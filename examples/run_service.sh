#!/usr/bin/env bash
# Launch the HTTP serving entrypoint (the reference's examples/run_service.sh
# analog — see docs/developer/http_service.md).  Defaults to the tiny PixArt
# smoke config on the virtual CPU mesh so it runs anywhere; set MESH=tpu (and
# a real --model) for hardware serving.
#
#   ./examples/run_service.sh                 # tiny model, CPU, port 6311
#   MESH=tpu MODEL=pixart PORT=6311 ./examples/run_service.sh
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${MESH:-cpu}" = "cpu" ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
  MODEL="${MODEL:-pixart-tiny}"
  STEPS="${STEPS:-4}"
  SIZE="${SIZE:-256}"
else
  MODEL="${MODEL:-pixart}"
  STEPS="${STEPS:-20}"
  SIZE="${SIZE:-512}"
fi

exec python entrypoints/launch.py \
  --model "$MODEL" \
  --height "$SIZE" --width "$SIZE" \
  --num_inference_steps "$STEPS" \
  --port "${PORT:-6311}" \
  "$@"
