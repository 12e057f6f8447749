#!/usr/bin/env bash
# DiTFastAttn workflow (the reference's examples/run_fastditattn.sh analog,
# see docs/methods/ditfastattn.md): calibrate a per-(step, layer) attention
# plan on caption prompts, cache it, and run compressed.  Defaults to the
# tiny PixArt config on the CPU mesh; set MESH=tpu MODEL=pixart-sigma-2k (or
# another PixArt checkpoint path) for real runs.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${MESH:-cpu}" = "cpu" ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
  MODEL="${MODEL:-pixart-tiny}"
  TASK_ARGS="--height 64 --width 64 --num_inference_steps 4 --max_sequence_length 8"
  WINDOW="${WINDOW:-8}"
else
  MODEL="${MODEL:-pixart}"
  TASK_ARGS="--height 1024 --width 1024 --num_inference_steps 20 --no_use_resolution_binning"
  WINDOW="${WINDOW:-512}"
fi

FAST_ATTN_ARGS="--use_fast_attn --window_size $WINDOW --n_calib 4 --threshold 0.15 \
  --use_cache --coco_path ${COCO_PATH:-benchmark/prompts.json}"

exec python examples/pixartalpha_example.py \
  --model "$MODEL" $TASK_ARGS $FAST_ATTN_ARGS --prompt "a cactus" "$@"
