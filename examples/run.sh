#!/usr/bin/env bash
# e2e example matrix (the reference treats examples/run.sh as its de-facto
# integration suite, SURVEY.md §4).  Runs every family through xDiTParallel
# across the parallelism axes on the virtual 8-device CPU mesh — no
# checkpoints or hardware needed; pass real sizes/degrees on a TPU slice.
#
#   ./examples/run.sh            # tiny smoke matrix (CPU, ~minutes)
#   MESH=tpu ./examples/run.sh   # run on the attached TPU devices instead
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${MESH:-cpu}" = "cpu" ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
fi

SMALL="--height 64 --width 64 --num_inference_steps 3 --max_sequence_length 8"
run() {
  echo "=== $* ==="
  python "$@"
}

# PixArt: single / USP / compressed ring / CFG / patch-pipelined PP
run examples/pixartalpha_example.py $SMALL --prompt "a cactus"
run examples/pixartalpha_example.py $SMALL --ulysses_degree 2 --ring_degree 2 --prompt "a cactus"
run examples/pixartalpha_example.py $SMALL --ring_degree 4 --compact --compact_type binary --prompt "a cactus"
run examples/pixartalpha_example.py $SMALL --use_cfg_parallel --ring_degree 2 --prompt "a cactus"

# FLUX (12B - minutes per forward on CPU; set FULL=1 to include)
if [ "${FULL:-0}" = "1" ]; then
  run examples/flux_example.py $SMALL --model black-forest-labs/FLUX.1-schnell --ulysses_degree 2 --prompt "a fox"
  run examples/flux_example.py $SMALL --model black-forest-labs/FLUX.1-schnell --ring_degree 4 --compact --compact_type int2 --prompt "a fox"
fi

# SD3
run examples/sd3_example.py $SMALL --model stabilityai/stable-diffusion-3-medium --ulysses_degree 2 --prompt "a boat"

# HunyuanDiT (skip-channel PP)
run examples/hunyuandit_example.py $SMALL --ring_degree 2 --prompt "a temple"

# Video families (latent out; tiny frame counts)
VSMALL="--height 64 --width 64 --num_frames 5 --num_inference_steps 2 --max_sequence_length 8"
run examples/cogvideox_example.py $VSMALL --model THUDM/CogVideoX-2b --ulysses_degree 2 --prompt "a river"
# latte shards FRAMES over SP: frame count must divide the sp degree
run examples/latte_example.py --height 64 --width 64 --num_frames 4 --num_inference_steps 2 --max_sequence_length 8 --ulysses_degree 2 --prompt "a river"

echo "ALL EXAMPLE CONFIGS PASSED"
