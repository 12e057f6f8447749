#!/usr/bin/env bash
# e2e example matrix (the reference treats examples/run.sh as its de-facto
# integration suite, SURVEY.md §4).  Runs every family through xDiTParallel
# across the parallelism axes on the virtual 8-device CPU mesh — "-tiny"
# model names route the registry to the family's smoke-test config, so no
# checkpoints or hardware are needed; set FULL=1 for the real model sizes
# (slow on CPU) or MESH=tpu to run on the attached TPU devices.
#
#   ./examples/run.sh            # tiny smoke matrix (CPU, ~minutes)
#   FULL=1 ./examples/run.sh     # real model sizes
#   MESH=tpu ./examples/run.sh   # run on the attached TPU devices instead
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${MESH:-cpu}" = "cpu" ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
fi

if [ "${FULL:-0}" = "1" ]; then
  PIXART="PixArt-alpha/PixArt-XL-2-512x512"
  FLUX="black-forest-labs/FLUX.1-schnell"
  SD3="stabilityai/stable-diffusion-3-medium"
  HYDIT="Tencent-Hunyuan/HunyuanDiT-v1.2"
  COG="THUDM/CogVideoX-2b"
  COG15="THUDM/CogVideoX1.5-5B"
  LATTE="maxin-cn/Latte-1"
  HV="tencent/HunyuanVideo"
  CONSISID="BestWishYsh/ConsisID-preview"
  STEPVIDEO="stepfun-ai/stepvideo-t2v"
else
  PIXART="pixart-tiny"; FLUX="flux-tiny"; SD3="sd3-tiny"
  HYDIT="hunyuandit-tiny"; COG="cogvideox-tiny"; LATTE="latte-tiny"
  HV="hunyuanvideo-tiny"; CONSISID="consisid-tiny"; STEPVIDEO="stepvideo-tiny"
fi

SMALL="--height 64 --width 64 --num_inference_steps 3 --max_sequence_length 8"
run() {
  echo "=== $* ==="
  python "$@"
}

# PixArt: single / USP / compressed ring / CFG parallel / per-layer plan
run examples/pixartalpha_example.py $SMALL --model "$PIXART" --prompt "a cactus"
run examples/pixartalpha_example.py $SMALL --model "$PIXART" --ulysses_degree 2 --ring_degree 2 --prompt "a cactus"
run examples/pixartalpha_example.py $SMALL --model "$PIXART" --ring_degree 4 --compact --compact_type binary --prompt "a cactus"
run examples/pixartalpha_example.py $SMALL --model "$PIXART" --use_cfg_parallel --ring_degree 2 --prompt "a cactus"
run examples/per_layer_schedule_example.py $SMALL --model "$PIXART" --ring_degree 4 --prompt "a cactus"
# DiTFastAttn: calibrate -> per-(step,layer) plan -> run compressed
run examples/pixartalpha_example.py $SMALL --model "$PIXART" --use_fast_attn --threshold 0.35 --window_size 4 --prompt "a cactus"
# AWL: attention-aware low-rank on the compressed ring
run examples/pixartalpha_example.py $SMALL --model "$PIXART" --ring_degree 4 --compact --compact_type low-rank-awl --compact_rank 2 --prompt "a cactus"

# FLUX: USP / compressed ring
run examples/flux_example.py $SMALL --model "$FLUX" --ulysses_degree 2 --prompt "a fox"
run examples/flux_example.py $SMALL --model "$FLUX" --ring_degree 4 --compact --compact_type int2 --prompt "a fox"

# SD3
run examples/sd3_example.py $SMALL --model "$SD3" --ulysses_degree 2 --prompt "a boat"

# HunyuanDiT (skip-channel ring)
run examples/hunyuandit_example.py $SMALL --model "$HYDIT" --ring_degree 2 --prompt "a temple"

# Video families (latent out; tiny frame counts)
VSMALL="--height 64 --width 64 --num_frames 5 --num_inference_steps 2 --max_sequence_length 8"
run examples/cogvideox_example.py $VSMALL --model "$COG" --ulysses_degree 2 --prompt "a river"
# CogVideoX 1.5: temporal patching (patch_size_t=2) with frame padding
run examples/cogvideox_example.py --height 64 --width 64 --num_frames 9 --num_inference_steps 2 --max_sequence_length 8 --model "${COG15:-cogvideox1.5-tiny}" --ulysses_degree 2 --prompt "a river"
run examples/hunyuanvideo_example.py $VSMALL --model "$HV" --ring_degree 2 --prompt "a wave"
run examples/consisid_example.py $VSMALL --model "$CONSISID" --ulysses_degree 2 --prompt "a face"
run examples/stepvideo_example.py $VSMALL --model "$STEPVIDEO" --prompt "a dance"
# functional USP plugged into an external (non-bundled) model
run examples/external_usp_example.py
# latte shards FRAMES over SP: frame count must divide the sp degree
run examples/latte_example.py --height 64 --width 64 --num_frames 4 --num_inference_steps 2 --max_sequence_length 8 --model "$LATTE" --ulysses_degree 2 --prompt "a river"

echo "ALL EXAMPLE CONFIGS PASSED"
