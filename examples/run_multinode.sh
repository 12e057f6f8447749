#!/usr/bin/env bash
# Multi-host launch (the reference's examples/run_multinodes.sh analog).
#
# torchrun's rendezvous becomes JAX multi-controller bootstrap: run ONE
# process per host with the same command; each process calls
# jax.distributed.initialize via init_distributed_environment, which reads
# COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID from the environment
# (compactfusion_tpu/envs.py).  On Cloud TPU pods these are auto-detected
# and the three vars can be omitted entirely.
#
#   # host 0 (also the coordinator):
#   COORDINATOR_ADDRESS=10.0.0.1:8476 NUM_PROCESSES=2 PROCESS_ID=0 \
#       ./examples/run_multinode.sh
#   # host 1:
#   COORDINATOR_ADDRESS=10.0.0.1:8476 NUM_PROCESSES=2 PROCESS_ID=1 \
#       ./examples/run_multinode.sh
#
# The ring axis should stay inside a slice (ICI); put dp/cfg across hosts
# (DCN) — and on DCN-separated hosts the compressed ring is exactly where
# CompactFusion pays off (the paper's Ethernet story, latency_eth.csv).
set -euo pipefail
cd "$(dirname "$0")/.."

exec python examples/flux_example.py \
    --model "${MODEL:-flux-tiny}" \
    --height "${HEIGHT:-1024}" --width "${WIDTH:-1024}" \
    --num_inference_steps "${STEPS:-28}" \
    --ulysses_degree "${ULYSSES:-2}" --ring_degree "${RING:-4}" \
    --data_parallel_degree "${DP:-1}" \
    --compact --compact_type "${COMPACT_TYPE:-binary}" \
    --prompt "${PROMPT:-a photograph of a mountain lake at dawn}" \
    "$@"
