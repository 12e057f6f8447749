#!/bin/bash
# Smoke-test the generation service (reference: entrypoints/curl.sh).
# Start it first, e.g.:
#   python entrypoints/launch.py --model pixart --num_inference_steps 20
# Size/steps are baked into the compiled program at launch; per-request
# fields are prompt / negative_prompt / seed (others are reported ignored).
HOST="${HOST:-localhost}"
PORT="${PORT:-6000}"

curl -X POST "http://${HOST}:${PORT}/generate" \
     -H "Content-Type: application/json" \
     -d '{
           "prompt": "a cute rabbit",
           "seed": 42,
           "save_disk_path": "/tmp"
         }'
