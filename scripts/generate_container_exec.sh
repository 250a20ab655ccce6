#!/usr/bin/env bash
# Interactive generation container (ops parity with the reference's
# generate_container_exec.sh recommended config: 25 steps, guidance 6,
# negative prompt).
set -euo pipefail
IMAGE=${IMAGE:-photoverse-tpu}
docker build -t "$IMAGE" -f docker/Dockerfile .
docker run -it --privileged --network host \
  -v "$PWD:/workspace" -w /workspace \
  -e JAX_PLATFORMS=tpu \
  "$IMAGE" -m photoverse_tpu.cli.generate \
  --num_timesteps 25 --guidance_scale 6 \
  --negative_prompt "blurry, abstract, digital art, cartoon" \
  "$@"
