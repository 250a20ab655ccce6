#!/usr/bin/env bash
# Detached training container on a TPU VM (ops parity with the reference's
# train_container_exec.sh, with --gpus replaced by TPU device passthrough).
set -euo pipefail
IMAGE=${IMAGE:-photoverse-tpu}
docker build -t "$IMAGE" -f docker/Dockerfile .
docker run -d --privileged --network host \
  -v "$PWD:/workspace" -w /workspace \
  -e JAX_PLATFORMS=tpu \
  "$IMAGE" -m photoverse_tpu.cli.train "$@"
