#!/usr/bin/env bash
# Training pipeline: train -> evaluate -> export torch-schema checkpoint.
# Parity role of /root/reference/run_training_pipeline.sh (train + dvc
# add/push); artifact versioning is a plain directory/DVC hook point here.
set -euo pipefail

CONFIG="${1:-configs/basic_config.yaml}"

python -m unsupervised_pseuso_lidar_tpu.cli.train --config "$CONFIG"
python -m unsupervised_pseuso_lidar_tpu.cli.evaluate --config "$CONFIG"

# Optional: version the checkpoint directory with DVC if available.
if command -v dvc >/dev/null 2>&1 && [ -d .dvc ]; then
    dvc add pretrained/
    dvc push
fi
