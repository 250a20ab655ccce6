#!/usr/bin/env bash
# Canonical full recipe (ops parity with the reference's
# prepare_dataset_and_train.sh): prepare CelebA-HQ then run the 40k-step
# recipe — batch 16, LoRA rank 128, arcface identity loss, lr 1e-5, wandb.
set -euo pipefail

python -m photoverse_tpu.cli.prepare_celebhqmasks --save_path ./CelebaHQMaskDataset

python -m photoverse_tpu.cli.train \
  --data_root_path ./CelebaHQMaskDataset/train \
  --img_subfolder images --mask_subfolder masks \
  --train_batch_size 16 --max_train_steps 40000 \
  --use_lora --lora_rank 128 --lora_alpha 1 --lora_dropout 0.1 \
  --face_loss arcface --learning_rate 1e-5 \
  --lr_scheduler constant --lr_warmup_steps 500 \
  --use_random_prompts --report_to wandb \
  --mixed_precision bf16 \
  "$@"
