#!/bin/bash
# MVDT + adversarial-distillation fine-tuning (≙ reference scripts/finetune/finetune.sh,
# torchrun replaced by one SPMD program over the device mesh)
python -m yume_tpu.train \
    --config ti2v-5B \
    --data_dir ./mp4_frame \
    --full_mp4_dir ./sekai \
    --MVDT --Distil \
    --learning_rate 1e-5 \
    --max_train_steps 1000 \
    --checkpointing_steps 25 \
    --validation_steps 100 \
    --output_dir ./checkpoints "$@"
