#!/bin/bash
# 5B distilled sampling, 4 steps (≙ reference scripts/inference/sample_5b.sh)
python -m yume_tpu.sample \
    --config ti2v-5B \
    --ckpt_dir ./Yume-5B-720P \
    --jpg_dir ./jpg \
    --caption_file ./caption.txt \
    --num_euler_timesteps 4 \
    --shift 7.0 \
    --width 1280 --height 704 \
    --sample_num 4 \
    --output_dir ./outputs "$@"
