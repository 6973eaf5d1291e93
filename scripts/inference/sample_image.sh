#!/bin/bash
# 14B I2V sampling from ./jpg + caption.txt (≙ reference scripts/inference/sample_image.sh)
python -m yume_tpu.sample \
    --config i2v-14B \
    --ckpt_dir ./Yume-I2V-540P \
    --jpg_dir ./jpg \
    --caption_file ./caption.txt \
    --num_euler_timesteps 50 \
    --guide_scale 5.0 \
    --shift 3.0 \
    --width 960 --height 544 \
    --sample_num 4 \
    --output_dir ./outputs "$@"
