#!/bin/bash
# 14B I2V video-continuation sampling over ./test_video categories
# (≙ reference scripts/inference/sample.sh: mp4_data mode — decode each
# category's mp4, VAE-encode it as history, continue generation with the
# vocab caption; fastvideo/sample/sample.py:487-584)
python -m yume_tpu.sample \
    --config i2v-14B \
    --ckpt_dir ./Yume-I2V-540P \
    --video_root_dir ./test_video \
    --num_euler_timesteps 50 \
    --guide_scale 5.0 \
    --shift 3.0 \
    --width 960 --height 544 \
    --output_dir ./outputs "$@"
