#!/bin/bash
# TTS (SDE churn) sampling (≙ reference scripts/inference/sample_tts.sh)
python -m yume_tpu.sample --config ti2v-5B --sde "$@"
