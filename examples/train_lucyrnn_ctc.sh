#!/usr/bin/env bash
# Canonical stateful LucyRNN-CTC training against a speechcatcher-data server
# (the analogue of the reference's train.sh: 8 s segments, clipping strategy).
python -m statecatcher_tpu.cli \
    --data.config_path config.yaml \
    --train.sp_model tokenizer.json \
    --frontend.kind mfcc \
    --model.encoder lucyrnn \
    --model.hidden_size 512 --model.num_layers 4 \
    --data.target_duration 8.0 \
    --data.batch_segment_strategy clipping \
    --train.mode ctc \
    "$@"
