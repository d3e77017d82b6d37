#!/usr/bin/env bash
# RNN-T training with the fused transducer loss.
python -m statecatcher_tpu.cli \
    --data.config_path config.yaml \
    --train.sp_model tokenizer.json \
    --model.encoder lucyrnn \
    --train.mode rnnt \
    --model.rnnt_pred_emb_dim 64 --model.rnnt_joiner_dim 64 \
    "$@"
