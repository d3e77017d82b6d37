#!/usr/bin/env bash
# Train the unigram tokenizer (analogue of the reference's
# train_sentencepiece.sh: vocab 1024).
python -m statecatcher_tpu.train_tokenizer \
    --input corpus.txt --model-prefix tokenizer --vocab-size 1024 "$@"
