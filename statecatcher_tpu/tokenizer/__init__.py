"""Tokenizers: sentencepiece adapter + self-contained char/unigram models.

The reference tokenizes with the sentencepiece C++ library (reference
train.py:15,91-97, train_sentencepiece.py) and hardcodes ``blank_id = 0`` —
sharing sp's ``<unk>`` slot, which works because ``<unk>`` never appears in
encode output at character coverage ≈ 1.0 (SURVEY.md Appendix A.9).

This package keeps that contract: **piece 0 is the CTC blank and is never
produced by encode**.  Three interchangeable backends:

  * ``SentencePieceTokenizer`` — thin adapter when the sentencepiece package
    is importable (identical models ⇒ identical token streams as reference).
  * ``CharTokenizer`` — character vocabulary; trivial, fully reproducible.
  * ``UnigramTokenizer`` — sentencepiece-style unigram LM trained with EM +
    pruning, Viterbi encoding; self-contained replacement for the reference's
    ``train_sentencepiece.py`` component (C21).
"""

from statecatcher_tpu.tokenizer.base import Tokenizer, load_tokenizer
from statecatcher_tpu.tokenizer.char import CharTokenizer
from statecatcher_tpu.tokenizer.unigram import UnigramTokenizer

__all__ = ["Tokenizer", "load_tokenizer", "CharTokenizer", "UnigramTokenizer"]
