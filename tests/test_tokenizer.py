import json

import pytest

from statecatcher_tpu.tokenizer import CharTokenizer, UnigramTokenizer, load_tokenizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day",
    "a quick brown cat jumps too",
    "all the quick animals jump over dogs",
] * 5


def test_char_roundtrip():
    tok = CharTokenizer.train(CORPUS)
    ids = tok.encode("the quick dog")
    assert all(i >= 2 for i in ids)  # never blank/unk for in-vocab text
    assert tok.decode_ids(ids) == "the quick dog"


def test_char_unknown_char():
    tok = CharTokenizer.train(["abc"])
    ids = tok.encode("abz")
    assert ids[-1] == CharTokenizer.UNK
    assert tok.decode_ids(ids) == "ab"


def test_char_save_load(tmp_path):
    tok = CharTokenizer.train(CORPUS)
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = load_tokenizer(p)
    assert tok2.encode("lazy dog") == tok.encode("lazy dog")


def test_unigram_trains_and_roundtrips():
    tok = UnigramTokenizer.train(CORPUS, vocab_size=64)
    assert tok.vocab_size <= 64
    for text in ("the quick brown fox", "lazy dogs jump"):
        ids = tok.encode(text)
        assert len(ids) > 0
        assert all(i != tok.blank_id for i in ids)  # blank never emitted
        assert tok.decode_ids(ids) == text


def test_unigram_learns_multichar_pieces():
    tok = UnigramTokenizer.train(CORPUS, vocab_size=96)
    ids = tok.encode("the the the")
    # frequent word "the" should encode to few pieces (merged subwords)
    assert len(ids) <= 6


def test_unigram_unknown_char_is_unk():
    tok = UnigramTokenizer.train(CORPUS, vocab_size=64)
    ids = tok.encode("the ¤ dog")
    assert UnigramTokenizer.UNK in ids
    assert tok.decode_ids(ids) == "the dog"


def test_unigram_save_load(tmp_path):
    tok = UnigramTokenizer.train(CORPUS, vocab_size=64)
    p = str(tmp_path / "uni.json")
    tok.save(p)
    tok2 = load_tokenizer(p)
    assert tok2.encode("quick brown") == tok.encode("quick brown")
    assert tok2.vocab_size == tok.vocab_size


def test_blank_id_zero_contract():
    for tok in (CharTokenizer.train(CORPUS), UnigramTokenizer.train(CORPUS, vocab_size=64)):
        assert tok.blank_id == 0
        assert tok.id_to_piece(0) == "<blk>"
