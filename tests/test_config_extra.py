"""Extra config-surface tests."""

import pytest

from statecatcher_tpu.config import Config


def test_from_dict_unknown_field_warns_and_skips():
    # Forward compat: a saved run config may contain fields that were later
    # removed; loading warns and ignores them instead of failing.
    with pytest.warns(UserWarning, match="nonexistent_field"):
        cfg = Config.from_dict({"model": {"nonexistent_field": 1, "hidden_size": 7}})
    assert cfg.model.hidden_size == 7


def test_nested_roundtrip_preserves_overrides():
    cfg = Config().apply_overrides([
        "--model.lucyrnn.kernel_impl", "assoc",
        "--model.xlstm.chunk_size", "32",
        "--frontend.kind", "mel",
    ])
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.model.lucyrnn.kernel_impl == "assoc"
    assert cfg2.model.xlstm.chunk_size == 32
    assert cfg2.frontend.kind == "mel"
    assert cfg2 == cfg


def test_frozen_configs_hashable():
    cfg = Config()
    hash(cfg.frontend)  # jit static-arg requirement
    hash(cfg.model.lucyrnn)


def test_unigram_training_deterministic():
    from statecatcher_tpu.tokenizer import UnigramTokenizer

    corpus = ["deterministic training of unigram pieces"] * 10
    t1 = UnigramTokenizer.train(corpus, vocab_size=48)
    t2 = UnigramTokenizer.train(corpus, vocab_size=48)
    assert t1.to_dict() == t2.to_dict()
