import pytest

from statecatcher_tpu.config import Config


def test_roundtrip_json():
    cfg = Config()
    s = cfg.to_json()
    cfg2 = Config.from_json(s)
    assert cfg2 == cfg


def test_overrides():
    cfg = Config().apply_overrides([
        "--model.encoder", "lucyrnn",
        "--train.optim.lr", "1e-3",
        "--data.batch_size=8",
        "--train.optim.use_scheduler", "true",
        "--train.steps", "100",
        "--data.max_duration", "120.5",
    ])
    assert cfg.model.encoder == "lucyrnn"
    assert cfg.train.optim.lr == 1e-3
    assert cfg.data.batch_size == 8
    assert cfg.train.optim.use_scheduler is True
    assert cfg.train.steps == 100
    assert cfg.data.max_duration == 120.5


def test_override_none():
    cfg = Config().apply_overrides(["--train.steps", "none"])
    assert cfg.train.steps is None


def test_unknown_path_raises():
    with pytest.raises(ValueError):
        Config().apply_overrides(["--nope.nope", "1"])


def test_dash_aliases():
    cfg = Config().apply_overrides(["--model.input-proj-dim", "128"])
    assert cfg.model.input_proj_dim == 128
