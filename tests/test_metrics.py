import json

from statecatcher_tpu.metrics import (
    JsonlSink,
    StageTimer,
    ThroughputMeter,
    cer,
    edit_distance,
    wer,
)


def test_edit_distance_basic():
    assert edit_distance([], []) == 0
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(["a"], []) == 1


def test_wer():
    assert wer(["hello world"], ["hello world"]) == 0.0
    assert wer(["a b c d"], ["a x c d"]) == 0.25
    assert wer(["a b", "c d"], ["a b", "c x"]) == 0.25
    assert wer([""], [""]) == 0.0
    assert wer([""], ["something"]) == float("inf")


def test_cer():
    assert cer(["abcd"], ["abxd"]) == 0.25


def test_jsonl_sink(tmp_path):
    p = str(tmp_path / "m.jsonl")
    s = JsonlSink(p)
    s.set_params({"lr": 1e-3})
    s.track(0.5, "loss", 1)
    s.close()
    lines = [json.loads(line) for line in open(p)]
    assert lines[0]["hparams"]["lr"] == 1e-3
    assert lines[1]["loss"] == 0.5


def test_throughput_meter():
    m = ThroughputMeter(window=10)
    for _ in range(5):
        m.step(16.0)
    assert m.audio_seconds_per_second > 0


def test_stage_timer():
    t = StageTimer()
    with t.time("stage_a"):
        pass
    assert "stage_a" in t.summary()
    assert t.summary()["stage_a"]["n"] == 1
