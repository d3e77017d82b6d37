"""Multi-process FULL training loop e2e (SURVEY.md §2.3 comm-backend row):
two OS processes under jax.distributed, each owning half the fixture files
(per-host data sessions), global batch assembled as sharded jax.Arrays over a
4-device data mesh — loss sequence must match the single-process run over the
same global batch (the reduction is a masked mean over global rows, so the
host→row assignment is irrelevant up to float reassociation)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from statecatcher_tpu.config import Config
from statecatcher_tpu.data.audio import write_wav_bytes


def _fixture_dir(path, n=4, seconds=4, sr=8000):
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    words = ["hello", "world", "testing", "audio", "stream", "state"]
    for i in range(n):
        x = rng.uniform(-0.3, 0.3, size=seconds * sr).astype(np.float32)
        (path / f"rec{i}.wav").write_bytes(write_wav_bytes(x, sr))
        lines = ["WEBVTT", ""]
        cue = seconds / 2
        for j in range(2):
            s, e = j * cue, (j + 1) * cue
            lines.append(f"00:00:{s:06.3f} --> 00:00:{e:06.3f}")
            lines.append(" ".join(rng.choice(words, size=3)))
            lines.append("")
        (path / f"rec{i}.vtt").write_text("\n".join(lines))
    return str(path)


_OVERRIDES = [
    "--model.encoder", "lstm",
    "--model.hidden_size", "16",
    "--model.num_layers", "1",
    "--model.dtype", "float32",
    "--data.source", "local",
    "--data.batch_samplerate", "8000",
    "--data.batch_size", "4",
    "--data.target_duration", "2.0",
    "--data.num_workers", "2",
    "--train.log_every_n", "1000",
    "--train.epochs", "100",
    "--train.steps", "6",
    "--train.segments_per_dispatch", "2",
]


_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platform_name", "cpu")

port, pid, data_dir, model_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]

from statecatcher_tpu.parallel.distributed import initialize_distributed
topo = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.device_count() == 4, jax.devices()

from statecatcher_tpu.config import Config
from statecatcher_tpu.train.loop import train

overrides = json.loads(sys.argv[5]) + [
    "--data.local_dir", data_dir, "--train.model_dir", model_dir,
]
cfg = Config().apply_overrides(overrides)
summary = train(cfg)
print("LOSSES " + json.dumps(summary["loss_history"]), flush=True)
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_full_train_loss_parity(tmp_path):
    data_dir = _fixture_dir(tmp_path / "data")

    # --- single-process baseline over the same 4 files, global batch 4 ---
    from statecatcher_tpu.train.loop import train

    cfg = Config().apply_overrides(
        _OVERRIDES + [
            "--data.local_dir", data_dir,
            "--train.model_dir", str(tmp_path / "models_sp"),
        ]
    )
    base = train(cfg)
    assert len(base["loss_history"]) == 6, base

    # --- two processes, two local devices each, per-host file shards ---
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid), data_dir,
             str(tmp_path / f"models_mp{pid}"), json.dumps(_OVERRIDES)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode("utf-8", "replace"))

    seqs = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid} OK" in out
        line = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert line, out[-4000:]
        seqs.append(json.loads(line[-1][len("LOSSES "):]))

    # both processes observe the identical replicated loss scalars
    np.testing.assert_array_equal(seqs[0], seqs[1])
    # and they match the single-process run over the same global batch
    # (row order differs host-to-host → tiny float reassociation slack)
    np.testing.assert_allclose(seqs[0], base["loss_history"], rtol=2e-4, atol=1e-6)


_KILL_RESUME_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platform_name", "cpu")

port, pid, data_dir, model_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]

from statecatcher_tpu.parallel.distributed import initialize_distributed
initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.device_count() == 4, jax.devices()

from statecatcher_tpu.config import Config
from statecatcher_tpu.train.loop import train

overrides = json.loads(sys.argv[5]) + [
    "--data.local_dir", data_dir, "--train.model_dir", model_dir,
]
cfg = Config().apply_overrides(overrides)

full = train(cfg.apply_overrides(["--train.steps", "6"]))
assert full["global_step"] == 6, full["global_step"]
part = train(cfg.apply_overrides(["--train.steps", "3"]))
assert part["global_step"] == 3, part["global_step"]
resumed = train(cfg.apply_overrides(
    ["--train.steps", "6", "--train.resume_from", part["run_dir"]]
))
assert resumed["global_step"] == 6, resumed["global_step"]

print("FULL " + json.dumps(full["loss_history"]), flush=True)
print("GOT " + json.dumps(part["loss_history"] + resumed["loss_history"]), flush=True)
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_kill_resume_mid_batch(tmp_path):
    """Multi-host mid-recording-batch resume (round-3 gap): the carry is
    restored from the full-session checkpoint into batch-sharded global
    arrays (local-row slice + make_global), so the resumed 2-process loss
    sequence must equal the uninterrupted 2-process run — steps=3 stops
    after the first segment of the second recording batch, forcing re-entry
    at seg_idx=1 with the restored sharded carry."""
    data_dir = _fixture_dir(tmp_path / "data")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    shared_models = str(tmp_path / "models_shared")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _KILL_RESUME_WORKER, str(port), str(pid),
             data_dir, shared_models, json.dumps(_OVERRIDES)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode("utf-8", "replace"))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid} OK" in out
        full = json.loads(
            [l for l in out.splitlines() if l.startswith("FULL ")][-1][5:])
        got = json.loads(
            [l for l in out.splitlines() if l.startswith("GOT ")][-1][4:])
        assert len(full) == 6 and len(got) == 6
        np.testing.assert_allclose(got, full, rtol=0, atol=0)
