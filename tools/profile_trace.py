"""Capture a device trace of the flagship train step and print the HLO-op
time breakdown (needs the xprof / tensorboard-plugin-profile wheels).

    python tools/profile_trace.py [trace_dir]

Env: same BENCH_* knobs as bench.py (B, kernel impl, mode...).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np


def capture(trace_dir: str):
    from statecatcher_tpu.config import Config
    from statecatcher_tpu.models.asr import init_carry
    from statecatcher_tpu.models.speech import build_speech_model
    from statecatcher_tpu.train.step import init_train_state, make_segment_scan_step

    B = int(os.environ.get("BENCH_BATCH", "32"))
    K = int(os.environ.get("BENCH_SEGMENTS", "8"))
    seconds = 16.0
    kernel = os.environ.get("BENCH_KERNEL", "")
    mode = os.environ.get("BENCH_MODE", "ctc")
    encoder = os.environ.get("BENCH_ENCODER", "lucyrnn")
    over = [
        "--train.mode", mode,
        "--model.encoder", encoder,
        "--model.xlstm.embedding_dim", "512",
        "--model.hidden_size", "512",
        "--model.num_layers", "4",
        "--model.vocab_size", "1024",
        "--model.dtype", "bfloat16",
        "--data.batch_size", str(B),
        "--data.target_duration", str(seconds),
    ]
    if kernel:
        over += ["--model.lucyrnn.kernel_impl", kernel]
    cfg = Config().apply_overrides(over)
    sr = cfg.data.batch_samplerate
    S = int(sr * seconds)
    model = build_speech_model(cfg.model, 80, mode)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), 80, 64)
    step = make_segment_scan_step(
        model, cfg, blank_id=0,
        ctc_impl=os.environ.get("BENCH_CTC", "auto"),
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.3, 0.3, (K, B, S)).astype(np.float32))
    mask = jnp.ones((K, B, S), jnp.bool_)
    U = 128
    tokens = jnp.asarray(rng.integers(1, 1024, (K, B, U)).astype(np.int32))
    tok_lens = jnp.full((K, B), U, jnp.int32)
    rv = jnp.ones((K, B), jnp.bool_)
    sv = jnp.ones((K,), jnp.bool_)
    carry = init_carry(cfg.model, B, jnp.dtype(cfg.model.dtype))

    def fetch(outs):
        return float(jnp.sum(outs.loss))

    state, carry, outs = step(state, carry, audio, mask, tokens, tok_lens, rv, sv)
    fetch(outs)
    with jax.profiler.trace(trace_dir):
        state, carry, outs = step(state, carry, audio, mask, tokens, tok_lens, rv, sv)
        fetch(outs)


def report(trace_dir: str, top: int = 40):
    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane.pb found under", trace_dir)
        return
    xplane = max(xplanes, key=os.path.getmtime)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = (gzip.decompress(data) if data[:2] == b"\x1f\x8b" else data).decode()
    rows = json.loads(data)
    if isinstance(rows, list) and rows and "rows" in rows[0].get("", {}):
        pass
    # gviz DataTable: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    if isinstance(rows, list):
        tables = rows
    else:
        tables = [rows]
    for tbl in tables:
        if not isinstance(tbl, dict) or "cols" not in tbl:
            print(str(tbl)[:300])
            continue
        cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
        print("columns:", cols)
        out = []
        for r in tbl["rows"]:
            vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            out.append(dict(zip(cols, vals)))
        # sort by total self time if present
        key = next((k for k in cols if k and "self" in k.lower() and "time" in k.lower()), None)
        if key:
            out.sort(key=lambda d: -(d.get(key) or 0))
        for d in out[:top]:
            print(json.dumps(d))
        break


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sc_trace"
    if os.environ.get("SKIP_CAPTURE") != "1":
        capture(trace_dir)
    report(trace_dir)
