"""The training loop: session → batches → segment-slice loop → carried state.

Structure parity with reference train.py:308-604 —

  while True:
    fetch batch (retry-forever on error)
    per-item preprocess (parallel, drop failures)
    K = min|max segment count (clipping|padding strategy)
    carry = zero state                     # reset per recording-batch
    for seg_idx in range(K):               # ═ segment-slice loop ═
        stack slice → tokens → train_step  # carry survives the update
    mark_batch_done

— but the per-segment work (frontend, masks, loss, backward, clip, update,
greedy decode) is a single donated jit (train/step.py), batches are padded to
fixed shapes for compile-once behavior, and the data pipeline prefetches in
the background.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.config import Config
from statecatcher_tpu.data.local import LocalSpeechDataset
from statecatcher_tpu.data.pipeline import (
    BatchPipeline,
    assemble_compact_group,
    stack_segment_slice,
)
from statecatcher_tpu.decode import keep_to_token_lists
from statecatcher_tpu.frontend import feat_dim as frontend_feat_dim
from statecatcher_tpu.frontend import num_frames
from statecatcher_tpu.metrics import StageTimer, ThroughputMeter, wer
from statecatcher_tpu.models.speech import build_speech_model
from statecatcher_tpu.tokenizer import CharTokenizer, load_tokenizer
from statecatcher_tpu.train.checkpoint import CheckpointManager, setup_run_dir
from statecatcher_tpu.train.step import init_train_state

logger = logging.getLogger("statecatcher.train")


def _setup_logging(run_dir: str):
    root = logging.getLogger("statecatcher")
    root.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(run_dir, "train.log"))
    fh.setFormatter(fmt)
    root.addHandler(fh)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        root.addHandler(sh)


def build_dataset(cfg: Config):
    if cfg.data.source == "local":
        if not cfg.data.local_dir:
            raise ValueError("data.source=local requires data.local_dir")
        return LocalSpeechDataset(
            cfg.data.local_dir,
            batch_segment_strategy=cfg.data.batch_segment_strategy,
            batch_samplerate=cfg.data.batch_samplerate,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
    from statecatcher_tpu.data.client import SpeechDataset

    return SpeechDataset(
        config_path=cfg.data.config_path,
        batch_segment_strategy=cfg.data.batch_segment_strategy,
        batch_samplerate=cfg.data.batch_samplerate,
    )


def build_tokenizer(cfg: Config):
    """Load the configured tokenizer, or auto-train a char tokenizer from
    local VTTs (test/dev convenience; the reference requires --sp-model)."""
    if cfg.train.sp_model:
        return load_tokenizer(cfg.train.sp_model)
    if cfg.data.source == "local" and cfg.data.local_dir:
        from statecatcher_tpu.data.vtt import vtt_to_segments_with_text

        corpus = []
        for name in sorted(os.listdir(cfg.data.local_dir)):
            if name.endswith(".vtt"):
                with open(os.path.join(cfg.data.local_dir, name)) as f:
                    for _, _, text in vtt_to_segments_with_text(f.read()):
                        corpus.append(text)
        logger.info("Auto-training char tokenizer from %d cues", len(corpus))
        return CharTokenizer.train(corpus or ["abcdefghijklmnopqrstuvwxyz "])
    raise ValueError("train.sp_model is required for http data source")


def train(
    cfg: Config,
    dataset=None,
    max_batches: Optional[int] = None,
    initial_params=None,
) -> dict:
    """Run training.  Returns a summary dict (final step, losses, run_dir).

    ``initial_params``: optional params pytree to start from instead of the
    seeded init — warm starts, and the reference-in-the-loop parity harness
    (tools/reference_parity.py), which injects weights converted from the
    reference's torch init so both engines train the same function.

    Works single-process or under ``jax.distributed`` with N processes: each
    host fetches and preprocesses its own B/N rows (per-host data sessions,
    SURVEY.md §2.3 comm-backend row), assembles them into global
    batch-sharded arrays, and XLA emits the gradient allreduce — per-segment
    losses/updates are identical to the single-process run over the same
    global batch.
    """
    from statecatcher_tpu.parallel.distributed import (
        local_rows, make_global, shared_run_dir, sync_int,
    )

    n_proc = jax.process_count()
    if n_proc > 1:
        # one shared run dir (orbax multihost save coordinates through it)
        run_dir = setup_run_dir(cfg) if jax.process_index() == 0 else ""
        run_dir = shared_run_dir(run_dir)
        os.makedirs(run_dir, exist_ok=True)
    else:
        run_dir = setup_run_dir(cfg)
    _setup_logging(run_dir)
    logger.info("Run directory: %s", run_dir)

    if cfg.train.debug:
        from statecatcher_tpu.debug import enable_debug

        enable_debug()
    profiler_ctx = None
    if cfg.train.profile_dir:
        from statecatcher_tpu.debug import profile as profile_ctx

        profiler_ctx = profile_ctx(cfg.train.profile_dir)
        profiler_ctx.__enter__()

    tokenizer = build_tokenizer(cfg)
    vocab_size = tokenizer.vocab_size
    blank_id = tokenizer.blank_id
    logger.info("Vocab size: %d (blank_id=%d)", vocab_size, blank_id)
    if hasattr(tokenizer, "save") and jax.process_index() == 0:
        # snapshot next to the checkpoints so eval/inference reconstructs the
        # exact token mapping (the reference has no such artifact)
        tokenizer.save(os.path.join(run_dir, "tokenizer.json"))

    import dataclasses

    model_cfg = dataclasses.replace(cfg.model, vocab_size=vocab_size)
    if cfg.mesh.model_parallel > 1 and model_cfg.lucyrnn.kernel_impl == "auto":
        # Tensor parallelism lane-shards the fused (B,T,7D) gate tensor via
        # GSPMD; the fused-lm Pallas cell is an opaque custom call GSPMD
        # cannot partition along those lanes, so TP runs keep the split
        # path (XLA coeff math + Pallas scans), which GSPMD partitions fine.
        model_cfg = dataclasses.replace(
            model_cfg,
            lucyrnn=dataclasses.replace(model_cfg.lucyrnn, kernel_impl="pallas"),
        )
    fdim = frontend_feat_dim(cfg.frontend)
    model = build_speech_model(model_cfg, fdim, cfg.train.mode)

    sr = cfg.data.batch_samplerate
    target_samples = int(sr * cfg.data.target_duration)
    T = num_frames(target_samples, cfg.frontend)
    B = cfg.data.batch_size                 # global batch
    if B % n_proc != 0:
        raise ValueError(f"batch_size {B} not divisible by {n_proc} processes")
    B_local = B // n_proc                   # rows this host owns

    rng = jax.random.PRNGKey(cfg.train.seed)
    state = init_train_state(model, cfg, rng, fdim, min(T, 64))
    if initial_params is not None:
        tree_of = jax.tree_util.tree_structure
        if tree_of(state.params) != tree_of(initial_params):
            raise ValueError("initial_params tree does not match the model")
        state = state.replace(params=jax.tree.map(
            lambda tmpl, given: jnp.asarray(given, tmpl.dtype),
            state.params, initial_params,
        ))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(
        "Model built: %s, feat_dim=%d, vocab=%d, params=%.2fM",
        model_cfg.encoder, fdim, vocab_size, n_params / 1e6,
    )

    ckpt = CheckpointManager(run_dir)
    start_epoch = 0
    global_step = 0
    resume_cursor = None      # {"batches_done": N, "seg_idx": s} if mid-session
    resume_carry = None       # carry pytree at the checkpointed boundary
    resume_window = None      # metrics window at the checkpointed boundary
    if cfg.train.resume_from:
        prev = CheckpointManager(cfg.train.resume_from)
        # Every host restores the FULL global-B carry (it is tiny — a few MB
        # at flagship shapes); the mid-batch re-entry below slices each
        # host's local rows and reassembles the sharded global array once
        # the mesh exists.  This makes mid-recording-batch resume exact
        # under multi-host too (round-3 gap: the old path rounded up to the
        # next batch).
        state, meta, resume_carry = prev.restore(
            state, carry_template=model.init_state(B))
        global_step = int(meta["global_step"])
        start_epoch = int(meta["epoch"])
        resume_cursor = meta.get("cursor")
        resume_window = meta.get("metrics_window")
        logger.info(
            "Resumed from %s at step %d (cursor=%s, carry=%s)",
            cfg.train.resume_from, global_step, resume_cursor,
            "restored" if resume_carry is not None else "absent",
        )
        prev.close()

    from statecatcher_tpu.train.step import make_segment_scan_step

    # Data-parallel mesh when more than one device is available (and B
    # divides): batches + carry shard batch-major; XLA emits the gradient
    # allreduce.  Single-device runs take the unsharded path.
    mesh_plan = None
    n_dev = len(jax.devices())
    dp = cfg.mesh.data_parallel if cfg.mesh.data_parallel > 0 else n_dev
    if dp > 1 and n_dev >= dp and B % dp == 0:
        from statecatcher_tpu.parallel.mesh import make_mesh_plan

        mesh_plan = make_mesh_plan(cfg.mesh)
        if n_proc > 1:
            # params are identical on every host (same seed); assemble the
            # replicated global arrays from each host's copy
            state = jax.tree.map(
                lambda x: make_global(
                    np.asarray(x), mesh_plan.replicated_sharding()
                ),
                state,
            )
        else:
            state = mesh_plan.shard_replicated(state)
        logger.info(
            "data-parallel mesh: %d×%d devices, %d rows/device",
            mesh_plan.data_size, mesh_plan.model_size, B // mesh_plan.data_size,
        )
    elif n_proc > 1:
        raise ValueError(
            f"multi-process training needs a data-parallel mesh: "
            f"{n_dev} devices, dp={dp}, batch {B}"
        )

    train_step = make_segment_scan_step(
        model, cfg, blank_id=blank_id, ctc_impl=cfg.train.ctc_impl,
        mesh_plan=mesh_plan,
    )

    if dataset is None:
        dataset = build_dataset(cfg)
    dataset.start_session(
        batch_size=B_local, order=cfg.data.order,
        min_duration=cfg.data.min_duration, max_duration=cfg.data.max_duration,
    )

    from statecatcher_tpu.metrics import make_sinks

    experiment = f"asr_statecatcher_{os.path.basename(run_dir)}"
    sinks = make_sinks(logger, run_dir, experiment)
    sinks.set_params({
        "encoder": model_cfg.encoder, "frontend": cfg.frontend.kind,
        "mode": cfg.train.mode, "lr": cfg.train.optim.lr,
        "batch_samplerate": sr, "target_duration": cfg.data.target_duration,
        "optimizer": cfg.train.optim.optimizer,
        "max_grad_norm": cfg.train.optim.max_grad_norm,
        "epochs": cfg.train.epochs,
        "accumulation_steps": cfg.train.optim.accumulation_steps,
        "num_params": int(n_params),
    })

    import collections

    timer = StageTimer()
    meter = ThroughputMeter()
    # rolling history of per-segment losses (windowed `losses` is cleared at
    # each log flush; the summary and parity tests want the raw sequence)
    loss_history: collections.deque = collections.deque(maxlen=100_000)
    losses: list[float] = []
    window_refs: list[str] = []
    window_hyps: list[str] = []
    if resume_window:
        # continue the avg_loss / train-TER windows exactly where the
        # checkpointed session left them
        losses.extend(resume_window.get("losses", []))
        window_refs.extend(resume_window.get("refs", []))
        window_hyps.extend(resume_window.get("hyps", []))
    prev_epoch = None
    n_batches = 0
    stop = False
    pending = None  # deferred metrics of the in-flight dispatch
    # Hallucination / bad-transcript filter (reference roadmap README.md:30):
    # per-utterance losses z-scored against a rolling median/MAD window; a
    # flagged recording's remaining segments are quarantined via row_valid.
    halluc = None
    if cfg.train.hallucination_zscore > 0:
        from statecatcher_tpu.metrics import LossOutlierDetector

        halluc = LossOutlierDetector(
            cfg.train.hallucination_zscore,
            cfg.train.hallucination_window,
            cfg.train.hallucination_min_window,
            cfg.train.hallucination_min_rel,
        )
    carry = None
    compact_checked = False  # one-time compact_transfer prefix-mask check
    compact_err_checked = False  # one-time int16-grid probe (first FLOAT group)
    from statecatcher_tpu.data.pipeline import GroupBufferPool

    compact_pool = GroupBufferPool()  # reusable double-buffered group buffers
    # data-session cursor: how many recording batches this session has fully
    # processed, and the next segment index within the in-flight batch.  Saved
    # with every checkpoint so resume can re-enter mid-recording-batch (the
    # session replay is exact for deterministic sources: local dirs and the
    # fixture server; a live shuffled server resumes at the params/carry level
    # with best-effort positioning).
    cursor = {"batches_done": 0, "seg_idx": 0}
    skip_batches = 0
    resume_seg = 0
    if resume_cursor:
        skip_batches = int(resume_cursor.get("batches_done", 0))
        resume_seg = int(resume_cursor.get("seg_idx", 0))
        cursor = {"batches_done": skip_batches, "seg_idx": resume_seg}
    # total completed batches since SESSION start (includes replayed ones, so
    # cursors chain across repeated resumes); n_batches counts only this
    # process run (max_batches semantics unchanged)
    batches_done_total = skip_batches

    def _resolve_metrics(p):
        outs, group, last_texts, rows, audio_secs, step_at, \
            row_real, quarantined, batch_ident = p
        loss_vals = np.asarray(outs.loss)[:group]   # replicated scalars
        losses.extend(float(x) for x in loss_vals)
        loss_history.extend(float(x) for x in loss_vals)
        meter.step(audio_secs)
        if halluc is not None:
            pl = np.asarray(local_rows(outs.per_loss, batch_axis=1))[:group]
            for k in range(group):
                # Detrend: the raw per-utterance NLL falls as training
                # progresses, which would leave every current value below a
                # trailing window's median.  The residual against the
                # CONTEMPORANEOUS group median is stationary — a bad
                # transcript sits far above its own batch peers at every
                # point of training.
                cur = [
                    float(pl[k, i]) for i in range(min(rows, pl.shape[1]))
                    if row_real[k, i] and not quarantined[i]
                    and np.isfinite(pl[k, i])
                ]
                if not cur:
                    continue
                group_med = float(np.median(cur))
                for i in range(min(rows, pl.shape[1])):
                    if quarantined[i] or not row_real[k, i]:
                        continue
                    if halluc.update(float(pl[k, i]) - group_med,
                                     scale=group_med):
                        # quarantine the rest of this recording (detection
                        # runs one dispatch behind — the affected rows stop
                        # training from the next segment group on) and
                        # report through the server log endpoint the
                        # reference already calls (reference train.py log)
                        quarantined[i] = True
                        msg = (
                            "hallucination filter: quarantined row "
                            f"{i} of batch {batch_ident} (per-utterance "
                            f"loss {pl[k, i]:.3f}, robust z > "
                            f"{cfg.train.hallucination_zscore:g})"
                        )
                        logger.warning(msg)
                        try:
                            dataset.log("WARNING", msg)
                        except Exception:
                            pass
        if len(losses) >= cfg.train.log_every_n:
            with timer.time("metrics"):
                last = group - 1
                # decode this host's rows only (preds are batch-sharded)
                hyp_lists = keep_to_token_lists(
                    local_rows(outs.preds, batch_axis=1)[last],
                    local_rows(outs.keep, batch_axis=1)[last],
                )
                for i in range(rows):
                    window_hyps.append(tokenizer.decode_ids(hyp_lists[i]))
                    window_refs.append(last_texts[i])
                avg_loss = sum(losses) / len(losses)
                ter = wer(window_refs, window_hyps)
                sinks.track(avg_loss, f"avg_loss_{cfg.train.log_every_n}", step_at)
                sinks.track(ter, f"train_ter_{cfg.train.log_every_n}", step_at)
                sinks.track(float(outs.grad_norm[last]), "grad_norm", step_at)
                sinks.track(meter.audio_seconds_per_second, "audio_sec_per_sec", step_at)
                if halluc is not None:
                    sinks.track(
                        halluc.flagged, "hallucination_quarantined", step_at)
                losses.clear()
                window_refs.clear()
                window_hyps.clear()

    def save(epoch, step=None):
        nonlocal pending
        if pending is not None:
            # fold the in-flight dispatch into the windows so the saved
            # metrics state matches the saved cursor exactly
            _resolve_metrics(pending)
            pending = None
        ckpt.save(
            step if step is not None else global_step,
            state,
            {
                "epoch": int(epoch),
                "global_step": int(global_step),
                "cursor": dict(cursor),
                "metrics_window": {
                    "losses": list(losses),
                    "refs": list(window_refs),
                    "hyps": list(window_hyps),
                },
            },
            carry=carry,
        )

    pipe = BatchPipeline(
        dataset, target_samples, num_workers=cfg.data.num_workers,
        prefetch=cfg.data.prefetch_batches,
    ).start()
    try:
        while not stop:
            with timer.time("fetch"):
                batch = pipe.get()
            if skip_batches > 0:
                # resume replay: the checkpointed session already processed
                # this batch; consume and discard to restore data position
                skip_batches -= 1
                prev_epoch = batch.epoch
                continue
            epoch = batch.epoch

            if prev_epoch is None:
                prev_epoch = epoch
            elif epoch != prev_epoch:
                save(prev_epoch)
                if prev_epoch + 1 >= cfg.train.epochs:
                    break
                prev_epoch = epoch
            if epoch >= cfg.train.epochs:
                break

            K = batch.num_segments(cfg.data.batch_segment_strategy)
            # all hosts must agree on the segment count of the global batch
            K = sync_int(
                K, "min" if cfg.data.batch_segment_strategy == "clipping" else "max"
            )
            n_rows = len(batch.audio_items)
            # hallucination-filter quarantine state, per recording batch:
            # a flagged row stops training (row_valid=False) for the rest
            # of its recording
            quarantined = np.zeros(B_local, bool)

            # Reset the carry at each new recording batch (reference
            # train.py:460) — fixed shape B for compile-once.  On the first
            # batch after a mid-recording-batch resume, restore the
            # checkpointed carry and re-enter at the saved segment instead.
            seg_idx = 0
            if resume_seg > 0:
                seg_idx = min(resume_seg, K)
                resume_seg = 0
                if resume_carry is None:
                    raise RuntimeError(
                        "resume cursor is mid-recording-batch but the "
                        "checkpoint has no carry (pre-migration layout)"
                    )
                if n_proc > 1:
                    # slice this host's rows of the restored global-B carry
                    # and reassemble the batch-sharded global array
                    sh = mesh_plan.batch_sharding()

                    def _to_global(x, sh=sh):
                        x = np.asarray(x)
                        idxs = sh.addressable_devices_indices_map(x.shape)
                        spans = sorted({
                            (s[0].start or 0,
                             x.shape[0] if s[0].stop is None else s[0].stop)
                            for s in idxs.values()
                        })
                        # the min:max slice below assumes this host's batch
                        # rows are CONTIGUOUS; on a mesh layout mapping a
                        # host to scattered rows it would silently restore
                        # the wrong rows — fail loudly instead
                        cur = spans[0][0]
                        for a, b in spans:
                            if a > cur:
                                raise RuntimeError(
                                    "mid-batch carry resume: this host's "
                                    f"addressable batch rows {spans} are not "
                                    "contiguous under the mesh layout — "
                                    "cannot reassemble the restored carry "
                                    "with a single slice"
                                )
                            cur = max(cur, b)
                        return make_global(x[spans[0][0]:cur], sh)

                    carry = jax.tree.map(_to_global, resume_carry)
                elif mesh_plan is not None:
                    carry = jax.tree.map(
                        lambda x: jax.device_put(
                            x, mesh_plan.batch_sharding()), resume_carry,
                    )
                else:
                    carry = resume_carry
                resume_carry = None
            elif n_proc > 1:
                carry = jax.tree.map(
                    lambda x: make_global(np.asarray(x), mesh_plan.batch_sharding()),
                    model.init_state(B_local),
                )
            else:
                carry = model.init_state(B)
            KG = max(1, cfg.train.segments_per_dispatch)

            while seg_idx < K and not stop:
                # group of up to KG segments, capped so step limits are exact
                group = min(KG, K - seg_idx)
                if cfg.train.steps:
                    group = min(group, cfg.train.steps - global_step)
                group_ids = list(range(seg_idx, seg_idx + group))
                seg_idx += group

                with timer.time("host_prep"):
                    if cfg.train.compact_transfer:
                        # Single-pass assembly straight into the final
                        # (KG, B, S) transfer buffer — int16 passthrough
                        # (no quantize pass) and prefix lens instead of
                        # stacked bool masks.  The generic per-segment path
                        # below copies the group twice; measured 5.5 s vs
                        # ~1 s per flagship group (profile_e2e_flagship.py).
                        audio_k, lens_k, g_texts = assemble_compact_group(
                            batch, group_ids, KG, B_local, target_samples,
                            pool=compact_pool,
                        )
                        g_tokens = [
                            [tokenizer.encode(t) for t in g_texts[gi]]
                            for gi in range(group)
                        ]
                        if not compact_checked:
                            # one-time invariant check: masks must be PREFIX
                            # masks — interior zeros (e.g. a future
                            # time-masking augmentation) would silently
                            # become a different mask under the lens form
                            compact_checked = True
                            for mi in batch.mask_items:
                                for si in group_ids:
                                    if si >= len(mi):
                                        continue
                                    m = mi[si]
                                    nnz = int(np.count_nonzero(m))
                                    if not (m[:nnz].all()
                                            and not m[nnz:].any()):
                                        raise ValueError(
                                            "train.compact_transfer requires"
                                            " prefix sample masks; got a "
                                            "mask with interior zeros — "
                                            "disable compact_transfer or "
                                            "fix the data plane "
                                            "(chunks_to_segments produces "
                                            "prefix masks)"
                                        )
                        if audio_k.dtype != np.int16:
                            # float-sourced / resampled rows present:
                            # quantize to the int16 grid
                            audio_q = np.clip(
                                np.rint(audio_k * 32767.0), -32768.0, 32767.0
                            ).astype(np.int16)
                            if not compact_err_checked and audio_k.size:
                                # int16-grid probe, once, on the first FLOAT
                                # group (≤ ~3e-5/sample perturbation for
                                # non-PCM16 sources — say so, not silently)
                                compact_err_checked = True
                                err = float(
                                    np.max(np.abs(audio_q / 32767.0 - audio_k))
                                )
                                if err > 1e-6:  # PCM16 roundtrip noise ~1e-8
                                    logger.info(
                                        "compact_transfer: audio not on the "
                                        "int16 grid (max quantization error "
                                        "%.2e/sample — resampled or "
                                        "float-sourced input); set "
                                        "train.compact_transfer=false for "
                                        "bit-exact transfer", err,
                                    )
                            audio_k = audio_q
                        mask_k = lens_k
                    else:
                        g_audio, g_mask, g_texts = [], [], []
                        g_tokens = []
                        for si in group_ids:
                            audio, mask, texts = stack_segment_slice(
                                batch, si, target_samples,
                            )
                            if n_rows < B_local:  # pad to per-host shape
                                pad = B_local - n_rows
                                audio = np.pad(audio, ((0, pad), (0, 0)))
                                mask = np.pad(mask, ((0, pad), (0, 0)))
                                texts = texts + [""] * pad
                            g_audio.append(audio)
                            g_mask.append(mask)
                            g_texts.append(texts)
                            g_tokens.append(
                                [tokenizer.encode(t) for t in texts])
                        # pad the group to fixed KG with invalid segments
                        while len(g_audio) < KG:
                            g_audio.append(np.zeros_like(g_audio[0]))
                            g_mask.append(np.zeros_like(g_mask[0]))
                            g_texts.append([""] * B_local)
                        audio_k = np.stack(g_audio)
                        mask_k = np.stack(g_mask)
                    row_valid = np.broadcast_to(
                        (np.arange(B_local) < n_rows) & ~quarantined,
                        (KG, B_local),
                    )
                    seg_valid = np.arange(KG) < group
                    # common token padding across the group (bucketed); all
                    # hosts must agree so the global array shapes match
                    flat = [t for seg in g_tokens for t in seg]
                    U = max(max((len(t) for t in flat), default=1), 1)
                    U = sync_int(-(-U // 16) * 16, "max")
                    tokens = np.full((KG, B_local, U), blank_id, dtype=np.int32)
                    tgt_lens = np.zeros((KG, B_local), dtype=np.int32)
                    for gi, seg in enumerate(g_tokens):
                        for bi, t in enumerate(seg):
                            tgt_lens[gi, bi] = len(t)
                            if t:
                                tokens[gi, bi, : len(t)] = np.asarray(t, np.int32)
                    # Hallucination-filter scope: a row only participates in
                    # the outlier statistics when its segment is REAL —
                    # within its recording's segment count and with tokens.
                    # Under the "padding" strategy ended recordings keep
                    # training on silence + empty text (reference parity),
                    # and their near-zero losses would otherwise collapse
                    # the group median and falsely flag the longest
                    # recording's tail segments.
                    counts = np.zeros(B_local, np.int64)
                    counts[:n_rows] = batch.num_segments_per_item
                    gid = np.full(KG, np.iinfo(np.int64).max)
                    gid[:len(group_ids)] = group_ids
                    row_real = (
                        row_valid
                        & (gid[:, None] < counts[None, :])
                        & (tgt_lens > 0)
                    )
                with timer.time("train_step"):
                    # async dispatch: nothing here blocks — the device starts
                    # while the host prepares the next group
                    if n_proc > 1:
                        from jax.sharding import NamedSharding, PartitionSpec

                        seg_sh = NamedSharding(
                            mesh_plan.mesh, PartitionSpec(None, "data")
                        )
                        repl_sh = mesh_plan.replicated_sharding()
                        args = (
                            make_global(audio_k, seg_sh),
                            make_global(mask_k, seg_sh),
                            make_global(tokens, seg_sh),
                            make_global(tgt_lens, seg_sh),
                            make_global(np.ascontiguousarray(row_valid), seg_sh),
                            make_global(seg_valid, repl_sh),
                        )
                    else:
                        args = (
                            jnp.asarray(audio_k), jnp.asarray(mask_k),
                            jnp.asarray(tokens), jnp.asarray(tgt_lens),
                            jnp.asarray(row_valid), jnp.asarray(seg_valid),
                        )
                    state, carry, outs = train_step(state, carry, *args)

                global_step += group
                cursor = {"batches_done": batches_done_total, "seg_idx": seg_idx}
                # Resolve the PREVIOUS dispatch's metrics now (one dispatch of
                # lag keeps the device busy during host-side prep/decoding).
                if pending is not None:
                    _resolve_metrics(pending)
                pending = (
                    outs, group, g_texts[group - 1], n_rows,
                    float(mask_k[:group].sum()) / sr, global_step,
                    row_real, quarantined, batch.batch_id,
                )

                if (
                    cfg.train.save_every_n_updates
                    and global_step % cfg.train.save_every_n_updates < group
                ):
                    save(epoch)

                if cfg.train.steps and global_step >= cfg.train.steps:
                    stop = True

            with timer.time("mark_done"):
                dataset.mark_batch_done(epoch, batch.batch_id)
            dataset.log("INFO", f"Completed batch {batch.batch_id} @ epoch {epoch}")
            n_batches += 1
            batches_done_total += 1
            if seg_idx >= K:
                # only a fully-processed batch advances the resume cursor; a
                # steps-limit stop mid-batch keeps {batches_done, seg_idx}
                # pointing at the unprocessed remainder
                cursor = {"batches_done": batches_done_total, "seg_idx": 0}
            if max_batches and n_batches >= max_batches:
                break
    finally:
        if pending is not None:
            _resolve_metrics(pending)
            pending = None
        pipe.stop()
        dataset.end_session()
        save(prev_epoch if prev_epoch is not None else 0)
        ckpt.wait()
        ckpt.close()
        sinks.close()
        if profiler_ctx is not None:
            profiler_ctx.__exit__(None, None, None)
        if cfg.train.debug and global_step > 0:
            from statecatcher_tpu.debug import check_carry

            check_carry(
                jax.tree.map(local_rows, carry), batch_size=B_local
            )
        logger.info("Stage timing: %s", timer.summary())

    return {
        "run_dir": run_dir,
        "global_step": global_step,
        "final_loss": loss_history[-1] if loss_history else None,
        "loss_history": list(loss_history),
        "audio_sec_per_sec": meter.audio_seconds_per_second,
        "stage_timing": timer.summary(),
        "hallucination_quarantined": halluc.flagged if halluc else 0,
    }
