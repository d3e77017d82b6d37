"""The jitted train step: frontend → encoder(state) → loss → update.

The whole hot path of the reference's segment loop (reference
train.py:461-585: frontend, mask math, compute_loss, backward, clip, step)
is one XLA computation here, with:

  * the carry-state pytree threaded through and **donated** — truncated-BPTT
    state carry (``lax.stop_gradient`` at entry, parity with reference
    model.py:59-63 detach_states) with zero host↔device traffic
  * gradient accumulation via ``optax.MultiSteps`` (reference
    train.py:549-571 semantics: clip + step every `accumulation_steps`)
  * grad-norm as ONE device scalar (the reference syncs per-parameter norms
    to host every update — SURVEY.md Appendix A.11)
  * greedy decode computed on device so the TER window costs one (B, T)
    int32 transfer, not a (B, T, V) logits transfer

Padded-row handling: batches are padded to a fixed shape for jit; rows with
``row_valid=False`` contribute zero loss and zero gradient (masked mean).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from statecatcher_tpu.config import Config, OptimConfig
from statecatcher_tpu.decode import ctc_greedy_decode
from statecatcher_tpu.frontend import (
    compute_features,
    compute_frame_mask,
    frame_mask_from_lens,
    num_frames,
)
from statecatcher_tpu.ops.ctc import ctc_loss_per_example


class TrainState(train_state.TrainState):
    pass


class StepOutput(NamedTuple):
    loss: jnp.ndarray          # scalar
    grad_norm: jnp.ndarray     # scalar (pre-clip global norm)
    preds: jnp.ndarray         # (B, T) greedy argmax tokens
    keep: jnp.ndarray          # (B, T) greedy keep-mask
    in_lens: jnp.ndarray       # (B,)
    per_loss: jnp.ndarray      # (B,) per-utterance loss (hallucination filter)


TrainStepFn = Callable[..., tuple[TrainState, Any, StepOutput]]


def lr_schedule(optim: OptimConfig):
    """Warmup + cosine (reference train.py:147-157 lr_lambda semantics)."""
    if not optim.use_scheduler:
        return optim.lr

    def fn(step):
        warm = jnp.asarray(optim.warmup_steps, jnp.float32)
        total = jnp.asarray(optim.total_steps, jnp.float32)
        s = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
        warm_factor = s / jnp.maximum(1.0, warm)
        progress = (s - warm) / jnp.maximum(1.0, total - warm)
        cos_factor = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return optim.lr * jnp.where(s < warm, warm_factor, cos_factor)

    return fn


def build_optimizer(optim: OptimConfig) -> optax.GradientTransformation:
    """adam | adamw | lion with global-norm clip and optional accumulation
    (reference train.py:112-137,549-571)."""
    lr = lr_schedule(optim)
    if optim.optimizer == "adamw":
        tx = optax.adamw(
            lr, b1=optim.beta1, b2=optim.beta2, weight_decay=optim.weight_decay
        )
    elif optim.optimizer == "lion":
        tx = optax.lion(lr, weight_decay=optim.weight_decay)
    elif optim.optimizer == "adam":
        tx = optax.adam(lr)
    else:
        raise ValueError(f"Unknown optimizer {optim.optimizer!r}")
    tx = optax.chain(optax.clip_by_global_norm(optim.max_grad_norm), tx)
    if optim.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=optim.accumulation_steps)
    return tx


def make_train_step(
    model,
    cfg: Config,
    blank_id: int = 0,
    mesh_plan=None,
    ctc_impl: str = "lattice",
) -> TrainStepFn:
    """Build the jitted ``(state, carry, batch...) → (state, carry, out)``.

    ``batch`` arrays: audio (B, S) f32, sample_mask (B, S) bool,
    tokens (B, U) i32, tok_lens (B,) i32, row_valid (B,) bool.
    """
    step = _make_step_body(model, cfg, blank_id, ctc_impl)
    step = _maybe_sequence_parallel(step, cfg, mesh_plan)
    donate = (0, 1)  # state and carry buffers are donated (updated in place)
    if mesh_plan is None:
        return jax.jit(step, donate_argnums=donate)

    batch_sh = mesh_plan.batch_sharding()
    repl_sh = mesh_plan.replicated_sharding()
    # state sharding unspecified (None): replicated or tensor-parallel param
    # layouts both pass through unchanged (see make_segment_scan_step).
    return jax.jit(
        step,
        donate_argnums=donate,
        in_shardings=(
            None,               # train state (params/opt): keep arg layout
            batch_sh,           # carry: batch-major sharded
            batch_sh, batch_sh, batch_sh, batch_sh, batch_sh,
        ),
        out_shardings=(None, batch_sh, StepOutput(
            loss=repl_sh, grad_norm=repl_sh,
            preds=batch_sh, keep=batch_sh, in_lens=batch_sh,
            per_loss=batch_sh,
        )),
    )


def make_segment_scan_step(
    model,
    cfg: Config,
    blank_id: int = 0,
    mesh_plan=None,
    ctc_impl: str = "lattice",
):
    """Whole-recording-batch step: ``lax.scan`` over the K segment slices.

    The reference's segment-slice loop (reference train.py:461-590) issues
    one optimizer step per segment from the host; here the entire K-loop is
    ONE device dispatch — the carry threads through the scan on-chip, each
    segment still performs its own gradient update (identical truncated-BPTT
    semantics), and the host sees only the final state plus stacked
    per-segment metrics.  This removes all host↔device round-trips between
    segments (SURVEY.md §7 hard part (c): "the K-loop must become a
    scan-over-segments").

    Segment axis shapes: audio (K, B, S), sample_mask (K, B, S),
    tokens (K, B, U), tok_lens (K, B), row_valid (K, B), seg_valid (K,).
    ``seg_valid=False`` segments leave state/carry untouched (K-bucketing).

    ``carry`` is an explicit argument so the loop can chunk a long
    recording's segment axis into fixed-size groups (compile once) while the
    carry threads through groups; it is zero-reset by the loop at each new
    recording batch (reference train.py:460 semantics).
    """
    base_step = _make_step_body(model, cfg, blank_id, ctc_impl)

    def batch_step(state, carry, audio, sample_mask, tokens, tok_lens, row_valid, seg_valid):
        def body(sc, xs):
            st, cr = sc
            a, m, tk, tl, rv, sv = xs

            def do(_):
                return base_step(st, cr, a, m, tk, tl, rv)

            def skip(_):
                dummy = StepOutput(
                    loss=jnp.float32(0), grad_norm=jnp.float32(0),
                    preds=jnp.zeros(_pred_shape(a, cfg), jnp.int32),
                    keep=jnp.zeros(_pred_shape(a, cfg), jnp.bool_),
                    in_lens=jnp.zeros((a.shape[0],), jnp.int32),
                    per_loss=jnp.zeros((a.shape[0],), jnp.float32),
                )
                return st, cr, dummy

            st2, cr2, out = jax.lax.cond(sv, do, skip, None)
            return (st2, cr2), out

        (state, carry), outs = jax.lax.scan(
            body, (state, carry),
            (audio, sample_mask, tokens, tok_lens, row_valid, seg_valid),
        )
        return state, carry, outs

    batch_step = _maybe_sequence_parallel(batch_step, cfg, mesh_plan)
    if mesh_plan is None:
        return jax.jit(batch_step, donate_argnums=(0, 1))

    batch_sh = mesh_plan.batch_sharding()
    repl_sh = mesh_plan.replicated_sharding()
    from jax.sharding import NamedSharding, PartitionSpec as P

    seg_sh = NamedSharding(mesh_plan.mesh, P(None, "data"))   # (K, B, ...) → shard B
    # state shardings are unspecified (None) so mixed layouts work: replicated
    # DP-only params as well as tensor-parallel params sharded on 'model'
    # (parallel/mesh.py shard_params_tp) both pass through unchanged.
    return jax.jit(
        batch_step,
        donate_argnums=(0, 1),
        in_shardings=(None, batch_sh, seg_sh, seg_sh, seg_sh, seg_sh, seg_sh, repl_sh),
        out_shardings=(None, batch_sh, StepOutput(
            loss=repl_sh, grad_norm=repl_sh,
            preds=seg_sh, keep=seg_sh, in_lens=seg_sh,
            per_loss=seg_sh,
        )),
    )


def _maybe_sequence_parallel(step_fn, cfg: Config, mesh_plan):
    """Wrap a step so kernel_impl="sp" scans trace inside the active
    sequence-parallel context (ops/scan_sp.py) — time axis sharded over
    ``cfg.mesh.sequence_axis`` of the mesh."""
    if mesh_plan is None or cfg.model.lucyrnn.kernel_impl != "sp":
        return step_fn

    from statecatcher_tpu.ops.scan_sp import sequence_parallel_scans

    def wrapped(*args):
        with sequence_parallel_scans(mesh_plan.mesh, cfg.mesh.sequence_axis):
            return step_fn(*args)

    return wrapped


def _pred_shape(audio, cfg: Config):
    T = num_frames(int(audio.shape[-1]), cfg.frontend)
    s = max(1, cfg.model.stack_order)
    if s > 1:
        T = T // s
    return (audio.shape[0], T)


def resolve_rnnt_band(requested: int, u_pad: int) -> int:
    """Band width for the transducer loss at a given padded label length.

    ``requested`` ≥ 0 is honored verbatim (0 = exact).  -1 = auto: exact for
    u_pad ≤ 48, band 32 above — the measured crossover at the retuned
    B=96/K=16 defaults (BASELINE.md round-5: the banded cost is
    ~U-independent at ~8.1k audio-s/s while exact falls 9.8k → 8.7k → 7.7k
    → 5.1k over U = 32/48/64/128).  u_pad is a static trace-time shape
    (train/loop.py buckets U to multiples of 16), so every U bucket
    compiles with its own choice and a long-label dispatch no longer
    leaves ~26 % on the table unless a flag is set.
    """
    if requested >= 0:
        return requested
    return 32 if u_pad > 48 else 0


def _make_step_body(model, cfg: Config, blank_id: int, ctc_impl: str):
    """The un-jitted single-segment step body (shared by both step makers)."""
    fe = cfg.frontend
    stack_order = max(1, cfg.model.stack_order)
    mode = cfg.train.mode

    def step(state: TrainState, carry, audio, sample_mask, tokens, tok_lens, row_valid):
        # Compact-transfer forms (train/loop.py host→device halving): audio may
        # arrive as int16 PCM (de-quantized here, on device — within 1 ulp of
        # the host's float32 division: XLA lowers /32767 to reciprocal
        # multiply) and the sample mask as (B,) prefix lengths instead of
        # (B, S) bools (that half IS bit-exact: frame_mask_from_lens).
        S = audio.shape[-1]
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) / 32767.0
        feats = compute_features(audio, fe)
        T = feats.shape[1]
        if sample_mask.ndim == 1:
            frame_mask, in_lens = frame_mask_from_lens(sample_mask, S, T, stack_order)
        else:
            frame_mask, in_lens = compute_frame_mask(sample_mask, T, stack_order)
        in_lens = jnp.maximum(in_lens, 1)
        carry_in = jax.lax.stop_gradient(carry)

        def loss_fn(params):
            if mode == "rnnt":
                from statecatcher_tpu.models.rnnt import make_prefix
                from statecatcher_tpu.ops.rnnt import rnnt_loss_fused
                from statecatcher_tpu.ops.rnnt_pallas import rnnt_loss_pallas

                prefix = make_prefix(tokens, blank_id)
                logits, new_state, (enc_p, pred_p, jk, jb) = model.apply(
                    params, feats, carry_in, frame_mask, prefix
                )
                impl = cfg.train.rnnt_impl
                if impl == "auto":
                    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
                band = resolve_rnnt_band(cfg.train.rnnt_band, tokens.shape[-1])
                if band > 0 and impl == "pallas":
                    from statecatcher_tpu.ops.rnnt_band import rnnt_loss_banded

                    loss, per = rnnt_loss_banded(
                        enc_p, pred_p, jk, jb, tokens, in_lens, tok_lens,
                        blank_id=blank_id, row_valid=row_valid,
                        time_block=cfg.train.rnnt_time_block,
                        band=band, return_per=True,
                    )
                elif impl == "pallas":
                    loss, per = rnnt_loss_pallas(
                        enc_p, pred_p, jk, jb, tokens, in_lens, tok_lens,
                        blank_id=blank_id, row_valid=row_valid,
                        time_block=cfg.train.rnnt_time_block,
                        return_per=True,
                    )
                else:
                    loss, per = rnnt_loss_fused(
                        enc_p, pred_p, jk, jb, tokens, in_lens, tok_lens,
                        blank_id=blank_id, row_valid=row_valid,
                        time_chunk=cfg.train.rnnt_time_chunk,
                        return_per=True,
                    )
            else:
                logits, new_state = model.apply(params, feats, carry_in, frame_mask)
                per = ctc_loss_per_example(
                    logits, in_lens, tokens, tok_lens, blank_id=blank_id, impl=ctc_impl
                )
                valid = row_valid.astype(per.dtype)
                loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
                # hallucination filter wants the TOTAL per-utterance NLL:
                # the PyTorch label-length normalization inverts the outlier
                # signal (a garbage transcript's big NLL gets divided by its
                # big length); totals are comparable across rows because
                # segments share one fixed duration (RNN-T per is already
                # the warp_rnnt-parity total)
                per = per * jnp.maximum(tok_lens, 1).astype(per.dtype)
            return loss, (logits, new_state, per)

        (loss, (logits, new_state, per_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grad_norm = optax.global_norm(grads)

        # Bad-segment filtering: a non-finite (or above-threshold) loss skips
        # the update and freezes the carry, so one poisoned segment cannot
        # corrupt parameters or downstream state.
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        if cfg.train.skip_loss_above is not None:
            ok = ok & (loss < cfg.train.skip_loss_above)
        if not cfg.train.skip_nonfinite_updates and cfg.train.skip_loss_above is None:
            ok = jnp.bool_(True)

        updated = state.apply_gradients(grads=grads)
        state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), updated, state
        )
        new_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_state, carry_in
        )

        preds, keep = ctc_greedy_decode(
            jax.lax.stop_gradient(logits), in_lens, blank_id
        )
        out = StepOutput(
            loss=loss, grad_norm=grad_norm, preds=preds, keep=keep,
            in_lens=in_lens,
            per_loss=jax.lax.stop_gradient(per_loss).astype(jnp.float32),
        )
        return state, new_state, out

    return step


def init_train_state(model, cfg: Config, rng, feat_dim: int, sample_T: int) -> TrainState:
    """Initialize parameters + optimizer state with a dummy forward."""
    import contextlib

    dummy = jnp.zeros((1, sample_T, feat_dim), jnp.float32)
    ctx = contextlib.nullcontext()
    if cfg.model.lucyrnn.kernel_impl == "sp":
        # Init runs before the training mesh exists; a trivial 1×1 mesh gives
        # the sp scan its named axis (params are impl-independent anyway).
        import numpy as _np
        from jax.sharding import Mesh

        from statecatcher_tpu.ops.scan_sp import sequence_parallel_scans

        tiny = Mesh(_np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
        ctx = sequence_parallel_scans(tiny, cfg.mesh.sequence_axis)
    with ctx:
        if cfg.train.mode == "rnnt":
            prefix = jnp.zeros((1, 2), jnp.int32)
            params = model.init(rng, dummy, None, None, prefix)
        else:
            params = model.init(rng, dummy)
    tx = build_optimizer(cfg.train.optim)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
