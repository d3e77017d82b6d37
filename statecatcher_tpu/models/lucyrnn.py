"""LucyRNN: 7-gate gated linear-recurrent encoder, TPU-first formulation.

Semantics match the reference's canonical Triton cell (reference
lucyrnn_triton.py:27-75,179-244 — the variant ASRModel always instantiates,
reference model.py:308-310):

  gates    g = W x + b           split into r, z, k, v, h_pre, decay, alpha
  grouped RMS (elementwise over gate pairs, per (b,t,d)):
             rms_rz = sqrt((r²+z²)/2 + ε);  rms_kv = sqrt((k²+v²)/2 + ε)
             rms_d  = sqrt(decay² + ε);     rms_a  = sqrt(alpha² + ε)
             rms_h  = sqrt(h_pre² + ε)
  normalize + squash:
             z = σ(z/rms_rz)  decay = σ(decay/rms_d)  alpha = σ(alpha/rms_a)
             kv = (k/rms_kv)(v/rms_kv) / (rms_kv² + ε)
  recurrences (the two linear scans):
             s_t = decay_t · s_{t-1} + alpha_t · kv_t
             c_t = tanh(h_pre_t/rms_h + s_t)
             h_t = z_t · h_{t-1} + (1 − z_t) · c_t
  (r is computed by the reference cell but never used in the recurrence —
   the parameters are kept for checkpoint-shape parity.)

TPU-first design: the gate projection is ONE (B·T, Din)×(Din, 7D) matmul on
the MXU; everything after it is elementwise VPU work plus two linear scans
(see ops/scan.py) — parallel-in-time via associative scan or fused into a
Pallas kernel.  Unlike the reference Triton kernels (forward-only, outputs
outside autograd — SURVEY.md Appendix A.1) every path here has a real
backward.

Layer stack parity (reference lucyrnn_triton.py:77-155): per-track layer
stacks with inter-layer LayerNorm, optional multi-track merge projection,
zero-init output projection; carried state per track/layer is
(h = last-timestep output, s = final scan state).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from statecatcher_tpu.config import LucyRNNConfig
from statecatcher_tpu.ops.scan import linear_scan

_EPS = 1e-6


def tp_active() -> bool:
    """True when an ambient mesh has a 'model' axis of size > 1.

    The fused Pallas cells are GSPMD-opaque custom calls that cannot be
    lane-partitioned, so tensor-parallel contexts must take the split
    (XLA math + Pallas scan) path.  train() patches its config explicitly
    (train/loop.py); this catches any OTHER entry point (eval/serving with
    TP, multichip dryruns) that enters a `jax.sharding.use_mesh` /
    `with mesh:` scope around model application.
    """
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        if m is not None and not m.empty and "model" in m.axis_names:
            if dict(zip(m.axis_names, m.devices.shape))["model"] > 1:
                return True
    except Exception:
        pass
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is not None and not am.empty and "model" in am.axis_names:
            return am.shape["model"] > 1
    except Exception:
        pass
    return False


def lucy_cell_parallel(
    gates: jnp.ndarray,      # (B, T, 7, D) or lane-major (B, T, 7·D)
    h0: jnp.ndarray,         # (B, D)
    s0: jnp.ndarray,         # (B, D)
    impl: str = "assoc",
    frame_mask: Optional[jnp.ndarray] = None,  # (B, T) bool, optional
    bias: Optional[jnp.ndarray] = None,        # (7·D,) gate bias, optional
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the 7-gate cell over a whole segment.  Returns (h_all, h_T, s_T).

    The gate math (grouped RMS normalization, reference
    lucyrnn_triton.py:214-226) lives in ops/lucy_pallas.py:lucy_gate_coeffs;
    prefer the lane-major (B, T, 7·D) gate layout + ``bias`` — the 4D layout
    costs a retiling pass on TPU and the pre-applied bias another (see the
    coeffs docstring).

    With ``frame_mask`` given, masked steps leave (h, s) unchanged — realized
    by forcing the scan coefficients to the identity map (a=1, b=0), which
    composes exactly under the associative scan.  (The reference ignores
    masks here; pass None for parity.)

    ``impl`` selects the recurrence implementation:
      * "pallas" — XLA gate math + Pallas scan kernels (fastest measured)
      * "pallas-dual" — XLA gate math + ONE kernel for s-scan → tanh → h-scan
      * "pallas-fused" — ONE Pallas kernel for gate math + both scans
      * "assoc"/"chunked"/"xla-scan" — XLA-only scan variants (ops/scan.py)
    """
    from statecatcher_tpu.ops.lucy_pallas import lucy_gate_coeffs

    D_ = gates.shape[-1] if gates.ndim == 4 else gates.shape[-1] // 7
    if (impl == "auto" and frame_mask is None and D_ % 128 == 0
            and jax.default_backend() == "tpu"):
        # measured default on TPU: the fused lane-major cell at chunk 32
        # (12459 vs 10678 audio-s/s flagship at @64=11357, @128=10775 —
        # BASELINE.md round 4)
        impl = "fused-lm@32"
    if (impl.startswith("fused-lm") and frame_mask is None and D_ % 128 == 0
            and jax.default_backend() == "tpu" and not tp_active()):
        # ONE kernel for gate math + both scans, lane-major gates, fused
        # backward emitting d_gates directly (ops/lucy_fused_lm.py).  No
        # frame-mask support: masked calls fall through to the split path.
        from statecatcher_tpu.ops.lucy_fused_lm import lucy_cell_fused_lm

        # "fused-lm@32" = one chunk for both passes; "fused-lm@32/16" =
        # separate forward/backward time-chunks
        if "@" in impl:
            spec = impl.split("@", 1)[1]
            if "/" in spec:
                cf, cb = spec.split("/", 1)
                chunk = (int(cf), int(cb))
            else:
                chunk = int(spec)
        else:
            chunk = 128
        if gates.ndim == 4:
            B, T, _, D = gates.shape
            gates = gates.reshape(B, T, 7 * D)
        if bias is None:
            bias = jnp.zeros((gates.shape[-1],), jnp.float32)
        h_all, s_all = lucy_cell_fused_lm(gates, bias, h0, s0, chunk)
        return h_all, h_all[:, -1, :], s_all[:, -1, :]
    if impl.startswith("fused-lm"):
        # masked / odd-D fallback: split path below
        impl = "pallas" if jax.default_backend() == "tpu" else "assoc"

    if impl in ("pallas-fused", "auto-fused"):
        from statecatcher_tpu.ops.lucy_pallas import lucy_fused_cell

        if gates.ndim == 3:
            B, T, G = gates.shape
            gates = gates.reshape(B, T, 7, G // 7)
        if bias is not None:
            gates = gates + bias.reshape(7, -1).astype(gates.dtype)
        h_all, s_all = lucy_fused_cell(gates, h0, s0, frame_mask)
        return h_all, h_all[:, -1, :], s_all[:, -1, :]

    a_s, b_s, a_h, bh_c, h_pre_n = lucy_gate_coeffs(gates, frame_mask, bias)

    if impl == "pallas-dual":
        # s-scan → tanh → h-scan chain in ONE kernel
        # (ops/lucy_pallas.py:lucy_dual_scan).  The h-scan offset is derived
        # in-kernel as (1 − a_h)·c — identical under masking, where a_h = 1.
        from statecatcher_tpu.ops.lucy_pallas import lucy_dual_scan

        h_all, s_all = lucy_dual_scan(a_s, b_s, a_h, h_pre_n, h0, s0)
        return h_all, h_all[:, -1, :], s_all[:, -1, :]

    s_all = linear_scan(a_s, b_s, s0, impl=impl)
    c = jnp.tanh(h_pre_n + s_all)
    h_all = linear_scan(a_h, bh_c * c, h0, impl=impl)

    return h_all, h_all[:, -1, :], s_all[:, -1, :]


def _gate_bias_init(key, shape, dtype=jnp.float32):
    """Gate-aware bias init (reference lucyrnn_triton.py:39-48):
    r=0, z=1, k=0, v=0, h_pre=0, decay=2, alpha=0.5."""
    (n,) = shape
    d = n // 7
    vals = jnp.concatenate([
        jnp.zeros(d), jnp.ones(d), jnp.zeros(d), jnp.zeros(d),
        jnp.zeros(d), jnp.full((d,), 2.0), jnp.full((d,), 0.5),
    ])
    return vals.astype(dtype)


class GateProj(nn.Module):
    """Fused gate projection that returns the bias UNAPPLIED.

    Param tree is identical to ``nn.Dense`` ({kernel, bias} under this
    module's name), but the (B, T, 7D) matmul output is returned raw and the
    bias separately: adding the bias here would materialize an extra
    (B, T, 7D) HBM round-trip (measured 1.1 ms/layer/segment at flagship
    shapes — XLA does not fuse the broadcast add into the matmul epilogue);
    folded into the gate-coeff elementwise pass it is free.
    """

    features: int
    bias_init: Any
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (x.shape[-1], self.features), self.param_dtype,
        )
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return y, bias


class LucyCell(nn.Module):
    """One LucyRNN layer: fused 7-gate projection + parallel recurrence."""

    hidden_dim: int
    kernel_impl: str = "assoc"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h0, s0, frame_mask=None):
        B, T, _ = x.shape
        D = self.hidden_dim
        # Lane-major (B, T, 7D) gates: no (B,T,7,D) retiling, bias applied
        # inside the coeff pass (see GateProj/lucy_gate_coeffs docstrings).
        gates, bias = GateProj(
            7 * D,
            bias_init=_gate_bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="gate_proj",
        )(x)
        return lucy_cell_parallel(
            gates, h0.astype(gates.dtype), s0.astype(gates.dtype),
            impl=self.kernel_impl, frame_mask=frame_mask, bias=bias,
        )


class LucyRNNEncoder(nn.Module):
    """Multi-track, multi-layer LucyRNN with vocab output projection.

    State pytree: ``{"h": (B, tracks, L, D), "s": (B, tracks, L, D)}`` —
    batch-major so carry rows shard with their utterances under DP.
    """

    input_dim: int
    vocab_size: int
    cfg: LucyRNNConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def init_state(self, batch_size: int) -> dict:
        L, D = self.cfg.num_layers, self.cfg.hidden_dim
        k = self.cfg.num_tracks
        return {
            "h": jnp.zeros((batch_size, k, L, D), self.dtype),
            "s": jnp.zeros((batch_size, k, L, D), self.dtype),
        }

    @nn.compact
    def __call__(self, x, state=None, frame_mask=None):
        B, T, _ = x.shape
        cfg = self.cfg
        if state is None:
            state = self.init_state(B)
        cell_mask = frame_mask if cfg.mask_state_updates else None

        track_outputs = []
        new_h = []
        new_s = []
        for t in range(cfg.num_tracks):
            x_t = x
            h_layers = []
            s_layers = []
            for l in range(cfg.num_layers):
                x_t, h_T, s_T = LucyCell(
                    hidden_dim=cfg.hidden_dim,
                    kernel_impl=cfg.kernel_impl,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"track{t}_layer{l}",
                )(x_t, state["h"][:, t, l], state["s"][:, t, l], cell_mask)
                h_layers.append(h_T)
                s_layers.append(s_T)
                if l < cfg.num_layers - 1:
                    # epsilon=1e-5 matches torch nn.LayerNorm's default
                    # (reference lucyrnn_triton.py:97); flax defaults to 1e-6
                    x_t = nn.LayerNorm(
                        epsilon=1e-5,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"track{t}_norm{l}",
                    )(x_t)
            track_outputs.append(x_t)
            new_h.append(jnp.stack(h_layers, axis=1))   # (B, L, D)
            new_s.append(jnp.stack(s_layers, axis=1))

        if cfg.num_tracks == 1:
            y = track_outputs[0]
        else:
            y = jnp.concatenate(track_outputs, axis=-1)
            y = nn.Dense(
                cfg.hidden_dim,
                kernel_init=nn.initializers.xavier_uniform(),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="merge_proj",
            )(y)

        # Zero-init output projection (reference lucyrnn_triton.py:107-109)
        logits = nn.Dense(
            self.vocab_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="output_proj",
        )(y)

        new_state = {
            "h": jnp.stack(new_h, axis=1),  # (B, tracks, L, D)
            "s": jnp.stack(new_s, axis=1),
        }
        return logits, new_state
