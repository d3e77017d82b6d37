"""Stateful flagship parity: N adam updates of our LucyRNN-CTC stack WITH
carry threaded across segments vs an independent torch replica of the
reference's canonical 7-gate cell math (reference lucyrnn_triton.py:179-244;
backward via torch autograd on the same equations — the reference's own
Triton kernels have none, SURVEY.md Appendix A.1).

This is the server-free WER anchor (VERDICT round 1, item 2): it locks the
full per-step numerical contract of reference config 2 — fused 7-gate
projection, grouped RMS normalization, both recurrences, inter-layer
LayerNorm, zero-init output projection, CTC loss, clip, adam — across
multiple truncated-BPTT segments per recording, state surviving updates.

Both sides run in float64: the reference's h_pre/sqrt(h_pre^2+eps)
normalization has an eps^{-1/2}-scale derivative near zero, which amplifies
float32 matmul reassociation noise (~1e-7) by ~5e5 into visible per-step
gradient differences — in f64 the amplified noise is ~1e-11 and tolerances
stay tight over 20 optimizer steps. The sequential "xla-scan" recurrence is
used so accumulation order matches torch's per-timestep loop; assoc/chunked/
pallas equivalence to xla-scan is pinned separately (test_scan.py,
test_pallas_scan.py), closing the chain torch == xla-scan == assoc == pallas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.ops.ctc import ctc_loss

torch = pytest.importorskip("torch")

_EPS = 1e-6

_X64_OVERRIDES = ["--model.dtype", "float64", "--model.param_dtype", "float64"]


def _torch_semantics_clip(clip):
    """torch.nn.utils.clip_grad_norm_ scales by min(1, clip/(norm + 1e-6));
    optax.clip_by_global_norm has no +1e-6 — the 2e-7 relative difference per
    clipped step compounds visibly over 20 adam updates, so the lockstep uses
    a torch-exact clip (production keeps the plain optax transform)."""

    def update(updates, state, params=None):
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, clip / (norm + 1e-6))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


class _TorchLucyCell(torch.nn.Module):
    """One 7-gate layer, math re-derived from reference
    lucyrnn_triton.py:204-241 (vectorized over (B, D), loop over T)."""

    def __init__(self, din, d):
        super().__init__()
        self.d = d
        self.lin = torch.nn.Linear(din, 7 * d)

    def forward(self, x, h0, s0):
        B, T, _ = x.shape
        g = self.lin(x).view(B, T, 7, self.d)
        r, z, k, v, h_pre, decay, alpha = g.unbind(2)
        rms_rz = torch.sqrt((r * r + z * z) / 2 + _EPS)
        rms_kv2 = (k * k + v * v) / 2 + _EPS
        rms_kv = rms_kv2.sqrt()
        z_n = torch.sigmoid(z / rms_rz)
        decay_n = torch.sigmoid(decay / torch.sqrt(decay * decay + _EPS))
        alpha_n = torch.sigmoid(alpha / torch.sqrt(alpha * alpha + _EPS))
        h_pre_n = h_pre / torch.sqrt(h_pre * h_pre + _EPS)
        kv = (k / rms_kv) * (v / rms_kv) / (rms_kv2 + _EPS)

        h, s = h0, s0
        outs = []
        for t in range(T):
            s = decay_n[:, t] * s + alpha_n[:, t] * kv[:, t]
            c = torch.tanh(h_pre_n[:, t] + s)
            h = (1.0 - z_n[:, t]) * c + z_n[:, t] * h
            outs.append(h)
        return torch.stack(outs, dim=1), s


class _TorchLucyStack(torch.nn.Module):
    """L layers + inter-layer LayerNorm + zero-init output projection
    (reference lucyrnn_triton.py:77-155, single track)."""

    def __init__(self, din, d, L, vocab):
        super().__init__()
        self.layers = torch.nn.ModuleList(
            [_TorchLucyCell(din if i == 0 else d, d) for i in range(L)]
        )
        self.norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(d) for _ in range(L - 1)]
        )
        self.out = torch.nn.Linear(d, vocab)
        torch.nn.init.zeros_(self.out.weight)
        torch.nn.init.zeros_(self.out.bias)

    def forward(self, x, hs, ss):
        new_h, new_s = [], []
        for i, layer in enumerate(self.layers):
            x, s_T = layer(x, hs[i], ss[i])
            new_h.append(x[:, -1, :])
            new_s.append(s_T)
            if i < len(self.norms):
                x = self.norms[i](x)
        return self.out(x), new_h, new_s


def _copy_weights_to_torch(params, tmodel, L):
    enc = params["params"]["encoder"]
    sd = {}
    for i in range(L):
        cell = enc[f"track0_layer{i}"]["gate_proj"]
        sd[f"layers.{i}.lin.weight"] = torch.from_numpy(
            np.asarray(cell["kernel"]).T.copy()
        )
        sd[f"layers.{i}.lin.bias"] = torch.from_numpy(
            np.asarray(cell["bias"]).copy()
        )
        if i < L - 1:
            norm = enc[f"track0_norm{i}"]
            sd[f"norms.{i}.weight"] = torch.from_numpy(np.asarray(norm["scale"]).copy())
            sd[f"norms.{i}.bias"] = torch.from_numpy(np.asarray(norm["bias"]).copy())
    sd["out.weight"] = torch.from_numpy(np.asarray(enc["output_proj"]["kernel"]).T.copy())
    sd["out.bias"] = torch.from_numpy(np.asarray(enc["output_proj"]["bias"]).copy())
    tmodel.load_state_dict(sd)


def test_stateful_lockstep_lucyrnn_ctc(rng):
    B, T, F, D, L, V, U = 2, 21, 8, 10, 2, 12, 4
    lr, clip = 1e-3, 5.0
    recordings, segments = 4, 5          # 20 adam updates, carry across 5

    with jax.enable_x64(True):
        cfg = Config().apply_overrides([
            "--model.encoder", "lucyrnn", "--model.hidden_size", str(D),
            "--model.num_layers", str(L), "--model.vocab_size", str(V),
            "--model.lucyrnn.kernel_impl", "xla-scan", *_X64_OVERRIDES,
        ])
        model = build_model(cfg.model, F)
        feats0 = rng.standard_normal((B, T, F))
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats0))

        tmodel = _TorchLucyStack(F, D, L, V).double()
        _copy_weights_to_torch(params, tmodel, L)

        tx = optax.chain(_torch_semantics_clip(clip), optax.adam(lr))
        opt_state = tx.init(params)
        topt = torch.optim.Adam(tmodel.parameters(), lr=lr)
        crit = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="mean")

        @jax.jit
        def step(params, opt_state, carry, feats, labels, in_lens, label_lens):
            carry_in = jax.lax.stop_gradient(carry)   # truncated BPTT boundary

            def loss_fn(p):
                logits, new_state = model.apply(p, feats, carry_in)
                loss = ctc_loss(logits, in_lens, labels, label_lens, impl="lattice")
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_state, loss

        jl_curve, tl_curve = [], []
        for _ in range(recordings):
            carry = init_carry(cfg.model, B, jnp.float64)
            th = [torch.zeros(B, D, dtype=torch.float64) for _ in range(L)]
            ts = [torch.zeros(B, D, dtype=torch.float64) for _ in range(L)]
            for _ in range(segments):
                feats = rng.standard_normal((B, T, F))
                labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
                in_lens = np.array([T, T - 3], np.int32)
                label_lens = np.array([U, U - 1], np.int32)

                params, opt_state, carry, jl = step(
                    params, opt_state, carry, jnp.asarray(feats),
                    jnp.asarray(labels), jnp.asarray(in_lens),
                    jnp.asarray(label_lens),
                )
                jl_curve.append(float(jl))

                topt.zero_grad()
                logits, th, ts = tmodel(
                    torch.from_numpy(feats),
                    [h.detach() for h in th], [s.detach() for s in ts],
                )
                logp = logits.log_softmax(-1).transpose(0, 1)
                tl = crit(logp, torch.from_numpy(labels.astype(np.int64)),
                          torch.from_numpy(in_lens.astype(np.int64)),
                          torch.from_numpy(label_lens.astype(np.int64)))
                tl.backward()
                torch.nn.utils.clip_grad_norm_(tmodel.parameters(), clip)
                topt.step()
                tl_curve.append(float(tl.detach()))

        np.testing.assert_allclose(jl_curve, tl_curve, rtol=1e-5, atol=1e-7)

        # Carried state still aligned after 20 updates (batch-major (B,1,L,D)).
        for i in range(L):
            np.testing.assert_allclose(
                np.asarray(carry["h"])[:, 0, i], th[i].detach().numpy(),
                rtol=1e-5, atol=1e-7,
            )
            np.testing.assert_allclose(
                np.asarray(carry["s"])[:, 0, i], ts[i].detach().numpy(),
                rtol=1e-5, atol=1e-7,
            )
        # Parameters still aligned (gate projection of layer 0).
        np.testing.assert_allclose(
            np.asarray(
                params["params"]["encoder"]["track0_layer0"]["gate_proj"]["kernel"]
            ),
            tmodel.layers[0].lin.weight.detach().numpy().T,
            rtol=1e-5, atol=1e-7,
        )


def test_stateful_single_forward_matches_torch(rng):
    """One stateful forward with a NONZERO carry (no training): pins the
    state-threading contract itself, independent of optimizer dynamics."""
    B, T, F, D, L, V = 3, 17, 6, 8, 2, 9
    with jax.enable_x64(True):
        cfg = Config().apply_overrides([
            "--model.encoder", "lucyrnn", "--model.hidden_size", str(D),
            "--model.num_layers", str(L), "--model.vocab_size", str(V),
            "--model.lucyrnn.kernel_impl", "xla-scan", *_X64_OVERRIDES,
        ])
        model = build_model(cfg.model, F)
        feats = rng.standard_normal((B, T, F))
        params = model.init(jax.random.PRNGKey(1), jnp.asarray(feats))
        tmodel = _TorchLucyStack(F, D, L, V).double()
        _copy_weights_to_torch(params, tmodel, L)

        h0 = rng.standard_normal((B, L, D)) * 0.3
        s0 = rng.standard_normal((B, L, D)) * 0.3
        carry = {
            "h": jnp.asarray(h0)[:, None], "s": jnp.asarray(s0)[:, None],
        }
        logits, new_state = model.apply(params, jnp.asarray(feats), carry)
        tlogits, th, ts = tmodel(
            torch.from_numpy(feats),
            [torch.from_numpy(h0[:, i].copy()) for i in range(L)],
            [torch.from_numpy(s0[:, i].copy()) for i in range(L)],
        )
        np.testing.assert_allclose(
            np.asarray(logits), tlogits.detach().numpy(), rtol=1e-9, atol=1e-11
        )
        for i in range(L):
            np.testing.assert_allclose(
                np.asarray(new_state["h"])[:, 0, i], th[i].detach().numpy(),
                rtol=1e-9, atol=1e-11,
            )
            np.testing.assert_allclose(
                np.asarray(new_state["s"])[:, 0, i], ts[i].detach().numpy(),
                rtol=1e-9, atol=1e-11,
            )
