"""Native 6-gate LucyRNN variant (models/lucyrnn_native.py) semantics tests.

Checked against an independent torch restatement of the reference's
SEQUENTIAL cell math (reference lucyrnn.py:44-70,172-184 — the
self-consistent path; the reference's parallel training path double-applies
the s update, see the module docstring), in float64, over carried segments,
for both fused_ops modes and with/without LayerNorm.  prefix_sum decay is
checked against a naive numpy recurrence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config, LucyRNNConfig
from statecatcher_tpu.models.asr import build_model, init_carry

torch = pytest.importorskip("torch")


class _TorchNativeCell(torch.nn.Module):
    """One 6-gate LayerNorm layer, per-timestep loop (independent impl of
    reference lucyrnn.py:44-70)."""

    def __init__(self, din, d, fused_ops, layer_norm, lambda_decay=None):
        super().__init__()
        self.d = d
        self.fused_ops = fused_ops
        self.lambda_decay = lambda_decay  # None => learned decay
        self.input_proj = torch.nn.Linear(din, d)
        ln = (lambda: torch.nn.LayerNorm(d)) if layer_norm else torch.nn.Identity
        self.ln_in, self.ln_r, self.ln_z, self.ln_h = ln(), ln(), ln(), ln()
        if fused_ops:
            self.W_fused = torch.nn.Linear(d, 6 * d)
        else:
            for nm in ("W_r", "W_z", "W_k", "W_v", "W_h", "W_decay"):
                setattr(self, nm, torch.nn.Linear(d, d))

    def forward(self, x, h0, s0):
        B, T, _ = x.shape
        h, s = h0, s0
        outs = []
        for t in range(T):
            u = self.ln_in(self.input_proj(x[:, t]))
            if self.fused_ops:
                r, z, k, v, h_pre, dl = self.W_fused(u).chunk(6, dim=-1)
            else:
                z = self.W_z(u)
                k, v = self.W_k(u), self.W_v(u)
                dl = self.W_decay(u)
            z = torch.sigmoid(self.ln_z(z))
            if self.lambda_decay is not None:
                decay = torch.exp(
                    torch.tensor(-self.lambda_decay * t, dtype=x.dtype)
                ).expand(B, self.d)
            else:
                decay = torch.sigmoid(dl)
            s = decay * s + k * v
            if self.fused_ops:
                c = torch.tanh(self.ln_h(h_pre + s))
            else:
                c = torch.tanh(self.ln_h(self.W_h(u + s)))
            h = (1 - z) * c + z * h
            outs.append(h)
        return torch.stack(outs, dim=1), h, s


class _TorchNativeStack(torch.nn.Module):
    def __init__(self, din, d, n_layers, vocab, fused_ops, layer_norm,
                 lambda_decay=None):
        super().__init__()
        self.layers = torch.nn.ModuleList(
            [
                _TorchNativeCell(din if i == 0 else d, d, fused_ops, layer_norm,
                                 lambda_decay)
                for i in range(n_layers)
            ]
        )
        self.output_proj = torch.nn.Linear(d, vocab)

    def forward(self, x, hs, ss):
        new_h, new_s = [], []
        for layer, h0, s0 in zip(self.layers, hs, ss):
            x, hT, sT = layer(x, h0, s0)
            new_h.append(hT)
            new_s.append(sT)
        return self.output_proj(x), new_h, new_s


def _copy_params_to_torch(params, tmodel, fused_ops, layer_norm):
    """Load flax params (in/out kernel layout) into the torch replica."""

    def lin(tlin, p):
        tlin.weight.data = torch.tensor(np.asarray(p["kernel"]).T)
        tlin.bias.data = torch.tensor(np.asarray(p["bias"]))

    def ln(tln, p):
        tln.weight.data = torch.tensor(np.asarray(p["scale"]))
        tln.bias.data = torch.tensor(np.asarray(p["bias"]))

    enc = params["params"]["encoder"]
    for i, tlayer in enumerate(tmodel.layers):
        fl = enc[f"layer{i}"]
        lin(tlayer.input_proj, fl["input_proj"])
        if fused_ops:
            lin(tlayer.W_fused, fl["W_fused"])
        else:
            for nm in ("W_r", "W_z", "W_k", "W_v", "W_h", "W_decay"):
                lin(getattr(tlayer, nm), fl[nm])
        if layer_norm:
            ln(tlayer.ln_in, fl["layernorm_in"])
            ln(tlayer.ln_r, fl["layernorm_r"])
            ln(tlayer.ln_z, fl["layernorm_z"])
            ln(tlayer.ln_h, fl["layernorm_h"])
    lin(tmodel.output_proj, enc["output_proj"])


def _model_cfg(dtype="float64", **lucy_kw):
    import dataclasses

    lucy_kw.setdefault("kernel_impl", "xla-scan")
    lucy = LucyRNNConfig(variant="native", **lucy_kw)
    cfg = Config().apply_overrides(
        [
            "--model.encoder", "lucyrnn",
            "--model.hidden_size", "16",
            "--model.num_layers", "2",
            "--model.vocab_size", "11",
            "--model.dtype", dtype,
            "--model.param_dtype", dtype,
        ]
    )
    return dataclasses.replace(cfg.model, lucyrnn=lucy)


def _rand_params(model, feat_dim, key):
    x0 = jnp.zeros((2, 4, feat_dim), jnp.float64)
    params = model.init(key, x0)
    # output_proj is zero-init by design; randomize it so logits are a
    # meaningful comparison surface.
    enc = params["params"]["encoder"]
    k = jax.random.normal(key, enc["output_proj"]["kernel"].shape, jnp.float64)
    enc["output_proj"]["kernel"] = 0.3 * k
    return params


@pytest.mark.parametrize("fused_ops", [False, True])
@pytest.mark.parametrize("layer_norm", [False, True])
def test_native_vs_torch_sequential_carried(fused_ops, layer_norm):
    with jax.enable_x64(True):
        mcfg = _model_cfg(fused_ops=fused_ops, layer_norm=layer_norm)
        feat, B, T, D, L = 8, 2, 6, 16, 2
        model = build_model(mcfg, feat)
        params = _rand_params(model, feat, jax.random.PRNGKey(0))

        tmodel = _TorchNativeStack(feat, D, L, 11, fused_ops, layer_norm).double()
        _copy_params_to_torch(params, tmodel, fused_ops, layer_norm)

        rng = np.random.default_rng(1)
        carry = init_carry(mcfg, B, jnp.float64)
        th = [torch.zeros(B, D, dtype=torch.float64) for _ in range(L)]
        ts = [torch.zeros(B, D, dtype=torch.float64) for _ in range(L)]
        for seg in range(3):  # carried state across segments
            x = rng.standard_normal((B, T, feat))
            logits, carry = model.apply(params, jnp.asarray(x), carry)
            with torch.no_grad():
                tlogits, th, ts = tmodel(torch.tensor(x), th, ts)
            np.testing.assert_allclose(
                np.asarray(logits), tlogits.numpy(), rtol=1e-9, atol=1e-10,
                err_msg=f"segment {seg}",
            )
            np.testing.assert_allclose(
                np.asarray(carry["h"]),
                torch.stack(th, 1).numpy(), rtol=1e-9, atol=1e-10,
            )
            np.testing.assert_allclose(
                np.asarray(carry["s"]),
                torch.stack(ts, 1).numpy(), rtol=1e-9, atol=1e-10,
            )


def test_native_prefix_sum_decay():
    with jax.enable_x64(True):
        mcfg = _model_cfg(decay_mode="prefix_sum", lambda_decay=0.05)
        feat, B, D, L = 8, 2, 16, 2
        model = build_model(mcfg, feat)
        params = _rand_params(model, feat, jax.random.PRNGKey(2))

        tmodel = _TorchNativeStack(
            feat, D, L, 11, False, True, lambda_decay=0.05
        ).double()
        _copy_params_to_torch(params, tmodel, False, True)

        x = np.random.default_rng(3).standard_normal((B, 7, feat))
        logits, carry = model.apply(params, jnp.asarray(x), None)
        with torch.no_grad():
            tlogits, th, ts = tmodel(
                torch.tensor(x),
                [torch.zeros(B, D, dtype=torch.float64)] * L,
                [torch.zeros(B, D, dtype=torch.float64)] * L,
            )
        np.testing.assert_allclose(
            np.asarray(logits), tlogits.numpy(), rtol=1e-9, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(carry["s"]), torch.stack(ts, 1).numpy(),
            rtol=1e-9, atol=1e-10,
        )


def test_native_carry_invariance_and_scan_impls():
    """One 2T segment == two T segments with carried state, and every scan
    impl agrees with the sequential one (learned decay)."""
    mcfg = _model_cfg(dtype="float32")
    feat, B, T = 8, 2, 8
    model = build_model(mcfg, feat)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, 2 * T, feat))
    params = model.init(jax.random.PRNGKey(5), x[:, :T])

    y_full, st_full = model.apply(params, x, None)
    y1, st1 = model.apply(params, x[:, :T], None)
    y2, st2 = model.apply(params, x[:, T:], st1)
    np.testing.assert_allclose(
        np.asarray(y_full), np.asarray(jnp.concatenate([y1, y2], axis=1)),
        rtol=2e-5, atol=2e-6,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6),
        st_full, st2,
    )

    import dataclasses

    h_seq = np.asarray(st_full["h"])
    for impl in ("assoc", "chunked"):
        mcfg_i = dataclasses.replace(
            mcfg, lucyrnn=dataclasses.replace(mcfg.lucyrnn, kernel_impl=impl)
        )
        model_i = build_model(mcfg_i, feat)
        _, st_i = model_i.apply(params, x, None)
        np.testing.assert_allclose(
            np.asarray(st_i["h"]), h_seq, rtol=2e-5, atol=2e-6, err_msg=impl
        )


def test_native_mask_freezes_state_and_grads_flow():
    mcfg = _model_cfg(
        dtype="float32", kernel_impl="assoc", mask_state_updates=True
    )
    feat, B, T = 8, 2, 6
    model = build_model(mcfg, feat)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, feat))
    params = model.init(jax.random.PRNGKey(7), x)

    mask = jnp.ones((B, T), bool).at[:, 3:].set(False)
    _, st_masked = model.apply(params, x, None, mask)
    _, st_short = model.apply(params, x[:, :3], None)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        st_masked, st_short,
    )

    # The output projection is zero-initialized (reference parity,
    # lucyrnn.py:85-87), which would make sum(logits²) gradient-free
    # everywhere — randomize it so gradient flow through the cell is tested.
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jax.random.normal(jax.random.PRNGKey(8), leaf.shape, leaf.dtype)
            if any(getattr(p, "key", None) == "output_proj" for p in path)
            else leaf
        ),
        params,
    )

    def loss(p):
        logits, _ = model.apply(p, x, None)
        return jnp.sum(logits**2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # r-gate params feed nothing (parity: reference computes r but never uses
    # it) — their grads must be exactly zero while the used gates get signal.
    enc = grads["params"]["encoder"]["layer0"]
    assert float(jnp.abs(enc["W_r"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(enc["W_z"]["kernel"]).max()) > 0.0
