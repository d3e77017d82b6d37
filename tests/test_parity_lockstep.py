"""Lockstep loss-curve parity: N adam updates of our LSTM-CTC stack vs a
torch replica on identical data (SURVEY.md §6 loss-curve parity target).

Covers: encoder forward, CTC loss, backward, global-norm clip, adam update —
the full per-step numerical contract of reference config 1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model
from statecatcher_tpu.ops.ctc import ctc_loss

torch = pytest.importorskip("torch")


def test_lockstep_adam_training(rng):
    B, T, F, H, L, V, U = 2, 25, 8, 10, 1, 12, 4
    lr, clip = 1e-3, 5.0
    steps = 8

    cfg = Config().apply_overrides([
        "--model.encoder", "lstm", "--model.hidden_size", str(H),
        "--model.num_layers", str(L), "--model.vocab_size", str(V),
    ])
    model = build_model(cfg.model, F)
    feats0 = rng.standard_normal((B, T, F)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats0))

    # torch replica with identical initial weights
    lstm = torch.nn.LSTM(input_size=F, hidden_size=H, num_layers=L, batch_first=True)
    enc = params["params"]["encoder"]["layer0"]
    lstm.load_state_dict({
        "weight_ih_l0": torch.from_numpy(np.asarray(enc["w_ih"]).T.copy()),
        "weight_hh_l0": torch.from_numpy(np.asarray(enc["w_hh"]).T.copy()),
        "bias_ih_l0": torch.from_numpy(np.asarray(enc["b_ih"]).copy()),
        "bias_hh_l0": torch.from_numpy(np.asarray(enc["b_hh"]).copy()),
    })
    clf = torch.nn.Linear(H, V)
    c = params["params"]["classifier"]
    clf.load_state_dict({
        "weight": torch.from_numpy(np.asarray(c["kernel"]).T.copy()),
        "bias": torch.from_numpy(np.asarray(c["bias"]).copy()),
    })

    tx = optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))
    opt_state = tx.init(params)
    topt = torch.optim.Adam(
        list(lstm.parameters()) + list(clf.parameters()), lr=lr
    )
    crit = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="mean")

    @jax.jit
    def step(params, opt_state, feats, labels, in_lens, label_lens):
        def loss_fn(p):
            logits, _ = model.apply(p, feats)
            return ctc_loss(logits, in_lens, labels, label_lens, impl="lattice")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jl_curve, tl_curve = [], []
    for s in range(steps):
        feats = rng.standard_normal((B, T, F)).astype(np.float32)
        labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
        in_lens = np.array([T, T - 3], np.int32)
        label_lens = np.array([U, U - 1], np.int32)

        params, opt_state, jl = step(
            params, opt_state, jnp.asarray(feats), jnp.asarray(labels),
            jnp.asarray(in_lens), jnp.asarray(label_lens),
        )
        jl_curve.append(float(jl))

        topt.zero_grad()
        y, _ = lstm(torch.from_numpy(feats))
        logits = clf(y)
        logp = logits.log_softmax(-1).transpose(0, 1)
        tl = crit(logp, torch.from_numpy(labels.astype(np.int64)),
                  torch.from_numpy(in_lens.astype(np.int64)),
                  torch.from_numpy(label_lens.astype(np.int64)))
        tl.backward()
        torch.nn.utils.clip_grad_norm_(
            list(lstm.parameters()) + list(clf.parameters()), clip
        )
        topt.step()
        tl_curve.append(float(tl))

    np.testing.assert_allclose(jl_curve, tl_curve, rtol=2e-4, atol=2e-4)
    # parameters still aligned after N updates
    np.testing.assert_allclose(
        np.asarray(params["params"]["classifier"]["kernel"]),
        clf.weight.detach().numpy().T, rtol=1e-3, atol=1e-4,
    )
