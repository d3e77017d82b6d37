"""Composite loss parity: our full LSTM-CTC path vs a torch replica.

Config-1 parity (SURVEY.md §6: loss-curve parity anchored on the
CPU-runnable nn.LSTM + CTC reference configuration): identical parameters →
identical per-batch loss AND identical parameter gradients, through the
entire encoder + classifier + CTC composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.config import Config
from statecatcher_tpu.models.asr import build_model, init_carry
from statecatcher_tpu.ops.ctc import ctc_loss

torch = pytest.importorskip("torch")


def _build_torch_replica(params, F, H, L, V):
    lstm = torch.nn.LSTM(input_size=F, hidden_size=H, num_layers=L, batch_first=True)
    sd = {}
    enc = params["params"]["encoder"]
    for l in range(L):
        p = enc[f"layer{l}"]
        sd[f"weight_ih_l{l}"] = torch.from_numpy(np.asarray(p["w_ih"]).T.copy())
        sd[f"weight_hh_l{l}"] = torch.from_numpy(np.asarray(p["w_hh"]).T.copy())
        sd[f"bias_ih_l{l}"] = torch.from_numpy(np.asarray(p["b_ih"]).copy())
        sd[f"bias_hh_l{l}"] = torch.from_numpy(np.asarray(p["b_hh"]).copy())
    lstm.load_state_dict(sd)
    clf = torch.nn.Linear(H, V)
    c = params["params"]["classifier"]
    clf.load_state_dict({
        "weight": torch.from_numpy(np.asarray(c["kernel"]).T.copy()),
        "bias": torch.from_numpy(np.asarray(c["bias"]).copy()),
    })
    return lstm, clf


def test_lstm_ctc_loss_and_grads_match_torch(rng):
    B, T, F, H, L, V, U = 2, 30, 10, 12, 2, 16, 5
    cfg = Config().apply_overrides([
        "--model.encoder", "lstm", "--model.hidden_size", str(H),
        "--model.num_layers", str(L), "--model.vocab_size", str(V),
    ])
    model = build_model(cfg.model, F)
    feats = rng.standard_normal((B, T, F)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))

    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    in_lens = np.array([T, T - 4], np.int32)
    label_lens = np.array([U, U - 2], np.int32)
    mask = np.zeros((B, T), bool)
    mask[0, :in_lens[0]] = True
    mask[1, :in_lens[1]] = True

    def jax_loss(p):
        logits, _ = model.apply(p, jnp.asarray(feats), None, jnp.asarray(mask))
        return ctc_loss(logits, jnp.asarray(in_lens), jnp.asarray(labels),
                        jnp.asarray(label_lens), impl="lattice")

    jl, jg = jax.value_and_grad(jax_loss)(params)

    # torch replica (packed sequences = the reference's exact path)
    lstm, clf = _build_torch_replica(params, F, H, L, V)
    tx = torch.from_numpy(feats)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        tx, torch.from_numpy(in_lens.astype(np.int64)), batch_first=True,
        enforce_sorted=False,
    )
    out, _ = lstm(packed)
    y, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
    logits = clf(y)
    logp = logits.log_softmax(-1).transpose(0, 1)
    crit = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="mean")
    tl = crit(logp, torch.from_numpy(labels.astype(np.int64)),
              torch.from_numpy(in_lens.astype(np.int64)),
              torch.from_numpy(label_lens.astype(np.int64)))
    tl.backward()

    np.testing.assert_allclose(float(jl), float(tl), rtol=1e-5, atol=1e-6)

    # parameter gradients match across the whole composition
    gj = np.asarray(jg["params"]["encoder"]["layer0"]["w_ih"])
    gt = lstm.weight_ih_l0.grad.numpy().T
    np.testing.assert_allclose(gj, gt, rtol=1e-3, atol=1e-5)
    gcj = np.asarray(jg["params"]["classifier"]["kernel"])
    gct = clf.weight.grad.numpy().T
    np.testing.assert_allclose(gcj, gct, rtol=1e-3, atol=1e-5)
