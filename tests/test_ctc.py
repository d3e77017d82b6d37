"""CTC loss tests — both implementations against torch.nn.CTCLoss (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from statecatcher_tpu.ops.ctc import ctc_loss, ctc_nll_lattice, ctc_nll_optax


def _rand_problem(rng, B=3, T=20, U=6, V=10):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    in_lens = rng.integers(U + 2, T + 1, size=(B,)).astype(np.int32)
    label_lens = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    return logits, labels, in_lens, label_lens


def _torch_ctc(logits, labels, in_lens, label_lens, reduction="none"):
    torch = pytest.importorskip("torch")
    lp = torch.from_numpy(logits).log_softmax(-1).transpose(0, 1)  # (T,B,V)
    crit = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction=reduction)
    return crit(
        lp,
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(in_lens.astype(np.int64)),
        torch.from_numpy(label_lens.astype(np.int64)),
    ).numpy()


@pytest.mark.parametrize("impl_fn", [ctc_nll_lattice, ctc_nll_optax])
def test_nll_matches_torch(impl_fn, rng):
    logits, labels, in_lens, label_lens = _rand_problem(rng)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(
        impl_fn(lp, jnp.asarray(in_lens), jnp.asarray(labels), jnp.asarray(label_lens))
    )
    want = _torch_ctc(logits, labels, in_lens, label_lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mean_reduction_matches_torch(rng):
    logits, labels, in_lens, label_lens = _rand_problem(rng, B=4)
    for impl in ("lattice", "optax"):
        got = float(
            ctc_loss(
                jnp.asarray(logits), jnp.asarray(in_lens), jnp.asarray(labels),
                jnp.asarray(label_lens), impl=impl,
            )
        )
        want = float(_torch_ctc(logits, labels, in_lens, label_lens, reduction="mean"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_length_target(rng):
    logits, labels, in_lens, label_lens = _rand_problem(rng, B=2)
    label_lens[0] = 0
    labels[0] = 0
    got = np.asarray(
        ctc_nll_lattice(
            jax.nn.log_softmax(jnp.asarray(logits), -1),
            jnp.asarray(in_lens), jnp.asarray(labels), jnp.asarray(label_lens),
        )
    )
    want = _torch_ctc(logits, labels, in_lens, label_lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unalignable_zeroed(rng):
    """in_len < label_len → inf NLL → zero_infinity zeroes it (reference
    train.py:141-142 nn.CTCLoss(zero_infinity=True))."""
    V = 10
    logits = rng.standard_normal((1, 3, V)).astype(np.float32)
    labels = np.array([[1, 2, 3, 4, 5]], dtype=np.int32)
    in_lens = np.array([3], dtype=np.int32)
    label_lens = np.array([5], dtype=np.int32)
    got = float(
        ctc_loss(jnp.asarray(logits), jnp.asarray(in_lens), jnp.asarray(labels),
                 jnp.asarray(label_lens), impl="lattice")
    )
    assert got == 0.0


def test_repeated_labels(rng):
    """Repeats exercise the skip-transition constraint."""
    torch = pytest.importorskip("torch")
    V = 6
    logits = rng.standard_normal((1, 12, V)).astype(np.float32)
    labels = np.array([[2, 2, 3, 3]], dtype=np.int32)
    in_lens = np.array([12], dtype=np.int32)
    label_lens = np.array([4], dtype=np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    got = np.asarray(
        ctc_nll_lattice(lp, jnp.asarray(in_lens), jnp.asarray(labels),
                        jnp.asarray(label_lens))
    )
    want = _torch_ctc(logits, labels, in_lens, label_lens)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_grad_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits, labels, in_lens, label_lens = _rand_problem(rng, B=2, T=15, U=4, V=8)

    def jloss(lg):
        return ctc_loss(lg, jnp.asarray(in_lens), jnp.asarray(labels),
                        jnp.asarray(label_lens), impl="lattice")

    gj = np.asarray(jax.grad(jloss)(jnp.asarray(logits)))

    tl = torch.from_numpy(logits).requires_grad_(True)
    lp = tl.log_softmax(-1).transpose(0, 1)
    crit = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="mean")
    loss = crit(lp, torch.from_numpy(labels.astype(np.int64)),
                torch.from_numpy(in_lens.astype(np.int64)),
                torch.from_numpy(label_lens.astype(np.int64)))
    loss.backward()
    gt = tl.grad.numpy()
    np.testing.assert_allclose(gj, gt, rtol=1e-3, atol=1e-4)
