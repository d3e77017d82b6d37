"""RNN-T predictor + joiner networks.

Parity with reference model.py:112-145 (``RNNTPredictorJoiner``): stateless
1-token embedding predictor, encoder/predictor projections into a shared join
space, broadcast add + tanh, final vocab projection.  The predictor input is
the blank-prefixed label sequence (reference model.py:77-83).

The "compact" ΣTU packing of the reference (model.py:147-200, a per-batch
Python loop) is replaced by the fused chunked loss path
(ops/rnnt.py:rnnt_loss_fused) — same memory goal, static shapes, MXU-batched.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RNNTPredictorJoiner(nn.Module):
    """Embedding predictor + add-joiner producing dense (B, T, U+1, V)."""

    vocab_size: int
    enc_out_dim: int
    pred_emb_dim: int = 64
    join_dim: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.pred_emb_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.enc_proj = nn.Dense(
            self.join_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.pred_proj = nn.Dense(
            self.join_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )
        # Final projection as explicit params (not a Dense) so the fused loss
        # path (ops/rnnt.py:rnnt_loss_fused) can consume the raw kernel/bias.
        self.join_kernel = self.param(
            "join_kernel", nn.initializers.lecun_normal(),
            (self.join_dim, self.vocab_size), self.param_dtype,
        )
        self.join_bias = self.param(
            "join_bias", nn.initializers.zeros, (self.vocab_size,), self.param_dtype
        )

    def project(self, enc_out, prefix):
        """Returns (enc_p (B,T,J), pred_p (B,U+1,J), kernel, bias)."""
        pred_emb = self.embedding(prefix)
        return (
            self.enc_proj(enc_out), self.pred_proj(pred_emb),
            self.join_kernel, self.join_bias,
        )

    def joint(self, enc_proj, pred_proj):
        """(B,T,J) × (B,U+1,J) → (B,T,U+1,V) via broadcast add + tanh."""
        j = jnp.tanh(enc_proj[:, :, None, :] + pred_proj[:, None, :, :])
        return j @ self.join_kernel.astype(j.dtype) + self.join_bias.astype(j.dtype)

    def decode_tables(self):
        """Decode-time context: (pred_table (V, J), join_kernel, join_bias).

        ``pred_table[v] = pred_proj(embedding(v))`` for every vocab token, so
        each greedy/beam emission is one (B,J)×(J,V) matmul (rnnt_decode.py).
        Going through the module (rather than raw param-dict paths) keeps
        inference robust to parameter renames.
        """
        tokens = jnp.arange(self.vocab_size)
        return self.pred_proj(self.embedding(tokens)), self.join_kernel, self.join_bias

    def project_encoder(self, enc_out):
        """Encoder output → join space, same projection the loss path uses."""
        return self.enc_proj(enc_out)

    def __call__(self, enc_out, prefix):
        enc_p, pred_p, _, _ = self.project(enc_out, prefix)
        return self.joint(enc_p, pred_p)


def make_prefix(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """Blank-prefixed predictor input (reference model.py:77-83)."""
    B = labels.shape[0]
    blank_col = jnp.full((B, 1), blank_id, dtype=labels.dtype)
    return jnp.concatenate([blank_col, labels], axis=1)
