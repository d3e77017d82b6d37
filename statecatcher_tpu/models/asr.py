"""ASRModel wrapper: input projection, masking policy, encoder dispatch.

Parity with reference model.py:282-398:
  * optional input projection ``proj_dim > 0`` (reference model.py:297-298)
  * LSTM: mask-aware scan (packed-sequence equivalent) + classifier head
    (reference model.py:296,350-372,393-396)
  * LucyRNN / xLSTM: zero-input masking fallback (reference model.py:374-377),
    vocab projection inside the encoder, state updates on padded frames
    unless ``mask_state_updates`` is set (an improvement the reference lists
    as WiP — reference README.md:29)

All encoders share the stateful contract
``(logits, new_state) = model.apply(params, feats, state, frame_mask)``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from statecatcher_tpu.config import ModelConfig
from statecatcher_tpu.models.lstm import LSTMEncoder
from statecatcher_tpu.models.lucyrnn import LucyRNNEncoder


class ASRModel(nn.Module):
    cfg: ModelConfig
    feat_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _encoder(self):
        cfg = self.cfg
        enc_in = cfg.input_proj_dim if cfg.input_proj_dim > 0 else self.feat_dim
        enc_in *= max(1, cfg.stack_order)
        if cfg.encoder == "lstm":
            return LSTMEncoder(
                input_dim=enc_in, hidden_size=cfg.hidden_size,
                num_layers=cfg.num_layers, dtype=self.dtype,
                param_dtype=self.param_dtype, name="encoder",
            )
        if cfg.encoder == "lucyrnn":
            import dataclasses

            lcfg = dataclasses.replace(
                cfg.lucyrnn, hidden_dim=cfg.hidden_size, num_layers=cfg.num_layers
            )
            if lcfg.variant == "native":
                from statecatcher_tpu.models.lucyrnn_native import LucyNativeEncoder

                # The fused/dual-cell impls are 7-gate-specific; fall back
                # to the Pallas scan kernel for the native variant.
                if lcfg.kernel_impl in ("pallas-fused", "auto-fused", "pallas-dual"):
                    lcfg = dataclasses.replace(lcfg, kernel_impl="pallas")
                return LucyNativeEncoder(
                    input_dim=enc_in, vocab_size=cfg.vocab_size, cfg=lcfg,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
                )
            return LucyRNNEncoder(
                input_dim=enc_in, vocab_size=cfg.vocab_size, cfg=lcfg,
                dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
            )
        if cfg.encoder == "xlstm":
            from statecatcher_tpu.models.xlstm import XLSTMEncoder

            return XLSTMEncoder(
                input_dim=enc_in, vocab_size=cfg.vocab_size, cfg=cfg.xlstm,
                dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
            )
        if cfg.encoder == "rwkv":
            from statecatcher_tpu.models.rwkv import RWKVEncoder

            return RWKVEncoder(
                input_dim=enc_in, vocab_size=cfg.vocab_size,
                dim=cfg.hidden_size, num_layers=cfg.num_layers,
                dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
            )
        raise ValueError(f"Unknown encoder type: {self.cfg.encoder!r}")

    def init_state(self, batch_size: int):
        return init_carry(self.cfg, batch_size)

    @nn.compact
    def __call__(self, feats, state=None, frame_mask=None):
        cfg = self.cfg
        x = feats.astype(self.dtype)
        if cfg.input_proj_dim > 0:
            x = nn.Dense(
                cfg.input_proj_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="proj",
            )(x)

        if cfg.stack_order > 1:
            # Frame stacking (reference lucyrnn.py:92-99): trim T to a
            # multiple of the stack, fold consecutive frames into features.
            # The caller's frame_mask is already at the stacked rate
            # (frontend.compute_frame_mask with stack_order).
            s = cfg.stack_order
            B, T, F = x.shape
            Tt = T - (T % s)
            x = x[:, :Tt].reshape(B, Tt // s, F * s)

        encoder = self._encoder()
        if cfg.encoder == "lstm":
            y, new_state = encoder(x, state, frame_mask)
            logits = nn.Dense(
                cfg.vocab_size, dtype=self.dtype, param_dtype=self.param_dtype,
                name="classifier",
            )(y)
        else:
            # Zero-input masking fallback (reference model.py:374-377).
            if frame_mask is not None:
                x = x * frame_mask[..., None].astype(x.dtype)
            logits, new_state = encoder(x, state, frame_mask)
        cdt = carry_dtype(cfg)
        new_state = jax.tree.map(lambda s: s.astype(cdt), new_state)
        return logits, new_state


def carry_dtype(cfg: ModelConfig) -> jnp.dtype:
    """Resolved dtype of the inter-segment carry (``cfg.carry_dtype``;
    "auto" → the activation dtype)."""
    name = cfg.carry_dtype
    return jnp.dtype(cfg.dtype if name == "auto" else name)


def init_carry(cfg: ModelConfig, batch_size: int, dtype=None):
    """Zero carry-state pytree for an encoder config — a pure function (no
    module machinery) so the training loop can build donated buffers.

    Batch-major layout: axis 0 is the utterance, so the carry shards with its
    batch rows under a data-parallel mesh.  ``dtype=None`` resolves from
    ``cfg.carry_dtype`` (fp32 carry under bf16 activations when configured).
    """
    B = batch_size
    if dtype is None:
        dtype = carry_dtype(cfg)
    if cfg.encoder == "lstm":
        shape = (B, cfg.num_layers, cfg.hidden_size)
        return {"h": jnp.zeros(shape, dtype), "c": jnp.zeros(shape, dtype)}
    if cfg.encoder == "lucyrnn":
        if cfg.lucyrnn.variant == "native":
            shape = (B, cfg.num_layers, cfg.hidden_size)
        else:
            shape = (B, cfg.lucyrnn.num_tracks, cfg.num_layers, cfg.hidden_size)
        return {"h": jnp.zeros(shape, dtype), "s": jnp.zeros(shape, dtype)}
    if cfg.encoder == "xlstm":
        from statecatcher_tpu.models.xlstm import xlstm_init_carry

        return xlstm_init_carry(cfg.xlstm, B, dtype)
    if cfg.encoder == "rwkv":
        from statecatcher_tpu.models.rwkv import rwkv_init_carry

        return rwkv_init_carry(cfg.hidden_size, cfg.num_layers, B, dtype)
    raise ValueError(f"Unknown encoder type: {cfg.encoder!r}")


def build_model(cfg: ModelConfig, feat_dim: int) -> ASRModel:
    """Encoder factory (reference model.py:202-247 build_encoder + ASRModel)."""
    dtype = jnp.dtype(cfg.dtype)
    param_dtype = jnp.dtype(cfg.param_dtype)
    return ASRModel(cfg=cfg, feat_dim=feat_dim, dtype=dtype, param_dtype=param_dtype)
