"""Top-level trainable module: encoder (+ RNN-T predictor/joiner).

The reference keeps ``model`` and ``joiner`` as separate torch modules fed to
one optimizer (reference train.py:112-117,366-375); here they are submodules
of a single flax module so the train state is one params pytree.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from statecatcher_tpu.config import ModelConfig
from statecatcher_tpu.models.asr import ASRModel, init_carry
from statecatcher_tpu.models.rnnt import RNNTPredictorJoiner


class SpeechModel(nn.Module):
    cfg: ModelConfig
    feat_dim: int
    mode: str = "ctc"             # "ctc" | "rnnt"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.asr = ASRModel(
            cfg=self.cfg, feat_dim=self.feat_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        if self.mode == "rnnt":
            self.joiner = RNNTPredictorJoiner(
                vocab_size=self.cfg.vocab_size,
                enc_out_dim=self.cfg.vocab_size,  # enc_out_dim == vocab (reference model.py:295,304,311)
                pred_emb_dim=self.cfg.rnnt_pred_emb_dim,
                join_dim=self.cfg.rnnt_joiner_dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )

    def encode(self, feats, state=None, frame_mask=None):
        return self.asr(feats, state, frame_mask)

    def rnnt_project(self, enc_out, prefix):
        return self.joiner.project(enc_out, prefix)

    def rnnt_joint_logits(self, enc_out, prefix):
        return self.joiner(enc_out, prefix)

    def rnnt_decode_tables(self):
        """(pred_table (V,J), join_kernel (J,V), join_bias (V,)) for decoding.

        Use via ``model.apply(params, method="rnnt_decode_tables")`` so
        inference never touches raw param-dict paths.
        """
        return self.joiner.decode_tables()

    def rnnt_project_encoder(self, enc_out):
        return self.joiner.project_encoder(enc_out)

    def __call__(self, feats, state=None, frame_mask=None, prefix=None):
        enc_out, new_state = self.encode(feats, state, frame_mask)
        if self.mode == "rnnt" and prefix is not None:
            return enc_out, new_state, self.rnnt_project(enc_out, prefix)
        return enc_out, new_state

    def init_state(self, batch_size: int):
        return init_carry(self.cfg, batch_size)


def build_speech_model(cfg: ModelConfig, feat_dim: int, mode: str) -> SpeechModel:
    return SpeechModel(
        cfg=cfg, feat_dim=feat_dim, mode=mode,
        dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.dtype(cfg.param_dtype),
    )
