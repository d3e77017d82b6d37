"""Streaming recognizer: incremental encode + decode with carried state.

The reference's whole design motivation is streaming ASR with propagated
state (reference README.md:5) but it ships no inference path.  This module
is that path: feed waveform chunks of any size; complete 25 ms frames are
featurized and encoded with the carry threaded; greedy (or prefix-beam)
decoding state advances incrementally, so partial hypotheses are available
at any time.

The encoder step is a single jitted function of fixed chunk length (audio is
buffered to ``chunk_frames`` frames) — compile once, stream forever.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.beam import BeamState, beam_hypotheses, beam_init, ctc_beam_search
from statecatcher_tpu.config import Config
from statecatcher_tpu.frontend import compute_features
from statecatcher_tpu.models.asr import init_carry


class StreamingRecognizer:
    """Single-utterance streaming recognition with carried encoder state."""

    def __init__(
        self,
        model,
        params,
        cfg: Config,
        tokenizer=None,
        chunk_frames: int = 32,
        decoder: str = "greedy",       # "greedy" | "beam" | "rnnt"
        beam: int = 8,
        blank_id: int = 0,
        max_out: int = 512,
    ):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.decoder = decoder
        self.beam = beam
        self.blank_id = blank_id
        # Device-side hypothesis-buffer capacity for beam/RNN-T decode
        # state.  Streams of ANY length are supported: once a buffer is
        # half full, the prefix all live beams agree on is committed to the
        # host (``_committed``) and the buffers are left-shifted, so
        # hour-long recordings (reference README.md:5) decode losslessly
        # with a fixed-size device buffer.
        self.max_out = max_out
        fe = cfg.frontend
        self.stack_order = max(1, cfg.model.stack_order)
        if chunk_frames % self.stack_order != 0:
            raise ValueError(
                f"chunk_frames ({chunk_frames}) must be a multiple of "
                f"model.stack_order ({self.stack_order}) so no frames are "
                "dropped at the frame-stacking trim"
            )
        self.chunk_frames = chunk_frames
        # samples consumed per encoder chunk; win−hop lookahead stays buffered
        self.chunk_samples = fe.hop_length * chunk_frames
        self.lookahead = fe.n_fft - fe.hop_length

        self._buffer = np.zeros(0, dtype=np.float32)
        self._carry = init_carry(cfg.model, 1)
        self._tokens: list[int] = []
        self._prev_argmax = -1
        self._beam_state: Optional[BeamState] = None
        self._rnnt_state = None
        self._committed: list[int] = []

        if decoder == "rnnt":
            pt, jk, jb = model.apply(params, method="rnnt_decode_tables")
            self._rnnt_tables = tuple(
                jnp.asarray(x, jnp.float32) for x in (pt, jk, jb)
            )

            @jax.jit
            def _encode_chunk(params, audio, carry):
                feats = compute_features(audio, fe)
                logits, new_carry = model.apply(
                    params, feats, carry, None, method="encode"
                )
                enc_p = model.apply(params, logits, method="rnnt_project_encoder")
                return enc_p.astype(jnp.float32), new_carry
        else:
            @jax.jit
            def _encode_chunk(params, audio, carry):
                feats = compute_features(audio, fe)
                logits, new_carry = model.apply(params, feats, carry, None)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                return lp, new_carry

        self._encode_chunk = _encode_chunk

    # ------------------------------------------------------------------ #
    def accept_waveform(self, samples: np.ndarray):
        """Feed samples (float32, model sample rate); decode what completes."""
        self._buffer = np.concatenate([self._buffer, samples.astype(np.float32)])
        need = self.chunk_samples + self.lookahead
        while len(self._buffer) >= need:
            chunk = self._buffer[:need]
            self._buffer = self._buffer[self.chunk_samples:]
            lp, self._carry = self._encode_chunk(
                self.params, jnp.asarray(chunk[None]), self._carry
            )
            self._advance_decode(lp)

    def finish(self):
        """Flush remaining buffered samples (zero-padded to a full chunk)."""
        if len(self._buffer) > self.lookahead:
            pad = self.chunk_samples + self.lookahead - len(self._buffer)
            # valid frames at the ENCODER rate (post frame-stacking)
            n_valid = (
                (len(self._buffer) - self.lookahead)
                // self.cfg.frontend.hop_length
                // self.stack_order
            )
            chunk = np.concatenate([self._buffer, np.zeros(pad, np.float32)])
            self._buffer = np.zeros(0, np.float32)
            lp, self._carry = self._encode_chunk(
                self.params, jnp.asarray(chunk[None]), self._carry
            )
            self._advance_decode(lp[:, :max(n_valid, 0)])

    # ------------------------------------------------------------------ #
    def _advance_decode(self, lp):
        T = lp.shape[1]
        if T == 0:
            return
        if self.decoder == "rnnt":
            from statecatcher_tpu.rnnt_decode import (
                rnnt_decode_init,
                rnnt_greedy_decode,
            )

            # lp IS the join-space encoder projection for the rnnt decoder
            # (projected inside the jitted encode chunk)
            if self._rnnt_state is None:
                self._rnnt_state = rnnt_decode_init(1, self.max_out, self.blank_id)
            self._rnnt_state = rnnt_greedy_decode(
                lp, *self._rnnt_tables,
                jnp.asarray([T]), blank_id=self.blank_id,
                init_state=self._rnnt_state,
            )
            if int(self._rnnt_state.out_len[0]) >= self.max_out // 2:
                from statecatcher_tpu.rnnt_decode import rnnt_drain

                self._rnnt_state, com = rnnt_drain(self._rnnt_state)
                self._committed.extend(com[0])
            return
        if self.decoder == "greedy":
            preds = np.asarray(jnp.argmax(lp[0], axis=-1))
            for t in range(T):
                tok = int(preds[t])
                if tok != self.blank_id and tok != self._prev_argmax:
                    self._tokens.append(tok)
                self._prev_argmax = tok
        else:
            if self._beam_state is None:
                self._beam_state = beam_init(1, self.beam, self.max_out)
            self._beam_state, self._totals = ctc_beam_search(
                lp, jnp.asarray([T]), beam=self.beam,
                blank_id=self.blank_id, max_len=self.max_out,
                init_state=self._beam_state,
            )
            if int(jnp.max(self._beam_state.lens)) >= self.max_out // 2:
                from statecatcher_tpu.beam import beam_commit

                self._beam_state, com = beam_commit(
                    self._beam_state, self._totals,
                    reserve=self.max_out // 2,
                )
                self._totals = jnp.logaddexp(
                    self._beam_state.p_b, self._beam_state.p_nb)
                self._committed.extend(com[0])

    # ------------------------------------------------------------------ #
    @property
    def tokens(self) -> list[int]:
        """Full current hypothesis: committed prefix ++ in-buffer residual."""
        if self.decoder == "rnnt":
            if self._rnnt_state is None:
                return list(self._committed)
            from statecatcher_tpu.rnnt_decode import rnnt_state_to_lists

            return self._committed + rnnt_state_to_lists(self._rnnt_state)[0]
        if self.decoder == "greedy":
            return list(self._tokens)
        if self._beam_state is None:
            return list(self._committed)
        hyps = beam_hypotheses(self._beam_state, self._totals)[0]
        return self._committed + (hyps[0][1] if hyps else [])

    @property
    def committed_tokens(self) -> list[int]:
        """Partial-commit result: the prefix that can no longer change
        (all live beams agree on it / already drained).  For greedy CTC
        every emitted token is final."""
        if self.decoder == "greedy":
            return list(self._tokens)
        return list(self._committed)

    @property
    def committed_text(self) -> str:
        if self.tokenizer is None:
            return " ".join(map(str, self.committed_tokens))
        return self.tokenizer.decode_ids(self.committed_tokens)

    @property
    def text(self) -> str:
        if self.tokenizer is None:
            return " ".join(map(str, self.tokens))
        return self.tokenizer.decode_ids(self.tokens)

    def reset(self):
        self._buffer = np.zeros(0, dtype=np.float32)
        self._carry = init_carry(self.cfg.model, 1)
        self._tokens = []
        self._prev_argmax = -1
        self._beam_state = None
        self._rnnt_state = None
        self._committed = []
