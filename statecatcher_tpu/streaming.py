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


def _make_ctc_encode_chunk(model, fe):
    """The ONE definition of the CTC streaming encode body — shared by the
    greedy/beam fused chunk steps AND the finish() flush path, so the
    steady-state and flush decodes can never diverge."""

    @jax.jit
    def _encode_chunk(params, audio, carry):
        feats = compute_features(audio, fe)
        logits, new_carry = model.apply(params, feats, carry, None)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return lp, new_carry

    return _encode_chunk


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
        self._best_packed = None   # device [len, toks...] of the best beam
        self._best_resid_host: Optional[list] = None   # host cache post-commit
        # host-side upper bound on the device buffers' fill level — lets the
        # commit check run WITHOUT a per-chunk device sync (profiled: the
        # blocking ``int(lens)`` fetch serialized the pipeline every chunk)
        self._fill_bound = 0

        # One fused jit per chunk: encode AND decode advance in a single
        # dispatch, decode state stays device-resident, and only the
        # minimal result crosses the tunnel (greedy: (1, T) int32 preds
        # instead of the (1, T, V) float log-probs).  Streaming latency is
        # dispatch-round-trip-bound on this box (tools/profile_streaming.py)
        # so one dispatch per chunk is the headline lever.
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

            def _step_chunk(params, audio, carry, dec_state):
                from statecatcher_tpu.rnnt_decode import rnnt_greedy_decode

                enc_p, new_carry = _encode_chunk(params, audio, carry)
                new_state = rnnt_greedy_decode(
                    enc_p, *self._rnnt_tables,
                    jnp.asarray([enc_p.shape[1]]), blank_id=self.blank_id,
                    init_state=dec_state,
                )
                return new_state, new_carry

            self._step_chunk = jax.jit(_step_chunk)
        elif decoder == "greedy":
            _encode_chunk = _make_ctc_encode_chunk(model, fe)

            @jax.jit
            def _step_chunk(params, audio, carry):
                # argmax commutes with log_softmax — only (1, T) int32
                # preds cross the tunnel, not the (1, T, V) float lp
                lp, new_carry = _encode_chunk(params, audio, carry)
                return jnp.argmax(lp, axis=-1).astype(jnp.int32), new_carry

            self._step_chunk = _step_chunk
        else:
            _encode_chunk = _make_ctc_encode_chunk(model, fe)

            def _step_chunk(params, audio, carry, beam_state):
                lp, new_carry = _encode_chunk(params, audio, carry)
                new_state, totals = ctc_beam_search(
                    lp, jnp.asarray([lp.shape[1]]), beam=self.beam,
                    blank_id=self.blank_id, max_len=self.max_out,
                    init_state=beam_state,
                )
                # best hypothesis extracted ON DEVICE and packed into one
                # int32 array [len, toks...]: ``tokens`` then costs a single
                # small fetch instead of pulling the whole beam state
                # (profiled: 3-4 per-array tunnel round trips per chunk)
                b = jnp.argmax(totals[0])
                best = jnp.concatenate(
                    [new_state.lens[0, b][None], new_state.toks[0, b]])
                return new_state, totals, best, new_carry

            self._step_chunk = jax.jit(_step_chunk)

        self._encode_chunk = _encode_chunk

    # ------------------------------------------------------------------ #
    def accept_waveform(self, samples: np.ndarray):
        """Feed samples (float32, model sample rate); decode what completes."""
        self._buffer = np.concatenate([self._buffer, samples.astype(np.float32)])
        need = self.chunk_samples + self.lookahead
        t_enc = self.chunk_frames // self.stack_order
        while len(self._buffer) >= need:
            chunk = self._buffer[:need]
            self._buffer = self._buffer[self.chunk_samples:]
            audio = jnp.asarray(chunk[None])
            if self.decoder == "greedy":
                preds, self._carry = self._step_chunk(
                    self.params, audio, self._carry)
                self._absorb_greedy(np.asarray(preds)[0])
            elif self.decoder == "rnnt":
                from statecatcher_tpu.rnnt_decode import (
                    rnnt_decode_init,
                    rnnt_drain,
                )

                if self._rnnt_state is None:
                    self._rnnt_state = rnnt_decode_init(
                        1, self.max_out, self.blank_id)
                self._rnnt_state, self._carry = self._step_chunk(
                    self.params, audio, self._carry, self._rnnt_state)
                self._fill_bound += t_enc * 4        # ≤ max_symbols emits/frame
                if self._fill_bound >= self.max_out // 2:
                    self._rnnt_state, com = rnnt_drain(self._rnnt_state)
                    self._committed.extend(com[0])
                    self._fill_bound = 0
            else:
                from statecatcher_tpu.beam import beam_commit

                if self._beam_state is None:
                    self._beam_state = beam_init(1, self.beam, self.max_out)
                (self._beam_state, self._totals, self._best_packed,
                 self._carry) = self._step_chunk(
                    self.params, audio, self._carry, self._beam_state)
                self._best_resid_host = None
                self._fill_bound += t_enc            # ≤ 1 CTC emit/frame
                if self._fill_bound >= self.max_out // 2:
                    self._beam_state, com, best_resid, fill = beam_commit(
                        self._beam_state, self._totals,
                        reserve=self.max_out // 2, return_best=True,
                    )
                    self._totals = jnp.logaddexp(
                        self._beam_state.p_b, self._beam_state.p_nb)
                    self._committed.extend(com[0])
                    self._fill_bound = fill
                    self._best_packed = None         # residual shifted
                    self._best_resid_host = best_resid[0]

    def _absorb_greedy(self, preds: np.ndarray):
        for tok in preds.tolist():
            if tok != self.blank_id and tok != self._prev_argmax:
                self._tokens.append(tok)
            self._prev_argmax = tok

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
        """Flush-path decode advance (variable trimmed T — ``finish()``).

        The steady-state chunk path runs through the fused ``_step_chunk``
        dispatch in ``accept_waveform`` instead."""
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
        self._best_packed = None   # state advances off the fused fast path
        self._best_resid_host = None
        if self.decoder == "greedy":
            self._absorb_greedy(np.asarray(jnp.argmax(lp[0], axis=-1)))
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
        if self._best_packed is not None:
            packed = np.asarray(self._best_packed)     # ONE small fetch
            n = int(packed[0])
            return self._committed + packed[1 : 1 + n].tolist()
        if self._best_resid_host is not None:          # post-commit: no fetch
            return self._committed + list(self._best_resid_host)
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
        self._best_packed = None
        self._best_resid_host = None
        self._fill_bound = 0
