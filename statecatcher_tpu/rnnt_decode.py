"""RNN-T greedy decoding — batched, jittable.

Standard transducer greedy search: at each frame, emit the argmax label and
re-query the joint with the updated predictor context until blank (bounded by
``max_symbols`` per frame).  The reference's predictor is a 1-token embedding
(reference model.py:112-145), so decoder context is exactly the last emitted
token — precomputed as a (V, J) table so each emission is one (B,J)×(J,V)
matmul.

Carried decode state across segments: (last_token, out_len, out_buf) —
streaming twin of the encoder carry.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class RNNTDecodeState(NamedTuple):
    last_token: jnp.ndarray   # (B,) int32 — predictor context (blank at start)
    out_buf: jnp.ndarray      # (B, max_out) int32
    out_len: jnp.ndarray      # (B,) int32


def rnnt_decode_init(batch: int, max_out: int, blank_id: int) -> RNNTDecodeState:
    return RNNTDecodeState(
        last_token=jnp.full((batch,), blank_id, jnp.int32),
        out_buf=jnp.zeros((batch, max_out), jnp.int32),
        out_len=jnp.zeros((batch,), jnp.int32),
    )


def pred_table_from_params(variables, dtype=jnp.float32) -> jnp.ndarray:
    """(V, J) predictor vectors: pred_proj(embedding) for every token."""
    p = variables["params"]["joiner"]
    emb = p["embedding"]["embedding"].astype(dtype)            # (V, E)
    k = p["pred_proj"]["kernel"].astype(dtype)                 # (E, J)
    b = p["pred_proj"]["bias"].astype(dtype)                   # (J,)
    return emb @ k + b


@functools.partial(jax.jit, static_argnames=("blank_id", "max_symbols", "max_out"))
def rnnt_greedy_decode(
    enc_proj: jnp.ndarray,     # (B, T, J) encoder projected to join space
    pred_table: jnp.ndarray,   # (V, J)
    join_kernel: jnp.ndarray,  # (J, V)
    join_bias: jnp.ndarray,    # (V,)
    in_lens: jnp.ndarray,      # (B,)
    blank_id: int = 0,
    max_symbols: int = 4,
    init_state: Optional[RNNTDecodeState] = None,
    max_out: int = 512,
) -> RNNTDecodeState:
    B, T, J = enc_proj.shape
    state = init_state if init_state is not None else rnnt_decode_init(
        B, max_out, blank_id
    )
    Mo = state.out_buf.shape[1]

    def frame(st: RNNTDecodeState, inp):
        enc_t, t = inp                         # (B, J), scalar
        active0 = t < in_lens

        def sym_step(i, carry):
            st, can_emit = carry
            pred = pred_table[st.last_token]   # (B, J)
            joint = jnp.tanh(enc_t + pred)
            logits = joint @ join_kernel + join_bias
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = can_emit & (nxt != blank_id) & (st.out_len < Mo)
            pos = jnp.minimum(st.out_len, Mo - 1)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (B, Mo), 1) == pos[:, None]
            ) & emit[:, None]
            out_buf = jnp.where(onehot, nxt[:, None], st.out_buf)
            out_len = st.out_len + emit.astype(jnp.int32)
            last = jnp.where(emit, nxt, st.last_token)
            return (
                RNNTDecodeState(last_token=last, out_buf=out_buf, out_len=out_len),
                emit,   # a row stops emitting this frame once it hits blank
            )

        st, _ = lax.fori_loop(0, max_symbols, sym_step, (st, active0))
        return st, None

    state, _ = lax.scan(
        frame, state, (jnp.swapaxes(enc_proj, 0, 1), jnp.arange(T))
    )
    return state


def rnnt_state_to_lists(state: RNNTDecodeState) -> list[list[int]]:
    buf = np.asarray(state.out_buf)
    lens = np.asarray(state.out_len)
    return [[int(x) for x in buf[b, : lens[b]]] for b in range(buf.shape[0])]
