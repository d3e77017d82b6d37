"""Feature frontend in pure JAX: STFT → mel filterbank → log-mel / MFCC.

Numerics parity with the reference's torchaudio frontend (reference
model.py:250-279): hann(periodic) window, ``center=False`` (no padding),
power-2 spectrogram, HTK mel scale with ``norm=None`` triangular filters,
``AmplitudeToDB(top_db=80)`` for kind="mel", and natural-log mels + DCT-II
(ortho) for kind="mfcc".

TPU notes: framing uses ``conv_general_dilated_patches`` (one strided gather,
no host loop); mel projection and DCT are plain matmuls that land on the MXU;
the whole frontend jits into a single fused XLA computation.  The reference
runs its frontend outside the model under ``no_grad`` (train.py:473-475);
here it is a pure function, jitted together with the train step.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from statecatcher_tpu.config import FrontendConfig


# --------------------------------------------------------------------------- #
# Filterbank / window construction (host-side numpy, baked into the jit)
# --------------------------------------------------------------------------- #
def hann_window_periodic(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels), norm=None.

    Matches torchaudio ``melscale_fbanks`` (the reference's MelSpectrogram
    internals): filters are triangles over the linear rfft bin frequencies
    with corner points equally spaced on the mel scale.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    if mel_scale != "htk":
        raise NotImplementedError("only htk mel scale (reference parity) is supported")
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                     # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]        # (n_freqs, n_mels+2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II basis, shape (n_mels, n_mfcc) — torchaudio ``create_dct``."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)        # (n_mfcc, n_mels)
    if norm is None:
        dct *= 2.0
    else:
        assert norm == "ortho"
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / n_mels)
    return dct.T.astype(np.float32)                     # (n_mels, n_mfcc)


def num_frames(num_samples: int, cfg: FrontendConfig) -> int:
    """Frame count for center=False framing: 1 + (S − n_fft) // hop."""
    assert not cfg.center
    return 1 + (num_samples - cfg.n_fft) // cfg.hop_length


def windowed_dft_matrix(n_fft: int, win_length: int) -> np.ndarray:
    """Real-DFT basis with the analysis window folded in, (n_fft, 2·n_freqs).

    Columns are [cos_0..cos_F | −sin_0..−sin_F] so that
    ``frames @ W`` yields re‖im of ``rfft(frames · window)`` — the windowing
    and the transform become ONE MXU matmul.  TPUs have no fast FFT; at
    n_fft=400 the O(N²) matmul form is ~7× faster than ``jnp.fft.rfft``'s
    lowering and removes the separate windowing + layout passes (measured
    35 ms → ~5 ms per 8-segment dispatch, tools/profile_trace.py).

    The window is zero-padded centered to n_fft when win_length < n_fft
    (torch.stft semantics).
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    w[left:left + win_length] = hann_window_periodic(win_length).astype(np.float64)
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return (w[:, None] * basis).astype(np.float32)


# --------------------------------------------------------------------------- #
# Jitted frontend
# --------------------------------------------------------------------------- #
def power_spectrogram(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(B, S) float32 → (B, T, n_freqs) power spectrogram.

    Windowing + real DFT run as ONE f32 MXU matmul (windowed_dft_matrix),
    contracted straight out of the (B, n_fft, T) patches layout so no
    explicit frame transpose is materialized.
    """
    W = jnp.asarray(windowed_dft_matrix(cfg.n_fft, cfg.win_length))
    x = x.astype(jnp.float32)
    B = x.shape[0]
    hop, n_fft = cfg.hop_length, cfg.n_fft
    T = num_frames(x.shape[1], cfg)
    # Frame t covers samples [t·hop, t·hop + n_fft): instead of materializing
    # the 2.5×-expanded (B, n_fft, T) patch tensor (13 ms/dispatch as a
    # gather-conv), decompose each frame into ceil(n_fft/hop) hop-aligned
    # chunks.  Chunk j of every frame lives in the FREE reshape view
    # x[:, j·hop :].reshape(B, T, hop), so the windowed DFT is a sum of
    # ceil(n_fft/hop) thin MXU matmuls over un-expanded views of x.
    n_chunks = -(-n_fft // hop)
    # One hop of zero tail so every chunk's (B, T·hop) view stays in bounds.
    xp = jnp.pad(x, ((0, 0), (0, n_chunks * hop + T * hop - x.shape[1])))
    spec = None
    for j in range(n_chunks):
        rows = min(hop, n_fft - j * hop)
        xj = xp[:, j * hop: (j + T) * hop].reshape(B, T, hop)
        if rows < hop:
            xj = xj[..., :rows]
        part = jax.lax.dot_general(
            xj, W[j * hop: j * hop + rows],
            (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        spec = part if spec is None else spec + part    # (B, T, 2·n_freqs)
    F = cfg.n_fft // 2 + 1
    p = jnp.square(spec[..., :F]) + jnp.square(spec[..., F:])
    if cfg.power != 2.0:
        p = p ** (cfg.power / 2.0)
    return p.astype(jnp.float32)


def amplitude_to_db(
    x: jnp.ndarray, top_db: float = 80.0, amin: float = 1e-10
) -> jnp.ndarray:
    """Power → dB with per-utterance top_db clamp (torchaudio AmplitudeToDB).

    The clamp floor is ``max_db − top_db`` where the max is taken per batch
    element over its full (time, freq) spectrogram.
    """
    x_db = 10.0 * jnp.log10(jnp.maximum(x, amin))
    max_db = jnp.max(x_db, axis=tuple(range(1, x_db.ndim)), keepdims=True)
    return jnp.maximum(x_db, max_db - top_db)


@functools.partial(jax.jit, static_argnames=("cfg",))
def compute_features(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(B, S) waveform → (B, T, n_feats) features.

    kind="mel":  log-mel (dB, top_db-clamped) — reference model.py:270-277.
    kind="mfcc": natural-log mels → DCT-II ortho — reference model.py:261-269.

    Output is already time-major (B, T, F), i.e. the reference's
    ``feats.transpose(1, 2)`` is folded in.
    """
    p = power_spectrogram(x, cfg)                              # (B, T, n_freqs)
    fb = jnp.asarray(
        mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate,
                       mel_scale=cfg.mel_scale)
    )
    mel = jnp.einsum("btf,fm->btm", p, fb)                     # MXU matmul
    if cfg.kind == "mel":
        return amplitude_to_db(mel, top_db=cfg.top_db)
    elif cfg.kind == "mfcc":
        if cfg.log_mels:
            logmel = jnp.log(mel + 1e-6)
        else:
            logmel = amplitude_to_db(mel, top_db=cfg.top_db)
        dct = jnp.asarray(dct_matrix(cfg.n_mfcc, cfg.n_mels, "ortho"))
        return jnp.einsum("btm,mk->btk", logmel, dct)          # MXU matmul
    raise ValueError(f"Unsupported frontend: {cfg.kind}")


def feat_dim(cfg: FrontendConfig) -> int:
    """Feature dimension — computed exactly, not probed.

    (The reference probes with a mis-shaped dummy and reads the wrong axis;
    see reference train.py:338-343 and SURVEY.md Appendix A.)
    """
    return cfg.n_mfcc if cfg.kind == "mfcc" else cfg.n_mels


# --------------------------------------------------------------------------- #
# Sample-mask → frame-mask / lengths
# --------------------------------------------------------------------------- #
def compute_frame_mask(sample_mask: jnp.ndarray, num_feat_frames: int,
                       stack_order: int = 1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Boolean (B, S) sample mask → ((B, T) frame mask, (B,) frame lengths).

    Reference semantics (train.py:296-306,484-490): ``subsample = S/T ×
    stack_order``; frame mask is any-pooling of the sample mask over each
    subsample window; ``in_lens = mask.sum/subsample`` clamped to T.  The
    reference's reshape is only safe because subsample divides cleanly; here
    the window boundaries are computed exactly with integer arithmetic.
    """
    B, S = sample_mask.shape
    T = num_feat_frames // stack_order if stack_order > 1 else num_feat_frames
    subsample = (S / num_feat_frames) * float(stack_order)
    # Exact reference math: trim to a multiple of T, reshape, any-pool.
    win = int(subsample)
    S_trim = T * win
    reshaped = sample_mask[:, :S_trim].reshape(B, T, win)
    frame_mask = jnp.any(reshaped, axis=2)
    in_lens = jnp.minimum(
        (jnp.sum(sample_mask, axis=1) / subsample).astype(jnp.int32), T
    )
    return frame_mask, in_lens


def frame_mask_from_lens(sample_lens: jnp.ndarray, num_samples: int,
                         num_feat_frames: int, stack_order: int = 1
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prefix-length (B,) i32 → ((B, T) frame mask, (B,) frame lengths).

    Every sample mask the data plane produces is a PREFIX mask (real audio
    then zero-pad — ``data/chunking.py:chunks_to_segments``, parity with
    reference dataset.py:221-248), so the (B, S) boolean mask carries only
    B integers of information.  This computes ``compute_frame_mask``'s exact
    result from those integers: for a prefix of length L, the any-pool over
    window t is ``t·win < L`` and ``sum(mask) == L``.  Lets the train loop
    ship (B,) int32 instead of (B, S) bool across host→device.
    """
    T = num_feat_frames // stack_order if stack_order > 1 else num_feat_frames
    subsample = (num_samples / num_feat_frames) * float(stack_order)
    win = int(subsample)
    t = jnp.arange(T, dtype=jnp.int32)
    frame_mask = t[None, :] * win < sample_lens[:, None]
    in_lens = jnp.minimum(
        (sample_lens / subsample).astype(jnp.int32), T
    )
    return frame_mask, in_lens
