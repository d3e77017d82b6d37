"""The three torchaudio transforms the reference uses (model.py:250-279).

Formulas follow torchaudio's documented semantics:
  Spectrogram: torch.stft(hann periodic, center=False here, onesided),
               |.|**power, output (..., freq, time).
  MelScale:    HTK-scale triangular filterbank, f_min=0, f_max=sr/2, norm=None.
  AmplitudeToDB("power"): 10*log10(clamp(x, 1e-10)), per-item top_db clamp.
  MFCC: log_mels=True -> ln(mel + 1e-6); DCT-II with 'ortho' norm.
"""

import math

import torch
import torch.nn as nn


def _hz_to_mel_htk(f):
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
    """(n_freqs, n_mels) HTK triangle bank, torchaudio layout."""
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs, dtype=torch.float64)
    m_pts = torch.linspace(
        _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2,
        dtype=torch.float64,
    )
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]                    # (n_mels+1,)
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)   # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    return fb.to(torch.float32)


def create_dct(n_mfcc, n_mels, norm):
    """(n_mels, n_mfcc) DCT-II basis, torchaudio layout."""
    n = torch.arange(n_mels, dtype=torch.float64)
    k = torch.arange(n_mfcc, dtype=torch.float64).unsqueeze(1)
    dct = torch.cos(math.pi / n_mels * (n + 0.5) * k)     # (n_mfcc, n_mels)
    if norm is None:
        dct *= 2.0
    else:
        assert norm == "ortho"
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / n_mels)
    return dct.t().to(torch.float32)


class Spectrogram(nn.Module):
    def __init__(self, n_fft=400, win_length=None, hop_length=None,
                 power=2.0, center=True):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.power = power
        self.center = center
        self.register_buffer("window", torch.hann_window(self.win_length))

    def forward(self, waveform):
        shape = waveform.size()
        x = waveform.reshape(-1, shape[-1])
        spec = torch.stft(
            x, n_fft=self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.window,
            center=self.center, normalized=False, onesided=True,
            return_complex=True,
        )
        spec = spec.abs() ** self.power                 # (B', freq, time)
        return spec.reshape(shape[:-1] + spec.shape[-2:])


class MelScale(nn.Module):
    def __init__(self, n_mels, sample_rate, n_stft, mel_scale="htk"):
        super().__init__()
        assert mel_scale == "htk", "shim supports the reference's htk scale only"
        self.register_buffer(
            "fb", melscale_fbanks(n_stft, 0.0, sample_rate / 2.0, n_mels,
                                  sample_rate)
        )

    def forward(self, specgram):
        # (..., freq, time) @ fb -> (..., n_mels, time)
        return torch.matmul(specgram.transpose(-1, -2), self.fb).transpose(-1, -2)


class MelSpectrogram(nn.Module):
    def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                 hop_length=None, n_mels=128, center=True, power=2.0,
                 mel_scale="htk"):
        super().__init__()
        self.spectrogram = Spectrogram(
            n_fft=n_fft, win_length=win_length, hop_length=hop_length,
            power=power, center=center,
        )
        self.mel_scale = MelScale(
            n_mels, sample_rate, n_fft // 2 + 1, mel_scale=mel_scale
        )

    def forward(self, waveform):
        return self.mel_scale(self.spectrogram(waveform))


class AmplitudeToDB(nn.Module):
    def __init__(self, stype="power", top_db=None):
        super().__init__()
        self.multiplier = 10.0 if stype == "power" else 20.0
        self.top_db = top_db
        self.amin = 1e-10

    def forward(self, x):
        x_db = self.multiplier * torch.log10(torch.clamp(x, min=self.amin))
        # ref_value = 1.0 -> the db_multiplier term is zero
        if self.top_db is not None:
            # per-item clamp over the trailing (channel, freq, time) dims
            flat = x_db.reshape(x_db.shape[0], -1) if x_db.dim() > 2 else \
                x_db.reshape(1, -1)
            maxes = flat.max(dim=-1, keepdim=True).values
            flat = torch.max(flat, maxes - self.top_db)
            x_db = flat.reshape(x_db.shape)
        return x_db


class MFCC(nn.Module):
    def __init__(self, sample_rate=16000, n_mfcc=40, dct_type=2, norm="ortho",
                 log_mels=False, melkwargs=None):
        super().__init__()
        assert dct_type == 2
        melkwargs = melkwargs or {}
        self.mel_spectrogram = MelSpectrogram(sample_rate=sample_rate,
                                              **melkwargs)
        n_mels = melkwargs.get("n_mels", 128)
        self.register_buffer("dct_mat", create_dct(n_mfcc, n_mels, norm))
        self.log_mels = log_mels
        self.amplitude_to_db = AmplitudeToDB("power", top_db=80.0)

    def forward(self, waveform):
        mel = self.mel_spectrogram(waveform)            # (..., n_mels, time)
        if self.log_mels:
            mel = torch.log(mel + 1e-6)
        else:
            mel = self.amplitude_to_db(mel)
        return torch.matmul(mel.transpose(-1, -2), self.dct_mat).transpose(-1, -2)
