"""torchaudio stand-in for the reference-in-the-loop parity harness.

The image has no torchaudio; the reference imports it unconditionally
(reference train.py:14, model.py:4) and uses exactly three transforms
(reference model.py:250-279): MelSpectrogram, AmplitudeToDB, MFCC.  This shim
reimplements those three with torchaudio's documented formulas in plain torch
so the unmodified reference can run on CPU.  Numerics are cross-checked
against statecatcher_tpu's JAX frontend (tests/test_reference_parity.py),
which is itself golden-tested against torch.stft + loop-built filterbanks
(tests/test_frontend.py) — the two engines therefore share one frontend
definition during parity runs.

NOT a general torchaudio replacement: only the surface the reference touches.
"""

from . import transforms  # noqa: F401

__version__ = "0.0.0+statecatcher-parity-shim"
