"""Reference-in-the-loop parity (VERDICT round 2, Missing #1).

These tests run the UNMODIFIED reference (/root/reference/train.py) as a
subprocess against our fake speechcatcher-data server — real HTTP, real
ffmpeg-pipe protocol (shimmed), same char tokenizer, same torch-seeded
initial weights converted into our flax model — and assert the two engines'
per-step loss sequences agree.

The frontend-shim test pins the link that makes this meaningful: the
torchaudio stand-in the reference trains through (tools/ref_shims/torchaudio)
and our JAX frontend agree numerically, so both engines optimize the same
function of the same bytes.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
SHIMS = os.path.join(REPO, "tools", "ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)


def test_torchaudio_shim_matches_jax_frontend(rng):
    torch = pytest.importorskip("torch")
    for p in (SHIMS, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    import jax.numpy as jnp
    from model import make_frontend  # reference model.py, via shims

    from statecatcher_tpu.config import FrontendConfig
    from statecatcher_tpu.frontend import compute_features

    x = rng.uniform(-0.5, 0.5, size=(2, 16000)).astype(np.float32)
    for kind in ("mfcc", "mel"):
        fe, _ = make_frontend(kind, 16000)
        with torch.no_grad():
            tfeat = fe(torch.from_numpy(x)).transpose(1, 2).numpy()
        jfeat = np.asarray(
            compute_features(jnp.asarray(x), FrontendConfig(kind=kind)))
        assert tfeat.shape == jfeat.shape
        np.testing.assert_allclose(tfeat, jfeat, atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_reference_loss_sequence_matches(tmp_path):
    pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from reference_parity import default_args, run_parity

    args = default_args(
        steps=6, hidden=32, layers=1, batch_size=2, n_train=4, n_heldout=2,
        workdir=str(tmp_path), timeout=600,
    )
    report = run_parity(args)
    assert report["steps_compared"] == 6
    # identical weights + identical data -> f32 agreement from step one
    assert report["rel_diff_step1"] < 1e-5
    assert report["rel_diff_max"] < 1e-3
