"""Deterministic seeding for the reference subprocess.

The reference never calls torch.manual_seed, so its initial weights differ
run to run.  Python imports sitecustomize from sys.path at interpreter
startup; with the shims directory on PYTHONPATH this seeds torch before
train.py builds the model, making the run reproducible — the parity harness
replays the same seed and the same construction order (reference
train.py:99-110 build_model) to obtain bit-identical initial weights without
modifying the reference.

Python imports only the FIRST sitecustomize found, so this one chains to the
next on sys.path (the axon JAX-plugin registers through its own
sitecustomize; shadowing it would break jax in any process that also has
this directory on PYTHONPATH)."""

import os
import sys

_seed = os.environ.get("REF_PARITY_TORCH_SEED")
if _seed is not None:
    import torch

    torch.manual_seed(int(_seed))

    # The triton stub (./triton/) exists only so the reference's
    # lucyrnn_triton.py imports; torch itself must keep believing triton is
    # absent, or its inductor/dynamo import chain dereferences stub internals
    # (torch/_inductor/runtime/hints.py imports triton.backends.compiler when
    # has_triton_package() is true).  Patch the probe before anything else
    # imports it.
    import torch.utils._triton as _torch_triton

    _torch_triton.has_triton_package = lambda: False
    if hasattr(_torch_triton, "has_triton"):
        _torch_triton.has_triton = lambda *a, **k: False

# chain-load the next sitecustomize on sys.path, if any
_here = os.path.dirname(os.path.abspath(__file__))
for _dir in sys.path:
    try:
        _abs = os.path.abspath(_dir or ".")
    except Exception:
        continue
    if _abs == _here:
        continue
    _cand = os.path.join(_abs, "sitecustomize.py")
    if os.path.isfile(_cand):
        import runpy

        runpy.run_path(_cand)
        break
