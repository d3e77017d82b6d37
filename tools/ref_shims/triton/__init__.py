"""Import-time stub for triton (GPU-only; not in this image).

The reference's lucyrnn_triton.py defines @triton.jit kernels at module
import (lucyrnn_triton.py:158,179); reference model.py imports that module
unconditionally.  The parity harness runs the LSTM-CTC config, which never
launches these kernels — this stub only has to let the import succeed.
Launching a stubbed kernel raises immediately."""

from . import language  # noqa: F401


class _StubKernel:
    def __init__(self, fn):
        self.fn = fn
        self.__name__ = getattr(fn, "__name__", "kernel")

    def __getitem__(self, grid):
        raise RuntimeError(
            "triton stub: GPU kernels are unavailable in the parity harness "
            "(use the lstm encoder config)"
        )

    def __call__(self, *a, **k):
        raise RuntimeError("triton stub: kernels cannot be called directly")


def jit(fn=None, **kwargs):
    if fn is None:
        return lambda f: _StubKernel(f)
    return _StubKernel(fn)
