"""Debug / tracing / sanitizer hooks.

Reference equivalents (SURVEY.md §5): ``--debug`` turns on torch anomaly
detection + shape prints + detach assertions (reference train.py:659-660,
model.py:27-35); profiling is manual wall-clock prints.  Here:

  * ``enable_debug()`` — jax debug_nans/debug_infs (NaN provenance: the
    failing primitive is reported with a traceback, the analogue of
    ``set_detect_anomaly``)
  * ``check_carry(carry)`` — runtime invariant on the carry pytree: finite
    values, expected batch-major shapes.  (Gradient truncation itself is
    structural in JAX — ``stop_gradient`` in the jitted step — so there is
    no "requires_grad leak" class of bug to assert against; value sanity is
    what remains.)
  * ``profile()`` — context manager around ``jax.profiler`` emitting a
    Perfetto-compatible trace directory.
  * ``kernel_interpret_mode()`` — run all Pallas kernels interpreted (the
    kernel-debug analogue of a sanitizer build).
"""

from __future__ import annotations

import contextlib
import logging

import jax
import numpy as np

logger = logging.getLogger("statecatcher.debug")


def enable_debug(nans: bool = True, infs: bool = False):
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    logger.info("debug mode: jax_debug_nans=%s jax_debug_infs=%s", nans, infs)


def disable_debug():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)


def check_carry(carry, batch_size: int | None = None, name: str = "carry"):
    """Host-side invariant check on a carry pytree (call on fetched values)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(carry)[0]:
        arr = np.asarray(leaf)
        label = f"{name}{jax.tree_util.keystr(path)}"
        if not np.all(np.isfinite(arr)):
            raise FloatingPointError(f"{label} contains non-finite values")
        if batch_size is not None and arr.shape[0] != batch_size:
            raise ValueError(
                f"{label} not batch-major: shape {arr.shape}, expected leading {batch_size}"
            )


@contextlib.contextmanager
def profile(log_dir: str):
    """jax.profiler trace (view in Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def kernel_interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
