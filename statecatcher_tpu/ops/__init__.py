"""L2 kernels: linear-recurrence scans, CTC and RNN-T lattice losses.

Three implementations per op, switchable for A/B numerics (SURVEY.md §5
config system):
  * "xla-scan" — ``lax.scan`` sequential reference semantics
  * "assoc"    — ``lax.associative_scan`` parallel-in-time (XLA)
  * "pallas"   — fused TPU kernel with custom VJP
"""

from statecatcher_tpu.ops.scan import (
    linear_scan,
    linear_scan_assoc,
    linear_scan_chunked,
    linear_scan_seq,
)
from statecatcher_tpu.ops.ctc import ctc_loss, ctc_loss_per_example
from statecatcher_tpu.ops.rnnt import rnnt_loss, rnnt_loss_fused

__all__ = [
    "linear_scan", "linear_scan_assoc", "linear_scan_chunked",
    "linear_scan_seq", "ctc_loss", "ctc_loss_per_example",
    "rnnt_loss", "rnnt_loss_fused",
]
