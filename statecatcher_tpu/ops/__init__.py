"""L2 kernels: linear-recurrence scans, CTC and RNN-T lattice losses.

Three implementations per op, switchable for A/B numerics (SURVEY.md §5
config system):
  * "xla-scan" — ``lax.scan`` sequential reference semantics
  * "assoc"    — ``lax.associative_scan`` parallel-in-time (XLA)
  * "pallas"   — fused TPU kernel with custom VJP
"""

from statecatcher_tpu.ops.scan import linear_scan, linear_scan_assoc, linear_scan_seq

__all__ = ["linear_scan", "linear_scan_assoc", "linear_scan_seq"]
