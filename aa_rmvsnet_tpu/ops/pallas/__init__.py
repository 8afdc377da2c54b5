"""Hand-written Pallas TPU kernels for the hot paths.

Status ledger (what is a kernel here vs. what stays XLA, and why):

- **ConvLSTM gate fusion** (:mod:`.gates`) — the per-depth-slice recurrent
  aggregation's elementwise tail (sigmoid/tanh gate math over the gate-conv
  output, reference models/module.py:76-92).  Shipped as a real
  ``pallas_call`` kernel operating on a flat 128-lane layout (zero padding
  waste regardless of the 16/8-channel hidden sizes).  Numerically
  validated against the XLA path in ``tests/test_pallas.py`` (interpret
  mode on CPU, native Mosaic on TPU).
- **Warp + variance cost-volume gather — intentionally NOT a Pallas kernel
  today.**  Mosaic (the Pallas TPU compiler) supports lane-axis
  ``take_along_axis`` and dynamic-start HBM→VMEM DMA (both verified on the
  attached chip), but not sublane-axis gathers, and wide-lane (4608)
  gathers crash the compiler; the warp's 2D in-VMEM band gather therefore
  has no efficient lowering.  The XLA gather over 128-lane patch tables
  (:mod:`aa_rmvsnet_tpu.ops.patch_sample`) already runs at the measured
  random-access ceiling of the hardware (BENCHMARKS.md), so a Pallas
  version would add nothing; revisit when Mosaic grows sublane gathers.

Kernels run in interpret mode automatically on non-TPU backends, so the
same code path is exercised by the CPU test suite.
"""

from .gates import fused_lstm_gates

__all__ = ["fused_lstm_gates"]
