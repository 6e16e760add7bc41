"""Pallas TPU kernels for hot paths.

The kernel layer of the framework — the TPU counterpart of the reference's
Shakti GPU backends (reference: cpp/src/DO/Shakti/Halide/Generators/*,
Cuda/FeatureDetectors/*.cu). Kernels fall back to ``interpret=True`` off-TPU
so the suite validates them everywhere.

Engineering position (measured, NOTES.md): on this hardware the production
hot paths ended up as XLA-native formulations that beat hand kernels —
blurs as banded-Toeplitz MXU matmuls, descriptor accumulation as einsums,
matching as a blocked GEMM, detection as fused stencils. The Pallas kernels
here are kept as the escape hatch for shapes XLA schedules poorly and as
working templates (VMEM-tiled row conv, MXU pairwise-distance tiles); the
default pipeline only reaches them where they win.
"""

from sara_tpu.ops.conv import separable_conv_rows_pallas
from sara_tpu.ops.matcher import pairwise_sqdist_pallas

__all__ = ["separable_conv_rows_pallas", "pairwise_sqdist_pallas"]
