"""Pallas TPU kernels for hot paths.

The kernel layer of the framework — the TPU counterpart of the reference's
Shakti GPU backends (reference: cpp/src/DO/Shakti/Halide/Generators/*,
Cuda/FeatureDetectors/*.cu). Kernels fall back to ``interpret=True`` off-TPU
so the suite validates them everywhere.
"""

from sara_tpu.ops.conv import separable_conv_rows_pallas
from sara_tpu.ops.matcher import pairwise_sqdist_pallas

__all__ = ["separable_conv_rows_pallas", "pairwise_sqdist_pallas"]
