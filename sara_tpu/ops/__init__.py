"""Device-op layer: TPU-shaped primitives for the hot paths.

The kernel layer of the framework — the TPU counterpart of the reference's
Shakti GPU backends (reference: cpp/src/DO/Shakti/Halide/Generators/*,
Cuda/FeatureDetectors/*.cu).

Engineering position (measured, NOTES.md): on this hardware every
production hot path ended up as an XLA-native formulation that beat hand
kernels — blurs as banded-Toeplitz MXU matmuls, descriptor accumulation as
einsums, matching as a blocked GEMM, detection as fused stencils, batched
small-matrix solves as lane-parallel Gauss-Jordan (ops/smallmat.py), exact
top-k as bucketed compaction (ops/topk.py). Two demonstration Pallas
kernels (VMEM-tiled row conv, MXU pairwise-distance tiles) lived here
through round 3 but were never reached by any pipeline; they were removed
rather than carried as dead code (round-4 decision — see COMPONENTS.md).
"""
