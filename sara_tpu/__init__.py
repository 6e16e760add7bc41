"""sara-tpu: a TPU-native structure-from-motion / visual-odometry framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of the
reference C++ library oddkiva/sara (see SURVEY.md), redesigned TPU-first:

- arrays + pure functions + static shapes instead of pointer graphs,
- ``vmap`` over keypoints / hypotheses / image pairs,
- fixed-capacity buffers with validity masks instead of dynamic vectors,
- device mesh sharding (``jax.sharding``) for the distributed bundle adjuster.

Subpackages
-----------
core      typed pytrees (keypoints, matches), Lie groups, camera models, math
image     filtering, pyramids, warps, differential operators
features  DoG/Harris/Hessian/LoG detectors, SIFT description, orientation
matching  brute-force descriptor matching (blocked GEMM + ratio test)
ransac    vmapped robust estimation engine
mvg       minimal solvers and two-view geometry
ba        bundle adjustment (Levenberg-Marquardt + Schur complement)
sfm       host-side incremental SfM: pose graph, tracks, odometry pipeline
parallel  device meshes, sharded/distributed solvers
io        image/video/dataset IO, PLY/HDF5 serialization
viz       matplotlib-based visualization
ops       Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: on the target TPU runtime every compile
# costs ~10 s wall-clock (remote compile service), so caching compiled
# programs across processes/rounds is a first-order performance feature.
# Opt out with SARA_TPU_NO_CACHE=1; override the location with
# SARA_TPU_CACHE_DIR.
import os as _os

if not _os.environ.get("SARA_TPU_NO_CACHE"):
    import jax as _jax

    # Only cache for accelerator backends: CPU AOT cache entries embed host
    # machine features and break when reloaded under different CPU flag
    # sets (observed with the axon runtime's helper CPU executables).
    _platforms = None
    try:
        _platforms = _jax.config.jax_platforms
    except Exception:
        pass
    if _platforms != "cpu":
        _cache_dir = _os.environ.get(
            "SARA_TPU_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass

# Default matmul precision: TPU's default (one bfloat16 pass) silently
# breaks the geometry stack in float32 — measured: the 5-point solver's
# constraint residuals land above their validity threshold and EVERY RANSAC
# hypothesis dies (the IRLS refit then rescued E while success stayed
# False). "float32" forces full-precision passes for f32 matmul INPUTS
# only; the frontend's deliberate bfloat16 arrays keep the native fast
# MXU path.
try:
    import jax as _jax2

    _jax2.config.update("jax_default_matmul_precision", "float32")
except Exception:
    pass
