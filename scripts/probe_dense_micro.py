"""Micro-probe: lowering strategies for the dense-BA product columns.

The ablation (probe_dense_ablate) put pass A's cost in the jac+blocks
stages. Hypothesis: rank-3 broadcast intermediates ((N, 6, 6) etc.) get
(8, 128)-tile padded when materialized — gigabytes for megabytes of data
(the round-3 trap again). This probe times, at N ~ 1.8M and in one
process:

  base     — jacobians only (E + pose matmul + closed-form chain)
  rank3    — + u36 via (N,6,6) broadcast + reshape (current code)
  take     — + u36 via static lane-index column products
  pairs    — + ALL products via one (N, 105) static-pair array
  stack36  — + u36 via 36-column jnp.stack
each followed by the Ucat matmul consumer (so nothing is dead code).

Usage: python scripts/probe_dense_micro.py [--cpu]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=256)
    ap.add_argument("--n", type=int, default=1_835_008,
                    help="total slots (matches the large bench)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    C = args.cams
    N = args.n
    rs = np.random.RandomState(0)
    Jx = jnp.asarray(rs.normal(size=(N, 6)).astype(np.float32))
    Jy = jnp.asarray(rs.normal(size=(N, 6)).astype(np.float32))
    rx = jnp.asarray(rs.normal(size=N).astype(np.float32))
    ry = jnp.asarray(rs.normal(size=N).astype(np.float32))
    cam = jnp.asarray(rs.randint(0, C, N).astype(np.int32))

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(out).ravel()[:1]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = fn(*a)
            np.asarray(out).ravel()[:1]
        dtm = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:10s} {dtm:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)

    @jax.jit
    def ehot_only(cam):
        E = jax.nn.one_hot(cam, C, dtype=jnp.float32)
        return jnp.sum(E, axis=0)

    timeit("onehot", ehot_only, cam)

    @jax.jit
    def ucat_rank3(Jx, Jy, rx, ry, cam):
        E = jax.nn.one_hot(cam, C, dtype=jnp.float32)
        u36 = (Jx[:, :, None] * Jx[:, None, :]
               + Jy[:, :, None] * Jy[:, None, :]).reshape(N, 36)
        jtr = Jx * rx[:, None] + Jy * ry[:, None]
        cc = jnp.concatenate([u36, jtr], axis=1)
        return jnp.einsum("nc,nu->cu", E, cc)

    timeit("rank3", ucat_rank3, Jx, Jy, rx, ry, cam)

    II = np.repeat(np.arange(6), 6)
    JJ = np.tile(np.arange(6), 6)

    @jax.jit
    def ucat_take(Jx, Jy, rx, ry, cam):
        E = jax.nn.one_hot(cam, C, dtype=jnp.float32)
        u36 = (jnp.take(Jx, II, axis=1) * jnp.take(Jx, JJ, axis=1)
               + jnp.take(Jy, II, axis=1) * jnp.take(Jy, JJ, axis=1))
        jtr = Jx * rx[:, None] + Jy * ry[:, None]
        cc = jnp.concatenate([u36, jtr], axis=1)
        return jnp.einsum("nc,nu->cu", E, cc)

    timeit("take", ucat_take, Jx, Jy, rx, ry, cam)

    # All cam-side second moments from one static pair table on the
    # 14-vector A = [Jx, Jy, rx, ry].
    IIp, JJp = np.triu_indices(14)

    @jax.jit
    def ucat_pairs(Jx, Jy, rx, ry, cam):
        E = jax.nn.one_hot(cam, C, dtype=jnp.float32)
        A = jnp.concatenate([Jx, Jy, rx[:, None], ry[:, None]], axis=1)
        A2 = jnp.take(A, IIp, axis=1) * jnp.take(A, JJp, axis=1)  # (N, 105)
        return jnp.einsum("nc,nu->cu", E, A2)

    timeit("pairs", ucat_pairs, Jx, Jy, rx, ry, cam)

    @jax.jit
    def ucat_stack(Jx, Jy, rx, ry, cam):
        E = jax.nn.one_hot(cam, C, dtype=jnp.float32)
        cols = [Jx[:, i] * Jx[:, j] + Jy[:, i] * Jy[:, j]
                for i in range(6) for j in range(6)]
        cols += [Jx[:, i] * rx + Jy[:, i] * ry for i in range(6)]
        cc = jnp.stack(cols, axis=1)
        return jnp.einsum("nc,nu->cu", E, cc)

    timeit("stack42", ucat_stack, Jx, Jy, rx, ry, cam)

    # The pose-gather matmul on its own (suspect: N x C read of E).
    poses = jnp.asarray(rs.normal(size=(C, 6)).astype(np.float32))

    @jax.jit
    def pose_mm(cam, poses):
        E = jax.nn.one_hot(cam, C, dtype=jnp.float32)
        return jnp.sum(E @ poses)

    timeit("poseMM", pose_mm, cam, poses)

    # Plain gather for comparison.
    @jax.jit
    def pose_gather(cam, poses):
        return jnp.sum(poses[cam])

    timeit("poseGather", pose_gather, cam, poses)


if __name__ == "__main__":
    main()
