"""Stage-isolate the dense-Schur BA LM iteration on TPU (round 4).

bench_ba measured the dense path at ~307 ms/LM-iter (C=256/P=100k/O=800k),
~3x away from the traffic estimate. Times each piece as its own program
with honest host-fetch sync: pass A (camera-system accumulation scan),
dense solve, pass B (back-substitution), cost pass.

Usage: python scripts/probe_dense_ba.py [--cpu]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=256)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--obs", type=int, default=800_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/scripts")
    from bench_ba import make_problem

    from sara_tpu.ba import BAOptions
    from sara_tpu.ba.dense_schur import (_chunk_backsub, _chunk_stats,
                                         _chunked, pack_pt_major, ptm_cost)

    print("backend:", jax.default_backend(), flush=True)
    prob = make_problem(args.cams, args.points, args.obs)
    ptm, stats = pack_pt_major(prob)
    Q = stats["chunk"]
    print("Sp", stats["sp"], "chunk", Q, "inflation",
          round(stats["inflation"], 2), flush=True)
    C = args.cams
    dt = ptm.poses.dtype
    opts = BAOptions(max_iters=1)

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = fn(*a)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        dtm = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:24s} {dtm:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return out

    lam = jnp.asarray(1e-3, dt)
    delta, cutoff = 4.0, 6.0

    @jax.jit
    def pass_a(poses, points):
        chunks = _chunked((points, ptm.cam_idx, ptm.uv, ptm.slot_mask,
                           ptm.point_fixed), Q)

        def body(acc, ch):
            u, s, rh = _chunk_stats(poses, ptm.intrinsics, ptm.pose_free,
                                    lam, ch, delta, cutoff)
            return (acc[0] + u, acc[1] + s, acc[2] + rh), None

        init = (jnp.zeros((C, 42), dt), jnp.zeros((6 * C, 6 * C), dt),
                jnp.zeros((C, 6), dt))
        return jax.lax.scan(body, init, chunks)[0]

    Ucat, S_pt, rhs_pt = timeit("pass A (stats scan)", pass_a, ptm.poses,
                                ptm.points)

    @jax.jit
    def solve(Ucat, S_pt, rhs_pt):
        U = Ucat[:, :36].reshape(C, 6, 6)
        bc = -Ucat[:, 36:]
        d6 = jnp.eye(6, dtype=dt)
        U_d = U + lam * U * d6 + 1e-8 * d6
        S = (jnp.einsum("cd,cij->cidj", jnp.eye(C, dtype=dt), U_d)
             .reshape(6 * C, 6 * C) - S_pt)
        rhs = (bc - rhs_pt).reshape(6 * C)
        return jnp.linalg.solve(S, rhs).reshape(C, 6) * ptm.pose_free

    dc6 = timeit("dense solve 1536", solve, Ucat, S_pt, rhs_pt)

    @jax.jit
    def pass_b(poses, points, dc6):
        chunks = _chunked((points, ptm.cam_idx, ptm.uv, ptm.slot_mask,
                           ptm.point_fixed), Q)

        def body(_, ch):
            return None, _chunk_backsub(poses, ptm.intrinsics, ptm.pose_free,
                                        dc6, lam, ch, delta, cutoff)

        return jax.lax.scan(body, None, chunks)[1]

    timeit("pass B (backsub)", pass_b, ptm.poses, ptm.points, dc6)

    @jax.jit
    def cost(poses, points):
        return ptm_cost(ptm, poses, points, delta, cutoff, Q)

    timeit("cost pass", cost, ptm.poses, ptm.points)

    from sara_tpu.ba.dense_schur import dense_schur_bundle_adjust

    jba = functools.partial(dense_schur_bundle_adjust, opts=opts, Q=Q)
    timeit("full LM iter", lambda: jba(ptm))


if __name__ == "__main__":
    main()
