"""Same-process ablation of the (stratified) dense-Schur LM iteration.

Each variant is its own jitted program over the full stratified problem;
honest host-fetch sync. Variants:
  full      — complete LM iteration (pass A + solve + pass B + cost)
  passA     — accumulation only
  passA-noS — accumulation with the S matmul replaced by zeros (D/H kept)
  passA-jac — jac + Ucat + V/W only (no D/H/S)
  passB     — back-substitution scan only
  cost      — candidate cost pass only
  solve     — dense solve only

Usage: python scripts/probe_dense_ablate.py [--cpu]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


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

    from bench_ba import make_problem

    from sara_tpu.ba import BAOptions
    from sara_tpu.ba import dense_schur as DS

    print("backend:", jax.default_backend(), flush=True)
    prob = make_problem(args.cams, args.points, args.obs)
    strata, ids, stats = DS.pack_pt_major_strata(prob)
    Qs = tuple(stats["chunks"])
    print("sps", stats["sps"], "chunks", stats["chunks"],
          "inflation", round(stats["inflation"], 2), flush=True)
    C = args.cams
    dt = strata[0].poses.dtype
    opts = BAOptions(max_iters=1)
    lam = jnp.asarray(1e-3, dt)
    delta, cutoff = 4.0, 6.0

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
        print(f"{name:12s} {dtm:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return out

    def pass_a(poses, mode):
        acc = (jnp.zeros((C, 42), dt), jnp.zeros((6 * C, 6 * C), dt),
               jnp.zeros((C, 6), dt))
        for ptm, Q in zip(strata, Qs):
            chunks = DS._chunked((ptm.points, ptm.cam_idx, ptm.uv,
                                  ptm.slot_mask, ptm.point_fixed), Q)

            def body(a, ch, _ptm=ptm, _mode=mode):
                points_q, cam_q, uv_q, m_q, ptfix_q = ch
                Qc, Sp = cam_q.shape
                r, Jcf, Jpf = DS._slot_residual_jac(
                    poses, points_q, _ptm.intrinsics, cam_q, uv_q, m_q,
                    ptfix_q, delta, cutoff)
                wd = r.dtype
                E = (jax.nn.one_hot(cam_q, C, dtype=wd)
                     * m_q[..., None].astype(wd))
                N = Qc * Sp
                Jx, Jy = Jcf[:, :6], Jcf[:, 6:]
                Px, Py = Jpf[:, :3], Jpf[:, 3:]
                rx, ry = r[:, 0], r[:, 1]
                u36 = (Jx[:, :, None] * Jx[:, None, :]
                       + Jy[:, :, None] * Jy[:, None, :]).reshape(N, 36)
                jtr = Jx * rx[:, None] + Jy * ry[:, None]
                camcols = jnp.concatenate([u36, jtr], axis=1)
                Ucat = jnp.einsum("nc,nu->cu", E.reshape(N, C), camcols)
                v9 = (Px[:, :, None] * Px[:, None, :]
                      + Py[:, :, None] * Py[:, None, :]).reshape(Qc, Sp, 9)
                V = jnp.sum(v9, axis=1).reshape(Qc, 3, 3)
                bp = -jnp.sum((Px * rx[:, None]
                               + Py * ry[:, None]).reshape(Qc, Sp, 3), axis=1)
                Vinv = DS._vinv3(V, lam, dt)
                W18 = (Px[:, :, None] * Jx[:, None, :]
                       + Py[:, :, None] * Jy[:, None, :]).reshape(Qc, Sp, 18)
                if _mode == "jac":
                    s = jnp.sum(W18) + jnp.sum(Vinv) + jnp.sum(bp)
                    return (a[0] + Ucat, a[1] + s * 0, a[2] + bp[:1] * 0
                            if False else a[2]), None
                D = jnp.einsum("qsc,qsw->qwc", E, W18).reshape(Qc, 3, 6, C)
                H = jnp.sum(Vinv[:, :, :, None, None]
                            * D[:, None, :, :, :], axis=2)
                D2 = D.reshape(3 * Qc, 6 * C)
                H2 = H.reshape(3 * Qc, 6 * C)
                if _mode == "noS":
                    S_pt = jnp.zeros((6 * C, 6 * C), dt) + jnp.sum(H2) * 0
                else:
                    S_pt = jax.lax.dot_general(
                        H2.astype(jnp.bfloat16), D2.astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(dt)
                y = jnp.einsum("qkl,ql->qk", Vinv, bp).reshape(3 * Qc)
                rhs_pt = (D2.T @ y).reshape(6, C).T
                return (a[0] + Ucat, a[1] + S_pt, a[2] + rhs_pt), None

            acc, _ = jax.lax.scan(body, acc, chunks)
        return acc

    import functools

    for mode in ("jac", "noS", "full"):
        fn = jax.jit(functools.partial(pass_a, mode=mode))
        timeit(f"passA-{mode}", fn, strata[0].poses)

    @jax.jit
    def cost_all(poses):
        c = jnp.zeros((), dt)
        for ptm, Q in zip(strata, Qs):
            c = c + DS.ptm_cost(ptm, poses, ptm.points, delta, cutoff, Q)
        return c

    timeit("cost", cost_all, strata[0].poses)

    @jax.jit
    def pass_b(poses, dc6):
        outs = []
        for ptm, Q in zip(strata, Qs):
            chunks = DS._chunked((ptm.points, ptm.cam_idx, ptm.uv,
                                  ptm.slot_mask, ptm.point_fixed), Q)

            def body(_, ch, _ptm=ptm):
                return None, DS._chunk_backsub(
                    poses, _ptm.intrinsics, _ptm.pose_free, dc6, lam, ch,
                    delta, cutoff)

            _, dp = jax.lax.scan(body, None, chunks)
            outs.append(jnp.sum(dp))
        return sum(outs)

    timeit("passB", pass_b, strata[0].poses,
           jnp.zeros((C, 6), dt))

    Ucat, S_pt, rhs_pt = jax.jit(
        functools.partial(pass_a, mode="full"))(strata[0].poses)

    @jax.jit
    def solve(Ucat, S_pt, rhs_pt):
        U = Ucat[:, :36].reshape(C, 6, 6)
        bc = -Ucat[:, 36:]
        d6 = jnp.eye(6, dtype=dt)
        U_d = U + lam * U * d6 + 1e-8 * d6
        S = (jnp.einsum("cd,cji->jcid", jnp.eye(C, dtype=dt), U_d)
             .reshape(6 * C, 6 * C) - S_pt)
        rhs = (bc - rhs_pt).T.reshape(6 * C)
        return jnp.linalg.solve(S, rhs)

    timeit("solve", solve, Ucat, S_pt, rhs_pt)

    from sara_tpu.ba.dense_schur import dense_schur_bundle_adjust_strata

    timeit("full LM iter", lambda: dense_schur_bundle_adjust_strata(
        tuple(strata), opts, Qs))


if __name__ == "__main__":
    main()
