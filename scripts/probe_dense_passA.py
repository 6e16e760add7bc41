"""Sub-stage attribution inside the dense-Schur pass A (TPU).

Times cumulative prefixes of the per-chunk work as separate scans:
  jac     — one-hot E + pose matmul + closed-form jacobians + Huber
  ucat    — + camera-side U/bc contraction
  vw      — + V blocks, bp, Vinv, W18
  d       — + dense per-point camera columns D
  full    — + H, S contraction, rhs

Usage: python scripts/probe_dense_passA.py [--cpu]
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

    from sara_tpu.ba.dense_schur import (_chunked, _slot_residual_jac,
                                         _vinv3, pack_pt_major)

    print("backend:", jax.default_backend(), flush=True)
    prob = make_problem(args.cams, args.points, args.obs)
    ptm, stats = pack_pt_major(prob)
    Q = stats["chunk"]
    C = args.cams
    dt = ptm.poses.dtype
    lam = jnp.asarray(1e-3, dt)
    delta, cutoff = 4.0, 6.0

    def chunk_work(poses, ch, stage):
        points_q, cam_q, uv_q, m_q, ptfix_q = ch
        Qc, Sp = cam_q.shape
        r, Jcf, Jpf = _slot_residual_jac(poses, points_q, ptm.intrinsics,
                                         cam_q, uv_q, m_q, ptfix_q, delta,
                                         cutoff)
        wd = r.dtype
        E = (jax.nn.one_hot(cam_q, C, dtype=wd) * m_q[..., None].astype(wd))
        N = Qc * Sp
        Jx, Jy = Jcf[:, :6], Jcf[:, 6:]
        Px, Py = Jpf[:, :3], Jpf[:, 3:]
        rx, ry = r[:, 0], r[:, 1]
        if stage == "jac":
            return (jnp.sum(r) + jnp.sum(Jcf) + jnp.sum(Jpf),)
        u36 = (Jx[:, :, None] * Jx[:, None, :]
               + Jy[:, :, None] * Jy[:, None, :]).reshape(N, 36)
        jtr = Jx * rx[:, None] + Jy * ry[:, None]
        camcols = jnp.concatenate([u36, jtr], axis=1)
        Ucat = jnp.einsum("nc,nu->cu", E.reshape(N, C), camcols)
        if stage == "ucat":
            return (jnp.sum(Ucat),)
        v9 = (Px[:, :, None] * Px[:, None, :]
              + Py[:, :, None] * Py[:, None, :]).reshape(Qc, Sp, 9)
        V = jnp.sum(v9, axis=1).reshape(Qc, 3, 3)
        bp = -jnp.sum((Px * rx[:, None] + Py * ry[:, None]).reshape(Qc, Sp, 3),
                      axis=1)
        Vinv = _vinv3(V, lam, dt)
        W18 = (Jx[:, :, None] * Px[:, None, :]
               + Jy[:, :, None] * Py[:, None, :]).reshape(Qc, Sp, 18)
        if stage == "vw":
            return (jnp.sum(Ucat) + jnp.sum(Vinv) + jnp.sum(W18),)
        D = jnp.einsum("qsc,qsw->qwc", E, W18).reshape(Qc, 6, 3, C)
        if stage == "d":
            return (jnp.sum(Ucat) + jnp.sum(D),)
        H = jnp.einsum("qkl,qjlc->qjkc", Vinv, D)
        S_pt = jnp.einsum("qjkc,qikd->cjdi", H, D).reshape(6 * C, 6 * C)
        y = jnp.einsum("qkl,ql->qk", Vinv, bp)
        rhs_pt = jnp.einsum("qjkc,qk->cj", D, y)
        return (jnp.sum(Ucat) + jnp.sum(S_pt) + jnp.sum(rhs_pt),)

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

    for stage in ("jac", "ucat", "vw", "d", "full"):
        @jax.jit
        def scan_stage(poses, points, _stage=stage):
            chunks = _chunked((points, ptm.cam_idx, ptm.uv, ptm.slot_mask,
                               ptm.point_fixed), Q)

            def body(acc, ch):
                out = chunk_work(poses, ch, _stage)
                return acc + out[0], None

            return jax.lax.scan(body, jnp.zeros((), dt), chunks)[0]

        timeit(stage, scan_stage, ptm.poses, ptm.points)


if __name__ == "__main__":
    main()
