"""Isolate where the BA LM iteration's time goes on TPU (round-3 item 5).

bench_ba measures ~670 ms/LM-iteration at C=256/P=60k/O=800k vs a ~1.5 ms
roofline. Candidates (VERDICT r2): per-observation jacfwd gathers,
segment_sum scatters, per-CG W re-reads, small-block inverses. This probe
times each piece as its own program with honest host-fetch sync.

Usage: python probe_ba_stages.py [--cams 256] [--obs 800000]
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
    ap.add_argument("--points", type=int, default=60000)
    ap.add_argument("--obs", type=int, default=800000)
    ap.add_argument("--cg", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sara_tpu.ba.core import (BAOptions, BAProblem, _gauss_newton_blocks,
                                  _inv_blocks, _jacobians, _damp,
                                  _schur_matvec, _solve_lm, ba_cost)

    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)
    C, P, O = args.cams, args.points, args.obs
    X = rs.uniform(-10, 10, (P, 3)) + np.array([0, 0, 30.0])
    poses = np.zeros((C, 6))
    poses[:, 3] = np.linspace(0, 10, C)
    intr = np.array([800.0, 800.0, 512.0, 384.0])
    cam_idx = np.sort(rs.randint(0, C, O)).astype(np.int32)
    pt_idx = rs.randint(0, P, O).astype(np.int32)
    Xw = X[pt_idx]
    tc = poses[cam_idx][:, 3:]
    Xc = Xw + tc
    uv = np.stack([intr[0] * Xc[:, 0] / Xc[:, 2] + intr[2],
                   intr[1] * Xc[:, 1] / Xc[:, 2] + intr[3]], axis=1)
    uv += rs.normal(scale=0.5, size=uv.shape)
    pose_fixed = np.zeros(C, bool)
    pose_fixed[0] = True
    prob = BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        points=jnp.asarray(X, jnp.float32),
        intrinsics=jnp.asarray(intr, jnp.float32),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.ones(O, bool),
        pose_fixed=jnp.asarray(pose_fixed),
        point_fixed=jnp.zeros(P, bool),
    )
    opts = BAOptions(max_iters=1, cg_iters=args.cg)

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x).ravel()[:1], out)  # honest fetch
        compile_s = time.perf_counter() - t0
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:24s} {dt:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return out

    from sara_tpu.ba.core import _jacobians_closed_form

    jcost = jax.jit(lambda pr: ba_cost(pr, 4.0))
    timeit("cost", jcost, prob)

    jjcf = jax.jit(lambda pr: _jacobians_closed_form(pr, 4.0, 6.0))
    timeit("jacobians_closed", jjcf, prob)

    jjac = jax.jit(lambda pr: _jacobians(pr, 4.0, 6.0))
    r, Jc, Jp, _ = timeit("jacobians", jjac, prob)

    jblocks = jax.jit(lambda pr, r_, Jc_, Jp_: _gauss_newton_blocks(
        pr, r_, Jc_, Jp_))
    U, V, Wo, bc, bp = timeit("gn_blocks(segsum)", jblocks, prob, r, Jc, Jp)

    jinv = jax.jit(lambda V_: _inv_blocks(_damp(V_, 1e-3)))
    Vinv = timeit("inv_blocks(V 3x3)", jinv, V)
    jinvU = jax.jit(lambda U_: _inv_blocks(_damp(U_, 1e-3)))
    timeit("inv_blocks(U 6x6)", jinvU, U)

    U_d = _damp(U, 1e-3)

    @jax.jit
    def one_matvec(x, U_d_, Vinv_, Wo_):
        return _schur_matvec(x, U_d_, Vinv_, Wo_, prob.cam_idx, prob.pt_idx,
                             C, P)

    x0 = jnp.ones((C, 6), jnp.float32)
    timeit("schur_matvec x1", one_matvec, x0, U_d, Vinv, Wo)

    @jax.jit
    def matvec15(x, U_d_, Vinv_, Wo_):
        def body(_, xx):
            return _schur_matvec(xx, U_d_, Vinv_, Wo_, prob.cam_idx,
                                 prob.pt_idx, C, P) * 1e-3
        return jax.lax.fori_loop(0, args.cg, body, x)

    timeit(f"schur_matvec x{args.cg}", matvec15, x0, U_d, Vinv, Wo)

    jsolve = jax.jit(functools.partial(_solve_lm, opts=opts),
                     static_argnames=())
    timeit("solve_lm(full)", lambda: jsolve(prob, r, Jc, Jp, None,
                                            jnp.float32(1e-3)))

    from sara_tpu.ba import bundle_adjust

    jba = jax.jit(functools.partial(bundle_adjust, opts=opts))
    timeit("LM iter (full step)", jba, prob)


if __name__ == "__main__":
    main()
