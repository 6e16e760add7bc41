"""Bundle-adjustment scale benchmark (BASELINE config 4 flavor).

Measures LM iterations/s of the Schur-complement bundle adjuster on
synthetic problems of increasing size (cameras/points/observations) on the
available device. Honest timing: fetches the final cost per measurement
(this platform's block_until_ready is unreliable — NOTES.md).

Usage: python scripts/bench_ba.py [--cpu] [--sizes small,medium,large]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = {
    "small": dict(C=16, P=2_000, O=16_000),
    "medium": dict(C=64, P=20_000, O=160_000),
    "large": dict(C=256, P=100_000, O=800_000),
    "xl": dict(C=512, P=300_000, O=2_400_000),
}


def make_problem(C, P, O, seed=0):
    import jax.numpy as jnp

    from sara_tpu.ba import BAProblem

    rs = np.random.RandomState(seed)
    X = rs.uniform(-10, 10, (P, 3)) + np.array([0, 0, 30.0])
    intr = np.array([800.0, 800.0, 512.0, 384.0])
    poses = np.zeros((C, 6))
    poses[:, 3] = np.linspace(0, 10.0, C)
    poses[:, :3] = rs.normal(scale=0.01, size=(C, 3))
    cam_idx = rs.randint(0, C, O).astype(np.int32)
    pt_idx = rs.randint(0, P, O).astype(np.int32)

    from scipy.spatial.transform import Rotation

    Rm = Rotation.from_rotvec(poses[:, :3]).as_matrix()
    Xc = np.einsum("oij,oj->oi", Rm[cam_idx], X[pt_idx]) + poses[cam_idx, 3:]
    z = np.clip(Xc[:, 2], 1.0, None)
    uv = np.stack([intr[0] * Xc[:, 0] / z + intr[2],
                   intr[1] * Xc[:, 1] / z + intr[3]], axis=1)
    uv += rs.normal(scale=0.5, size=uv.shape)
    pose_fixed = np.zeros(C, bool)
    pose_fixed[0] = True
    return BAProblem(
        poses=jnp.asarray(poses + np.concatenate(
            [np.zeros((1, 6)), rs.normal(scale=2e-3, size=(C - 1, 6))])),
        points=jnp.asarray(X + rs.normal(scale=5e-2, size=X.shape)),
        intrinsics=jnp.asarray(intr),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv),
        obs_mask=jnp.ones(O, bool),
        pose_fixed=jnp.asarray(pose_fixed),
        point_fixed=jnp.zeros(P, bool),
    )


def scipy_anchor(prob, opts, max_nfev=12):
    """External CPU LM anchor: scipy.optimize.least_squares (TRF + LSMR,
    Huber loss, analytic sparse Jacobian) on the SAME problem — the
    denominator for the TPU LM-iters/s claim (the reference's budget is
    Ceres DENSE_SCHUR, BundleAdjuster.cpp:218-219; Ceres isn't installable
    here, scipy's sparse TRF is the standard Python equivalent).

    Returns a dict with wall time, evaluations, and final trimmed-Huber
    cost measured by OUR ba_cost for convergence parity."""
    import jax
    import jax.numpy as jnp
    from scipy.optimize import least_squares
    from scipy.sparse import coo_matrix

    from sara_tpu.ba import ba_cost
    from sara_tpu.ba.jacobian import pinhole_jacobians_gathered

    cam = np.asarray(prob.cam_idx)
    pt = np.asarray(prob.pt_idx)
    uv = jnp.asarray(prob.uv)
    intr = jnp.asarray(prob.intrinsics)
    C = int(prob.poses.shape[0])
    P = int(prob.points.shape[0])
    O = len(cam)
    pose0 = np.asarray(prob.poses)[0]
    delta = opts.huber_delta

    @jax.jit
    def rj(poses, points):
        pc = poses[jnp.asarray(cam)]
        return pinhole_jacobians_gathered(
            pc[:, :3], pc[:, 3:], points[jnp.asarray(pt)], intr, uv)

    def unpack(x):
        poses = np.concatenate(
            [pose0[None], x[:6 * (C - 1)].reshape(C - 1, 6)])
        points = x[6 * (C - 1):].reshape(P, 3)
        return jnp.asarray(poses), jnp.asarray(points)

    def fun(x):
        r, _, _ = rj(*unpack(x))
        return np.asarray(r, np.float64).ravel()

    # Static sparsity pattern: rows 2o/2o+1; cols 6 per (free) camera + 3
    # per point.
    free_cam = cam >= 1
    rows_c = np.repeat(2 * np.arange(O)[free_cam], 6)
    cols_c6 = (6 * (cam[free_cam] - 1))[:, None] + np.arange(6)[None, :]
    rows_p = np.repeat(2 * np.arange(O), 3)
    cols_p3 = (6 * (C - 1) + 3 * pt)[:, None] + np.arange(3)[None, :]
    rows = np.concatenate([rows_c, rows_c + 1, rows_p, rows_p + 1])
    cols = np.concatenate([cols_c6.ravel(), cols_c6.ravel(),
                           cols_p3.ravel(), cols_p3.ravel()])
    n_params = 6 * (C - 1) + 3 * P

    def jac(x):
        _, Jcf, Jpf = rj(*unpack(x))
        Jcf = np.asarray(Jcf, np.float64)
        Jpf = np.asarray(Jpf, np.float64)
        data = np.concatenate([
            Jcf[free_cam, :6].ravel(), Jcf[free_cam, 6:].ravel(),
            Jpf[:, :3].ravel(), Jpf[:, 3:].ravel()])
        return coo_matrix((data, (rows, cols)),
                          shape=(2 * O, n_params)).tocsr()

    x0 = np.concatenate([np.asarray(prob.poses)[1:].ravel(),
                         np.asarray(prob.points).ravel()])
    fun(x0), jac(x0)  # compile/warm outside the timed region
    t0 = time.perf_counter()
    res = least_squares(fun, x0, jac=jac, method="trf", loss="huber",
                        f_scale=delta, max_nfev=max_nfev, tr_solver="lsmr",
                        verbose=0)  # x_scale='jac' measured WORSE here
                                    # (3 evals, cost barely moved)
    wall = time.perf_counter() - t0
    poses_f, points_f = unpack(res.x)
    final = float(ba_cost(prob._replace(poses=poses_f, points=points_f),
                          opts.huber_delta, opts.outlier_cutoff))
    return {"wall_s": wall, "nfev": int(res.njev or res.nfev),
            "s_per_jac_eval": wall / max(int(res.njev or res.nfev), 1),
            "final_cost_ours": final, "scipy_cost": float(res.cost),
            "status": int(res.status)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", default="small,medium")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cg", type=int, default=15)
    ap.add_argument("--solvers", default="dense,cg",
                    help="comma list: dense (explicit Schur direct), cg "
                    "(matrix-free Schur+PCG) — same-process A/B")
    ap.add_argument("--json", default="",
                    help="write per-size results to this JSON file")
    ap.add_argument("--scipy-anchor", action="store_true",
                    help="also run the external scipy TRF+LSMR anchor on "
                    "each size (CPU; slow at large sizes)")
    ap.add_argument("--anchor-nfev", type=int, default=12)
    ap.add_argument("--mesh", action="store_true",
                    help="also measure sharded-BA times over 1/2/4/8 "
                    "devices (virtual CPU mesh: a thread-level parallel "
                    "proxy, not real-chip ICI scaling)")
    args = ap.parse_args()

    import jax

    if args.cpu or args.mesh:
        # The virtual multi-device mesh only exists on the CPU backend.
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")

    from sara_tpu.ba import BAOptions, bundle_adjust

    results = {}
    for name in args.sizes.split(","):
        cfg = SIZES[name]
        prob = make_problem(**cfg)
        results[name] = dict(cfg)
        for solver in filter(None, args.solvers.split(",")):
            opts = BAOptions(max_iters=args.iters, cg_iters=args.cg,
                             solver=solver)
            t0 = time.perf_counter()
            out, info = bundle_adjust(prob, opts)
            c = float(info["final_cost"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out, info = bundle_adjust(prob, opts)
            c = float(info["final_cost"])
            run_s = time.perf_counter() - t0
            ips = args.iters / run_s
            print(f"{name}[{solver}]: C={cfg['C']} P={cfg['P']} "
                  f"O={cfg['O']}  compile+1st={compile_s:.1f}s  "
                  f"run={run_s*1e3:.0f}ms  {ips:.2f} LM iters/s  "
                  f"cost {float(info['initial_cost']):.1f}->{c:.1f}",
                  flush=True)
            from sara_tpu.utils.roofline import ba_lm_iteration, report

            est = ba_lm_iteration(cfg["C"], cfg["P"], cfg["O"], args.cg)
            tag = ("" if jax.default_backend() == "tpu"
                   else "  [TPU-peak roofline; CPU run — reference only]")
            print("  " + report(f"{name}/LM-iter", est, run_s / args.iters)
                  + tag, flush=True)
            results[name][solver] = {
                "lm_iters_per_s": ips, "ms_per_lm_iter": run_s * 1e3 / args.iters,
                "compile_s": compile_s, "final_cost": c,
                "initial_cost": float(info["initial_cost"]),
                "roofline_frac": est.roofline_seconds() / (run_s / args.iters),
            }
            if solver == "dense":
                # Device-resident measurement: the end-to-end number above
                # re-packs on the host and re-ships ~24 MB through this
                # runtime's ~30 MB/s tunnel EVERY call — a measurement
                # artifact (PCIe on real hardware moves it in ~2 ms). Time
                # the solver itself on pre-packed device-resident strata,
                # exactly how the CG number is taken (its BAProblem arrays
                # are already device-resident).
                from sara_tpu.ba.dense_schur import (
                    dense_schur_bundle_adjust_strata, pack_pt_major_strata)

                strata, _ids, st = pack_pt_major_strata(
                    prob, chunk=opts.dense_chunk)
                Qs = tuple(st["chunks"])
                _, _, inf0 = dense_schur_bundle_adjust_strata(
                    tuple(strata), opts, Qs)
                float(inf0["final_cost"])
                t0 = time.perf_counter()
                _, _, inf1 = dense_schur_bundle_adjust_strata(
                    tuple(strata), opts, Qs)
                float(inf1["final_cost"])
                dev_s = time.perf_counter() - t0
                print(f"{name}[dense/device-resident]: "
                      f"run={dev_s*1e3:.0f}ms  "
                      f"{args.iters/dev_s:.2f} LM iters/s", flush=True)
                results[name]["dense_device"] = {
                    "lm_iters_per_s": args.iters / dev_s,
                    "ms_per_lm_iter": dev_s * 1e3 / args.iters,
                }
                # Production end-to-end path: DenseSchurSession packs ONCE;
                # a re-solve (fresh pose/point VALUES, resident layout) is
                # the steady-state cost of windowed/restarted BA.
                from sara_tpu.ba import DenseSchurSession

                sess = DenseSchurSession(prob, opts)
                _, _, i0 = sess.solve(poses=prob.poses, points=prob.points)
                float(i0["final_cost"])
                t0 = time.perf_counter()
                _, _, i1 = sess.solve(poses=prob.poses, points=prob.points)
                float(i1["final_cost"])
                sess_s = time.perf_counter() - t0
                print(f"{name}[dense/session-resolve]: "
                      f"run={sess_s*1e3:.0f}ms  "
                      f"{args.iters/sess_s:.2f} LM iters/s "
                      f"({sess_s/dev_s:.2f}x device-resident)", flush=True)
                results[name]["dense_session"] = {
                    "lm_iters_per_s": args.iters / sess_s,
                    "ms_per_lm_iter": sess_s * 1e3 / args.iters,
                    "vs_device_resident": sess_s / dev_s,
                }
        if args.scipy_anchor:
            opts_a = BAOptions(max_iters=args.iters)
            a = scipy_anchor(prob, opts_a, max_nfev=args.anchor_nfev)
            print(f"{name}[scipy-anchor trf+lsmr]: wall={a['wall_s']:.1f}s "
                  f"({a['s_per_jac_eval']*1e3:.0f} ms/jac-eval, "
                  f"{a['nfev']} evals)  our-cost {a['final_cost_ours']:.1f}",
                  flush=True)
            results[name]["scipy_anchor"] = a

    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "lm_iters": args.iters, "cg_iters": args.cg,
                       "results": results}, f, indent=1)
        print("wrote", args.json, flush=True)

    if args.mesh:
        from sara_tpu.parallel import (BACommModel,
                                       distributed_bundle_adjust,
                                       make_mesh)

        base = None
        for n in (1, 2, 4, 8):
            if n > jax.device_count():
                break
            print("  " + BACommModel(cfg["C"], cfg["P"], cfg["O"],
                                     args.cg, n).report(), flush=True)
            mesh = make_mesh(n)
            t0 = time.perf_counter()
            out, info = distributed_bundle_adjust(prob, mesh, opts)
            float(info["final_cost"])
            _ = time.perf_counter() - t0
            t0 = time.perf_counter()
            out, info = distributed_bundle_adjust(prob, mesh, opts)
            float(info["final_cost"])
            dt = time.perf_counter() - t0
            base = base or dt
            print(f"  mesh n={n}: {dt*1e3:.0f} ms  "
                  f"speedup {base/dt:.2f}x  "
                  f"efficiency {base/dt/n*100:.0f}%", flush=True)


if __name__ == "__main__":
    main()
