"""Per-stage VO timing probe on the current backend (honest sync via host
fetches; every number includes the ~27 ms dispatch+fetch RTT of the axon
tunnel). Isolates: SIFT frontend, descriptor matching, E-RANSAC (the
5-point program), PnP RANSAC, triangulation.

Usage: python scripts/probe_vo_stages.py [--cpu] [--hw 240x320]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def timeit(fn, n=5):
    fn()  # compile/warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hw", default="240x320")
    ap.add_argument("--samples", type=int, default=300)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from render3d import make_room, render
    from sara_tpu.features import compute_sift_keypoints
    from sara_tpu.matching import MatchParams, match_descriptors
    from sara_tpu.ransac import estimate_absolute_pose, estimate_relative_pose
    from sara_tpu.mvg import triangulate_linear
    from sara_tpu.sfm.odometry import OdometryConfig

    h, w = map(int, args.hw.split("x"))
    K = np.array([[0.8 * w, 0, w / 2.0], [0, 0.8 * w, h / 2.0], [0, 0, 1.0]])
    planes = make_room(seed=1)
    imgs = [jnp.asarray(render(planes, K, np.eye(3),
                               np.array([0.05 * i, 0, 0.1 * i])))
            for i in range(2)]
    sp = OdometryConfig().sift

    kp0 = compute_sift_keypoints(imgs[0], sp)
    kp1 = compute_sift_keypoints(imgs[1], sp)
    t_sift = timeit(lambda: float(
        compute_sift_keypoints(imgs[1], sp).xy.sum()))
    print(f"SIFT frontend: {t_sift*1e3:.1f} ms "
          f"({int(kp1.count())} kp)", flush=True)

    mp = MatchParams(ratio=0.8)
    m = match_descriptors(kp0, kp1, mp)
    t_match = timeit(lambda: float(
        match_descriptors(kp0, kp1, mp).score.sum()))
    print(f"matching: {t_match*1e3:.1f} ms ({int(m.count())})", flush=True)

    key = jax.random.PRNGKey(0)
    Kj = jnp.asarray(K)
    v = kp1.xy[m.j]

    def erans():
        res, R, t = estimate_relative_pose(
            key, kp0.xy, v, m.mask, Kj, Kj, threshold_px=4.0,
            num_samples=args.samples, min_inliers=40)
        return float(res.inliers.sum())

    erans()
    t_e = timeit(erans)
    print(f"E-RANSAC ({args.samples} samples): {t_e*1e3:.1f} ms", flush=True)

    # PnP on synthetic 3-D points.
    rs = np.random.RandomState(0)
    P = 512
    X = rs.uniform(-2, 2, (P, 3)) + np.array([0, 0, 6.0])
    uvp = (X @ K.T)
    uvp = uvp[:, :2] / uvp[:, 2:]
    rays = np.concatenate([uvp, np.ones((P, 1))], axis=1) @ np.linalg.inv(K).T
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    mask = jnp.ones(P, bool)

    def pnp():
        res, R, t = estimate_absolute_pose(
            key, jnp.asarray(X), jnp.asarray(rays), jnp.asarray(uvp), Kj,
            mask, threshold_px=5.0, num_samples=args.samples, min_inliers=20)
        return float(res.inliers.sum())

    pnp()
    t_p = timeit(pnp)
    print(f"PnP RANSAC ({args.samples} samples): {t_p*1e3:.1f} ms", flush=True)

    R = np.eye(3)
    t = np.array([0.5, 0.0, 0.0])
    ra = jnp.asarray(rays)

    def tri():
        X3, d1, d2 = triangulate_linear(jnp.asarray(R), jnp.asarray(t),
                                        ra, ra)
        return float(X3.sum())

    tri()
    t_t = timeit(tri)
    print(f"triangulation ({P} rays): {t_t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
