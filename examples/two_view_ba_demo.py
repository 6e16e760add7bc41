"""Two-view reconstruction + bundle adjustment demo.

Rebuild of the reference's two-view BA example
(reference: cpp/examples/Sara/MultiViewGeometry/
two_view_bundle_adjustment_example.cpp:77-120+, call stack SURVEY.md §3.4):
SIFT on both images -> match -> essential RANSAC -> cheiral triangulation ->
two-view bundle adjustment -> PLY export.

Works on any image pair; defaults to a synthetically warped copy of the
bundled dog.jpg so structure is recoverable without a real stereo pair.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", default=None)
    ap.add_argument("--right", default=None)
    ap.add_argument("--f", type=float, default=600.0)
    ap.add_argument("--out", default="/tmp/sara_tpu_two_view_ba")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--self-calibrate", action="store_true",
                    help="perturb the intrinsics 5%% and let BA recover "
                    "them (intr_free; reference packs intrinsics as "
                    "parameters, BundleAdjuster.cpp:162-210)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sara_tpu.ba import BAOptions, BAProblem, bundle_adjust
    from sara_tpu.core import lie
    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.io.image import imread_gray
    from sara_tpu.matching import MatchParams, match_descriptors
    from sara_tpu.ransac import estimate_relative_pose
    from sara_tpu.sfm.pointcloud import PointCloudGenerator

    os.makedirs(args.out, exist_ok=True)

    if args.left and args.right:
        a = imread_gray(args.left)
        b = imread_gray(args.right)
    else:
        from sara_tpu.io.datasets import load_image_pair

        a, _ = load_image_pair(max_width=640)
        # Synthetic second view: small projective warp of the first.
        from sara_tpu.image import warp_homography

        H, W = a.shape
        Hm = np.array([[1.02, 0.02, -8.0], [-0.015, 1.01, 5.0],
                       [1e-5, -2e-5, 1.0]])
        b = np.asarray(warp_homography(jnp.asarray(a),
                                       jnp.asarray(np.linalg.inv(Hm)), H, W))

    h, w = a.shape
    K = np.array([[args.f, 0, w / 2], [0, args.f, h / 2], [0, 0, 1.0]])

    ka = compute_sift_keypoints(jnp.asarray(a), SIFTParams())
    kb = compute_sift_keypoints(jnp.asarray(b), SIFTParams())
    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    print(f"keypoints {int(ka.count())}/{int(kb.count())}, "
          f"matches {int(m.count())}")

    res, R, t = estimate_relative_pose(
        jax.random.PRNGKey(0), ka.xy, kb.xy[m.j], m.mask,
        jnp.asarray(K), jnp.asarray(K), threshold_px=4.0,
        num_samples=1000, min_inliers=50)
    print(f"relative pose inliers: {int(res.num_inliers)} "
          f"(success={bool(res.success)})")
    if not bool(res.success):
        return

    # Triangulate inliers with |t| = 1.
    from sara_tpu.mvg import triangulate_linear

    inl = np.asarray(res.inliers)
    Ki = np.linalg.inv(K)
    ua = np.asarray(ka.xy)[inl]
    ub = np.asarray(kb.xy)[np.asarray(m.j)[inl]]

    def rays(p):
        ph = np.concatenate([p, np.ones((len(p), 1))], axis=1) @ Ki.T
        return ph

    R = np.asarray(R)
    t = np.asarray(t)
    X, d1, d2 = triangulate_linear(jnp.asarray(R), jnp.asarray(t),
                                   jnp.asarray(rays(ua)), jnp.asarray(rays(ub)))
    X = np.asarray(X)
    keep = (np.asarray(d1) > 0) & (np.asarray(d2) > 0) & \
        np.isfinite(X).all(axis=1)
    X, ua, ub = X[keep], ua[keep], ub[keep]
    print(f"triangulated {len(X)} cheiral points")

    # Two-view bundle adjustment (first camera frozen as gauge).
    n = len(X)
    poses = np.zeros((2, 6))
    poses[1, :3] = np.asarray(lie.so3_log(jnp.asarray(R)))
    poses[1, 3:] = t
    intr_true = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    intr0 = intr_true.copy()
    intr_free = None
    if args.self_calibrate:
        intr0 = intr_true * np.array([1.05, 1.05, 0.97, 1.03])
        intr_free = jnp.ones(4, bool)
        print(f"perturbed intrinsics: {intr0}")
    # Monocular two-view gauge: pose 0 fixed + the largest translation
    # component of pose 1 (7th dof).
    pf = np.zeros((2, 6), bool)
    pf[0] = True
    pf[1, 3 + int(np.argmax(np.abs(poses[1, 3:])))] = True
    prob = BAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(X),
        intrinsics=jnp.asarray(intr0),
        cam_idx=jnp.asarray(np.r_[np.zeros(n, np.int32), np.ones(n, np.int32)]),
        pt_idx=jnp.asarray(np.r_[np.arange(n, dtype=np.int32),
                                 np.arange(n, dtype=np.int32)]),
        uv=jnp.asarray(np.concatenate([ua, ub])),
        obs_mask=jnp.ones(2 * n, bool),
        pose_fixed=jnp.asarray(pf),
        point_fixed=jnp.zeros(n, bool),
        intr_free=intr_free,
    )
    out, info = bundle_adjust(prob, BAOptions(max_iters=60))
    rms0 = float(np.sqrt(2 * info["initial_cost"] / (2 * n)))
    rms1 = float(np.sqrt(2 * info["final_cost"] / (2 * n)))
    print(f"BA reprojection RMS: {rms0:.3f} -> {rms1:.3f} px")
    if args.self_calibrate:
        rec = np.asarray(out.intrinsics)
        err = np.abs(rec - intr_true) / np.maximum(np.abs(intr_true), 1)
        print(f"recovered intrinsics: {rec} "
              f"(rel err {np.round(100 * err, 2)} %)")
        if args.left is None:
            print("note: the default pair is a PLANAR warp — two views of "
                  "a plane leave parts of the intrinsics unobservable "
                  "(use a real 3-D pair, or see test_ba_recovers_"
                  "intrinsics for the multi-view recovery gate)")

    pc = PointCloudGenerator()
    pc.add_points(range(len(out.points)), np.asarray(out.points))
    pc.write_ply(os.path.join(args.out, "two_view.ply"))
    print(f"wrote {os.path.join(args.out, 'two_view.ply')}")


if __name__ == "__main__":
    main()
