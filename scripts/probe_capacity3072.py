"""Verify the fo=-1 capacity-3072 SIFT program on the real TPU.

Round 2 this exact configuration reproducibly crashed the TPU worker
("kernel fault"); every lax.top_k now routes through
ops.topk.chunked_top_k (k<=1024 passes). This probe runs the single-frame
program AND the batched two-view program at the new defaults, plus one
estimate_relative_pose call (the round-3 R,t-gate change) on real pixels.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import PIL.Image

    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.matching import MatchParams, match_descriptors

    print("backend:", jax.default_backend(), flush=True)

    def load(p, w=640, h=480):
        img = PIL.Image.open(p).convert("L").resize((w, h))
        return np.asarray(img, np.float32) / 255.0

    a = load("/root/reference/data/sunflowerField.jpg")
    b = load("/root/reference/data/dog.jpg")

    params = SIFTParams()
    print("capacity:", params.dog.capacity, "total:", params.total_capacity,
          flush=True)

    t0 = time.perf_counter()
    ka = compute_sift_keypoints(jnp.asarray(a), params)
    n_a = int(ka.count())  # host fetch = honest sync
    print(f"frame A: {n_a} kp  ({time.perf_counter()-t0:.1f}s incl compile)",
          flush=True)
    t0 = time.perf_counter()
    kb = compute_sift_keypoints(jnp.asarray(b), params)
    n_b = int(kb.count())
    print(f"frame B: {n_b} kp  ({time.perf_counter()-t0:.1f}s)", flush=True)

    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    print("matches:", int(m.count()), flush=True)

    # Warm re-run timing (3 iters, honest sync).
    t0 = time.perf_counter()
    for _ in range(3):
        ka = compute_sift_keypoints(jnp.asarray(a), params)
        n_a = int(ka.count())
    dt = (time.perf_counter() - t0) / 3
    print(f"single-frame warm: {dt*1e3:.0f} ms", flush=True)

    # Relative pose on a known shift (drives the polished-R,t gate on TPU).
    from sara_tpu.ransac.estimators import estimate_relative_pose

    rs = np.random.RandomState(0)
    n = 300
    X = rs.randn(n, 3) + np.array([0, 0, 5.0])
    R_gt = np.eye(3)
    t_gt = np.array([0.5, 0.0, 0.0])
    u = X[:, :2] / X[:, 2:]
    X2 = X @ R_gt.T + t_gt
    v = X2[:, :2] / X2[:, 2:]
    key = jax.random.PRNGKey(0)
    res, R, t = estimate_relative_pose(
        key, jnp.asarray(u), jnp.asarray(v), jnp.ones((n,), bool),
        jnp.eye(3), jnp.eye(3), threshold_px=0.01, min_inliers=50)
    t_est = np.asarray(t)
    t_est = t_est / np.linalg.norm(t_est)
    terr = np.degrees(np.arccos(np.clip(abs(np.dot(
        t_est, t_gt / np.linalg.norm(t_gt))), -1, 1)))
    rerr = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(R).T @ R_gt) - 1) / 2, -1, 1)))
    print(f"relative pose: inliers {int(res.num_inliers)}/{n}, "
          f"Rerr {rerr:.3f} deg, terr {terr:.3f} deg", flush=True)
    assert int(res.num_inliers) > 0.9 * n and rerr < 0.5 and terr < 1.0
    print("OK", flush=True)


if __name__ == "__main__":
    main()
