"""Detection/matching quality harness: sara-tpu SIFT vs OpenCV SIFT.

Measures, on the bundled image + a known homography warp:
  - keypoint counts (ours vs OpenCV) on the same image;
  - repeatability: fraction of keypoints in the warped image that land
    within eps px of a projected keypoint from the source image;
  - match recall: descriptor matches that are homography-consistent (<3 px)
    per detected correspondence opportunity, ours vs OpenCV.

This is the quality gate VERDICT round 1 asked for ("a 10x speedup at 1/3
the recall is not matching-or-beating"); the reference's own benchmark
pattern is python/oddkiva/sara/pybind11/benchmark/sift_opencv_impl.py.

Runs on CPU (JAX CPU backend) so it can iterate fast; bench.py reuses the
same metric functions on TPU.

Usage: python scripts/eval_detection_quality.py [--first-octave -1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_image(path="/root/reference/data/sunflowerField.jpg", h=480, w=640):
    import PIL.Image

    img = PIL.Image.open(path).convert("L").resize((w, h))
    return np.asarray(img, np.float32) / 255.0


def make_warp(h, w, angle_deg=12.0, scale=0.9, tx=20.0, ty=-12.0):
    """Similarity homography about the image center (3x3, maps src->dst)."""
    c, s = np.cos(np.deg2rad(angle_deg)), np.sin(np.deg2rad(angle_deg))
    cx, cy = w / 2.0, h / 2.0
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
    R = np.array([[scale * c, -scale * s, tx], [scale * s, scale * c, ty],
                  [0, 0, 1]], np.float64)
    T2 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], np.float64)
    return T2 @ R @ T1


def warp_image(img, H):
    import cv2

    h, w = img.shape
    return cv2.warpPerspective(img, H.astype(np.float64), (w, h),
                               flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REFLECT)


def project(H, xy):
    p = np.concatenate([xy, np.ones((len(xy), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def interior_mask(xy, h, w, b=10):
    return ((xy[:, 0] >= b) & (xy[:, 0] < w - b) &
            (xy[:, 1] >= b) & (xy[:, 1] < h - b))


def repeatability(xy_a, xy_b, H, h, w, eps=2.0):
    """Fraction of projected source kps (landing inside the warped image)
    with a detection within eps px. Symmetrized would double cost; one
    direction suffices for a comparison metric."""
    pa = project(H, xy_a)
    keep = interior_mask(pa, h, w)
    pa = pa[keep]
    if len(pa) == 0 or len(xy_b) == 0:
        return 0.0, 0
    d2 = ((pa[:, None, :] - xy_b[None, :, :]) ** 2).sum(-1)
    return float((d2.min(axis=1) <= eps * eps).mean()), len(pa)


def match_quality(xy_a, xy_b, matches_ab, H, eps=3.0):
    """matches_ab: (M, 2) index pairs. Returns (n_correct, n_matches)."""
    if len(matches_ab) == 0:
        return 0, 0
    pa = project(H, xy_a[matches_ab[:, 0]])
    err = np.linalg.norm(pa - xy_b[matches_ab[:, 1]], axis=1)
    return int((err <= eps).sum()), len(matches_ab)


def run_ours(img_a, img_b, first_octave, total_capacity, octave_capacity,
             orientation_downsample=0):
    import dataclasses

    import jax.numpy as jnp

    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.features.api import SIFTParams as SP
    from sara_tpu.features.dog import DoGParams
    from sara_tpu.image.pyramid import PyramidParams
    from sara_tpu.matching import MatchParams, match_descriptors

    params = SIFTParams(
        pyramid=PyramidParams(first_octave=first_octave),
        dog=DoGParams(capacity=octave_capacity),
        total_capacity=total_capacity,
        orientation_downsample=orientation_downsample,
    )
    t0 = time.perf_counter()
    ka = compute_sift_keypoints(jnp.asarray(img_a), params)
    kb = compute_sift_keypoints(jnp.asarray(img_b), params)
    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    t1 = time.perf_counter()

    def unpack(k):
        mask = np.asarray(k.mask)
        return np.asarray(k.xy)[mask], np.asarray(k.scale)[mask]

    xy_a, s_a = unpack(ka)
    xy_b, s_b = unpack(kb)
    mmask = np.asarray(m.mask)
    mi = np.asarray(m.i)[mmask]
    mj = np.asarray(m.j)[mmask]
    # Remap match indices (into capacity slots) to compacted arrays.
    remap_a = np.cumsum(np.asarray(ka.mask)) - 1
    remap_b = np.cumsum(np.asarray(kb.mask)) - 1
    pairs = np.stack([remap_a[mi], remap_b[mj]], axis=1)
    return xy_a, xy_b, pairs, t1 - t0


def run_opencv(img_a, img_b):
    import cv2

    a8 = (img_a * 255).astype(np.uint8)
    b8 = (img_b * 255).astype(np.uint8)
    sift = cv2.SIFT_create()
    t0 = time.perf_counter()
    ka, da = sift.detectAndCompute(a8, None)
    kb, db = sift.detectAndCompute(b8, None)
    bf = cv2.BFMatcher()
    knn = bf.knnMatch(da, db, k=2)
    good = [m for m, n in knn if m.distance < 0.8 * n.distance]
    t1 = time.perf_counter()
    xy_a = np.array([k.pt for k in ka], np.float64).reshape(-1, 2)
    xy_b = np.array([k.pt for k in kb], np.float64).reshape(-1, 2)
    pairs = np.array([[m.queryIdx, m.trainIdx] for m in good],
                     np.int64).reshape(-1, 2)
    return xy_a, xy_b, pairs, t1 - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--first-octave", type=int, default=-1)
    ap.add_argument("--total-capacity", type=int, default=8192)
    ap.add_argument("--octave-capacity", type=int, default=4096)
    ap.add_argument("--image", default="/root/reference/data/sunflowerField.jpg")
    ap.add_argument("--orientation-downsample", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    img = load_image(args.image)
    h, w = img.shape
    H = make_warp(h, w)
    warped = warp_image(img, H)

    ocv = run_opencv(img, warped)
    rep_cv, n_cv = repeatability(ocv[0], ocv[1], H, h, w)
    cor_cv, m_cv = match_quality(ocv[0], ocv[1], ocv[2], H)
    log(f"opencv: kp {len(ocv[0])}/{len(ocv[1])} t={ocv[3]:.2f}s "
        f"repeatability {rep_cv:.3f} ({n_cv} projected) "
        f"matches {m_cv} correct {cor_cv}")

    ours = run_ours(img, warped, args.first_octave, args.total_capacity,
                    args.octave_capacity, args.orientation_downsample)
    rep, n = repeatability(ours[0], ours[1], H, h, w)
    cor, m = match_quality(ours[0], ours[1], ours[2], H)
    log(f"ours(fo={args.first_octave}): kp {len(ours[0])}/{len(ours[1])} "
        f"t={ours[3]:.2f}s repeatability {rep:.3f} ({n} projected) "
        f"matches {m} correct {cor}")
    log(f"kp ratio {len(ours[0]) / max(len(ocv[0]), 1):.2f}  "
        f"correct-match ratio {cor / max(cor_cv, 1):.2f}")


if __name__ == "__main__":
    main()
