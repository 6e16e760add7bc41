"""Tests for edges / segmentation / level sets / alternative detectors
(cf. reference cpp/test/Sara/ImageProcessing/test_imageprocessing_*_.cpp,
FeatureDetectors harris/hessian/log tests)."""

import jax.numpy as jnp
import numpy as np

from sara_tpu.image.edges import canny, hough_lines, line_segment_endpoints
from sara_tpu.image.segmentation import (
    otsu_threshold, adaptive_threshold, watershed, label_connected_components)
from sara_tpu.image.levelsets import fast_sweeping_distance, signed_distance
from sara_tpu.features.multiscale import (
    compute_log_keypoints, compute_doh_keypoints,
    compute_harris_laplace_keypoints)


def test_canny_finds_step_edge():
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 1.0
    e = np.asarray(canny(jnp.asarray(img)))
    cols = np.nonzero(e.any(axis=0))[0]
    assert len(cols) > 0
    assert np.all(np.abs(cols - 31.5) < 3)
    # Most rows should have the edge.
    assert e.any(axis=1).mean() > 0.8


def test_canny_flat_image_empty():
    img = jnp.full((64, 64), 0.5)
    assert not np.asarray(canny(img)).any()


def test_hough_detects_vertical_line():
    img = np.zeros((64, 64), np.float32)
    img[:, 20:] = 1.0
    e = canny(jnp.asarray(img))
    rho, theta, votes = hough_lines(e, max_lines=4)
    rho, theta, votes = (np.asarray(rho), np.asarray(theta), np.asarray(votes))
    best = np.argmax(votes)
    # Vertical line x ~ 19.5: theta ~ 0, rho ~ 19.5.
    assert abs(theta[best]) < 0.1 or abs(theta[best] - np.pi) < 0.1
    assert abs(abs(rho[best]) - 19.5) < 3.0
    p0, p1, ok = line_segment_endpoints(e, jnp.asarray(rho), jnp.asarray(theta),
                                        jnp.asarray(votes))
    p0, p1 = np.asarray(p0), np.asarray(p1)
    seg_len = np.linalg.norm(p1[best] - p0[best])
    assert seg_len > 50  # spans most of the image height


def test_otsu_bimodal():
    rs = np.random.RandomState(0)
    img = np.concatenate([rs.normal(0.2, 0.02, 500),
                          rs.normal(0.8, 0.02, 500)]).reshape(20, 50)
    thr, mask = otsu_threshold(jnp.asarray(np.clip(img, 0, 1)))
    assert 0.3 < float(thr) < 0.7
    assert 0.4 < np.asarray(mask).mean() < 0.6


def test_adaptive_threshold():
    # Gradient background with small bright blob. OpenCV-style semantics:
    # pixel > local_mean - offset, so a *negative* offset selects only
    # locally-bright structure.
    x = np.linspace(0, 0.5, 64)[None, :] * np.ones((64, 1))
    img = x.copy()
    img[30:34, 30:34] += 0.3
    m = np.asarray(adaptive_threshold(jnp.asarray(img.astype(np.float32)),
                                      radius=8, offset=-0.05))
    assert m[31, 31]
    assert m.mean() < 0.2


def test_connected_components_device():
    mask = np.zeros((32, 32), bool)
    mask[2:8, 2:8] = True
    mask[20:28, 20:28] = True
    lab = np.asarray(label_connected_components(jnp.asarray(mask), iters=32))
    l1 = lab[4, 4]
    l2 = lab[24, 24]
    assert l1 > 0 and l2 > 0 and l1 != l2
    assert (lab[2:8, 2:8] == l1).all()
    assert (lab[~mask] == 0).all()


def test_watershed_two_basins():
    # Relief: two valleys separated by a ridge at x=32.
    xs = np.arange(64, dtype=np.float32)
    relief = np.abs(np.abs(xs - 32.0) - 16.0)[None, :] * np.ones((64, 1)) / 32.0
    markers = np.zeros((64, 64), np.int32)
    markers[32, 16] = 1
    markers[32, 48] = 2
    lab = np.asarray(watershed(jnp.asarray(relief), jnp.asarray(markers)))
    assert lab[32, 10] == 1
    assert lab[32, 54] == 2
    # The two basins stay separated.
    assert (lab[:, :30] != 2).all()
    assert (lab[:, 34:] != 1).all()


def test_fast_sweeping_distance():
    seed = np.zeros((64, 64), bool)
    seed[32, 32] = True
    d = np.asarray(fast_sweeping_distance(jnp.asarray(seed)))
    assert abs(d[32, 32]) < 1e-6
    assert abs(d[32, 42] - 10.0) < 1.0
    assert abs(d[42, 32] - 10.0) < 1.0
    # Diagonal distance close to euclidean (within sweeping accuracy).
    assert abs(d[40, 40] - np.sqrt(128)) < 2.0


def test_signed_distance_signs():
    mask = np.zeros((32, 32), bool)
    mask[8:24, 8:24] = True
    sd = np.asarray(signed_distance(jnp.asarray(mask)))
    assert sd[16, 16] < 0
    assert sd[2, 2] > 0


def _blob_image(h, w, cx, cy, sigma):
    ys, xs = np.mgrid[0:h, 0:w]
    r2 = (xs - cx) ** 2 + (ys - cy) ** 2
    return (1.0 - np.exp(-r2 / (2 * sigma ** 2))).astype(np.float32)


def test_log_detector_finds_blob():
    img = _blob_image(96, 128, 64.0, 48.0, 6.0)
    kp = compute_log_keypoints(jnp.asarray(img))
    m = np.asarray(kp.mask)
    assert m.any()
    xy = np.asarray(kp.xy)[m]
    assert np.min(np.linalg.norm(xy - [64, 48], axis=1)) < 2.0


def test_doh_detector_finds_blob():
    img = _blob_image(96, 128, 40.0, 40.0, 5.0)
    kp = compute_doh_keypoints(jnp.asarray(img))
    m = np.asarray(kp.mask)
    assert m.any()
    xy = np.asarray(kp.xy)[m]
    assert np.min(np.linalg.norm(xy - [40, 40], axis=1)) < 2.0


def test_harris_laplace_finds_corners():
    img = np.zeros((96, 96), np.float32)
    img[32:64, 32:64] = 1.0
    kp = compute_harris_laplace_keypoints(jnp.asarray(img))
    m = np.asarray(kp.mask)
    assert m.any()
    xy = np.asarray(kp.xy)[m]
    corners = np.array([[32, 32], [32, 63], [63, 32], [63, 63]])
    # Harris responses are displaced inward by the integration smoothing
    # (displacement ~ sigma); accept the physically-correct 4 px bound.
    for c in corners:
        assert np.min(np.linalg.norm(xy - c, axis=1)) < 4.0


def test_slic_superpixels(rng):
    from sara_tpu.image.slic import slic

    # Two-tone image: superpixels should not straddle the strong edge much.
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 1.0
    labels, centers = slic(jnp.asarray(img), grid=16, iters=5)
    labels = np.asarray(labels)
    assert labels.shape == (64, 64)
    # Left and right halves should use disjoint label sets away from the edge.
    left = set(np.unique(labels[:, :24]))
    right = set(np.unique(labels[:, 40:]))
    assert not (left & right)
    # Labels are spatially coherent: each label's pixels stay in a small box.
    for l in np.unique(labels):
        ys, xs = np.nonzero(labels == l)
        assert np.ptp(ys) <= 48 and np.ptp(xs) <= 48


def test_edge_chains_and_line_segments():
    """Chain-based LSD on a synthetic polygon image: recovers the drawn
    segments with correct orientations (reference
    LineSegmentDetector.hpp pipeline parity)."""
    import jax.numpy as jnp

    from sara_tpu.image.edge_chains import (LineSegmentParams,
                                            detect_line_segments,
                                            edge_chains,
                                            group_aligned_segments)

    # White rotated square on dark background.
    h, w = 120, 160
    ys, xs = np.mgrid[0:h, 0:w].astype(float)
    c, s = np.cos(0.3), np.sin(0.3)
    xr = c * (xs - 80) + s * (ys - 60)
    yr = -s * (xs - 80) + c * (ys - 60)
    img = ((np.abs(xr) < 40) & (np.abs(yr) < 25)).astype(np.float32)

    chains = edge_chains(jnp.asarray(img))
    assert len(chains) >= 1
    total = sum(len(ch) for ch in chains)
    assert total > 100  # the square's perimeter is ~260 px

    segs = detect_line_segments(jnp.asarray(img),
                                LineSegmentParams(min_length=15.0))
    assert 4 <= len(segs) <= 12, f"{len(segs)} segments"
    # Each segment's direction must be parallel to one of the two square
    # edge orientations.
    d = segs[:, 1] - segs[:, 0]
    ang = np.mod(np.arctan2(d[:, 1], d[:, 0]), np.pi)
    ref = np.array([np.mod(0.3, np.pi), np.mod(0.3 + np.pi / 2, np.pi)])
    err = np.min(np.abs(((ang[:, None] - ref[None]) + np.pi / 2)
                        % np.pi - np.pi / 2), axis=1)
    assert (err < 0.1).all(), f"angles {ang}, errors {err}"

    # Collinear-grouping: split one long edge into two segments -> one
    # group.
    seg_pair = np.array([[[10.0, 10.0], [50.0, 10.0]],
                         [[55.0, 10.5], [90.0, 10.5]],
                         [[10.0, 60.0], [10.0, 90.0]]])
    labels = group_aligned_segments(seg_pair, dist_threshold=10.0)
    assert labels[0] == labels[1] and labels[2] != labels[0]


def test_edge_chain_ordering_is_a_path():
    """Chain points must be ordered: consecutive points are 8-adjacent."""
    import jax.numpy as jnp

    from sara_tpu.image.edge_chains import edge_chains

    h, w = 64, 96
    img = np.zeros((h, w), np.float32)
    img[20:44, 30:70] = 1.0  # axis-aligned rectangle
    chains = edge_chains(jnp.asarray(img))
    assert chains
    for ch in chains:
        steps = np.abs(np.diff(ch, axis=0))
        assert (steps.max(axis=1) <= 1.5).all()


def test_line_segments_on_real_image():
    """Chain-based LSD on the reference's real edge test image
    (data/sift_edge.jpg — a picture with strong straight structures)."""
    import PIL.Image
    import jax.numpy as jnp

    from sara_tpu.image.edge_chains import (LineSegmentParams,
                                            detect_line_segments)

    img = PIL.Image.open("/root/reference/data/sift_edge.jpg").convert("L")
    a = np.asarray(img, np.float32) / 255.0
    segs = detect_line_segments(jnp.asarray(a),
                                LineSegmentParams(min_length=20.0))
    assert len(segs) >= 5
    lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
    assert lengths.max() > 50  # the dominant long edges are recovered
