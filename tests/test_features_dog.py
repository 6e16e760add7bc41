"""DoG detector tests with synthetic blobs (cf. reference
cpp/test/Sara/FeatureDetectors/test_featuredetectors_dog.cpp)."""

import jax.numpy as jnp
import numpy as np

from sara_tpu.features import DoGParams, detect_dog_octave, compute_sift_keypoints, SIFTParams
from sara_tpu.image import gaussian_pyramid, dog_pyramid, PyramidParams


def _blob_image(h, w, cx, cy, sigma):
    """Dark Gaussian blob on bright background -> DoG minimum at (cx, cy)."""
    ys, xs = np.mgrid[0:h, 0:w]
    r2 = (xs - cx) ** 2 + (ys - cy) ** 2
    return (1.0 - np.exp(-r2 / (2 * sigma ** 2))).astype(np.float32)


def test_single_blob_detected():
    img = _blob_image(96, 128, 64.0, 48.0, 6.0)
    gp = gaussian_pyramid(jnp.asarray(img), PyramidParams())
    dg = dog_pyramid(gp)
    found = False
    for oct_idx, dog in enumerate(dg.octaves):
        det = detect_dog_octave(dog, DoGParams(capacity=64))
        m = np.asarray(det["mask"])
        if not m.any():
            continue
        xs = np.asarray(det["x"])[m] * gp.octave_scales[oct_idx]
        ys = np.asarray(det["y"])[m] * gp.octave_scales[oct_idx]
        d = np.sqrt((xs - 64.0) ** 2 + (ys - 48.0) ** 2)
        if (d < 2.0).any():
            found = True
    assert found, "blob center not detected in any octave"


def test_subpixel_accuracy():
    """Off-grid blob center must be recovered to sub-pixel accuracy."""
    cx, cy = 64.4, 47.7
    img = _blob_image(96, 128, cx, cy, 5.0)
    kp = compute_sift_keypoints(jnp.asarray(img), SIFTParams())
    m = np.asarray(kp.mask)
    assert m.any()
    xy = np.asarray(kp.xy)[m]
    d = np.linalg.norm(xy - np.array([cx, cy]), axis=-1)
    assert d.min() < 0.5, f"best distance {d.min()}"


def test_no_detections_on_flat_image():
    img = jnp.full((96, 128), 0.5, jnp.float32)
    kp = compute_sift_keypoints(img, SIFTParams())
    assert int(kp.count()) == 0


def test_scale_estimate():
    """Detected characteristic scale tracks the blob size."""
    img = _blob_image(128, 128, 64.0, 64.0, 8.0)
    kp = compute_sift_keypoints(jnp.asarray(img), SIFTParams())
    m = np.asarray(kp.mask)
    xy = np.asarray(kp.xy)[m]
    sc = np.asarray(kp.scale)[m]
    d = np.linalg.norm(xy - np.array([64.0, 64.0]), axis=-1)
    best = np.argmin(d)
    # DoG response peaks at sigma ~ blob sigma (for this center-surround
    # profile); allow generous tolerance across the discrete scale grid.
    assert 4.0 < sc[best] < 16.0


def test_edge_rejection():
    """A pure step edge must not produce (many) keypoints."""
    img = np.zeros((96, 128), np.float32)
    img[:, 64:] = 1.0
    kp = compute_sift_keypoints(jnp.asarray(img), SIFTParams())
    assert int(kp.count()) < 8
