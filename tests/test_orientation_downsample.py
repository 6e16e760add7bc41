"""Half-resolution orientation histograms must agree with the exact path.

The TPU frontend blurs the dense 36-bin magnitude maps at half resolution
(sum-pool 2x2 + residual-sigma blur) — ~8x less VPU work on the stage that
dominates frontend compute. This pins the approximation quality: primary
orientation peaks within a degree of the full-resolution computation.
"""

import numpy as np
import jax.numpy as jnp

from sara_tpu.features.dog import DoGParams, detect_dog_octave
from sara_tpu.features.orientation import dominant_orientations
from sara_tpu.image.differential import gradient
from sara_tpu.image.pyramid import PyramidParams, dog_pyramid, gaussian_pyramid


def _textured_image(h=160, w=200, seed=3):
    rs = np.random.RandomState(seed)
    img = rs.rand(h // 8, w // 8)
    img = np.kron(img, np.ones((8, 8)))  # blocky texture with clear edges
    yy, xx = np.mgrid[0:h, 0:w]
    img = img + 0.2 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    return jnp.asarray(img, jnp.float32)


def test_halfres_orientation_matches_exact():
    img = _textured_image()
    gp = gaussian_pyramid(img, PyramidParams())
    dg = dog_pyramid(gp)
    gauss, dog = gp.octaves[0], dg.octaves[0]
    det = detect_dog_octave(dog, DoGParams(capacity=256))
    gx, gy = gradient(gauss[:-1])

    t1, v1 = dominant_orientations(gx, gy, det["x"], det["y"], det["s"],
                                   gp.sigmas[:-1], max_peaks=2, downsample=1)
    t2, v2 = dominant_orientations(gx, gy, det["x"], det["y"], det["s"],
                                   gp.sigmas[:-1], max_peaks=2, downsample=2)
    m = np.asarray(det["mask"])
    assert m.sum() >= 30, "fixture produced too few keypoints"
    t1, t2, v1, v2 = map(np.asarray, (t1, t2, v1, v2))

    both = m & v1[:, 0] & v2[:, 0]
    d = np.abs(np.angle(np.exp(1j * (t1[both, 0] - t2[both, 0]))))
    # The half-res path sum-pools 2x2 BEFORE the blur (3x less MXU work);
    # the box prefilter costs ~1.7 deg median orientation error — far
    # inside the 10-deg histogram bins; end-to-end match quality measured
    # unchanged (scripts/eval_detection_quality.py). Outliers are
    # peak-order swaps between near-equal peaks.
    assert np.median(d) < 0.05
    # Peak-order swaps are harmless (both orientations get descriptors):
    # compare against the SET of exact-path peaks.
    t1m, v1m, t2m = t1[both], v1[both], t2[both]
    dmin = np.full(len(t2m), np.inf)
    for p_ in range(t1m.shape[1]):
        cand = np.abs(np.angle(np.exp(1j * (t1m[:, p_] - t2m[:, 0]))))
        dmin = np.minimum(dmin, np.where(v1m[:, p_], cand, np.inf))
    assert (dmin > 0.175).mean() < 0.07, f"{(dmin > 0.175).mean()}"
    assert (v1[m] == v2[m]).mean() > 0.95
