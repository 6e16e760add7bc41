"""Match propagation (seed-and-grow densification).

Mirrors the reference's match-propagation validation idea
(cpp/drafts/MatchPropagation — outlier-resistant region growing): on a
synthetic similarity-warped keypoint set with planted outlier matches,
grown regions must keep the consistent matches and reject the outliers.
"""

import numpy as np
import jax.numpy as jnp

from sara_tpu.core.types import Keypoints, Matches
from sara_tpu.matching import PropagationParams, propagate_matches


def _make_scene(n_in=60, n_out=20, cap=128, seed=0):
    rs = np.random.RandomState(seed)
    theta, s = 0.3, 1.2
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    t = np.array([30.0, -12.0])

    xa = rs.uniform(0, 150, size=(n_in, 2))
    xb = (s * xa @ R.T) + t

    # Outlier matches pair fresh, unrelated points on both sides.
    xa_out = rs.uniform(0, 150, size=(n_out, 2))
    xb_out = rs.uniform(0, 150, size=(n_out, 2))

    def kps(xy, extra_xy, rot, scale):
        n = n_in + n_out
        pos = np.concatenate([xy, extra_xy], 0)
        k = Keypoints.empty(cap)
        return k._replace(
            xy=jnp.asarray(np.pad(pos, ((0, cap - n), (0, 0)))),
            scale=jnp.full((cap,), 5.0 * scale, jnp.float32),
            orientation=jnp.full((cap,), rot, jnp.float32),
            mask=jnp.arange(cap) < n,
        )

    kp_a = kps(xa, xa_out, 0.0, 1.0)
    kp_b = kps(xb, xb_out, theta, s)

    m = n_in + n_out
    idx = np.arange(m)
    matches = Matches(
        i=jnp.asarray(np.pad(idx, (0, cap - m)), jnp.int32),
        j=jnp.asarray(np.pad(idx, (0, cap - m)), jnp.int32),
        score=jnp.asarray(np.pad(rs.uniform(0.1, 0.5, m), (0, cap - m)),
                          jnp.float32),
        mask=jnp.arange(cap) < m,
    )
    inlier = np.zeros(cap, bool)
    inlier[:n_in] = True
    outlier = np.zeros(cap, bool)
    outlier[n_in:m] = True
    return kp_a, kp_b, matches, inlier, outlier


def test_propagation_keeps_inliers_rejects_outliers():
    kp_a, kp_b, matches, inlier, outlier = _make_scene()
    params = PropagationParams(neighborhood_radius=12.0, min_votes=3)
    members, labels, densified = propagate_matches(
        kp_a, kp_b, matches, num_seeds=16, params=params)
    densified = np.asarray(densified)

    kept_in = densified[inlier].mean()
    kept_out = densified[outlier].sum()
    assert kept_in >= 0.8, f"only {kept_in:.0%} of inliers propagated"
    assert kept_out <= 2, f"{kept_out} outliers slipped into regions"

    # Labels: propagated matches carry a region id, others -1.
    labels = np.asarray(labels)
    assert (labels[densified] >= 0).all()
    assert (labels[~densified] == -1).all()


def test_propagation_no_valid_matches():
    kp_a, kp_b, matches, _, _ = _make_scene()
    matches = matches._replace(mask=jnp.zeros_like(matches.mask))
    members, labels, densified = propagate_matches(kp_a, kp_b, matches,
                                                   num_seeds=8)
    assert not bool(np.asarray(densified).any())
