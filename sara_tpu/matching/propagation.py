"""Match propagation — seed-and-grow densification of putative matches.

TPU-native rebuild of the reference's match-propagation research code
(reference: cpp/drafts/MatchPropagation/cpp/src/GrowRegion.hpp:40-80,
MatchNeighborhood.hpp:35-60 ``AffineCovariantMatchDistance``,
GrowMultipleRegions.hpp, LocalAffineConsistency.hpp — the ACCV 2012
"Efficient and Scalable 4th-order Match Propagation" algorithm).

The reference grows regions one match at a time: a seed match pulls
neighboring matches whose local affine geometry is consistent with a
triple already in the region, using KD-tree neighborhoods and a priority
queue. That control flow is hostile to a TPU, so this module reformulates
propagation as *batched boolean frontier expansion on a match-consistency
matrix*:

1. one (M, M) pairwise consistency matrix C: match n supports match m when
   it lies in m's affine-covariant neighborhood (distances measured in the
   keypoints' shape metric, as the reference's rho_m) with a symmetric
   scale ratio above ``rho_min`` and compatible relative orientation;
2. regions for all S seeds grow *simultaneously* by a fixed-iteration
   vote sweep: a match joins region R when >= ``min_votes`` current
   members support it (the vote plays the role of the reference's
   affine-consistent triple test — a match needs multiple independent
   supporters, not one);
3. each grown region is verified by a closed-form least-squares affinity
   fit over its members (the reference's local-affinity check,
   LocalAffineConsistency.hpp:38 ``affinity_from_x_to_y`` generalized from
   3 points to all members); members whose affine transfer error exceeds
   ``delta_x`` pixels are dropped.

Everything is fixed-shape and jit-compatible: M = match capacity,
S = seed count, matrices instead of graphs, masks instead of sets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sara_tpu.core.types import Keypoints, Matches


class PropagationParams(NamedTuple):
    """Knobs for region growing (reference: GrowthParams.hpp PredParams).

    neighborhood_radius: neighborhood size in units of the source keypoint
      scale (the reference uses K=80 KD-tree neighbors; a metric radius is
      the fixed-shape analog).
    rho_min: minimum affine-covariant distance ratio min(dx,dy)/max(dx,dy)
      (reference: squared_rho_min in PredParams, rho_m in
      MatchNeighborhood.hpp:35-60).
    delta_theta: max deviation (radians) between the relative-orientation
      change of the two matches (reference: PredParams delta_theta).
    delta_x: max affine transfer error in pixels for the final per-region
      affinity verification (reference: PredParams delta_x).
    min_votes: members that must support a candidate before it joins —
      the batched stand-in for the affine-consistent triple test.
    num_iters: frontier-expansion sweeps (region diameter bound).
    """

    neighborhood_radius: float = 12.0
    rho_min: float = 0.3
    delta_theta: float = 0.7
    delta_x: float = 12.0
    min_votes: int = 3
    num_iters: int = 10


def match_consistency_matrix(kp_a: Keypoints, kp_b: Keypoints,
                             matches: Matches,
                             params: PropagationParams = PropagationParams()
                             ) -> jnp.ndarray:
    """(M, M) bool: C[m, n] — does match n support match m?

    Support requires (all measured in the affine-covariant metric of the
    reference's ``AffineCovariantMatchDistance``, with SIFT's circular
    shape matrix Sigma = I / scale^2):
      - n lies within ``neighborhood_radius`` of m on the source side;
      - the source/target covariant distances agree:
        min(dx, dy) / max(dx, dy) >= rho_min;
      - the displacement directions rotate consistently with the
        keypoints' orientation change (within delta_theta);
      - m and n share no endpoint (one-to-one matching).
    """
    xm = kp_a.xy[matches.i]            # (M, 2)
    ym = kp_b.xy[matches.j]
    sx = jnp.maximum(kp_a.scale[matches.i], 1e-6)
    sy = jnp.maximum(kp_b.scale[matches.j], 1e-6)

    dx = xm[None, :, :] - xm[:, None, :]   # (M, M, 2) source displacement m->n
    dy = ym[None, :, :] - ym[:, None, :]
    # Covariant squared distances in m's shape metric (rho_m numerator terms).
    dxx = jnp.sum(dx * dx, axis=-1) / (sx[:, None] ** 2)
    dyy = jnp.sum(dy * dy, axis=-1) / (sy[:, None] ** 2)

    near = dxx <= params.neighborhood_radius ** 2
    lo = jnp.minimum(dxx, dyy)
    hi = jnp.maximum(dxx, dyy)
    rho_ok = lo >= params.rho_min * hi  # rho = lo/hi >= rho_min, 0/0-safe

    # Relative-orientation consistency: the angle of the displacement must
    # rotate by the same amount on both sides as the keypoint orientation
    # change of m (LocalAffineConsistency angle_difference_in_radian).
    ang_x = jnp.arctan2(dx[..., 1], dx[..., 0])
    ang_y = jnp.arctan2(dy[..., 1], dy[..., 0])
    dtheta = (kp_b.orientation[matches.j] - kp_a.orientation[matches.i])[:, None]
    dang = ang_y - ang_x - dtheta
    dang = jnp.arctan2(jnp.sin(dang), jnp.cos(dang))
    ang_ok = jnp.abs(dang) <= params.delta_theta

    distinct = ((matches.i[:, None] != matches.i[None, :])
                & (matches.j[:, None] != matches.j[None, :]))
    valid = matches.mask[:, None] & matches.mask[None, :]
    return near & rho_ok & ang_ok & distinct & valid


def _fit_affinity(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted least-squares 2x3 affinity mapping x -> y.

    Closed-form generalization of the reference's 3-point
    ``affinity_from_x_to_y`` (LocalAffineConsistency.hpp:38) to all region
    members; normal equations on homogeneous source coordinates.
    """
    xh = jnp.concatenate([x, jnp.ones_like(x[:, :1])], axis=1)  # (M, 3)
    wx = xh * w[:, None]
    ata = xh.T @ wx + 1e-6 * jnp.eye(3, dtype=x.dtype)
    atb = wx.T @ y
    return jnp.linalg.solve(ata, atb).T  # (2, 3)


def propagate_matches(kp_a: Keypoints, kp_b: Keypoints, matches: Matches,
                      num_seeds: int = 32,
                      params: PropagationParams = PropagationParams()):
    """Grow affine-consistent regions from the best-scoring seed matches.

    Batched analog of GrowMultipleRegions: all seeds grow at once via
    ``num_iters`` vote sweeps over the consistency matrix, then each region
    is verified with a least-squares affinity and trimmed at ``delta_x``.

    Returns (region_members (S, M) bool, labels (M,) int32, densified mask
    (M,) bool). ``labels[m]`` is the first region containing match m, or -1;
    the densified mask is the union of verified regions — the propagated
    (outlier-resistant) match set.
    """
    C = match_consistency_matrix(kp_a, kp_b, matches, params)
    # Mutual support only (both matches lie in each other's covariant
    # neighborhood) — the strict form of the reference's pairwise check.
    C = (C & C.T).astype(jnp.float32)

    # Seeds: the lowest descriptor distances (scores are squared L2; the
    # reference grows from best matches first, GrowMultipleRegions).
    seed_score = jnp.where(matches.mask, matches.score, jnp.inf)
    _, seed_idx = jax.lax.top_k(-seed_score, num_seeds)  # (S,)
    region = jax.nn.one_hot(seed_idx, matches.capacity, dtype=jnp.float32)

    def sweep(region, t):
        votes = region @ C  # (S, M): region members supporting candidate n
        # Vote threshold ramps 1, 2, ..., min_votes: a lone seed first pulls
        # its direct supporters (the reference's affine-quadruple
        # initialization, GrowRegion.hpp initialize_affine_quadruple), then
        # growth requires the full quorum.
        need = jnp.minimum(t + 1, params.min_votes).astype(votes.dtype)
        grown = (votes >= need) | (region > 0.5)
        return grown.astype(jnp.float32), None

    region, _ = jax.lax.scan(sweep, region, jnp.arange(params.num_iters))
    members = region > 0.5  # (S, M)

    # Per-region affinity verification (vmapped over seeds).
    xm = kp_a.xy[matches.i]
    ym = kp_b.xy[matches.j]

    def verify(member_row):
        w = member_row.astype(jnp.float32)
        A = _fit_affinity(xm, ym, w)
        xh = jnp.concatenate([xm, jnp.ones_like(xm[:, :1])], axis=1)
        err = jnp.linalg.norm(xh @ A.T - ym, axis=1)
        keep = member_row & (err <= params.delta_x)
        # A region needs >= 4 verified members to define an affinity at all
        # (the reference's affine quadruple initialization, GrowRegion.hpp).
        return keep & (jnp.sum(keep.astype(jnp.int32)) >= 4)

    members = jax.vmap(verify)(members)  # (S, M)

    densified = jnp.any(members, axis=0) & matches.mask
    first_region = jnp.argmax(members, axis=0).astype(jnp.int32)
    labels = jnp.where(densified, first_region, -1)
    return members, labels, densified
