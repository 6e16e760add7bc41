"""Global (unordered) SfM pipeline test on a synthetic collection
(BASELINE config 4 building block)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from geometry_fixtures import rotation_distance
from sara_tpu.sfm.global_sfm import run_global_sfm, GlobalSfMConfig
from sara_tpu.utils import ate_rmse
from test_sfm_pipeline import _make_sequence


def test_global_sfm_8_views():
    kps, centers_gt, K = _make_sequence(n_frames=8, n_points=300, noise=0.3,
                                        seed=1, capacity=512)
    cfg = GlobalSfMConfig(rel_pose_samples=200, min_pair_inliers=30,
                          ba_options=__import__("sara_tpu.ba", fromlist=["BAOptions"]).BAOptions(max_iters=20))
    out = run_global_sfm(kps, K, config=cfg)
    assert out["num_edges"] >= 7
    centers = np.stack([-out["R"][v].T @ out["t"][v] for v in range(8)])
    err = ate_rmse(centers, centers_gt)
    assert err < 0.15, f"ATE {err}"
    assert len(out["points"]) > 100
    # BA must have reduced cost.
    assert out["ba_info"]["final_cost"] <= out["ba_info"]["initial_cost"]


def test_global_sfm_batched_pair_stage():
    """pair_chunk > 0 (chunks of pairs as one vmapped program) must match
    the per-pair path's reconstruction quality. Uses 7 views so the
    power-of-two view-axis bucketing (compile reuse across collection
    sizes) pads one all-masked view."""
    from sara_tpu.ba import BAOptions

    kps, centers_gt, K = _make_sequence(n_frames=7, n_points=300, noise=0.3,
                                        seed=1, capacity=512)
    cfg = GlobalSfMConfig(rel_pose_samples=200, min_pair_inliers=30,
                          pair_chunk=8,
                          ba_options=BAOptions(max_iters=20))
    out = run_global_sfm(kps, K, config=cfg)
    assert out["num_edges"] >= 6
    centers = np.stack([-out["R"][v].T @ out["t"][v] for v in range(7)])
    err = ate_rmse(centers, centers_gt)
    assert err < 0.15, f"ATE {err}"
    assert len(out["points"]) > 100


def test_city_scale_partitioned_pipeline():
    """Scaled-down BASELINE config-5 pipeline: city-grid scene, proximity
    loop pairs, partitioned (keyframe/map-block) BA on the virtual mesh."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from bench_city_scale import make_city_scene, proximity_pairs

    from sara_tpu.ba import BAOptions
    from sara_tpu.parallel import make_mesh
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.utils import ate_rmse

    V = 48
    kps, centers_gt, K = make_city_scene(V, capacity=256)
    pairs = proximity_pairs(centers_gt)
    cfg = GlobalSfMConfig(rel_pose_samples=128, min_pair_inliers=20,
                          pair_chunk=32,
                          ba_options=BAOptions(max_iters=10),
                          ba_blocks=4, ba_sweeps=2)
    mesh = make_mesh(4, axis="block")
    out = run_global_sfm(kps, K, pairs=pairs, config=cfg, ba_mesh=mesh)
    centers = np.stack([-out["R"][v].T @ out["t"][v] for v in range(V)])
    err = ate_rmse(centers, centers_gt)
    # Path spans ~40 units; demand small relative ATE.
    assert err < 2.0, err
    assert len(out["points"]) > 500
