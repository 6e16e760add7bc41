"""Scaled-down BASELINE config-5 driver test: the SAME code path as
scripts/bench_config5_real.py (real rendered pixels -> production SIFT ->
pair matching/E-RANSAC -> averaging -> partitioned BA on the virtual mesh),
at toy size so it runs in CI.

Reference flagship being matched: the full image->reconstruction loop of
/root/reference/cpp/examples/Sara/MultiViewGeometry/
two_view_bundle_adjustment_example.cpp:77-120 at collection scale.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_config5_real_driver_small():
    from bench_config5_real import run_config5

    artifact = run_config5(
        views=16, hw=(180, 240), window=2, capacity=512,
        total_capacity=1024, samples=128, chunk=8, ba_blocks=2,
        ba_sweeps=3, ba_iters=6, mesh_devices=2, scaling=(1, 2),
        log=lambda *a: None)

    assert artifact["views"] == 16
    assert artifact["edges"] >= 24         # most windowed pairs verified
    assert artifact["points"] > 100
    # Smoke gate only: 16 views around a FULL circle put consecutive views
    # 22.5 deg apart with ~200 kp each, so edge noise dominates (measured
    # toy ATE ~0.3-0.6 on the 3.2-unit loop). The full-size run (128
    # views, 2.8 deg arcs) is the accuracy artifact — see CONFIG5_r5.json.
    assert artifact["ate"] < 0.7
    # Scaling table exercised both mesh sizes with identical final cost
    # (the sharded solve is the same computation).
    rows = artifact["partitioned_ba_scaling"]
    assert [r["mesh_devices"] for r in rows] == [1, 2]
    assert np.isclose(rows[0]["final_cost"], rows[1]["final_cost"],
                      rtol=1e-3)
    assert 0 < artifact["projected_2x4_efficiency"] <= 1
