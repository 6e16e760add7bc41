"""Shared-track edge-scale estimation (sfm/edge_scales.py)."""

import numpy as np

from sara_tpu.sfm.edge_scales import (estimate_edge_scales,
                                      solve_centers_fixed_scales,
                                      two_view_depths)


def _pose(center, yaw=0.0):
    R = np.array([[np.cos(yaw), 0, -np.sin(yaw)], [0, 1, 0],
                  [np.sin(yaw), 0, np.cos(yaw)]])
    return R, -R @ np.asarray(center, float)


def test_two_view_depths_exact():
    rs = np.random.RandomState(0)
    X = rs.uniform(-1, 1, (50, 3)) + [0, 0, 6.0]
    Ra, ta = _pose([0, 0, 0])
    Rb, tb = _pose([0.5, 0, 0])
    R = Rb @ Ra.T
    t = tb - R @ ta
    s = np.linalg.norm(t)
    Xa = X @ Ra.T + ta
    Xb = X @ Rb.T + tb
    ra = Xa / Xa[:, 2:3]
    rb = Xb / Xb[:, 2:3]
    z_a, z_b = two_view_depths(R, t / s, ra, rb)
    # Unit-baseline depths scale by 1/s vs metric depths.
    np.testing.assert_allclose(z_a * s, Xa[:, 2], rtol=1e-6)
    np.testing.assert_allclose(z_b * s, Xb[:, 2], rtol=1e-6)


def test_collinear_chain_scales_recovered():
    """A straight camera row (the case direction-only averaging cannot
    solve): non-uniform spacings must be recovered from shared tracks."""
    rs = np.random.RandomState(1)
    V = 8
    gaps = rs.uniform(0.5, 2.0, V - 1)
    cx = np.concatenate([[0.0], np.cumsum(gaps)])
    centers = np.stack([cx, np.zeros(V), np.zeros(V)], 1)
    X = rs.uniform(-3, 3, (200, 3)) + [cx.mean(), 0, 8.0]
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    kp_xy, vis = [], []
    for v in range(V):
        R, t = _pose(centers[v])
        Xc = X @ R.T + t
        uv = (Xc @ K.T)
        uv = uv[:, :2] / Xc[:, 2:3]
        kp_xy.append(uv.astype(np.float32))
        vis.append(Xc[:, 2] > 0)

    edges, edge_R, edge_t, edge_feats = [], [], [], []
    for a in range(V):
        for b in range(a + 1, min(a + 3, V)):
            Ra, ta = _pose(centers[a])
            Rb, tb = _pose(centers[b])
            R = Rb @ Ra.T
            t = tb - R @ ta
            edges.append((a, b))
            edge_R.append(R)
            edge_t.append(t / np.linalg.norm(t))
            ids = np.arange(len(X))[vis[a] & vis[b]]
            edge_feats.append((ids, ids))

    scales = estimate_edge_scales(edges, edge_R, edge_t, edge_feats,
                                  kp_xy, K)
    true = np.array([np.linalg.norm(centers[b] - centers[a])
                     for a, b in edges])
    ratio = scales / true
    # Correct up to ONE global scale.
    np.testing.assert_allclose(ratio / ratio.mean(), 1.0, atol=1e-3)

    u = np.stack([(centers[b] - centers[a]) / np.linalg.norm(
        centers[b] - centers[a]) for a, b in edges])
    c = solve_centers_fixed_scales(V, edges, u, scales)
    c = c * (true.sum() / np.sum(np.linalg.norm(
        c[[e[1] for e in edges]] - c[[e[0] for e in edges]], axis=1)))
    np.testing.assert_allclose(c, centers - centers[0], atol=1e-3)
