"""Synthetic multi-view geometry fixtures.

Replicates the reference's test-data pattern
(reference: cpp/test/Sara/MultiViewGeometry/SyntheticDataUtilities.hpp:20-95 —
make_cube_vertices, make_relative_motion, project_to_film): generate exact
projections of known 3-D structure under known motion, optionally with noise
and outliers, and assert that solvers recover the ground truth.
"""

import numpy as np


def make_cube_vertices(center=(0.0, 0.0, 5.0), side=2.0, n_extra=32, seed=0):
    """8 cube corners + random points inside, all in front of the cameras."""
    rs = np.random.RandomState(seed)
    c = np.asarray(center)
    h = side / 2.0
    corners = np.array([[sx, sy, sz] for sx in (-h, h)
                        for sy in (-h, h) for sz in (-h, h)])
    extra = rs.uniform(-h, h, size=(n_extra, 3))
    return np.concatenate([corners, extra]) + c


def make_relative_motion(yaw=0.1, pitch=-0.05, roll=0.03,
                         t=(1.0, 0.1, 0.05)):
    """Ground-truth (R, t): x2 = R x1 + t."""
    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                         [-np.sin(a), 0, np.cos(a)]])

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    return rz(yaw) @ ry(pitch) @ rx(roll), np.asarray(t, float)


def default_K(f=800.0, w=1024, h=768):
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])


def project(K, R, t, X):
    """Pixels of world points X under camera (R, t): x = K (R X + t)."""
    Xc = X @ R.T + t
    p = Xc @ K.T
    return p[:, :2] / p[:, 2:], Xc[:, 2]


def essential_from_motion(R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return E / np.linalg.norm(E)


def two_view_scene(n_points=40, noise=0.0, n_outliers=0, seed=0):
    """Full synthetic two-view setup. Returns dict with pixels, normalized
    coords, ground truth motion and intrinsics."""
    rs = np.random.RandomState(seed)
    X = make_cube_vertices(n_extra=n_points - 8, seed=seed)
    K = default_K()
    R1, t1 = np.eye(3), np.zeros(3)
    R2, t2 = make_relative_motion()
    u, z1 = project(K, R1, t1, X)
    v, z2 = project(K, R2, t2, X)
    u = u + rs.normal(scale=noise, size=u.shape) if noise else u
    v = v + rs.normal(scale=noise, size=v.shape) if noise else v
    if n_outliers:
        iout = rs.choice(len(u), n_outliers, replace=False)
        v[iout] = rs.uniform(0, 1024, size=(n_outliers, 2))
    else:
        iout = np.array([], int)
    Ki = np.linalg.inv(K)

    def norm(p):
        ph = np.concatenate([p, np.ones((len(p), 1))], axis=1)
        q = ph @ Ki.T
        return q[:, :2] / q[:, 2:]

    return dict(X=X, K=K, R=R2, t=t2, u=u, v=v, un=norm(u), vn=norm(v),
                outliers=iout, E=essential_from_motion(R2, t2))


def rotation_distance(Ra, Rb):
    """Geodesic angle between rotations (radians)."""
    cosang = (np.trace(Ra.T @ Rb) - 1) / 2
    return float(np.arccos(np.clip(cosang, -1, 1)))


def translation_angle(ta, tb):
    """Angle between translation directions (radians)."""
    a = ta / np.linalg.norm(ta)
    b = tb / np.linalg.norm(tb)
    return float(np.arccos(np.clip(abs(a @ b), -1, 1)))
