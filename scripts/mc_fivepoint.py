"""Monte-Carlo validation of the TPU 5-point solver against a CPU oracle.

The solver (sara_tpu/mvg/fivepoint.py) finds real roots of the hidden-
variable resultant by trig-series bracketing over remixed null bases — a
formulation chosen because XLA:TPU has no nonsymmetric eigensolver. Known
residual risk (NOTES.md): root pairs closer than the subdivision
resolution in every remix. This harness measures the actual miss rate:

  oracle: the SAME 10x10 cubic pencil C(z), solved exactly by
  linearizing det(C0 + C1 z + C2 z^2 + C3 z^3) = 0 into a 30x30
  generalized eigenproblem (scipy.linalg.eig) — the standard
  polynomial-eigenvalue route the reference's Groebner/companion
  solvers rely on (reference:
  cpp/src/DO/Sara/MultiViewGeometry/MinimalSolvers/
  SteweniusFivePointAlgorithm.cpp:18-126).

For each random problem we list the oracle's essential matrices (validated
against the 10 essential constraints) and check each is matched by a
solver output (sign-invariant Frobenius distance). Reports per-E recovery
rate and the rate of recovering the TRUE motion's E.

Usage: python scripts/mc_fivepoint.py [--n 10000] [--degenerate-frac 0.3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_problem(rs, near_planar=False, small_baseline=False):
    """Random two-view geometry; returns (u (5,2), v (5,2), E_gt)."""
    ang = rs.uniform(-0.5, 0.5, 3)

    def rot(axis, a):
        c, s = np.cos(a), np.sin(a)
        if axis == 0:
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == 1:
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    R = rot(0, ang[0]) @ rot(1, ang[1]) @ rot(2, ang[2])
    t = rs.normal(size=3)
    if small_baseline:
        t = t / np.linalg.norm(t) * 1e-3
    X = rs.uniform(-1, 1, (5, 3)) + np.array([0, 0, 4.0])
    if near_planar:
        n_vec = rs.normal(size=3)
        n_vec /= np.linalg.norm(n_vec)
        X = X - 0.999 * np.outer((X - X.mean(0)) @ n_vec, n_vec)
    u = X[:, :2] / X[:, 2:]
    Xb = X @ R.T + t
    v = Xb[:, :2] / Xb[:, 2:]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return u, v, E / np.linalg.norm(E)


def essential_residual(E):
    EEt = E @ E.T
    M = 2 * EEt @ E - np.trace(EEt) * E
    return np.sqrt(np.linalg.det(E) ** 2 + (M ** 2).sum())


def oracle_solutions(u, v):
    """All real essential matrices via the generalized companion of the
    same pencil the TPU solver uses."""
    import jax.numpy as jnp
    import scipy.linalg

    from sara_tpu.mvg.fivepoint import _coefficient_matrices

    A = np.stack([
        np.array([vx * ux, vx * uy, vx, vy * ux, vy * uy, vy, ux, uy, 1.0])
        for (ux, uy), (vx, vy) in zip(u, v)])
    _, _, Vt = np.linalg.svd(A)
    basis = Vt[-4:].reshape(4, 3, 3)
    C = np.asarray(_coefficient_matrices(
        jnp.asarray(basis[0]), jnp.asarray(basis[1]),
        jnp.asarray(basis[2]), jnp.asarray(basis[3])))
    C0, C1, C2, C3 = C
    # Linearization: det(C0 + C1 z + C2 z^2 + C3 z^3) = 0 as Az = z Bz.
    I = np.eye(10)
    Z = np.zeros((10, 10))
    Abig = np.block([[Z, I, Z], [Z, Z, I], [-C0, -C1, -C2]])
    Bbig = np.block([[I, Z, Z], [Z, I, Z], [Z, Z, C3]])
    w = scipy.linalg.eig(Abig, Bbig, right=False)
    zs = [z.real for z in w
          if np.isfinite(z) and abs(z.imag) < 1e-8 * max(1.0, abs(z.real))]
    out = []
    for z in zs:
        Cz = C0 + C1 * z + C2 * z * z + C3 * z ** 3
        _, s, Vt2 = np.linalg.svd(Cz)
        m = Vt2[-1]
        if abs(m[9]) < 1e-9:
            continue
        x, y = m[7] / m[9], m[8] / m[9]
        E = x * basis[0] + y * basis[1] + z * basis[2] + basis[3]
        E = E / np.linalg.norm(E)
        if essential_residual(E) < 1e-6:
            # Epipolar consistency on the 5 points.
            ep = max(abs(np.array([vx, vy, 1.0]) @ E @ np.array([ux, uy, 1.0]))
                     for (ux, uy), (vx, vy) in zip(u, v))
            if ep < 1e-6:
                out.append(E)
    # Dedup (sign-invariant).
    dedup = []
    for E in out:
        if all(min(np.linalg.norm(E - F), np.linalg.norm(E + F)) > 1e-4
               for F in dedup):
            dedup.append(E)
    return dedup


def run(n, degenerate_frac=0.3, seed=0, tol=1e-3, batch=256):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sara_tpu.mvg.fivepoint import five_point_essential

    solver = jax.jit(jax.vmap(five_point_essential))
    rs = np.random.RandomState(seed)
    probs = []
    for i in range(n):
        kind = rs.rand()
        probs.append(make_problem(
            rs, near_planar=kind < degenerate_frac,
            small_baseline=degenerate_frac <= kind < 1.5 * degenerate_frac))

    n_oracle = n_found = 0
    n_true = n_true_found = 0
    worst = []
    for c0 in range(0, n, batch):
        chunk = probs[c0:c0 + batch]
        U = jnp.asarray(np.stack([p[0] for p in chunk]))
        V = jnp.asarray(np.stack([p[1] for p in chunk]))
        Es, valids = solver(U, V)
        Es = np.asarray(Es)
        valids = np.asarray(valids)
        for k, (u, v, E_gt) in enumerate(chunk):
            ours = [Es[k][i] / max(np.linalg.norm(Es[k][i]), 1e-12)
                    for i in range(Es.shape[1]) if valids[k][i]]
            oracle = oracle_solutions(u, v)
            n_oracle += len(oracle)
            for E in oracle:
                hit = any(min(np.linalg.norm(E - F), np.linalg.norm(E + F))
                          < tol for F in ours)
                n_found += hit
                if not hit:
                    worst.append((c0 + k, essential_residual(E)))
            n_true += 1
            n_true_found += any(
                min(np.linalg.norm(E_gt - F), np.linalg.norm(E_gt + F)) < 1e-2
                for F in ours)
    return {
        "problems": n,
        "oracle_solutions": n_oracle,
        "recovered": n_found,
        "recovery_rate": n_found / max(n_oracle, 1),
        "true_E_rate": n_true_found / max(n_true, 1),
        "misses": worst[:20],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--degenerate-frac", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = run(args.n, args.degenerate_frac, args.seed)
    for k, v in out.items():
        print(f"{k}: {v}")
