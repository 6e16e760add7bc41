"""Differential operators: gradients, Laplacian, Hessian, structure tensor.

TPU-native rebuild of the reference's differential calculus
(reference: cpp/src/DO/Sara/ImageProcessing/Differential.hpp,
SecondMomentMatrix.hpp, Cornerness.hpp). Central differences with replicated
borders, vectorized over whole images (and any leading batch dims).
"""

from __future__ import annotations

import jax.numpy as jnp

from sara_tpu.image.filtering import gaussian_blur


def _shift(image: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge replication: out[y, x] = in[y+dy, x+dx] (clamped)."""
    H, W = image.shape[-2], image.shape[-1]
    ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return image[..., ys, :][..., :, xs]


def gradient(image: jnp.ndarray):
    """Central-difference gradient (gx, gy), each (..., H, W)."""
    gx = 0.5 * (_shift(image, 0, 1) - _shift(image, 0, -1))
    gy = 0.5 * (_shift(image, 1, 0) - _shift(image, -1, 0))
    return gx, gy


def gradient_polar(image: jnp.ndarray):
    """Gradient in polar coords (magnitude, orientation in (-pi, pi]).

    This is the SIFT pipeline's per-scale gradient stage
    (reference: FeatureDescriptors/Orientation.hpp:42-58
    ``gradient_polar_coordinates``).
    """
    gx, gy = gradient(image)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    return mag, ori


def laplacian(image: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian (reference: Differential.hpp laplacian)."""
    return (_shift(image, 0, 1) + _shift(image, 0, -1)
            + _shift(image, 1, 0) + _shift(image, -1, 0) - 4.0 * image)


def hessian(image: jnp.ndarray):
    """Per-pixel 2x2 Hessian entries (dxx, dxy, dyy)."""
    dxx = _shift(image, 0, 1) + _shift(image, 0, -1) - 2.0 * image
    dyy = _shift(image, 1, 0) + _shift(image, -1, 0) - 2.0 * image
    dxy = 0.25 * (_shift(image, 1, 1) - _shift(image, 1, -1)
                  - _shift(image, -1, 1) + _shift(image, -1, -1))
    return dxx, dxy, dyy


def second_moment_matrix(image: jnp.ndarray, sigma_d: float, sigma_i: float):
    """Structure tensor (mxx, mxy, myy), derivative scale sigma_d then
    integration scale sigma_i (reference: SecondMomentMatrix.hpp)."""
    smoothed = gaussian_blur(image, sigma_d)
    gx, gy = gradient(smoothed)
    mxx = gaussian_blur(gx * gx, sigma_i)
    mxy = gaussian_blur(gx * gy, sigma_i)
    myy = gaussian_blur(gy * gy, sigma_i)
    return mxx, mxy, myy


def harris_cornerness(image: jnp.ndarray, sigma_d: float, sigma_i: float,
                      kappa: float = 0.04) -> jnp.ndarray:
    """det(M) - kappa tr(M)^2 (reference: Cornerness.hpp, Harris.hpp:97).

    Includes the reference's sigma_d^2 scale normalization for the
    scale-adapted variant.
    """
    mxx, mxy, myy = second_moment_matrix(image, sigma_d, sigma_i)
    det = mxx * myy - mxy * mxy
    tr = mxx + myy
    return (sigma_d * sigma_d) ** 2 * (det - kappa * tr * tr)


def mean_curvature(u: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Mean curvature of the isolines of a (H, W) scalar field, densely.

    kappa = (Du^T Hu Du - |Du|^2 tr(Hu)) / (2 |Du|^3); zero where the
    gradient vanishes (reference: ImageProcessing/Curvature.hpp
    mean_curvature — per-point; here one vectorized field, the TPU-native
    form for level-set evolution). Note the reference's convention: in 2-D
    this equals MINUS HALF the classical isoline curvature div(Du/|Du|)
    (a circle SDF of radius r gives -1/(2r)).
    """
    gx, gy = gradient(u)
    hxx, hxy, hyy = hessian(u)
    n2 = gx * gx + gy * gy
    num = (gx * gx * hxx + 2.0 * gx * gy * hxy + gy * gy * hyy
           - n2 * (hxx + hyy))
    return jnp.where(n2 < eps, 0.0, 0.5 * num / jnp.maximum(n2, eps) ** 1.5)


def mean_curvature_flow(u: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Mean curvature motion (Du^T Hu Du - |Du|^2 tr Hu) / (2 |Du|^2):
    the speed term for curvature-driven level-set evolution
    (reference: Curvature.hpp mean_curvature_flow)."""
    gx, gy = gradient(u)
    hxx, hxy, hyy = hessian(u)
    n2 = gx * gx + gy * gy
    num = (gx * gx * hxx + 2.0 * gx * gy * hxy + gy * gy * hyy
           - n2 * (hxx + hyy))
    return jnp.where(n2 < eps, 0.0, 0.5 * num / jnp.maximum(n2, eps))
