"""Image processing: filtering, pyramids, warps, differential operators.

TPU-native rebuild of the reference's ``DO/Sara/ImageProcessing`` layer as
jit-friendly pure functions over ``jnp`` arrays (H, W) / (..., H, W).
"""

from sara_tpu.image.filtering import (
    gaussian_kernel_1d,
    separable_conv2d,
    gaussian_blur,
)
from sara_tpu.image.transform import (
    resize_bilinear,
    downscale2,
    upscale2,
    warp_bilinear,
    warp_homography,
    bilinear_sample,
)
from sara_tpu.image.differential import (
    gradient,
    gradient_polar,
    laplacian,
    hessian,
    second_moment_matrix,
    harris_cornerness,
)
from sara_tpu.image.pyramid import (
    PyramidParams,
    GaussianPyramid,
    gaussian_pyramid,
    dog_pyramid,
)
from sara_tpu.image.color import rgb_to_gray, gray_from_any

__all__ = [
    "gaussian_kernel_1d", "separable_conv2d", "gaussian_blur",
    "resize_bilinear", "downscale2", "upscale2", "warp_bilinear",
    "warp_homography", "bilinear_sample",
    "gradient", "gradient_polar", "laplacian", "hessian",
    "second_moment_matrix", "harris_cornerness",
    "PyramidParams", "GaussianPyramid", "gaussian_pyramid", "dog_pyramid",
    "rgb_to_gray", "gray_from_any",
]
