"""End-to-end SIFT + matching validation on a real image under a known warp.

This replicates the spirit of the reference's detector/descriptor tests and
benchmark scripts (reference: cpp/test/Sara/FeatureDescriptors/,
python/oddkiva/sara/pybind11/benchmark/sift_pysara_impl.py): detect on an
image and a transformed copy, match, and verify geometric consistency.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sara_tpu.features import compute_sift_keypoints, SIFTParams
from sara_tpu.image import gray_from_any, warp_homography
from sara_tpu.matching import match_descriptors, MatchParams

DATA = "/root/reference/data"


def _load_small(name, max_w=320):
    import PIL.Image

    img = PIL.Image.open(os.path.join(DATA, name)).convert("L")
    w, h = img.size
    s = max_w / w
    img = img.resize((max_w, int(h * s)))
    return np.asarray(img, np.float32) / 255.0


@pytest.fixture(scope="module")
def dog_img():
    return _load_small("dog.jpg")


def _match_under_homography(img, H, tol=3.0):
    warped = warp_homography(jnp.asarray(img), jnp.linalg.inv(jnp.asarray(H)),
                             img.shape[0], img.shape[1])
    p = SIFTParams()
    ka = compute_sift_keypoints(jnp.asarray(img), p)
    kb = compute_sift_keypoints(warped, p)
    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    mm = np.asarray(m.mask)
    ia, jb = np.asarray(m.i)[mm], np.asarray(m.j)[mm]
    xa = np.asarray(ka.xy)[ia]
    xb = np.asarray(kb.xy)[jb]
    ones = np.ones((len(xa), 1))
    pa = np.concatenate([xa, ones], axis=1) @ np.asarray(H).T
    pa = pa[:, :2] / pa[:, 2:]
    err = np.linalg.norm(pa - xb, axis=1)
    return len(err), float(np.mean(err < tol)) if len(err) else 0.0


def test_identity_selfmatch(dog_img):
    n, inlier_frac = _match_under_homography(dog_img, np.eye(3))
    assert n > 50, f"too few matches: {n}"
    assert inlier_frac > 0.9, f"inlier fraction {inlier_frac}"


def test_translation(dog_img):
    H = np.array([[1, 0, 12.0], [0, 1, -7.0], [0, 0, 1]])
    n, inlier_frac = _match_under_homography(dog_img, H)
    assert n > 30
    assert inlier_frac > 0.7, f"inlier fraction {inlier_frac}"


def test_rotation_30deg(dog_img):
    h, w = dog_img.shape
    c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
    # Rotate about the image center.
    T1 = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1.0]])
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    H = np.linalg.inv(T1) @ R @ T1
    n, inlier_frac = _match_under_homography(dog_img, H)
    assert n > 20, f"too few matches: {n}"
    assert inlier_frac > 0.6, f"inlier fraction {inlier_frac}"


def test_scale_0_8(dog_img):
    H = np.diag([0.8, 0.8, 1.0])
    n, inlier_frac = _match_under_homography(dog_img, H)
    assert n > 20
    assert inlier_frac > 0.6, f"inlier fraction {inlier_frac}"
