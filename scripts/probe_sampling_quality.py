"""Quality of the 4 sampling configurations on the TPU's ds=2 maps
(CPU harness with orientation_downsample=2 reproduces the TPU numbers —
NOTES.md round 2). Decides hist/desc nearest-vs-bilinear defaults.
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_platforms", "cpu")

import eval_detection_quality as q  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import PIL.Image  # noqa: E402

from sara_tpu.features import SIFTParams, compute_sift_keypoints  # noqa
from sara_tpu.matching import MatchParams, match_descriptors  # noqa


def main():
    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    img = np.asarray(img.convert("L").resize((640, 480)), np.float32) / 255.0
    h, w = img.shape
    H = q.make_warp(h, w)
    warped = q.warp_image(img, H)
    xy_cv_a, xy_cv_b, pairs_cv, _ = q.run_opencv(img, warped)
    cor_cv, _ = q.match_quality(xy_cv_a, xy_cv_b, pairs_cv, H)
    print(f"opencv: kp {len(xy_cv_a)} correct {cor_cv}", flush=True)

    base = SIFTParams(orientation_downsample=2)
    for hist_n in (False, True):
        for desc_n in (False, True):
            p = dataclasses.replace(base, hist_sample_nearest=hist_n,
                                    desc_sample_nearest=desc_n)
            ka = compute_sift_keypoints(jnp.asarray(img), p)
            kb = compute_sift_keypoints(jnp.asarray(warped), p)
            m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
            sel_a = np.asarray(ka.mask)
            sel_b = np.asarray(kb.mask)
            xy_a = np.asarray(ka.xy)[sel_a]
            xy_b = np.asarray(kb.xy)[sel_b]
            ra = np.cumsum(sel_a) - 1
            rb = np.cumsum(sel_b) - 1
            mm = np.asarray(m.mask)
            mi = ra[np.asarray(m.i)[mm]]
            mj = rb[np.asarray(m.j)[mm]]
            cor, _ = q.match_quality(xy_a, xy_b, np.stack([mi, mj], 1), H)
            rep, _ = q.repeatability(xy_a, xy_b, H, h, w)
            print(f"hist_nearest={hist_n!s:5} desc_nearest={desc_n!s:5} "
                  f"kp {len(xy_a)} correct {cor} "
                  f"({cor/max(cor_cv,1):.3f}x) rep {rep:.3f}", flush=True)


if __name__ == "__main__":
    main()
