import time, sys, numpy as np
def log(*a):
    print(*a, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp
log("devices:", jax.devices())
t0=time.perf_counter()
x = jnp.ones((1024,1024))
(x@x).block_until_ready()
log(f"matmul: {time.perf_counter()-t0:.1f}s")

from sara_tpu.image import gaussian_pyramid, PyramidParams, dog_pyramid
img = jnp.ones((480, 640), jnp.float32)
t0=time.perf_counter()
gp = gaussian_pyramid(img, PyramidParams())
jax.block_until_ready(gp.octaves)
log(f"pyramid: {time.perf_counter()-t0:.1f}s, octaves={len(gp.octaves)}")

dg = dog_pyramid(gp)
from sara_tpu.features.dog import detect_dog_octave, DoGParams
t0=time.perf_counter()
det = detect_dog_octave(dg.octaves[0], DoGParams())
jax.block_until_ready(det["x"])
log(f"detect octave0: {time.perf_counter()-t0:.1f}s")

from sara_tpu.image.differential import gradient_polar
from sara_tpu.features.orientation import dominant_orientations
mag, ori = gradient_polar(gp.octaves[0])
t0=time.perf_counter()
th, tv = dominant_orientations(mag, ori, det["x"], det["y"], det["s"], gp.sigmas, 2)
jax.block_until_ready(th)
log(f"orientation octave0: {time.perf_counter()-t0:.1f}s")

from sara_tpu.features.sift import sift_descriptors
t0=time.perf_counter()
d = sift_descriptors(mag, ori, det["x"], det["y"], det["s"], jnp.zeros_like(det["x"]), gp.sigmas)
jax.block_until_ready(d)
log(f"descriptor octave0: {time.perf_counter()-t0:.1f}s")

from sara_tpu.features import compute_sift_keypoints, SIFTParams
t0=time.perf_counter()
kp = compute_sift_keypoints(img, SIFTParams())
jax.block_until_ready(kp.xy)
log(f"full sift first: {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter()
kp = compute_sift_keypoints(img, SIFTParams())
jax.block_until_ready(kp.xy)
log(f"full sift second: {time.perf_counter()-t0:.1f}s")
