"""Benchmark: two-view SIFT frontend (BASELINE config 1) on the TPU.

Measures end-to-end detect+describe+match throughput of sara-tpu on the
bundled image pair and compares against OpenCV's CPU SIFT + BF matcher run
on the same machine — the stand-in for the reference's CPU path (the
reference publishes no numbers, BASELINE.md; its own benchmark scripts
compare against OpenCV too:
python/oddkiva/sara/pybind11/benchmark/sift_pysara_impl.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pair(h=480, w=640):
    import PIL.Image

    def load(p):
        img = PIL.Image.open(p).convert("L").resize((w, h))
        return np.asarray(img, np.float32) / 255.0

    try:
        a = load("/root/reference/data/sunflowerField.jpg")
        b = load("/root/reference/data/dog.jpg")
    except Exception:
        rs = np.random.RandomState(0)
        base = rs.rand(h, w).astype(np.float32)
        a, b = base, np.roll(base, 16, axis=1)
    return a, b


def bench_ours(a, b, iters=10):
    import jax
    import jax.numpy as jnp

    from sara_tpu.features import compute_sift_keypoints, SIFTParams
    from sara_tpu.matching import match_descriptors, MatchParams

    # Per-octave programs are jitted individually (and cached per shape), so
    # warmup compiles incrementally instead of one monolithic XLA program.
    params = SIFTParams()
    mp = MatchParams(ratio=0.8)

    def two_view(img_a, img_b):
        ka = compute_sift_keypoints(img_a, params)
        kb = compute_sift_keypoints(img_b, params)
        m = match_descriptors(ka, kb, mp)
        return ka, kb, m

    ja, jb = jnp.asarray(a), jnp.asarray(b)
    t0 = time.perf_counter()
    ka, kb, m = two_view(ja, jb)
    jax.block_until_ready(m.mask)
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s; "
        f"kp {int(ka.count())}/{int(kb.count())}, matches {int(m.count())}")

    t0 = time.perf_counter()
    for _ in range(iters):
        ka, kb, m = two_view(ja, jb)
    jax.block_until_ready(m.mask)
    dt = (time.perf_counter() - t0) / iters
    # One iteration = 2 frames detected + described + matched.
    return 2.0 / dt, int(ka.count()), int(m.count())


def bench_opencv(a, b, iters=5):
    import cv2

    a8 = (a * 255).astype(np.uint8)
    b8 = (b * 255).astype(np.uint8)
    sift = cv2.SIFT_create()
    bf = cv2.BFMatcher()

    def run():
        ka, da = sift.detectAndCompute(a8, None)
        kb, db = sift.detectAndCompute(b8, None)
        matches = bf.knnMatch(da, db, k=2)
        good = [m for m, n in matches if m.distance < 0.8 * n.distance]
        return len(ka), len(kb), len(good)

    run()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        na, nb, nm = run()
    dt = (time.perf_counter() - t0) / iters
    log(f"opencv: kp {na}/{nb}, matches {nm}, {2.0/dt:.2f} frames/s")
    return 2.0 / dt


def main():
    a, b = load_pair()
    ours_fps, n_kp, n_m = bench_ours(a, b)
    log(f"sara-tpu: {ours_fps:.2f} frames/s")
    try:
        cv_fps = bench_opencv(a, b)
    except Exception as e:
        log("opencv baseline failed:", e)
        cv_fps = float("nan")
    vs = ours_fps / cv_fps if cv_fps == cv_fps else 1.0
    print(json.dumps({
        "metric": "two_view_sift_detect_describe_match_throughput",
        "value": round(ours_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
