"""Micro-timing of the descriptor & orientation-peak internals on TPU.

desc delta ~17 ms, orient_peaks ~9 ms (probe_sift_prefix). Which op?
Shapes mirror the dominant fo=-1 octave: maps (3, 480, 640, 36) bf16,
K = 3840 descriptor slots / 3072 keypoints.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)
    S, Hc, Wc, FB = 3, 480, 640, 36
    K = 3840
    NO = 8
    maps = jnp.asarray(rs.rand(S, Hc, Wc, FB).astype(np.float32)
                       ).astype(jnp.bfloat16)
    th = jnp.asarray(rs.uniform(-np.pi, np.pi, K).astype(np.float32))
    xs = jnp.asarray(rs.uniform(0, Wc - 1, (K, 16)).astype(np.float32))
    ys = jnp.asarray(rs.uniform(0, Hc - 1, (K, 16)).astype(np.float32))
    si = jnp.asarray(rs.randint(0, S, K))
    F = jnp.asarray(rs.rand(K, 16, FB).astype(np.float32))
    hist = jnp.asarray(rs.rand(K, FB).astype(np.float32))

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*a)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name:22s} {dt:7.2f} ms  (compile {c:.0f}s)", flush=True)

    @jax.jit
    def gathers(xs_, ys_, si_):
        x0 = jnp.floor(xs_).astype(jnp.int32)
        y0 = jnp.floor(ys_).astype(jnp.int32)
        flat = maps.reshape(S * Hc * Wc, FB)
        base = si_[:, None] * (Hc * Wc)

        def take(yy, xx):
            lin = (base + yy * Wc + xx).reshape(-1)
            return jnp.take(flat, lin, axis=0).reshape(K, -1, FB) \
                .astype(jnp.float32)

        f = (take(y0, x0) + take(y0, jnp.minimum(x0 + 1, Wc - 1))
             + take(jnp.minimum(y0 + 1, Hc - 1), x0)
             + take(jnp.minimum(y0 + 1, Hc - 1),
                    jnp.minimum(x0 + 1, Wc - 1)))
        return jnp.sum(f)

    timeit("desc: 4 gathers", gathers, xs, ys, si)

    @jax.jit
    def wfo_build(th_):
        alpha = (jnp.arange(FB, dtype=jnp.float32) + 0.5) * (2 * np.pi / FB)
        ob = (alpha[None, :] - th_[:, None]) / (2 * np.pi) * NO
        o = jnp.arange(NO, dtype=jnp.float32)
        d = jnp.abs((ob[..., None] - o[None, None, :] + NO / 2) % NO - NO / 2)
        return jnp.sum(jnp.maximum(0.0, 1.0 - d))

    timeit("desc: wfo build", wfo_build, th)

    @jax.jit
    def einsum_collapse(F_, th_):
        alpha = (jnp.arange(FB, dtype=jnp.float32) + 0.5) * (2 * np.pi / FB)
        ob = (alpha[None, :] - th_[:, None]) / (2 * np.pi) * NO
        o = jnp.arange(NO, dtype=jnp.float32)
        d = jnp.abs((ob[..., None] - o[None, None, :] + NO / 2) % NO - NO / 2)
        wfo = jnp.maximum(0.0, 1.0 - d)
        return jnp.sum(jnp.einsum("knf,kfo->kno", F_, wfo))

    timeit("desc: wfo+einsum", einsum_collapse, F, th)

    @jax.jit
    def fixed_gemm_shift(F_, th_):
        # Collapse with theta=0 kernel (ONE fixed GEMM), then fractional
        # circular shift of the 8 coarse bins per keypoint.
        alpha = (jnp.arange(FB, dtype=jnp.float32) + 0.5) * (2 * np.pi / FB)
        o = jnp.arange(NO, dtype=jnp.float32)
        d0 = jnp.abs((alpha[:, None] / (2 * np.pi) * NO - o[None, :]
                      + NO / 2) % NO - NO / 2)
        W0 = jnp.maximum(0.0, 1.0 - d0)                       # (36, 8)
        C = (F_.reshape(-1, FB) @ W0).reshape(K, 16, NO)
        sh = th_ / (2 * np.pi) * NO
        i0 = jnp.floor(sh).astype(jnp.int32)
        fr = (sh - i0)[:, None, None]
        idx0 = (jnp.arange(NO)[None, :] + i0[:, None]) % NO    # (K, 8)
        g0 = jnp.take_along_axis(C, idx0[:, None, :].repeat(16, 1), axis=2)
        idx1 = (idx0 + 1) % NO
        g1 = jnp.take_along_axis(C, idx1[:, None, :].repeat(16, 1), axis=2)
        return jnp.sum(g0 * (1 - fr) + g1 * fr)

    timeit("desc: gemm+shift", fixed_gemm_shift, F, th)

    @jax.jit
    def lowe(h):
        for _ in range(6):
            h = (jnp.roll(h, 1, -1) + h + jnp.roll(h, -1, -1)) / 3.0
        return jnp.sum(h)

    timeit("peaks: lowe_smooth", lowe, hist)

    @jax.jit
    def peaks(h):
        left = jnp.roll(h, 1, -1)
        right = jnp.roll(h, -1, -1)
        gmax = jnp.max(h, -1, keepdims=True)
        is_peak = (h > left) & (h > right) & (h >= 0.8 * gmax) & (gmax > 0)
        score = jnp.where(is_peak, h, -1.0)
        vals, idx = jax.lax.top_k(score, 2)
        hl = jnp.take_along_axis(left, idx, -1)
        hc = jnp.take_along_axis(h, idx, -1)
        hr = jnp.take_along_axis(right, idx, -1)
        den = hl - 2 * hc + hr
        off = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (hl - hr) / den, 0.0)
        return jnp.sum(idx + off) + jnp.sum(vals)

    timeit("peaks: find_peaks", peaks, hist)

    @jax.jit
    def argmax_peaks(h):
        # top-2 via argmax + mask (no sort).
        left = jnp.roll(h, 1, -1)
        right = jnp.roll(h, -1, -1)
        gmax = jnp.max(h, -1, keepdims=True)
        is_peak = (h > left) & (h > right) & (h >= 0.8 * gmax) & (gmax > 0)
        score = jnp.where(is_peak, h, -1.0)
        i1 = jnp.argmax(score, -1)
        v1 = jnp.take_along_axis(score, i1[:, None], -1)[:, 0]
        score2 = score.at[jnp.arange(K), i1].set(-1.0)
        i2 = jnp.argmax(score2, -1)
        v2 = jnp.take_along_axis(score2, i2[:, None], -1)[:, 0]
        return jnp.sum(i1 + i2) + jnp.sum(v1 + v2)

    timeit("peaks: argmax-top2", argmax_peaks, hist)

    @jax.jit
    def sample_hist(xs_, ys_, si_):
        from sara_tpu.features.orientation import sample_orientation_maps

        return jnp.sum(sample_orientation_maps(
            maps, xs_[:, 0] * 0 + xs_[:, 0], ys_[:, 0], si_.astype(
                jnp.float32), downsample=1))

    timeit("peaks: sample", sample_hist, xs, ys, si)


if __name__ == "__main__":
    main()
