"""Measure segment-sum strategies for the BA block assembly on TPU.

gn_blocks measured 2.66 s at O=800k: the scatter-add lowering of
jax.ops.segment_sum serializes on TPU. Variants:

  scatter         — jax.ops.segment_sum (current)
  scatter_sorted  — same with indices_are_sorted=True
  cumsum          — sorted indices: global cumsum + boundary diff
  cumsum2         — two-level (within-block cumsum + block-offset cumsum)

Each timed on (O, 36) data summed into C=256 segments (the U blocks) and
(O, 9) into P=60k segments (the V blocks). Precision vs f64 reference is
printed for the cumsum variants (global f32 cumsum over 1e11-scale
prefixes can lose 3-4 digits on small late segments).

Usage: python probe_segsum.py [--obs 800000]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=800_000)
    ap.add_argument("--cams", type=int, default=256)
    ap.add_argument("--points", type=int, default=60_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)
    O = args.obs

    def bench(name, fn, *a, ref=None):
        t0 = time.perf_counter()
        out = np.asarray(fn(*a))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            out = np.asarray(fn(*a))
        dt = (time.perf_counter() - t0) / 5 * 1e3
        msg = f"{name:18s} {dt:8.1f} ms  (compile {compile_s:.0f}s)"
        if ref is not None:
            seg_mag = np.abs(ref) + np.abs(ref).mean()
            rel = np.abs(out - ref) / seg_mag
            msg += f"  max-rel-err {rel.max():.2e}"
        print(msg, flush=True)
        return out

    for label, nseg, k in (("U-blocks", args.cams, 36),
                           ("V-blocks", args.points, 9)):
        print(f"--- {label}: O={O} -> {nseg} segments, k={k}", flush=True)
        idx = np.sort(rs.randint(0, nseg, O)).astype(np.int32)
        data = (rs.normal(size=(O, k)) ** 2 * 300.0).astype(np.float32)
        jidx = jnp.asarray(idx)
        jdata = jnp.asarray(data)
        # f64 host reference.
        ref = np.zeros((nseg, k))
        np.add.at(ref, idx, data.astype(np.float64))

        f_scatter = jax.jit(lambda d, i: jax.ops.segment_sum(d, i, nseg))
        bench("scatter", f_scatter, jdata, jidx, ref=ref)

        f_sorted = jax.jit(lambda d, i: jax.ops.segment_sum(
            d, i, nseg, indices_are_sorted=True))
        bench("scatter_sorted", f_sorted, jdata, jidx, ref=ref)

        starts = np.searchsorted(idx, np.arange(nseg)).astype(np.int32)
        jstarts = jnp.asarray(starts)

        @jax.jit
        def f_cumsum(d, s):
            c = jnp.cumsum(d, axis=0)
            c = jnp.concatenate([jnp.zeros((1, d.shape[1]), d.dtype), c])
            ends = jnp.concatenate([s[1:], jnp.asarray([d.shape[0]],
                                                       jnp.int32)])
            return c[ends] - c[s]

        bench("cumsum", f_cumsum, jdata, jstarts, ref=ref)

        B = 1024
        nb = -(-O // B)
        padO = nb * B

        @jax.jit
        def f_cumsum2(d, s):
            dp = jnp.pad(d, ((0, padO - O), (0, 0)))
            blk = dp.reshape(nb, B, d.shape[1])
            inner = jnp.cumsum(blk, axis=1)              # within-block
            tot = inner[:, -1, :]                        # block totals
            off = jnp.cumsum(tot, axis=0) - tot          # exclusive offsets
            flat = (inner + off[:, None, :]).reshape(padO, d.shape[1])
            c = jnp.concatenate([jnp.zeros((1, d.shape[1]), d.dtype), flat])
            ends = jnp.concatenate([s[1:], jnp.asarray([O], jnp.int32)])
            return c[ends] - c[s]

        bench("cumsum2", f_cumsum2, jdata, jstarts, ref=ref)


if __name__ == "__main__":
    main()
