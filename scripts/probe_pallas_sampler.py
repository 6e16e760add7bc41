"""Same-process A/B of the Pallas patch-DMA sampler vs XLA row gathers.

Shapes mirror the dominant octave of the 480x640 fo=-1 frontend: maps
(5, 480, 640, 36) bf16 (octave-0 image 960x1280 at ds=2), K2 = 5120
descriptor slots x 16 bin centers.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from sara_tpu.ops.patch_sampler import sample_field_patches

    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)
    S, H, W, C = 5, 480, 640, 36
    K, N = 5120, 16
    RAD = 13.0  # max bin-center spread from centroid, map px (sigma 4.03)

    maps = jnp.asarray(rs.rand(S, H, W, C).astype(np.float32)
                       ).astype(jnp.bfloat16)
    cy = rs.uniform(0, H - 1, K)
    cx = rs.uniform(0, W - 1, K)
    ys = jnp.asarray((cy[:, None] + rs.uniform(-RAD, RAD, (K, N))
                      ).astype(np.float32))
    xs = jnp.asarray((cx[:, None] + rs.uniform(-RAD, RAD, (K, N))
                      ).astype(np.float32))
    si = jnp.asarray(rs.randint(0, S, K).astype(np.int32))

    INNER = 10  # amortize the ~27 ms dispatch RTT: INNER iterations with
                # perturbed inputs inside ONE program, one host fetch

    def timeit(name, fn, *a, reps=4):
        @jax.jit
        def many(ys_, xs_):
            acc = 0.0
            for it in range(INNER):
                acc += jnp.sum(fn(ys_ + 0.01 * it, xs_ + 0.01 * it))
            return acc

        t0 = time.perf_counter()
        float(many(*a))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            float(many(*a))
        dt = (time.perf_counter() - t0) / reps / INNER * 1e3
        print(f"{name:18s} {dt:7.2f} ms/iter (incl RTT/{INNER}; "
              f"compile {c:.0f}s)", flush=True)
        return fn(*a)

    flat = maps.reshape(S * H * W, C)
    base = si[:, None] * (H * W)

    @jax.jit
    def xla_nearest(ys_, xs_):
        yn = jnp.round(jnp.clip(ys_, 0, H - 1)).astype(jnp.int32)
        xn = jnp.round(jnp.clip(xs_, 0, W - 1)).astype(jnp.int32)
        lin = (base + yn * W + xn).reshape(-1)
        return jnp.take(flat, lin, axis=0).reshape(K, N, C) \
            .astype(jnp.float32)

    @jax.jit
    def xla_bilinear(ys_, xs_):
        yc = jnp.clip(ys_, 0, H - 1)
        xc = jnp.clip(xs_, 0, W - 1)
        y0 = jnp.floor(yc).astype(jnp.int32)
        x0 = jnp.floor(xc).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        fy = (yc - y0)[..., None]
        fx = (xc - x0)[..., None]

        def tk(yy, xx):
            lin = (base + yy * W + xx).reshape(-1)
            return jnp.take(flat, lin, axis=0).reshape(K, N, C) \
                .astype(jnp.float32)

        return (tk(y0, x0) * (1 - fx) * (1 - fy)
                + tk(y0, x1) * fx * (1 - fy)
                + tk(y1, x0) * (1 - fx) * fy
                + tk(y1, x1) * fx * fy)

    def pallas(ys_, xs_):
        return sample_field_patches(maps, si, ys_, xs_,
                                    max_sample_radius=RAD)

    near = timeit("xla nearest", xla_nearest, ys, xs)
    bil = timeit("xla bilinear", xla_bilinear, ys, xs)
    pal = timeit("pallas patches", pallas, ys, xs)
    err = float(jnp.max(jnp.abs(pal - bil)))
    print(f"pallas vs bilinear max abs err: {err:.4f} "
          f"(bf16 maps -> expect ~1e-2)", flush=True)


if __name__ == "__main__":
    main()
