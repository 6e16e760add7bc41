"""Sub-bisect the descriptor-stage TPU kernel fault at K2=3840.

Stages (separate processes; a fault kills the worker):
  gather  — the 4 bilinear corner gathers only
  einsum  — the 36->8 collapse einsum only (synthetic F)
  full    — the whole field descriptor at K2=3840 (expected: fault)
  chunk   — full field descriptor chunked over K (<=1920/section)

Usage: python probe_fault_desc.py <stage>
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

STAGE = sys.argv[1] if len(sys.argv) > 1 else "gather"


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from sara_tpu.features.api import SIFTParams
    from sara_tpu.features.dog import DoGParams, detect_dog_octave
    from sara_tpu.features.orientation import (find_orientation_peaks,
                                               lowe_smooth, orientation_maps,
                                               sample_orientation_maps)
    from sara_tpu.features.sift import (BIN_SCALE_UNIT, N_ORI, N_SPATIAL,
                                        sift_descriptors_field)
    from sara_tpu.image.differential import gradient
    from sara_tpu.image.pyramid import dog_pyramid, gaussian_pyramid

    print("backend:", jax.default_backend(), "stage:", STAGE, flush=True)

    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    img = img.convert("L").resize((640, 480))
    a = jnp.asarray(np.asarray(img, np.float32) / 255.0)
    params = SIFTParams(dog=DoGParams(capacity=3072))

    @functools.partial(jax.jit, static_argnames=("stage", "p"))
    def prog(image, stage=STAGE, p=params):
        import dataclasses
        gp = gaussian_pyramid(image, p.pyramid)
        dg = dog_pyramid(gp)
        acc = 0.0
        for gauss, dog in zip(gp.octaves, dg.octaves):
            s_, h_, w_ = dog.shape
            cap = min(p.dog.capacity, max(64, (s_ * h_ * w_) // 512))
            det = detect_dog_octave(dog, dataclasses.replace(p.dog,
                                                             capacity=cap))
            gx, gy = gradient(gauss[:-1])
            cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else None
            ds = 2 if cdt is not None else 1
            maps = orientation_maps(gx, gy, gp.sigmas[:-1], compute_dtype=cdt,
                                    downsample=ds)
            hist = lowe_smooth(sample_orientation_maps(
                maps, det["x"], det["y"], det["s"], downsample=ds))
            theta, tvalid = find_orientation_peaks(
                hist, max_peaks=p.max_orientations)
            K = det["x"].shape[0]
            P = p.max_orientations
            rep = lambda arr: jnp.repeat(arr, P)
            x, y, s = rep(det["x"]), rep(det["y"]), rep(det["s"])
            mask = rep(det["mask"]) & tvalid.reshape(-1)
            th = theta.reshape(-1)
            K2 = K + K // 4
            order = jnp.argsort((~mask).astype(jnp.int32), stable=True)[:K2]
            x, y, s, th, mask = (arr[order] for arr in (x, y, s, th, mask))

            S, Hc, Wc, FB = maps.shape
            s_idx = jnp.clip(jnp.round(s).astype(jnp.int32), 0, S - 1)
            sig_table = jnp.asarray(gp.sigmas[:-1], jnp.float32)
            l = BIN_SCALE_UNIT * sig_table[s_idx]
            u = (jnp.arange(N_SPATIAL, dtype=jnp.float32)
                 - (N_SPATIAL - 1) / 2.0)
            uu, vv = jnp.meshgrid(u, u)
            ct, st = jnp.cos(th), jnp.sin(th)
            dx = (ct[:, None, None] * uu - st[:, None, None] * vv) \
                * l[:, None, None]
            dy = (st[:, None, None] * uu + ct[:, None, None] * vv) \
                * l[:, None, None]
            xs = (x[:, None, None] + dx).reshape(K2, -1) / ds
            ys = (y[:, None, None] + dy).reshape(K2, -1) / ds
            xc = jnp.clip(xs, 0.0, Wc - 1.0)
            yc = jnp.clip(ys, 0.0, Hc - 1.0)
            x0 = jnp.floor(xc).astype(jnp.int32)
            y0 = jnp.floor(yc).astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, Wc - 1)
            y1 = jnp.minimum(y0 + 1, Hc - 1)
            fx = (xc - x0)[..., None].astype(jnp.float32)
            fy = (yc - y0)[..., None].astype(jnp.float32)
            si = s_idx[:, None]

            if stage == "gather":
                F = (maps[si, y0, x0].astype(jnp.float32) * (1 - fx) * (1 - fy)
                     + maps[si, y0, x1].astype(jnp.float32) * fx * (1 - fy)
                     + maps[si, y1, x0].astype(jnp.float32) * (1 - fx) * fy
                     + maps[si, y1, x1].astype(jnp.float32) * fx * fy)
                acc += jnp.sum(F)
                continue
            if stage == "einsum":
                F = jnp.broadcast_to(
                    jnp.sum(maps.astype(jnp.float32), axis=(0, 1, 2))[None,
                                                                      None, :],
                    (K2, 16, FB))
                alpha = (jnp.arange(FB, dtype=jnp.float32) + 0.5) \
                    * (2 * jnp.pi / FB)
                ob = (alpha[None, :] - th[:, None]) / (2 * jnp.pi) * N_ORI
                o = jnp.arange(N_ORI, dtype=jnp.float32)
                d = jnp.abs((ob[..., None] - o[None, None, :] + N_ORI / 2)
                            % N_ORI - N_ORI / 2)
                wfo = jnp.maximum(0.0, 1.0 - d)
                desc = jnp.einsum("knf,kfo->kno", F, wfo)
                acc += jnp.sum(desc)
                continue
            if stage == "chunk":
                CH = 1920
                parts = []
                for c0 in range(0, K2, CH):
                    c1 = min(c0 + CH, K2)
                    parts.append(sift_descriptors_field(
                        maps, x[c0:c1], y[c0:c1], s[c0:c1], th[c0:c1],
                        gp.sigmas[:-1], downsample=ds))
                desc = jnp.concatenate(parts, axis=0)
                acc += jnp.sum(desc) + jnp.sum(mask)
                continue
            # full
            desc = sift_descriptors_field(maps, x, y, s, th, gp.sigmas[:-1],
                                          downsample=ds)
            acc += jnp.sum(desc) + jnp.sum(mask)
        return acc

    t0 = time.perf_counter()
    out = float(prog(a))
    print(f"{STAGE} OK: acc={out:.3f} ({time.perf_counter()-t0:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
