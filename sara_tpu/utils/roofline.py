"""Roofline / MFU accounting for the hot pipelines.

BASELINE config 4 asks for "BA iters/s at speed-of-light per chip"; this
module makes "fast" defensible by estimating the FLOPs and HBM bytes of
one BA LM iteration and one SIFT frontend frame, and comparing measured
times against the chip's roofline bound max(flops/peak_flops,
bytes/peak_bw).

Peak numbers are per TPU v5e (the "TPU v5 lite" chip this repo targets):
197 TFLOP/s bf16 / ~49 TFLOP/s f32 on the MXU, 819 GB/s HBM. The f32
figure assumes the 3-pass f32 matmul decomposition; pure-VPU elementwise
work peaks far lower (~4 TFLOP/s) — pass ``vpu=True`` for stages that
cannot touch the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass

PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 49e12
PEAK_VPU_FLOPS = 4e12
PEAK_HBM_BW = 819e9


@dataclass(frozen=True)
class Estimate:
    flops: float
    bytes: float
    note: str = ""

    def roofline_seconds(self, peak_flops: float = PEAK_F32_FLOPS,
                         peak_bw: float = PEAK_HBM_BW) -> float:
        return max(self.flops / peak_flops, self.bytes / peak_bw)

    def bound(self, peak_flops: float = PEAK_F32_FLOPS,
              peak_bw: float = PEAK_HBM_BW) -> str:
        return ("compute" if self.flops / peak_flops
                > self.bytes / peak_bw else "memory")

    def achieved_fraction(self, measured_seconds: float,
                          peak_flops: float = PEAK_F32_FLOPS,
                          peak_bw: float = PEAK_HBM_BW) -> float:
        """roofline_time / measured — 1.0 means speed-of-light."""
        return self.roofline_seconds(peak_flops, peak_bw) / max(
            measured_seconds, 1e-12)


def ba_lm_iteration(C: int, P: int, O: int, cg_iters: int,
                    dtype_bytes: int = 4) -> Estimate:
    """One LM iteration of ba.core.bundle_adjust.

    Dominant terms per observation: residual+jacobian autodiff (~600 flops
    incl. so3_exp and the 2x6 / 2x3 jacobians), the U/V/W block products
    (6x6 + 3x3 + 6x3 outer products: ~200 flops), and per CG iteration the
    matrix-free Schur matvec (W gather: 2*(6*3)*2 = ~80 flops + the V^-1
    and U products). Memory: the (O, 2, 6) + (O, 2, 3) jacobian and
    (O, 6, 3) W arrays dominate HBM traffic; each CG iteration re-reads W.
    """
    jac_flops = O * 800.0
    block_flops = O * 260.0
    cg_flops = cg_iters * (O * 160.0 + C * 72.0 + P * 18.0)
    inv_flops = C * 216.0 + P * 27.0
    flops = jac_flops + block_flops + cg_flops + inv_flops

    w_bytes = O * 18 * dtype_bytes          # (O, 6, 3)
    jac_bytes = O * (12 + 6 + 2) * dtype_bytes
    cg_bytes = cg_iters * (O * 18 * dtype_bytes       # re-read W
                           + (C * 36 + P * 9) * dtype_bytes)
    bytes_ = 2 * jac_bytes + 2 * w_bytes + cg_bytes
    return Estimate(flops, bytes_, f"BA C={C} P={P} O={O} cg={cg_iters}")


def sift_frame(H: int, W: int, scales: int = 3, first_octave: int = -1,
               keypoints: int = 2048) -> Estimate:
    """One SIFT frontend frame (pyramid + DoG + orientation + descriptor).

    Pyramid: per octave, G-1 separable blurs as banded matmuls — the band
    matmul does 2*H*W*(H+W)-ish MAC work but rides the MXU; count the
    effective dense-band cost r~4sigma taps: 2 passes * 2*taps*H*W.
    Orientation maps: 36-bin dense maps blurred per scale (banded matmul,
    bf16). Descriptors: ~64 row-gathers of 36-vectors per keypoint.
    Octave areas form a geometric series: total ~4/3 of the base octave
    (x4 when first_octave=-1).
    """
    area = float(H * W) * (4.0 if first_octave < 0 else 1.0) * 4.0 / 3.0
    G = scales + 3
    blur_flops = area * (G - 1) * 2 * 2 * 24        # ~24-tap effective band
    dog_flops = area * (G - 1) * 2
    grad_flops = area * (G - 2) * 8
    ori_maps_flops = area / 4.0 * scales * 36 * 2 * 2 * 12  # ds=2 maps
    desc_flops = keypoints * 64 * 36 * 4
    flops = blur_flops + dog_flops + grad_flops + ori_maps_flops + desc_flops

    pyr_bytes = area * G * 4 * 2
    ori_bytes = area / 4.0 * scales * 36 * 2 * 2     # bf16 dense maps
    # 16 nearest row-gathers per keypoint (round-3 default; bilinear = 64)
    desc_bytes = keypoints * (16 * 36 * 2 + 128 * 4)
    bytes_ = pyr_bytes + ori_bytes + desc_bytes
    return Estimate(flops, bytes_,
                    f"SIFT {H}x{W} fo={first_octave} K={keypoints}")


def match_pair(k1: int, k2: int, dim: int = 128,
               dtype_bytes: int = 4) -> Estimate:
    """Brute-force descriptor matching of a (k1, dim) x (k2, dim) pair:
    one GEMM + top-2 row reductions + mutual check."""
    gemm_flops = 2.0 * k1 * k2 * dim
    reduce_flops = 4.0 * k1 * k2
    flops = gemm_flops + reduce_flops
    bytes_ = (k1 + k2) * dim * dtype_bytes + k1 * k2 * dtype_bytes
    return Estimate(flops, bytes_, f"match {k1}x{k2} d={dim}")


def report(name: str, est: Estimate, measured_seconds: float,
           peak_flops: float = PEAK_F32_FLOPS) -> str:
    frac = est.achieved_fraction(measured_seconds, peak_flops)
    return (f"{name}: {est.flops/1e9:.2f} GFLOP, {est.bytes/1e6:.1f} MB -> "
            f"roofline {est.roofline_seconds(peak_flops)*1e3:.2f} ms "
            f"({est.bound(peak_flops)}-bound), measured "
            f"{measured_seconds*1e3:.2f} ms, {100*frac:.1f}% of roofline")
