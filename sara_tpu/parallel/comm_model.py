"""Analytic communication/compute model for the sharded Schur BA.

BASELINE config 5 demands >= 80% scaling efficiency on a multi-chip mesh;
no multi-chip hardware exists in this environment, so the scaling claim is
made falsifiable the only honest way available: an explicit model of what
each shard computes and what the mesh must move per LM iteration, with a
test asserting the scaling structure (tests/test_parallel.py) and a
printed report in scripts/bench_ba.py --mesh.

Sharding layout (sara_tpu.parallel.dist_ba):
- observations + points sharded over the mesh axis (point V blocks stay
  on the shard owning the point's observations),
- cameras + 6x6 U blocks replicated; per-shard partial camera
  contributions combined by psum (XLA inserts them for the segment-sums).

Per LM iteration the collectives are therefore:
- ONE all-reduce of the camera-side normal-equation blocks:
  U (C, 6, 6) + camera gradient (C, 6) -> 42 C floats,
- per CG iteration, ONE all-reduce of the camera-space matvec partials
  (C, 6) plus O(1) scalars for the dot products.

Everything point- and observation-side is local. So replicated traffic is
O(C) (independent of O and of the shard count), while per-shard FLOPs are
O(O / n) + O(C) — the model the test pins down. On a v5e ICI ring
(~45 GB/s/link, all-reduce cost 2 (n-1)/n * bytes / bw) the camera
all-reduces are microseconds for C <= 10^4, far below the per-shard
compute, which is where the >= 80% efficiency claim comes from.
"""

from __future__ import annotations

from dataclasses import dataclass

from sara_tpu.utils.roofline import PEAK_F32_FLOPS

ICI_BW = 45e9  # bytes/s per link, v5e 2-D torus (per direction)
DCN_BW = 25e9  # bytes/s per host NIC, inter-host data-center network —
               # what cross-host boundary exchanges of the partitioned
               # dense-Schur BA (ba/partitioned.py) ride on


@dataclass(frozen=True)
class BACommModel:
    C: int
    P: int
    O: int
    cg_iters: int
    n: int
    dtype_bytes: int = 4

    # -- compute ------------------------------------------------------------

    def per_shard_obs_flops(self) -> float:
        """Observation-proportional work of one shard (jacobians, W/V block
        products, CG gather terms) — shrinks ~ 1/n."""
        O_shard = -(-self.O // self.n)
        jac = O_shard * 800.0
        blocks = O_shard * 260.0
        cg = self.cg_iters * O_shard * 160.0
        return jac + blocks + cg

    def per_shard_cam_flops(self) -> float:
        """Replicated camera-side work (U inverse, camera matvecs) — every
        shard repeats it; O(C), independent of n."""
        return self.C * 216.0 + self.cg_iters * self.C * 72.0

    def per_shard_flops(self) -> float:
        return self.per_shard_obs_flops() + self.per_shard_cam_flops()

    # -- communication ------------------------------------------------------

    def allreduce_bytes(self) -> float:
        """Payload all-reduced per LM iteration — O(C), independent of n
        and O."""
        cam_blocks = self.C * (36 + 6) * self.dtype_bytes
        per_cg = self.cg_iters * (self.C * 6 + 4) * self.dtype_bytes
        return cam_blocks + per_cg

    def allreduce_seconds(self) -> float:
        """Ring all-reduce time: 2 (n-1)/n * bytes / link_bw."""
        if self.n <= 1:
            return 0.0
        return 2.0 * (self.n - 1) / self.n * self.allreduce_bytes() / ICI_BW

    def compute_seconds(self, achieved: float = 1.0) -> float:
        """Per-shard compute time at ``achieved`` fraction of f32 peak
        (1.0 = speed of light; pass the measured roofline fraction for a
        prediction of the real pipeline)."""
        return self.per_shard_flops() / (PEAK_F32_FLOPS * achieved)

    def scaling_efficiency(self, achieved: float = 0.05) -> float:
        """Predicted efficiency vs perfect 1/n scaling of the n=1 work.

        ``achieved``: compute throughput as a fraction of peak — the
        efficiency claim is conditional on it (at literal speed-of-light
        the O(C) all-reduce is no longer negligible; at the config-4
        target of 5% of roofline it is)."""
        t1 = BACommModel(self.C, self.P, self.O, self.cg_iters, 1,
                         self.dtype_bytes).compute_seconds(achieved)
        tn = self.compute_seconds(achieved) + self.allreduce_seconds()
        return t1 / (self.n * tn)

    def report(self) -> str:
        eff = self.scaling_efficiency()
        return (f"BA comm model C={self.C} P={self.P} O={self.O} "
                f"cg={self.cg_iters} n={self.n}: "
                f"per-shard {self.per_shard_flops()/1e9:.3f} GFLOP "
                f"(obs {self.per_shard_obs_flops()/1e9:.3f} + cam "
                f"{self.per_shard_cam_flops()/1e9:.3f}), "
                f"all-reduce {self.allreduce_bytes()/1e6:.3f} MB "
                f"({self.allreduce_seconds()*1e6:.1f} us on ICI) "
                f"-> predicted scaling efficiency {100*eff:.1f}% "
                f"at 5%-of-roofline compute")
