"""Incremental visual odometry / SfM pipeline.

Rebuild of the reference's OdometryPipeline
(reference: cpp/src/DO/Sara/SfM/Odometry/OdometryPipeline.cpp:29-423; call
stack per SURVEY.md §3.1):

  per frame: undistort -> detect SIFT -> match vs previous -> E-RANSAC
  relative pose -> update feature tracks -> PnP (>= 3 poses) ->
  triangulate new tracks -> bundle adjust -> write back.

Division of labor (TPU-first): detection / matching / RANSAC / triangulation
/ BA are jitted fixed-capacity device programs; the pose graph, tracks and
map bookkeeping live on the host (NumPy + native union-find). Device calls
use bucketed capacities so shapes recompile only when buckets grow.

Failure handling mirrors the reference: < min inliers for the relative pose
or PnP aborts geometry growth for that frame and the pipeline continues
(reference: OdometryPipeline.cpp:173-179, 270-274).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from sara_tpu.core.types import Keypoints
from sara_tpu.features import SIFTParams, compute_sift_keypoints
from sara_tpu.image import gray_from_any, warp_bilinear
from sara_tpu.matching import MatchParams, match_descriptors
from sara_tpu.mvg import triangulate_linear
from sara_tpu.ransac import estimate_absolute_pose, estimate_relative_pose
from sara_tpu.ba import BAProblem, BAOptions, bundle_adjust
from sara_tpu.sfm.pointcloud import PointCloudGenerator
from sara_tpu.sfm.pose_graph import CameraPoseGraph
from sara_tpu.sfm.tracker import FeatureTracker


def _PyramidParams0():
    from sara_tpu.image.pyramid import PyramidParams

    return PyramidParams(first_octave=0)


def _DoGParams1024():
    from sara_tpu.features.dog import DoGParams

    return DoGParams(capacity=1024)


@dataclass(frozen=True)
class OdometryConfig:
    """Pipeline knobs (defaults mirror the reference, FeatureParams.hpp:8-14,
    RelativePoseEstimator.hpp:18-20, CameraPoseEstimator.hpp:41-49)."""

    # The reference SfM pipeline detects WITHOUT the -1 upsampled octave
    # (FeatureParams.hpp:10 `ImagePyramidParams(0)`) — 4x cheaper per frame;
    # the standalone-detector default (SIFTParams()) is first_octave=-1.
    # desc_sample_nearest stays OFF here: at capacity 1024 the VO frontend
    # is dispatch-bound, not gather-bound, and on the small VO frames
    # (fo=0, ds=2 maps) the nearest shift measurably hurts trajectory
    # accuracy (ATE 0.10 vs 0.04 on the 240x320 room bench).
    sift: SIFTParams = field(default_factory=lambda: SIFTParams(
        pyramid=_PyramidParams0(), dog=_DoGParams1024(), total_capacity=4096,
        desc_sample_nearest=False))
    match_ratio: float = 0.8
    rel_pose_samples: int = 1000
    rel_pose_threshold_px: float = 4.0
    rel_pose_min_inliers: int = 100
    # Two-stage E-RANSAC: run a cheap first pass of this many hypotheses
    # in the fused per-frame program, and only on rejection retry at the
    # full rel_pose_samples (the reference's confidence-based early exit
    # is host control flow XLA cannot express; after the ratio+mutual
    # match filter VO inlier ratios are high enough that a small first
    # pass almost always succeeds). 0 disables the fast pass.
    rel_pose_samples_fast: int = 128
    # Basis remixes of the 5-pt solver in the fast pass (full passes keep
    # the solver default 4): each remix is ~25% of the per-hypothesis
    # cost, and the rejection fallback already retries at full strength.
    rel_pose_remix_fast: int = 2
    pnp_samples: int = 1000
    pnp_threshold_px: float = 5.0
    pnp_min_inliers: int = 50
    ba_options: BAOptions = field(default_factory=lambda: BAOptions(max_iters=20))
    ba_window: int = 8            # poses in the BA window (0 = all)
    ba_every: int = 1             # run BA every k accepted frames
    # Additionally re-adjust the FULL trajectory every k accepted frames
    # (0 = never). Windowed BA freezes early poses once the window slides
    # past them, locking in whatever error the monocular bootstrap drew —
    # the round-5 seeded A/B measured ATE 0.03-0.20 across seeds from that
    # draw alone (probe_ab_vo.py). A periodic full-graph pass (cheap under
    # the dense-Schur solver; camera axis pow2-bucketed so programs are
    # reused) keeps re-polishing the early segment as later evidence
    # accumulates.
    full_ba_every: int = 0
    min_track_length: int = 2
    frontend_batch: int = 4       # frames per fused frontend dispatch
    # Live visualization (the TPU-headless analog of the reference's
    # Kalpana VO scene, Kalpana/EasyGL/SimpleSceneRenderer/
    # PointCloudScene.hpp): rewrite an interactive HTML viewer with the
    # growing cloud + trajectory every k accepted frames. "" disables.
    live_viewer_path: str = ""
    live_viewer_every: int = 5


@functools.partial(jax.jit, static_argnames=(
    "sift_params", "ratio", "threshold_px", "num_samples", "min_inliers",
    "undistort", "n_remix"))
def _fused_frontend(img, umap, vmap_, prev_kp, key, K, sift_params, ratio,
                    threshold_px, num_samples, min_inliers, undistort,
                    n_remix=0):
    """Undistort + detect + match + E-RANSAC as ONE device program.

    On the target TPU runtime every dispatch costs ~27 ms RTT; fusing the
    three per-frame device stages (the reference runs them as separate
    passes, OdometryPipeline.cpp:69-130) removes two of the three
    round-trips from the steady-state VO loop.
    """
    from sara_tpu.features.api import _compute_sift_jit

    if undistort:
        img = warp_bilinear(img, umap, vmap_)
    kp = _compute_sift_jit(img, sift_params)
    m = match_descriptors(prev_kp, kp, MatchParams(ratio=ratio))
    v = kp.xy[m.j]
    res, R, t = estimate_relative_pose(
        key, prev_kp.xy, v, m.mask, K, K, threshold_px=threshold_px,
        num_samples=num_samples, min_inliers=min_inliers, n_remix=n_remix)
    return kp, m, res, R, t


@functools.partial(jax.jit, static_argnames=(
    "sift_params", "ratio", "threshold_px", "num_samples", "min_inliers",
    "undistort"))
def _fused_frontend_batch(imgs, umap, vmap_, prev_kp, keys, K, sift_params,
                          ratio, threshold_px, num_samples, min_inliers,
                          undistort):
    """Multi-frame frontend: B frames of undistort+detect+match+E-RANSAC
    as ONE device program.

    Detection is independent per frame (vmapped); matching/RANSAC pairs
    each frame with its predecessor (frame 0 pairs with ``prev_kp``), so the
    whole lookahead window costs a single dispatch round-trip (~27 ms on
    the target runtime) instead of B of them. Host-side graph/track/map
    growth then consumes the results sequentially.
    """
    from sara_tpu.features.api import _compute_sift_jit

    def detect(img):
        if undistort:
            img = warp_bilinear(img, umap, vmap_)
        return _compute_sift_jit(img, sift_params)

    kps = jax.vmap(detect)(imgs)
    left = jax.tree_util.tree_map(
        lambda p, s: jnp.concatenate([p[None], s[:-1]], axis=0), prev_kp, kps)

    def pair(a, b, key):
        m = match_descriptors(a, b, MatchParams(ratio=ratio))
        v = b.xy[m.j]
        res, R, t = estimate_relative_pose(
            key, a.xy, v, m.mask, K, K, threshold_px=threshold_px,
            num_samples=num_samples, min_inliers=min_inliers)
        return m, res, R, t

    ms, ress, Rs, ts = jax.vmap(pair)(left, kps, keys)
    return kps, ms, ress, Rs, ts


def _bucket(n: int, lo: int = 256) -> int:
    """Round up to a power of two (shape bucketing to limit recompiles)."""
    b = lo
    while b < n:
        b *= 2
    return b


def _pad_to(a: np.ndarray, n: int, fill=0):
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


class OdometryPipeline:
    def __init__(self, K: np.ndarray, config: OdometryConfig = OdometryConfig(),
                 undistortion_maps=None):
        self.K = np.asarray(K, float)
        self.cfg = config
        self.maps = undistortion_maps  # (map_u, map_v) or None
        self.pose_graph = CameraPoseGraph()
        self.tracker = FeatureTracker()
        self.point_cloud = PointCloudGenerator()
        # Per accepted frame: host copies of keypoint data.
        self.frames: list[dict] = []
        self._prev_keypoints: Optional[Keypoints] = None
        self._frames_since_ba = 0
        self._frames_since_full_ba = 0
        self._accepted_since_viewer = 0
        self._key = jax.random.PRNGKey(0)
        # Original pixels of the frame currently being integrated (for
        # scene-point color sampling); only the newest frame's image is
        # retained.
        self._pending_image: Optional[np.ndarray] = None
        # Called as on_accept(kp, vertex_id) after every ACCEPTED frame
        # (device-resident Keypoints). Lets loop-closure retrieval ride the
        # batched/pipelined path too: per-frame descriptors never leave the
        # device (LoopCloser computes its VLAD signature in a jitted
        # program and fetches 8 KB).
        self.on_accept = None

    # -- helpers ------------------------------------------------------------

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _detect(self, image) -> Keypoints:
        img = gray_from_any(image)
        if self.maps is not None:
            img = warp_bilinear(img, self.maps[0], self.maps[1])
        return compute_sift_keypoints(img, self.cfg.sift)

    def _rays(self, xy: np.ndarray) -> np.ndarray:
        ph = np.concatenate([xy, np.ones((len(xy), 1))], axis=1)
        r = ph @ np.linalg.inv(self.K).T
        return r / np.linalg.norm(r, axis=1, keepdims=True)

    # -- main entry ---------------------------------------------------------

    def process_frame(self, image, frame_index: int = -1) -> bool:
        """Process one (already frame-skipped) video frame.

        Returns True if a new pose was added to the graph. Steady-state
        frames run undistort+detect+match+E-RANSAC as one fused device
        program (one dispatch round-trip instead of three).
        """
        self._pending_image = np.asarray(image, np.float32)
        if len(self.pose_graph) == 0:
            kp = self._detect(image)
            return self.process_keypoints(kp, frame_index)
        img = jnp.asarray(gray_from_any(image), jnp.float32)
        undistort = self.maps is not None
        umap, vmap_ = (self.maps if undistort
                       else (jnp.zeros((1, 1)), jnp.zeros((1, 1))))
        fast = self.cfg.rel_pose_samples_fast
        n_fast = fast if 0 < fast < self.cfg.rel_pose_samples \
            else self.cfg.rel_pose_samples
        kp, m, res, R_rel, t_rel = _fused_frontend(
            img, umap, vmap_, self._prev_keypoints, self._next_key(),
            jnp.asarray(self.K), self.cfg.sift, self.cfg.match_ratio,
            self.cfg.rel_pose_threshold_px, n_fast,
            self.cfg.rel_pose_min_inliers, undistort,
            n_remix=(self.cfg.rel_pose_remix_fast
                     if n_fast < self.cfg.rel_pose_samples else 0))
        ok = self._integrate(kp, m, res, R_rel, t_rel, frame_index)
        if not ok and n_fast < self.cfg.rel_pose_samples:
            # Rare hard frame: retry the relative pose at full strength.
            res, R_rel, t_rel = estimate_relative_pose(
                self._next_key(), self._prev_keypoints.xy, kp.xy[m.j],
                m.mask, jnp.asarray(self.K), jnp.asarray(self.K),
                threshold_px=self.cfg.rel_pose_threshold_px,
                num_samples=self.cfg.rel_pose_samples,
                min_inliers=self.cfg.rel_pose_min_inliers)
            ok = self._integrate(kp, m, res, R_rel, t_rel, frame_index)
        return ok

    def process_frames(self, images, frame_indices=None) -> list:
        """Process a sequence of frames through the batched frontend.

        Runs ``frontend_batch`` frames of undistort+detect+match+E-RANSAC
        per device dispatch (one round-trip for the whole window), then
        grows the graph/tracks/map sequentially on the host. Within a
        window each frame is matched against its predecessor's detection;
        if a frame is rejected (< min inliers) the chain through it is
        invalid, so the remaining frames of that window fall back to the
        per-frame path against the last *accepted* frame.

        Returns a list of per-frame booleans (pose added or not).
        """
        images = list(images)
        if frame_indices is None:
            frame_indices = [-1] * len(images)
        out = []
        start = 0
        if len(self.pose_graph) == 0 and images:
            out.append(self.process_frame(images[0], frame_indices[0]))
            start = 1
        B = max(1, self.cfg.frontend_batch)
        undistort = self.maps is not None
        umap, vmap_ = (self.maps if undistort
                       else (jnp.zeros((1, 1)), jnp.zeros((1, 1))))

        # Two-stage E-RANSAC applies in batch mode too: a frame whose
        # fast-pass pose is rejected breaks the window chain, and the
        # fallback (process_keypoints against the last accepted frame)
        # already re-runs at full strength — the same retry semantics as
        # the per-frame path, so the cheap first pass is safe here.
        # (Round 4 ran the full budget; measured fast-pass failure rate on
        # the room loop is ~0, and the fast pass saves ~60 ms/frame.)
        n_full = (self.cfg.rel_pose_samples_fast
                  if self.cfg.rel_pose_samples_fast > 0
                  else self.cfg.rel_pose_samples)

        def dispatch(i, prev_kp):
            """Dispatch one window's fused frontend (async); returns the
            pending record. ``prev_kp`` may be a NOT-YET-READY device array
            (the previous window's last detection) — dispatch-ahead keeps
            the device busy while the host integrates the previous window
            (VERDICT r3 item 8; same structure as bench.py's depth-2
            pipelining)."""
            chunk = [np.asarray(gray_from_any(im), np.float32)
                     for im in images[i:i + B]]
            n = len(chunk)
            imgs = jnp.asarray(np.stack(chunk + [chunk[-1]] * (B - n)))
            keys = jax.random.split(self._next_key(), B)
            kps, ms, ress, Rs, ts = _fused_frontend_batch(
                imgs, umap, vmap_, prev_kp, keys,
                jnp.asarray(self.K), self.cfg.sift, self.cfg.match_ratio,
                self.cfg.rel_pose_threshold_px, n_full,
                self.cfg.rel_pose_min_inliers, undistort)
            # The window's last detection: the matching target of the NEXT
            # window (valid even for padded slots — they repeat the last
            # real frame).
            last_kp = jax.tree_util.tree_map(lambda x: x[-1], kps)
            return dict(i=i, n=n, chunk=chunk, kps=kps, ms=ms, ress=ress,
                        Rs=Rs, ts=ts, last_kp=last_kp)

        def integrate(p):
            """Host integration of one dispatched window. The window's
            batched results assumed every earlier frame was accepted (its
            first frame matched the previous image's detection); if a
            rejection broke that chain, fall back per frame."""
            chain_ok = len(self.frames) == p["i"]
            for k in range(p["n"]):
                sl = lambda t: jax.tree_util.tree_map(lambda x: x[k], t)
                self._pending_image = p["chunk"][k]
                fi = frame_indices[p["i"] + k]
                if chain_ok:
                    ok = self._integrate(sl(p["kps"]), sl(p["ms"]),
                                         sl(p["ress"]), p["Rs"][k],
                                         p["ts"][k], fi)
                    if not ok:
                        chain_ok = False
                else:
                    # Re-match against the last accepted frame. On success
                    # this frame becomes the last accepted one, so the
                    # next frame's batched result (matched against this
                    # frame's detection) is valid again.
                    ok = self.process_keypoints(sl(p["kps"]), fi)
                    chain_ok = bool(ok)
                out.append(ok)

        pending = None
        i = start
        while i < len(images):
            prev_kp = (pending["last_kp"] if pending is not None
                       else self._prev_keypoints)
            cur = dispatch(i, prev_kp)
            i += cur["n"]
            if pending is not None:
                integrate(pending)
                # If integration diverged from the dispatch assumption the
                # fallback path already fixed up state; the in-flight
                # window falls back at its own integrate call.
            pending = cur
        if pending is not None:
            integrate(pending)
        return out

    def process_keypoints(self, kp: Keypoints, frame_index: int = -1) -> bool:
        """Geometric core of process_frame, driveable with precomputed
        keypoints (used by tests and offline pipelines)."""
        if len(self.pose_graph) == 0:
            kp_host = {
                "xy": np.asarray(kp.xy), "scale": np.asarray(kp.scale),
                "response": np.asarray(kp.response),
                "mask": np.asarray(kp.mask),
            }
            self._accept_first_frame(kp, kp_host, frame_index)
            return True

        # Match previous accepted frame vs current.
        m = match_descriptors(self._prev_keypoints, kp,
                              MatchParams(ratio=self.cfg.match_ratio))
        u = jnp.asarray(np.asarray(self._prev_keypoints.xy))
        v = kp.xy[m.j]
        fast = self.cfg.rel_pose_samples_fast
        n_fast = fast if 0 < fast < self.cfg.rel_pose_samples \
            else self.cfg.rel_pose_samples
        for n_samples in dict.fromkeys((n_fast, self.cfg.rel_pose_samples)):
            res, R_rel, t_rel = estimate_relative_pose(
                self._next_key(), u, v, m.mask,
                jnp.asarray(self.K), jnp.asarray(self.K),
                threshold_px=self.cfg.rel_pose_threshold_px,
                num_samples=n_samples,
                min_inliers=self.cfg.rel_pose_min_inliers,
                n_remix=(self.cfg.rel_pose_remix_fast
                         if n_samples < self.cfg.rel_pose_samples else 0))
            if self._integrate(kp, m, res, R_rel, t_rel, frame_index):
                return True
        return False

    def _integrate(self, kp, m, res, R_rel, t_rel, frame_index) -> bool:
        """Host-side graph/track/map growth from one frame's device results."""
        # ONE device->host transfer for everything this frame needs: on the
        # target runtime every separate np.asarray fetch pays the ~27 ms
        # dispatch RTT (measured: 9 fetches cost ~0.15 s/frame here).
        (xy_h, scale_h, resp_h, mask_h, m_mask, mi, mj, inliers_h,
         success_h, R_rel, t_rel) = jax.device_get(
            (kp.xy, kp.scale, kp.response, kp.mask, m.mask, m.i, m.j,
             res.inliers, res.success, R_rel, t_rel))
        kp_host = {"xy": xy_h, "scale": scale_h, "response": resp_h,
                   "mask": mask_h}
        if not bool(success_h):
            return False
        inl = inliers_h & m_mask
        R_rel = np.asarray(R_rel, float)
        t_rel = np.asarray(t_rel, float)
        t_rel = t_rel / max(np.linalg.norm(t_rel), 1e-12)

        # Register the frame and its inlier matches with the tracker.
        prev_frame = len(self.frames) - 1
        fid = self.tracker.add_frame(kp.capacity, kp_host["response"])
        self.tracker.add_matches(prev_frame, fid, mi[inl], mj[inl])
        self.tracker.compute_tracks(self.cfg.min_track_length)
        # Tracks may have merged: unify their scene points (barycenter)
        # and re-key the map to the merged representatives.
        self.point_cloud.propagate(self.tracker)

        # Absolute pose of the new frame + new scene points. The PnP
        # RANSAC and the two-view triangulation fuse into ONE device
        # program when both apply (each separate dispatch costs a ~27 ms
        # round-trip on the target runtime).
        R_prev, t_prev = self.pose_graph.pose(prev_frame)
        pose_from_pnp = False
        tri_result = None
        pnp_prep = (self._prep_pnp(fid, kp_host)
                    if len(self.pose_graph) >= 2
                    and self.point_cloud.num_points >= 8 else None)
        tri_prep = self._prep_triangulation(prev_frame, fid,
                                            mi[inl], mj[inl], kp_host)
        if pnp_prep is not None and tri_prep is not None:
            got = self._pnp_triangulate(pnp_prep, tri_prep, R_prev, t_prev)
            if got is not None:
                R_abs, t_abs, tri_result = got
                pose_from_pnp = True
        elif pnp_prep is not None:
            got = self._estimate_pnp_prepared(pnp_prep)
            if got is not None:
                R_abs, t_abs = got
                pose_from_pnp = True
        if not pose_from_pnp:
            # Compose the (unit-scale) relative pose onto the previous one.
            R_abs = R_rel @ R_prev
            t_abs = R_rel @ t_prev + t_rel
        v_id = self.pose_graph.add_absolute_pose(R_abs, t_abs, frame_index)
        self.pose_graph.add_relative_pose(prev_frame, v_id, R_rel, t_rel,
                                          int(m_mask.sum()), int(inl.sum()))

        self.frames.append({"kp": kp_host, "tracker_id": fid,
                            "image": self._pending_image})
        self._pending_image = None
        if len(self.frames) >= 2:
            self.frames[-2]["image"] = None  # bound memory: newest only
        self._prev_keypoints = kp

        # Grow the map from fresh two-view tracks, then bundle adjust.
        if tri_result is not None:
            self._commit_triangulation(tri_prep, *tri_result)
        elif tri_prep is not None:
            self._triangulate_prepared(prev_frame, v_id, tri_prep)
        self._frames_since_ba += 1
        self._frames_since_full_ba += 1
        if (len(self.pose_graph) >= 3
                and self._frames_since_ba >= self.cfg.ba_every):
            full = (self.cfg.full_ba_every > 0
                    and self._frames_since_full_ba >= self.cfg.full_ba_every)
            self._bundle_adjust(window=0 if full else None)
            self._frames_since_ba = 0
            if full:
                self._frames_since_full_ba = 0
        self._maybe_write_viewer()
        if self.on_accept is not None:
            self.on_accept(kp, v_id)
        return True

    def trajectory(self) -> np.ndarray:
        """(N, 3) camera centers of all accepted frames."""
        centers = []
        for v in range(len(self.pose_graph)):
            R, t = self.pose_graph.pose(v)
            centers.append(-np.asarray(R).T @ np.asarray(t))
        return np.stack(centers) if centers else np.zeros((0, 3))

    def _maybe_write_viewer(self):
        """Live Kalpana-analog: periodically rewrite the HTML scene so a
        browser tab shows the growing cloud + trajectory mid-run."""
        if not self.cfg.live_viewer_path:
            return
        self._accepted_since_viewer += 1
        if self._accepted_since_viewer < max(self.cfg.live_viewer_every, 1):
            return
        self._accepted_since_viewer = 0
        try:
            from sara_tpu.viz.html_viewer import write_html_viewer

            write_html_viewer(self.cfg.live_viewer_path,
                              self.point_cloud.points,
                              self.point_cloud.colors,
                              trajectory=self.trajectory())
        except Exception as e:  # never let viz kill the pipeline
            import logging

            logging.getLogger("sara_tpu").warning("live viewer: %s", e)

    # -- stages -------------------------------------------------------------

    @staticmethod
    @functools.partial(jax.jit, static_argnames=(
        "threshold_px", "num_samples", "min_inliers"))
    def _pnp_tri_static(key, X, rays, uv, mask, ra, rb, K, R_prev, t_prev,
                        threshold_px, num_samples, min_inliers):
        res, R, t = estimate_absolute_pose(
            key, X, rays, uv, K, mask, threshold_px=threshold_px,
            num_samples=num_samples, min_inliers=min_inliers)
        R_rel = R @ R_prev.T
        t_rel = t - R_rel @ t_prev
        Xc, d1, d2 = triangulate_linear(R_rel, t_rel, ra, rb)
        # Prev-camera frame -> world.
        Xw = (Xc - t_prev) @ R_prev
        return res.success, R, t, Xw, (d1 > 0) & (d2 > 0)

    def _accept_first_frame(self, kp, kp_host, frame_index):
        self.pose_graph.add_absolute_pose(np.eye(3), np.zeros(3), frame_index)
        fid = self.tracker.add_frame(kp.capacity, kp_host["response"])
        self.frames.append({"kp": kp_host, "tracker_id": fid,
                            "image": self._pending_image})
        self._pending_image = None
        self._prev_keypoints = kp
        if self.on_accept is not None:
            self.on_accept(kp, 0)

    def _prep_pnp(self, fid: int, kp_host):
        """Host prep of the PnP inputs (track->scene-point association).
        Returns padded (X, rays, uv, mask, n) or None."""
        feat_idx, track_ids = self.tracker.tracks_in_frame(fid)
        if len(feat_idx) == 0:
            return None
        reps = self.tracker.rep_of_tracks(track_ids)
        spt = self.point_cloud.scene_point_of_track
        idxs = np.fromiter((spt.get(int(r), -1) for r in reps), np.int64,
                           len(reps))
        sel = idxs >= 0
        if int(sel.sum()) < max(6, self.cfg.pnp_min_inliers // 4):
            return None
        X = self.point_cloud.points[idxs[sel]]
        uv = kp_host["xy"][np.asarray(feat_idx)[sel]]
        rays = self._rays(uv)
        cap = _bucket(len(X))
        mask = np.zeros(cap, bool)
        mask[: len(X)] = True
        return (_pad_to(X, cap), _pad_to(rays, cap), _pad_to(uv, cap),
                mask, len(X))

    def _prep_triangulation(self, va: int, vb: int, ia, ib, kp_host):
        """Host prep of the new-track triangulation inputs. Returns
        (reps_sel, xb_sel, padded rays_a, rays_b, mask) or None."""
        if len(ia) == 0:
            return None
        tracks = self.tracker.track_of_feature
        ga = self.tracker.global_id(self.frames[va]["tracker_id"], ia)
        ta = tracks[ga]
        # Scene points key on STABLE representatives, not the
        # generation-local dense track ids.
        reps = self.tracker.rep_of_tracks(ta)
        need = [k for k in range(len(ia))
                if ta[k] >= 0
                and not self.point_cloud.track_has_point(int(reps[k]))]
        if not need:
            return None
        sel = np.asarray(need)
        xa = self.frames[va]["kp"]["xy"][np.asarray(ia)[sel]]
        xb = kp_host["xy"][np.asarray(ib)[sel]]
        ra = self._rays(xa)
        rb = self._rays(xb)
        cap = _bucket(len(sel))
        mask = np.zeros(cap, bool)
        mask[: len(sel)] = True
        return (reps[sel], xb, _pad_to(ra, cap), _pad_to(rb, cap), mask)

    def _estimate_pnp_prepared(self, prep):
        """PnP of the current frame against the existing map
        (reference: CameraPoseEstimator.cpp:78-189)."""
        X, rays, uv, mask, n = prep
        res, R, t = estimate_absolute_pose(
            self._next_key(),
            jnp.asarray(X), jnp.asarray(rays), jnp.asarray(uv),
            jnp.asarray(self.K), jnp.asarray(mask),
            threshold_px=self.cfg.pnp_threshold_px,
            num_samples=self.cfg.pnp_samples,
            min_inliers=min(self.cfg.pnp_min_inliers, max(6, n // 2)))
        success, R, t = jax.device_get((res.success, R, t))  # one transfer
        if not bool(success):
            return None
        return np.asarray(R, float), np.asarray(t, float)

    def _pnp_triangulate(self, pnp_prep, tri_prep, R_prev, t_prev):
        """ONE device program: PnP RANSAC + triangulation of the new
        tracks with the PnP pose. Returns (R, t, (Xw, cheiral)) or None."""
        X, rays, uv, mask, n = pnp_prep
        _, _, ra, rb, mask_t = tri_prep
        success, R, t, Xw, cheiral = self._pnp_tri_static(
            self._next_key(), jnp.asarray(X), jnp.asarray(rays),
            jnp.asarray(uv), jnp.asarray(mask), jnp.asarray(ra),
            jnp.asarray(rb), jnp.asarray(self.K),
            jnp.asarray(np.asarray(R_prev)), jnp.asarray(np.asarray(t_prev)),
            threshold_px=self.cfg.pnp_threshold_px,
            num_samples=self.cfg.pnp_samples,
            min_inliers=min(self.cfg.pnp_min_inliers, max(6, n // 2)))
        success, R, t, Xw, cheiral = jax.device_get(
            (success, R, t, Xw, cheiral))
        if not bool(success):
            return None
        cheiral = cheiral & mask_t
        return (np.asarray(R, float), np.asarray(t, float),
                (np.asarray(Xw), cheiral))

    def _commit_triangulation(self, tri_prep, Xw, cheiral):
        """Host-side map growth from fused-program triangulation output."""
        reps_sel, xb, *_ = tri_prep
        k = len(reps_sel)
        self.point_cloud.add_points(
            reps_sel[cheiral[:k]], Xw[:k][cheiral[:k]],
            self._sample_colors(xb, cheiral[:k]))

    def _triangulate_prepared(self, va: int, vb: int, tri_prep):
        """Standalone triangulation dispatch (PnP-less path; reference:
        PointCloudGenerator::grow_point_cloud, .cpp:289-427)."""
        reps_sel, xb, ra, rb, mask_t = tri_prep
        Ra, tA = self.pose_graph.pose(va)
        Rb, tB = self.pose_graph.pose(vb)
        R = Rb @ Ra.T
        t = tB - R @ tA
        X, d1, d2 = triangulate_linear(jnp.asarray(R), jnp.asarray(t),
                                       jnp.asarray(ra), jnp.asarray(rb))
        X, d1, d2 = jax.device_get((X, d1, d2))  # one transfer
        cheiral = (d1 > 0) & (d2 > 0) & mask_t
        # Camera-a frame -> world: Xw = Ra^T (Xc - tA).
        Xw = (Ra.T @ (X.T - tA[:, None])).T
        k = len(reps_sel)
        self.point_cloud.add_points(
            reps_sel[cheiral[:k]], Xw[:k][cheiral[:k]],
            self._sample_colors(xb, cheiral[:k]))

    def _sample_colors(self, xb, keep):
        """Colors from the newest frame's pixels at the observed keypoint
        (reference retrieve_scene_point_color projects the scene point,
        PointCloudGenerator.cpp:376-427 — equivalent up to reprojection
        error, with no extra projection pass)."""
        img = self.frames[-1].get("image") if self.frames else None
        if img is None:
            return None
        h_i, w_i = img.shape[:2]
        xs = np.clip(np.round(xb[:, 0]).astype(int), 0, w_i - 1)
        ys = np.clip(np.round(xb[:, 1]).astype(int), 0, h_i - 1)
        px = img[ys, xs]
        return (np.repeat(px[:, None], 3, axis=1) if px.ndim == 1
                else np.asarray(px)[:, :3])[keep]

    def _bundle_adjust(self, window=None, pin=()):
        """Windowed BA over the latest poses (the reference adjusts the whole
        graph each frame, OdometryPipeline.cpp:315-422; windowing is the
        scalable default here — set ba_window=0 for full-graph behavior).
        ``window`` overrides the config for one call (full_ba_every).
        ``pin`` freezes the given absolute pose indices completely — the
        post-closure BA pins the loop-edge endpoint poses so reprojection
        evidence polishes the loop's interior without reverting the
        pose-graph correction (loop edges are not in the BA cost)."""
        n_poses = len(self.pose_graph)
        w = self.cfg.ba_window if window is None else window
        start = 0 if w == 0 else max(0, n_poses - w)
        # Vectorized window packing. The round-2 version iterated EVERY
        # track in the session with per-track Python work (incl. a
        # one-element rep_of_tracks call each); by frame 100 that was
        # >100 ms/frame of host time growing linearly with history. Only
        # features detected in window frames matter — slice them off the
        # global arrays first.
        tof = self.tracker.track_of_feature
        offsets = np.asarray(self.tracker.offsets)
        lo = offsets[start]
        gids = lo + np.nonzero(tof[lo:] >= 0)[0]
        if len(gids) == 0:
            return
        frames_arr = self.tracker.frame_of(gids)
        tids = tof[gids]
        uniq, inv = np.unique(tids, return_inverse=True)
        cnt = np.bincount(inv)
        reps = self.tracker.rep_of_tracks(uniq)
        spt = self.point_cloud.scene_point_of_track
        sp_idx = np.fromiter((spt.get(int(r), -1) for r in reps), np.int64,
                             len(reps))
        keep = (cnt >= 2) & (sp_idx >= 0)
        kept = np.nonzero(keep)[0]
        if len(kept) < 8:
            return
        pt_of_uniq = np.full(len(uniq), -1, np.int64)
        pt_of_uniq[kept] = np.arange(len(kept))
        obs_sel = pt_of_uniq[inv] >= 0
        obs_cam = (frames_arr[obs_sel] - start).astype(np.int32)
        obs_pt = pt_of_uniq[inv][obs_sel].astype(np.int32)
        feats = gids[obs_sel] - offsets[frames_arr[obs_sel]]
        obs_uv = np.zeros((len(obs_cam), 2))
        for f in range(start, n_poses):
            m = frames_arr[obs_sel] == f
            if m.any():
                obs_uv[m] = self.frames[f]["kp"]["xy"][feats[m]]
        pt_ids = reps[kept]
        pt_xyz = self.point_cloud.points[sp_idx[kept]]
        if len(obs_cam) < 24:
            return

        C = n_poses - start
        # Bucket the camera axis too (pow2, frozen obs-less padding): a
        # growing full-graph BA (ba_window=0 / full_ba_every) would
        # otherwise compile a fresh program EVERY frame (~10 s each on the
        # target runtime).
        Cb = _bucket(C, 8)
        P = _bucket(len(pt_ids), 64)
        O = _bucket(len(obs_cam), 256)
        poses = self.pose_graph.poses_se3()[start:]
        if Cb != C:
            poses = np.concatenate([poses, np.zeros((Cb - C, 6))])
        # Monocular gauge (7 dof: similarity): fixing the first pose removes
        # 6; the global scale must be pinned explicitly or it drifts
        # window-to-window. Per-component freeze masks (ba.core accepts a
        # (C, 6) pose_fixed).
        pose_fixed = np.zeros((Cb, 6), bool)
        pose_fixed[0] = True
        pose_fixed[C:] = True
        for p in pin:
            if start <= p < n_poses:
                pose_fixed[p - start] = True
        if start == 0 and C >= 2:
            # Freeze the second camera's largest translation component
            # (not a fixed axis: the dominant motion direction is scene-
            # dependent and a zero component would not pin scale).
            t1 = poses[1, 3:]
            pose_fixed[1, 3 + int(np.argmax(np.abs(t1)))] = True
        elif start > 0 and C >= 3:
            # Sliding window: anchor scale to the previous estimate by
            # freezing the second window pose entirely.
            pose_fixed[1] = True

        intr = np.array([self.K[0, 0], self.K[1, 1],
                         self.K[0, 2], self.K[1, 2]])
        prob = BAProblem(
            poses=jnp.asarray(poses),
            points=jnp.asarray(_pad_to(np.asarray(pt_xyz), P)),
            intrinsics=jnp.asarray(intr),
            cam_idx=jnp.asarray(_pad_to(np.asarray(obs_cam, np.int32), O)),
            pt_idx=jnp.asarray(_pad_to(np.asarray(obs_pt, np.int32), O)),
            uv=jnp.asarray(_pad_to(np.asarray(obs_uv), O)),
            obs_mask=jnp.asarray(_pad_to(np.ones(len(obs_cam), bool), O, False)),
            pose_fixed=jnp.asarray(pose_fixed),
            point_fixed=jnp.asarray(~_pad_to(np.ones(len(pt_ids), bool), P, False)),
        )
        out, info = bundle_adjust(prob, self.cfg.ba_options)
        new_poses = np.asarray(out.poses)[:C]
        packed = self.pose_graph.poses_se3()
        packed[start:] = new_poses
        self.pose_graph.update_from_se3(packed)
        self.point_cloud.update_points(pt_ids,
                                       np.asarray(out.points)[: len(pt_ids)])
