"""Incremental SfM main cycle — the pipeline driver.

Mirrors the reference's ``mainCycle`` control flow (src/mainModule/
cycleProcessing/mainCycle.cpp:73-240) with its exact scheduling semantics:

  bootstrap first pair (with head-promotion fallback)   mainCycle.cpp:243-316
  → loop { pick good frame from batch                   batch.cpp:59-99
           PnP-RANSAC pose                              mainCycle.cpp:155-161
           triangulate new matches                      mainCycle.cpp:182-191
           merge into map                               mainCycleInternals.cpp:222-246
           windowed BA + flush every BAMaxFramesCnt }   mainCycle.cpp:201-210
  track-loss restart with pose carry-over is driven one level up (app.py).

The compute inside each step is jitted fixed-shape JAX (frontend, geometry,
solver); this module is the thin host-side conductor that owns dynamic state
(map cursor, batch list, logging).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import (
    compose_with_world,
    estimate_transformation,
    reconstruct,
    solve_pnp_ransac,
)
from ..geometry.ransac import ransac_fanout
from ..io.logs import GlobalData, LogStreams
from ..models import frontend as fe
from ..utils.timer import ChronoTimer
from .batch import EMPTY_BATCH, FRAME_NOT_FOUND, BatchScheduler, GoodFrame
from .structures import (
    BatchElement,
    MapArena,
    TemporalFrameData,
    harvest_pnp_correspondences,
    push_new_spatial_points,
)


@dataclass
class CycleSettings:
    """Host-side processing conditions (reference: DataProcessingConditions,
    mainCycleStructures.h:21-33)."""

    required_extracted: int
    required_matched: int
    batch_size: int
    skip_from_head: int
    use_first_fit: bool
    head_tie_tolerance: float
    use_ransac: bool
    ransac_threshold: float
    distance_threshold: float
    use_ba: bool
    ba_window: int
    ransac_iters: int = 1024
    pnp_iters: int = 256

    @staticmethod
    def from_config(cfg) -> "CycleSettings":
        return CycleSettings(
            required_extracted=cfg.requiredExtractedPointsCount,
            required_matched=cfg.requiredMatchedPointsCount,
            batch_size=cfg.framesBatchSize,
            skip_from_head=cfg.skipFramesFromBatchHead,
            use_first_fit=cfg.useFirstFitInBatch,
            head_tie_tolerance=float(cfg.tpu.head_tie_tolerance),
            use_ransac=cfg.RPUseRANSAC,
            ransac_threshold=cfg.RPRANSACThreshold,
            distance_threshold=cfg.RPDistanceThreshold,
            use_ba=cfg.useBundleAdjustment,
            ba_window=cfg.BAMaxFramesCnt,
            # fan-out statistically matched to RPRANSACProb, capped by the
            # tpu.* compute budget (see geometry/ransac.py)
            ransac_iters=ransac_fanout(cfg.RPRANSACProb, 8,
                                       cfg.tpu.ransac_iters),
            pnp_iters=ransac_fanout(cfg.RPRANSACProb, 6,
                                    cfg.tpu.pnp_ransac_iters),
        )


def _element_to_frame_data(el: BatchElement, gf: GoodFrame | None) -> TemporalFrameData:
    k = el.xy.shape[0]
    fd = TemporalFrameData.empty(k, 1)
    fd.xy = np.asarray(el.xy)
    fd.valid = np.asarray(el.valid)
    fd.desc = el.desc  # device array — stays on device for matching
    fd.colors = np.asarray(el.colors)
    if gf is not None:
        fd.match_train = gf.match_train
        fd.match_mask = gf.match_mask
    return fd


def _matched_coords(prev: TemporalFrameData, cur: TemporalFrameData):
    """Per-match-slot coordinate pairs (uv_prev[q], uv_cur[train]) + mask —
    fixed-slot analogue of getKeyPointCoordsFromFramePair
    (featureMatchingCommon.cpp:23-33)."""
    train = np.where(cur.match_mask, cur.match_train, 0)
    uv1 = prev.xy
    uv2 = cur.xy[train]
    return (
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.asarray(cur.match_mask),
    )


class MainCycle:
    def __init__(
        self,
        media,
        K: np.ndarray,
        settings: CycleSettings,
        fcfg: fe.FrontendConfig,
        arena: MapArena,
        logs: LogStreams | None = None,
        ba_fn=None,
        seed: int = 0,
        dist: np.ndarray | None = None,
    ):
        self.media = media
        self.K = jnp.asarray(K, jnp.float32)
        self.K_host = np.asarray(K, np.float64)
        self.s = settings
        self.fcfg = fcfg
        self.arena = arena
        self.logs = logs
        self.ba_fn = ba_fn
        self._key = jax.random.PRNGKey(seed)
        # useUndistortion: keypoint coords are corrected right after
        # extraction, so all downstream geometry sees undistorted pixels —
        # same placement as the device runtime (runtime/steps.py ingest)
        self.dist = None
        if dist is not None and np.any(np.asarray(dist) != 0):
            self.dist = jnp.asarray(np.asarray(dist).reshape(-1), jnp.float32)
        self.scheduler = BatchScheduler(
            media, fcfg,
            batch_size=settings.batch_size,
            required_extracted=settings.required_extracted,
            required_matched=settings.required_matched,
            skip_from_head=settings.skip_from_head,
            use_first_fit=settings.use_first_fit,
            head_tie_tolerance=settings.head_tie_tolerance,
            report=logs.main if logs else None,
            K=self.K, dist=self.dist,
        )

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _log_pose(self, fd: TemporalFrameData):
        if self.logs:
            self.logs.write_pose(fd.rotation, fd.motion)

    # --------------------------------------------------------------- bootstrap
    def _find_first_good_frame(self) -> TemporalFrameData | None:
        """Pop frames until one has ≥ required corners
        (findFirstGoodFrame, mainCycleInternals.cpp:136-155).

        After a track-loss restart our scheduler still holds staged batch
        frames (already past the corner gate); consume those first — the
        reference drops its batch tail on restart, we don't."""
        if self.scheduler.batch:
            return _element_to_frame_data(self.scheduler.pop_head(), None)
        while True:
            f = self.media.next_frame()
            if f is None:
                return None
            res = fe.extract_and_describe(self.fcfg, jnp.asarray(f))
            if self.dist is not None:
                from ..geometry.projection import undistort_points

                res = dict(res)
                res["xy"] = undistort_points(self.K, self.dist, res["xy"])
            if int(res["num_corners"]) >= self.s.required_extracted:
                el = BatchElement(
                    frame=f, xy=res["xy"], valid=res["valid"], score=res["score"],
                    desc=res["desc"], colors=np.asarray(res["colors"]),
                )
                return _element_to_frame_data(el, None)

    def _bootstrap(self, init_R: np.ndarray, init_t: np.ndarray):
        """First-pair processing (processingFirstPairFrames,
        mainCycle.cpp:243-282).  Returns (frame0, frame1) or None."""
        first = self._find_first_good_frame()
        if first is None:
            return None
        while True:
            gf = self.scheduler.find_good_frame(first.desc, jnp.asarray(first.valid))
            if gf == EMPTY_BATCH:
                return None
            if gf == FRAME_NOT_FOUND:
                # Promote batch head to first frame and retry
                # (defineFirstPairFrames, mainCycle.cpp:299-315).
                if not self.scheduler.batch:
                    return None
                first = _element_to_frame_data(self.scheduler.pop_head(), None)
                continue
            break

        second = _element_to_frame_data(gf.element, gf)
        first.rotation = np.asarray(init_R, np.float64)
        first.motion = np.asarray(init_t, np.float64)

        uv1, uv2, mask = _matched_coords(first, second)
        pose = estimate_transformation(
            self._next_key(), self.K, uv1, uv2, mask,
            use_ransac=self.s.use_ransac,
            threshold_px=self.s.ransac_threshold,
            distance_threshold=self.s.distance_threshold,
            num_hypotheses=self.s.ransac_iters,
        )
        chirality = np.asarray(pose["chirality_mask"])
        if self.logs:
            self.logs.main.write(
                f"Points passed chirality check count: {int(chirality.sum())}\n"
            )

        R2, t2 = compose_with_world(
            jnp.asarray(first.rotation, jnp.float32),
            jnp.asarray(first.motion, jnp.float32),
            pose["R"], pose["t"],
        )
        second.rotation = np.asarray(R2, np.float64)
        second.motion = np.asarray(t2, np.float64)

        X = reconstruct(
            self.K,
            jnp.asarray(first.rotation, jnp.float32), jnp.asarray(first.motion, jnp.float32),
            jnp.asarray(second.rotation, jnp.float32), jnp.asarray(second.motion, jnp.float32),
            uv1, uv2, jnp.asarray(chirality),
        )
        X = np.asarray(X)

        # defineFeaturesCorrespondSpatialIndices (mainCycleInternals.cpp:178-204):
        # every chirality-passing match becomes a landmark, colored by the
        # second frame's pixel at the train keypoint.
        q = np.flatnonzero(chirality)
        train = second.match_train[q]
        ids = self.arena.append(X[q], second.colors[train])
        first.correspond[q] = ids
        second.correspond[train] = ids

        self._log_pose(first)
        self._log_pose(second)
        return first, second

    # -------------------------------------------------------------- main loop
    def run(self, init_R=None, init_t=None):
        """One cycle (sub-map).  Returns dict with:
        'status': 'video_over' | 'interrupted' | 'no_data',
        'last_frame': TemporalFrameData | None  (pose carry-over for restart),
        'global_data': GlobalData (cameras of this cycle),
        'frames_accepted': int."""
        timer = ChronoTimer()
        init_R = np.eye(3) if init_R is None else init_R
        init_t = np.zeros(3) if init_t is None else init_t
        gd = GlobalData()

        boot = self._bootstrap(init_R, init_t)
        if boot is None:
            return {"status": "no_data", "last_frame": None, "global_data": gd,
                    "frames_accepted": 0}
        prev, cur = boot
        processed: list[TemporalFrameData] = [prev, cur]
        frames_accepted = 2
        if self.logs:
            timer.print_last_point_delta("MS for first-pair computations: ", self.logs.time)
            timer.update_last_point()

        status = "interrupted"
        while True:
            gf = self.scheduler.find_good_frame(cur.desc, jnp.asarray(cur.valid))
            if gf == EMPTY_BATCH:
                status = "video_over"
                break
            if gf == FRAME_NOT_FOUND:
                if self.logs:
                    self.logs.main.write(
                        "No good frames in batch. Interrupt video processing\n")
                status = "interrupted"
                break
            if self.logs:
                timer.update_last_point()

            new = _element_to_frame_data(gf.element, gf)

            # 3D↔2D harvest + PnP (mainCycle.cpp:138-161)
            X, uv, pmask = harvest_pnp_correspondences(
                cur.correspond, new.match_train, new.match_mask, new.xy, self.arena
            )
            if pmask.sum() < 4:
                if self.logs:
                    self.logs.main.write(
                        "Not enough corresponding points for solvePnP RANSAC\n")
                status = "interrupted"
                break
            pnp = solve_pnp_ransac(
                self._next_key(), self.K,
                jnp.asarray(X), jnp.asarray(uv), jnp.asarray(pmask),
                num_hypotheses=self.s.pnp_iters,
                prior_R=jnp.asarray(cur.rotation, jnp.float32),
                prior_t=jnp.asarray(cur.motion, jnp.float32),
            )
            new.rotation = np.asarray(pnp["R"], np.float64)
            new.motion = np.asarray(pnp["t"], np.float64)
            if self.logs:
                timer.print_last_point_delta(
                    "RANSAC transformation estimation: ", self.logs.time)
                timer.update_last_point()
                self.logs.main.write(f"Used in solvePnP: {int(pmask.sum())}\n")
            self._log_pose(new)

            # Triangulate all current matches against the previous frame
            # (mainCycle.cpp:182-191) and merge into the map.
            uv1, uv2, mmask = _matched_coords(cur, new)
            Xnew = np.asarray(
                reconstruct(
                    self.K,
                    jnp.asarray(cur.rotation, jnp.float32), jnp.asarray(cur.motion, jnp.float32),
                    jnp.asarray(new.rotation, jnp.float32), jnp.asarray(new.motion, jnp.float32),
                    uv1, uv2, mmask,
                )
            )
            new_ok, prop_ok = self._verify_points(Xnew, cur, new, np.asarray(uv1), np.asarray(uv2))
            push_new_spatial_points(
                new.colors, Xnew, self.arena,
                cur.correspond, new.match_train, new.match_mask, new.correspond,
                new_point_ok=new_ok, propagate_ok=prop_ok,
            )
            if self.logs:
                timer.print_last_point_delta("Reconstruction: ", self.logs.time)
                timer.update_last_point()

            processed.append(new)
            frames_accepted += 1
            if len(processed) >= self.s.ba_window:
                self._ba_and_flush(processed, gd, timer)

            prev, cur = cur, new

        if processed:
            self._ba_and_flush(processed, gd, timer)

        return {
            "status": status,
            "last_frame": cur,
            "global_data": gd,
            "frames_accepted": frames_accepted,
        }

    def _verify_points(self, Xnew, cur, new, uv1, uv2, gate_px: float = 8.0):
        """Map-hygiene gates (beyond the reference, which pushes unfiltered):
        a new landmark must reproject within ``gate_px`` in both frames with
        positive depth; an existing binding must reproject within ``gate_px``
        in the new frame to propagate."""

        def _reproj(R, t, X, uv):
            Xc = X @ R.T + t
            z = Xc[:, 2]
            pix = Xc @ self.K_host.T
            pix = pix[:, :2] / np.maximum(np.abs(pix[:, 2:3]), 1e-9) * np.sign(pix[:, 2:3] + (pix[:, 2:3] == 0))
            return np.linalg.norm(pix - uv, axis=1), z

        e1, z1 = _reproj(cur.rotation, cur.motion, Xnew, uv1)
        e2, z2 = _reproj(new.rotation, new.motion, Xnew, uv2)
        new_ok = (e1 < gate_px) & (e2 < gate_px) & (z1 > 0) & (z2 > 0)

        bound = cur.correspond >= 0
        Xold = self.arena.points[np.where(bound, cur.correspond, 0)]
        e_old, z_old = _reproj(new.rotation, new.motion, Xold, uv2)
        prop_ok = (e_old < 2.0 * gate_px) & (z_old > 0)
        return new_ok, prop_ok

    def _ba_and_flush(self, processed: list[TemporalFrameData], gd: GlobalData, timer):
        """Windowed BA (if enabled) then move poses to the cycle's GlobalData
        (bundleAdjustment + moveProcessedDataToGlobalStruct,
        mainCycle.cpp:201-210, 318-338)."""
        if self.s.use_ba and self.ba_fn is not None and len(processed) >= 2:
            # BA adjusts the shared intrinsics in place, like the reference
            # writing back into calibrationMatrix (bundleAdjustment.cpp:176-181).
            new_K = self.ba_fn(self.K_host, processed, self.arena)
            if new_K is not None:
                self.K_host = np.asarray(new_K, np.float64)
                self.K = jnp.asarray(new_K, jnp.float32)
            if self.logs:
                timer.print_last_point_delta("Bundle adjustment: ", self.logs.time)
                timer.update_last_point()
        for fd in processed:
            gd.append_cameras(fd.rotation[None], fd.motion[None])
        processed.clear()
