"""Device-resident tracker state: one pytree holding the whole pipeline.

Fixed capacities (EngineConfig) make every array static-shape:
  K  keypoint slots per frame          R  candidate-ring slots
  P  map-arena landmark capacity       F  BA window frames
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..geometry.ransac import ransac_fanout


@dataclass(frozen=True)
class EngineConfig:
    """Static (hashable, shape-defining) runtime parameters.  One compile per
    distinct config — every threshold that could stay dynamic is folded in
    here for simplicity; re-jit on config change is the intended behaviour."""

    # shapes
    max_keypoints: int = 2048
    ring: int = 40               # candidate ring slots ≥ framesBatchSize + chunk
    map_cap: int = 1 << 18
    window: int = 8              # BAMaxFramesCnt
    window_points: int = 1 << 14
    fill_chunk: int = 8
    # frontend
    threshold: float = 20.0
    descriptor: str = "sift"
    ratio: float = 0.7
    metric: str = "l2"
    descriptor_downscale: int = 1
    sift_nearest: str = "auto"   # SIFT cell-sample interpolation (ops/sift.py)
    color_downscale: int = 4     # landmark-color plane at 1/d resolution
    # ingest policy: "device" = upload full gray, detect+describe on device;
    # "host" = OpenCV FAST on host, upload pooled gray + keypoints (the
    # slow-link path — see frontend.host_detect_pack); "auto" resolves by
    # measured link bandwidth at engine construction (engine.resolve_ingest)
    ingest_mode: str = "device"
    ingest_downscale: int = 2    # host-mode pooled-gray factor
    # host-mode descriptor source: "same" (device describes from the pooled
    # gray), "orb" (full-res cv2 ORB on host, Hamming matching, ~90 KB/frame
    # upload), "hybrid" (pooled-SIFT ⊕ α·orb-bits as one L2 descriptor).
    # Resolved from TpuConfig.host_descriptor="auto" by the engine.
    host_desc: str = "same"
    hybrid_alpha: float = 0.08   # weight of the bit block in hybrid L2
    # multi-chip: () = single device; (n,) shards the ingest/match fan-out
    # and the BA observation axis over an n-device "batch" mesh (steps.py
    # mesh hooks); the engine builds the Mesh and registers it
    mesh_shape: tuple = ()
    # streaming runtime (engine.run_streaming): device-held candidate queue +
    # in-scan BA flush; host trails the device by 1-2 dispatches
    streaming: bool = True
    # per-frame telemetry: classic loop with ONE-step dispatches so every
    # "Matching time for index N" line in time.txt is a true wall-clock
    # measurement of that step (batch.cpp:155-157 parity); costs the
    # per-dispatch sync the fused loops exist to avoid — a measurement mode
    per_frame_telemetry: bool = False
    # host-ingest adaptive extraction gate (engine._adapt_threshold):
    # lower the host FAST threshold when chunk corner counts sag below
    # required_extracted, bounded + logged; no-op on healthy scenes
    adaptive_threshold: bool = True
    # scheduler rule
    required_matched: int = 100
    skip_from_head: int = 0
    use_first_fit: bool = False
    # near-tie head preference (steps._select_good): 0.0 = strict reference
    # max-matches rule; e.g. 0.005 accepts the head when it is within 0.5%
    # of the best count (documented divergence knob — recovers the audited
    # near-tie skips for callers that want every camera)
    head_tie_tolerance: float = 0.0
    # geometry
    use_undistortion: bool = False
    use_ransac: bool = True
    ransac_threshold: float = 1.0
    distance_threshold: float = 50.0
    ransac_iters: int = 1024
    pnp_iters: int = 256
    reproj_gate_px: float = 8.0
    # BA
    # map re-binding (anti-drift): each tracked frame matches its unbound
    # features against the last `rebind_cap` landmarks by projected position
    # (< rebind_radius px under the PnP pose) + descriptor ratio test, and
    # re-binds instead of triangulating duplicates.  PnP then anchors on
    # older geometry, damping monocular scale drift across BA windows.
    # 0 disables (reference behaviour: bindings only propagate frame-to-frame)
    rebind_cap: int = 4096
    # NB: in EngineConfig as consumed by steps this is ACTUAL pixels;
    # DeviceEngine.__init__ resolves the config-level FHD-equivalent value
    # (TpuConfig.rebind_radius) to actual px using the calibration.
    rebind_radius: float = 12.0
    # restart-boundary re-binding (steps.bootstrap_step): at a track-loss
    # restart, match the new first frame against the RETAINED map and (a)
    # rescale the bootstrap baseline so the new sub-map's monocular scale
    # agrees with the old one (|t|=1 re-seeding teleports the concatenated
    # trajectory — measured 43-unit jumps at 384-frame restart boundaries),
    # (b) share the matched landmarks across the sub-map boundary.  Needs
    # rebind_cap > 0; no reference counterpart (src/main.cpp:89-101 carries
    # only the pose)
    restart_rebind: bool = True
    # pose-jump gate (steps._track_core): reject a PnP pose whose camera
    # center moved more than this factor times the EMA of accepted step
    # lengths (0 = off).  A catastrophic-but-consensused PnP solution
    # otherwise teleports the camera and corrupts the whole tail (measured:
    # a 43-unit accepted jump vs 0.25-unit true steps on the 384-frame
    # corridor).  The factor is far above any legitimate skip span (the
    # scheduler consumes at most a batch of candidates per accept).
    pose_jump_gate: float = 32.0
    use_ba: bool = False
    ba_loss: str = "huber"
    ba_loss_param: float = 1.0
    ba_iters: int = 25
    ba_obs_cap: int = 4096
    ba_adjust_intrinsics: bool = False
    ba_freeze_old: bool = False
    anchored_tri: bool = True
    parallax_min_deg: float = 1.0

    @property
    def desc_dim(self) -> int:
        if self.host_desc == "orb" or self.descriptor == "orb":
            return 8                      # 256 bits as uint32 words
        if self.host_desc == "hybrid":
            return 128 + 256              # pooled-SIFT ⊕ α·orb bits
        return 128

    @property
    def desc_dtype(self):
        if self.host_desc == "orb" or self.descriptor == "orb":
            return jnp.uint32
        return jnp.float32

    @staticmethod
    def from_config(cfg) -> "EngineConfig":
        loss, param = cfg.ba_loss
        return EngineConfig(
            max_keypoints=cfg.tpu.max_keypoints,
            # ring holds the live batch plus up to two staged (in-flight
            # upload) chunks plus the admit scratch chunk (the engine adds
            # streaming-lag headroom on top when the streaming loop will
            # actually run — DeviceEngine.__init__)
            ring=cfg.framesBatchSize + cfg.BAMaxFramesCnt + 24,
            streaming=cfg.tpu.streaming,
            per_frame_telemetry=cfg.tpu.per_frame_telemetry,
            map_cap=cfg.tpu.max_map_points,
            window=cfg.BAMaxFramesCnt,
            window_points=cfg.tpu.window_points,
            threshold=float(cfg.featureExtractingThreshold),
            descriptor=cfg.descriptor_kind,
            ratio=float(cfg.knnMatcherDistance),
            metric=cfg.match_metric,
            descriptor_downscale=cfg.tpu.descriptor_downscale,
            sift_nearest=cfg.tpu.sift_nearest_sampling,
            adaptive_threshold=cfg.tpu.adaptive_fast_threshold,
            ingest_mode=cfg.tpu.ingest,
            ingest_downscale=cfg.tpu.ingest_downscale,
            host_desc=cfg.tpu.host_descriptor,
            hybrid_alpha=float(cfg.tpu.hybrid_alpha),
            mesh_shape=tuple(cfg.tpu.mesh_shape),
            rebind_cap=cfg.tpu.rebind_cap,
            rebind_radius=float(cfg.tpu.rebind_radius),
            restart_rebind=cfg.tpu.restart_rebind,
            pose_jump_gate=float(cfg.tpu.pose_jump_gate),
            use_undistortion=cfg.useUndistortion,
            required_matched=cfg.requiredMatchedPointsCount,
            skip_from_head=cfg.skipFramesFromBatchHead,
            use_first_fit=cfg.useFirstFitInBatch,
            head_tie_tolerance=float(cfg.tpu.head_tie_tolerance),
            use_ransac=cfg.RPUseRANSAC,
            ransac_threshold=float(cfg.RPRANSACThreshold),
            distance_threshold=float(cfg.RPDistanceThreshold),
            # fan-out statistically matched to RPRANSACProb (the reference's
            # findEssentialMat confidence), capped by the tpu.* compute budget
            ransac_iters=ransac_fanout(cfg.RPRANSACProb, 8,
                                       cfg.tpu.ransac_iters),
            pnp_iters=ransac_fanout(cfg.RPRANSACProb, 6,
                                    cfg.tpu.pnp_ransac_iters),
            use_ba=cfg.useBundleAdjustment,
            ba_loss=loss,
            ba_loss_param=float(param),
            ba_iters=cfg.tpu.ba_max_iters,
            ba_adjust_intrinsics=cfg.tpu.ba_adjust_intrinsics,
            ba_freeze_old=cfg.tpu.ba_freeze_old,
            anchored_tri=cfg.tpu.anchored_triangulation,
            parallax_min_deg=float(cfg.tpu.parallax_min_deg),
        )


class TrackerState(NamedTuple):
    # shared intrinsics (BA adjusts these in place, like the reference's
    # calibrationMatrix write-back)
    K4: jnp.ndarray           # [4] fx, fy, cx, cy
    dist: jnp.ndarray         # [5] OpenCV distortion coeffs (k1,k2,p1,p2,k3)

    # global map arena (device twin of pipeline.structures.MapArena)
    map_points: jnp.ndarray   # [P,3] f32
    map_colors: jnp.ndarray   # [P,3] f32 (0-255)
    map_desc: jnp.ndarray     # [P,D] landmark descriptor (creation-frame view)
    map_count: jnp.ndarray    # () i32

    # previous accepted frame
    prev_xy: jnp.ndarray      # [K,2]
    prev_valid: jnp.ndarray   # [K] bool
    prev_desc: jnp.ndarray    # [K,D]
    prev_corr: jnp.ndarray    # [K] i32 (-1 = unbound)
    # track anchors (delayed triangulation): first-observation pose+pixel of
    # each live track, inherited along the match chain — unbound tracks
    # triangulate against THIS view once the baseline passes the parallax
    # gate, not against the adjacent frame
    prev_anchor_cam: jnp.ndarray  # [K,6] angle-axis+t of the anchor view
    prev_anchor_xy: jnp.ndarray   # [K,2] pixel in the anchor view
    pose_R: jnp.ndarray       # [3,3] world→camera of prev frame
    pose_t: jnp.ndarray       # [3]

    # candidate-frame ring buffer (filled by ingest, consumed by select)
    ring_xy: jnp.ndarray      # [R,K,2]
    ring_valid: jnp.ndarray   # [R,K] bool
    ring_desc: jnp.ndarray    # [R,K,D]
    ring_colors: jnp.ndarray  # [R,K,3] f32

    # BA window (accepted frames since last flush)
    win_xy: jnp.ndarray       # [F,K,2]
    win_corr: jnp.ndarray     # [F,K] i32
    win_cams: jnp.ndarray     # [F,6] angle-axis+t
    win_used: jnp.ndarray     # [F] bool
    # map_count at the current window's start: landmarks with id below this
    # were settled by earlier windows and are FROZEN in this window's BA
    # (they anchor the cameras; ba_step only moves window-born landmarks)
    win_map_base: jnp.ndarray  # () i32

    # EMA of accepted camera-center step lengths (map units) — feeds the
    # pose-jump gate (steps._track_core): a PnP solution teleporting the
    # camera far beyond the recent motion scale is rejected instead of
    # corrupting everything downstream.  0 = unknown (gate inactive)
    step_ema: jnp.ndarray      # () f32


def init_state(K: np.ndarray, cfg: EngineConfig,
               dist: np.ndarray | None = None) -> TrackerState:
    k, desc_dim, desc_dtype = cfg.max_keypoints, cfg.desc_dim, cfg.desc_dtype
    ring, map_cap, window = cfg.ring, cfg.map_cap, cfg.window
    f32 = jnp.float32
    K = np.asarray(K, np.float64)
    dist = np.zeros(5) if dist is None else np.asarray(dist).reshape(-1)[:5]
    return TrackerState(
        K4=jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], f32),
        dist=jnp.asarray(dist, f32),
        map_points=jnp.zeros((map_cap, 3), f32),
        map_colors=jnp.zeros((map_cap, 3), f32),
        map_desc=jnp.zeros((map_cap, desc_dim), desc_dtype),
        map_count=jnp.zeros((), jnp.int32),
        prev_xy=jnp.zeros((k, 2), f32),
        prev_valid=jnp.zeros((k,), bool),
        prev_desc=jnp.zeros((k, desc_dim), desc_dtype),
        prev_corr=jnp.full((k,), -1, jnp.int32),
        prev_anchor_cam=jnp.zeros((k, 6), f32),
        prev_anchor_xy=jnp.zeros((k, 2), f32),
        pose_R=jnp.eye(3, dtype=f32),
        pose_t=jnp.zeros((3,), f32),
        ring_xy=jnp.zeros((ring, k, 2), f32),
        ring_valid=jnp.zeros((ring, k), bool),
        ring_desc=jnp.zeros((ring, k, desc_dim), desc_dtype),
        ring_colors=jnp.zeros((ring, k, 3), f32),
        win_xy=jnp.zeros((window, k, 2), f32),
        win_corr=jnp.full((window, k), -1, jnp.int32),
        win_cams=jnp.zeros((window, 6), f32),
        win_used=jnp.zeros((window,), bool),
        win_map_base=jnp.zeros((), jnp.int32),
        step_ema=jnp.zeros((), f32),
    )
