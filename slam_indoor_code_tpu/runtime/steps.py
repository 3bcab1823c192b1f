"""Fused jitted step functions over the device-resident TrackerState.

Each public function is one device dispatch; outputs that the host needs are
packed into small vectors so every frame costs exactly one tiny download.
The pipeline semantics mirror pipeline/main_cycle.py (and through it the
reference's mainCycle.cpp) — see that module for the reference citations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import (
    compose_with_world,
    estimate_transformation,
    reconstruct,
    solve_pnp_ransac,
)
from ..geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix
from ..models import frontend as fe
from ..solver.ba import BAConfig, bundle_adjust_window
from .state import EngineConfig, TrackerState

# ---------------------------------------------------------------- mesh hooks
#
# Multi-chip execution (tpu.mesh_shape != ()) keeps ONE code path: the engine
# registers the active jax Mesh here and the step functions annotate their
# heavy fan-out intermediates with sharding constraints — the batch axis of
# ingest/describe and of the candidate-match tensor, and the BA observation
# axis (solver.ba).  XLA's SPMD partitioner inserts the collectives (the
# all-gathers back into the replicated TrackerState ride ICI).  EngineConfig
# carries mesh_shape so the jit cache keys distinguish meshed programs; on a
# single device no constraint is emitted and the programs are unchanged.

_ACTIVE_MESH = None


def set_active_mesh(mesh) -> None:
    """Register the mesh used by sharding constraints (engine calls this;
    must agree with cfg.mesh_shape, which keys the jit cache)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    from ..solver import ba as _ba

    _ba.set_active_mesh(mesh)


def _shard_leading(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain x to be sharded over its leading axis on the active mesh."""
    if _ACTIVE_MESH is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*(("batch",) + (None,) * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE_MESH, spec))


def _maybe_shard(cfg: EngineConfig, *xs):
    if not cfg.mesh_shape:
        return xs if len(xs) > 1 else xs[0]
    out = tuple(_shard_leading(x) for x in xs)
    return out if len(out) > 1 else out[0]


def _K_matrix(K4: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    z = jnp.zeros((), K4.dtype)
    o = jnp.ones((), K4.dtype)
    return jnp.stack([
        jnp.stack([fx, z, cx]),
        jnp.stack([z, fy, cy]),
        jnp.stack([z, z, o]),
    ])


def _frontend_cfg(cfg: EngineConfig) -> fe.FrontendConfig:
    return fe.FrontendConfig(
        max_keypoints=cfg.max_keypoints, threshold=cfg.threshold,
        descriptor=cfg.descriptor, ratio=cfg.ratio, metric=cfg.metric,
        descriptor_downscale=cfg.descriptor_downscale,
        sift_nearest=cfg.sift_nearest,
    )


def _select_good(cfg: EngineConfig, eligible: jnp.ndarray,
                 counts: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """The good-frame rule, shared by every scheduler variant: tail-most
    first-fit (batch.cpp:120-148 with useFirstFitInBatch) or head-most
    max-matches (batch.cpp:93-98).  ``head_tie_tolerance`` > 0 is a
    documented DIVERGENCE knob (default 0 = strict reference rule): every
    eligible frame within the tolerance of the best count competes and the
    head-most wins, so a head frame 1-4 matches short of a later near-tie
    is accepted instead of skipped.  Callers still gate on any(eligible)."""
    if cfg.use_first_fit:
        return jnp.max(jnp.where(eligible, pos, -1))
    best = jnp.max(jnp.where(eligible, counts, -1))
    if cfg.head_tie_tolerance > 0.0:
        cut = jnp.ceil(best.astype(jnp.float32)
                       * (1.0 - cfg.head_tie_tolerance)).astype(jnp.int32)
    else:
        cut = best
    return jnp.argmax(eligible & (counts >= cut)).astype(jnp.int32)


# ---------------------------------------------------------------- ingest
@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def ingest(cfg: EngineConfig, state: TrackerState, gray_u8: jnp.ndarray,
           rgb_small: jnp.ndarray, slots: jnp.ndarray):
    """Extract+describe a packed chunk (gray [C,H,W] u8 + color plane
    [C,H/d,W/d,3] u8 — see models.frontend.pack_frames) and write it into
    ring slots [C].  Returns (state, num_corners [C])."""
    fcfg = _frontend_cfg(cfg)
    gray_u8, rgb_small = _maybe_shard(cfg, gray_u8, rgb_small)
    res = fe.extract_and_describe_gray_batch(
        fcfg, gray_u8, rgb_small, cfg.color_downscale)
    xy = res["xy"]
    if cfg.use_undistortion:
        # reference declares useUndistortion but never applies it (TODO
        # comments at batch.cpp:247, mainCycleInternals.cpp:141); we correct
        # keypoint coordinates with the calibration's 5-coeff model.
        from ..geometry.projection import undistort_points

        K = _K_matrix(state.K4)
        xy = jax.vmap(lambda u: undistort_points(K, state.dist, u))(xy)
    state = state._replace(
        ring_xy=state.ring_xy.at[slots].set(xy),
        ring_valid=state.ring_valid.at[slots].set(res["valid"]),
        ring_desc=state.ring_desc.at[slots].set(res["desc"]),
        ring_colors=state.ring_colors.at[slots].set(
            res["colors"].astype(jnp.float32)),
    )
    return state, res["num_corners"].astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def ingest_host(cfg: EngineConfig, state: TrackerState,
                gray_small: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray,
                colors: jnp.ndarray, slots: jnp.ndarray):
    """Device half of host-detect ingest (see frontend.host_detect_pack):
    describe the host-detected keypoints from the pooled gray plane and write
    them into ring slots [C].  No download — the extraction gate already ran
    on the host, so this dispatch never blocks the conductor."""
    fcfg = _frontend_cfg(cfg)
    gray_small, xy, valid = _maybe_shard(cfg, gray_small, xy, valid)
    desc = fe.describe_packed_batch(fcfg, gray_small, xy, valid,
                                    cfg.ingest_downscale)
    if cfg.use_undistortion:
        # describe samples the (distorted) image, so correction applies to the
        # stored coords only — same order as the all-device ingest above.
        from ..geometry.projection import undistort_points

        K = _K_matrix(state.K4)
        xy = jax.vmap(lambda u: undistort_points(K, state.dist, u))(xy)
    return state._replace(
        ring_xy=state.ring_xy.at[slots].set(xy),
        ring_valid=state.ring_valid.at[slots].set(valid),
        ring_desc=state.ring_desc.at[slots].set(desc),
        ring_colors=state.ring_colors.at[slots].set(
            colors.astype(jnp.float32)),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def ingest_host_desc(cfg: EngineConfig, state: TrackerState,
                     desc_words: jnp.ndarray, xy: jnp.ndarray,
                     valid: jnp.ndarray, colors: jnp.ndarray,
                     slots: jnp.ndarray):
    """Host-descriptor ingest (host_desc="orb"): descriptors arrived packed
    as uint32 bit words [C,K,8] — the device stores them directly and
    matches by Hamming.  No image plane travels at all (~90 KB/frame)."""
    desc_words, xy, valid = _maybe_shard(cfg, desc_words, xy, valid)
    if cfg.use_undistortion:
        from ..geometry.projection import undistort_points

        K = _K_matrix(state.K4)
        xy = jax.vmap(lambda u: undistort_points(K, state.dist, u))(xy)
    return state._replace(
        ring_xy=state.ring_xy.at[slots].set(xy),
        ring_valid=state.ring_valid.at[slots].set(valid),
        ring_desc=state.ring_desc.at[slots].set(desc_words),
        ring_colors=state.ring_colors.at[slots].set(
            colors.astype(jnp.float32)),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def ingest_host_hybrid(cfg: EngineConfig, state: TrackerState,
                       gray_small: jnp.ndarray, desc_bits: jnp.ndarray,
                       xy: jnp.ndarray, valid: jnp.ndarray,
                       colors: jnp.ndarray, slots: jnp.ndarray):
    """Hybrid host ingest: pooled-gray SIFT (device dense maps) concatenated
    with α-scaled full-resolution ORB bits from the host — one 384-dim L2
    descriptor (the squared L2 of a 0/1 block IS its Hamming distance, so
    the fine-texture evidence rides the same matmul/kernel as SIFT)."""
    fcfg = _frontend_cfg(cfg)
    gray_small, desc_bits, xy, valid = _maybe_shard(
        cfg, gray_small, desc_bits, xy, valid)
    sift_part = fe.describe_packed_batch(fcfg, gray_small, xy, valid,
                                         cfg.ingest_downscale)  # [C,K,128]
    bits = jnp.unpackbits(desc_bits, axis=-1, bitorder="big")  # [C,K,256]
    desc = jnp.concatenate(
        [sift_part, cfg.hybrid_alpha * bits.astype(jnp.float32)], axis=-1)
    if cfg.use_undistortion:
        from ..geometry.projection import undistort_points

        K = _K_matrix(state.K4)
        xy = jax.vmap(lambda u: undistort_points(K, state.dist, u))(xy)
    return state._replace(
        ring_xy=state.ring_xy.at[slots].set(xy),
        ring_valid=state.ring_valid.at[slots].set(valid),
        ring_desc=state.ring_desc.at[slots].set(desc),
        ring_colors=state.ring_colors.at[slots].set(
            colors.astype(jnp.float32)),
    )


# ------------------------------------------------------------- set prev
@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def set_prev_from_slot(cfg: EngineConfig, state: TrackerState,
                       slot: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    """Promote a ring slot to the previous/reference frame (bootstrap first
    frame or head-promotion fallback), with pose (R,t)."""
    xy = state.ring_xy[slot]
    aa = matrix_to_rodrigues(R.astype(jnp.float32))
    cam6 = jnp.concatenate([aa, t.astype(jnp.float32)])
    return state._replace(
        prev_xy=xy,
        prev_valid=state.ring_valid[slot],
        prev_desc=state.ring_desc[slot],
        prev_corr=jnp.full_like(state.prev_corr, -1),
        prev_anchor_cam=jnp.broadcast_to(cam6, (xy.shape[0], 6)),
        prev_anchor_xy=xy,
        pose_R=R.astype(jnp.float32),
        pose_t=t.astype(jnp.float32),
    )


# ----------------------------------------------------------- match+select
@partial(jax.jit, static_argnames=("cfg",))
def match_select(cfg: EngineConfig, state: TrackerState, order: jnp.ndarray,
                 order_mask: jnp.ndarray):
    """Match prev frame against the ring slots listed in ``order`` [B] (head
    first) and apply the good-frame rule (batch.cpp:120-148 semantics).

    Returns (train_all [B,K] device, mask_all [B,K] device,
             info = [found, good_pos, count_of_good] i32, counts [B] i32)."""
    fcfg = _frontend_cfg(cfg)
    desc_b, valid_b = _maybe_shard(cfg, state.ring_desc[order],
                                   state.ring_valid[order])
    res = fe.match_against_batch(
        fcfg, state.prev_desc, state.prev_valid, desc_b, valid_b, order_mask
    )
    counts = res["num_matches"].astype(jnp.int32)
    B = counts.shape[0]
    pos = jnp.arange(B, dtype=jnp.int32)
    eligible = (pos >= cfg.skip_from_head) & order_mask & (
        counts >= cfg.required_matched)
    any_ok = eligible.any()
    good = jnp.where(any_ok, _select_good(cfg, eligible, counts, pos), -1)
    info = jnp.stack([
        any_ok.astype(jnp.int32), good.astype(jnp.int32),
        jnp.where(any_ok, counts[jnp.maximum(good, 0)], 0),
    ])
    return res["train_idx"], res["is_match"], info, counts


# --------------------------------------------------------------- helpers
def _verify_gates(cfg, K, Rp, tp, Rn, tn, X, uv1, uv2):
    """Map-hygiene gates in device form (see MainCycle._verify_points)."""

    def reproj(R, t, uv):
        Xc = X @ R.T + t
        z = Xc[:, 2]
        pix = Xc @ K.T
        safe = jnp.where(jnp.abs(pix[:, 2:3]) < 1e-9, 1e-9, pix[:, 2:3])
        e = jnp.linalg.norm(pix[:, :2] / safe - uv, axis=1)
        return e, z

    e1, z1 = reproj(Rp, tp, uv1)
    e2, z2 = reproj(Rn, tn, uv2)
    g = cfg.reproj_gate_px
    return (e1 < g) & (e2 < g) & (z1 > 0) & (z2 > 0)


def _verify_gates_anchored(cfg, K, R1s, t1s, Rn, tn, X, uv1, uv2):
    """_verify_gates with a PER-ROW first view (the track anchors)."""

    def reproj_rows(Xc, uv):
        pix = Xc @ K.T
        safe = jnp.where(jnp.abs(pix[:, 2:3]) < 1e-9, 1e-9, pix[:, 2:3])
        e = jnp.linalg.norm(pix[:, :2] / safe - uv, axis=1)
        return e, Xc[:, 2]

    Xc1 = jnp.einsum("nij,nj->ni", R1s, X) + t1s
    e1, z1 = reproj_rows(Xc1, uv1)
    e2, z2 = reproj_rows(X @ Rn.T + tn, uv2)
    g = cfg.reproj_gate_px
    return (e1 < g) & (e2 < g) & (z1 > 0) & (z2 > 0)


def _append_points(state: TrackerState, pts, colors, desc, add_mask):
    """Scatter-append masked points (+ their creation-frame descriptors, used
    by map re-binding); returns (state, ids [K], n_added)."""
    order = jnp.cumsum(add_mask.astype(jnp.int32)) - 1
    ids = state.map_count + order
    P = state.map_points.shape[0]
    ok = add_mask & (ids < P)
    idx = jnp.where(ok, ids, P)  # P = out-of-bounds → dropped
    return (
        state._replace(
            map_points=state.map_points.at[idx].set(pts, mode="drop"),
            map_colors=state.map_colors.at[idx].set(colors, mode="drop"),
            map_desc=state.map_desc.at[idx].set(desc, mode="drop"),
            map_count=state.map_count + ok.sum(dtype=jnp.int32),
        ),
        jnp.where(ok, ids, -1),
        ok.sum(dtype=jnp.int32),
    )


def _pose_out(ok, n_corr, n_inl, n_new, n_matches, R, t):
    head = jnp.stack([
        ok.astype(jnp.float32), n_corr.astype(jnp.float32),
        n_inl.astype(jnp.float32), n_new.astype(jnp.float32),
        n_matches.astype(jnp.float32),
    ])
    return jnp.concatenate([head, R.reshape(-1), t])


# -------------------------------------------------------------- bootstrap
@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def bootstrap_step(cfg: EngineConfig, state: TrackerState, slot: jnp.ndarray,
                   train: jnp.ndarray, mask: jnp.ndarray, key):
    """First-pair processing: essential-RANSAC pose + chirality filter +
    triangulation + landmark creation (processingFirstPairFrames /
    defineFeaturesCorrespondSpatialIndices).  The first frame is
    ``state.prev_*`` with pose (state.pose_R, state.pose_t)."""
    K = _K_matrix(state.K4)
    new_xy = state.ring_xy[slot]
    train_s = jnp.where(mask, train, 0)
    uv1 = state.prev_xy
    uv2 = new_xy[train_s]

    pose = estimate_transformation(
        key, K, uv1, uv2, mask,
        use_ransac=cfg.use_ransac, threshold_px=cfg.ransac_threshold,
        distance_threshold=cfg.distance_threshold,
        num_hypotheses=cfg.ransac_iters,
    )
    # a (re)bootstrap starts a fresh window: the previous sub-map's landmarks
    # are frozen anchors from here on (win_map_base = pre-append count)
    state = state._replace(win_map_base=state.map_count)
    chir = pose["chirality_mask"]
    R1, t1 = state.pose_R, state.pose_t
    R2, t2 = compose_with_world(R1, t1, pose["R"], pose["t"])

    X = reconstruct(K, R1, t1, R2, t2, uv1, uv2, chir)
    K_slots = uv1.shape[0]

    # ---- restart-boundary re-binding + monocular-scale rescue -----------
    # recoverPose's |t_rel| = 1 re-seeds the new sub-map's scale arbitrarily
    # at every track-loss restart; the concatenated trajectory then jumps at
    # the boundary (measured: one 43-unit teleport at a 384-frame corridor
    # restart vs 0.25-unit true steps).  The map arena RETAINS the old
    # sub-map, so: match the first frame's features against old landmarks
    # projected under the carried pose (the last good pose — exactly where
    # these features were just seen), estimate the depth ratio old/new per
    # match, rescale the baseline by its masked median, and SHARE the
    # matched landmarks across the boundary instead of duplicating them.
    # The first bootstrap (empty map) and match-less restarts reduce to the
    # reference behaviour arithmetically (s = 1, no binds).
    bind = jnp.zeros((K_slots,), bool)
    old_row_ids = jnp.full((K_slots,), -1, jnp.int32)
    scale_s = jnp.float32(1.0)
    n_bind = jnp.int32(0)
    n_rad = jnp.int32(0)    # features with >=1 old candidate in the radius
    n_okr = jnp.int32(0)    # ... that also passed the descriptor ratio test
    if cfg.rebind_cap > 0 and cfg.restart_rebind:
        from ..ops import knn as _knn

        Mr = cfg.rebind_cap
        stride_n = jnp.maximum(state.map_count, Mr)
        cand_ids = ((jnp.arange(Mr, dtype=jnp.int32)
                     * stride_n) // Mr).astype(jnp.int32)
        cand_real = cand_ids < state.map_count
        cand_X = state.map_points[cand_ids]
        cand_desc = state.map_desc[cand_ids]
        Xc1 = cand_X @ R1.T + t1
        pix = Xc1 @ K.T
        safe = jnp.where(jnp.abs(pix[:, 2:3]) < 1e-9, 1e-9, pix[:, 2:3])
        pc = pix[:, :2] / safe
        d = _knn.distance_matrix(state.prev_desc, cand_desc, cfg.metric)
        # the camera kept moving through the lost frames, so the projection
        # gate is 4x the steady-state re-bind radius
        rad = 4.0 * cfg.rebind_radius
        pixd2 = jnp.sum((uv1[:, None, :] - pc[None, :, :]) ** 2, -1)
        allowed = (cand_real & (Xc1[:, 2] > 0))[None, :] & (pixd2 < rad * rad)
        dm = jnp.where(allowed, d, _knn.BIG)
        bestc = jnp.argmin(dm, axis=1)
        d1 = jnp.take_along_axis(dm, bestc[:, None], 1)[:, 0]
        d2 = (dm + jax.nn.one_hot(bestc, Mr, dtype=dm.dtype) * _knn.BIG
              ).min(axis=1)
        ratio = cfg.ratio * cfg.ratio if cfg.metric == "l2" else cfg.ratio
        ok_r = (d1 < ratio * d2) & (d2 < _knn.BIG / 2)
        # LONE candidates (no second neighbor in the radius — the norm on a
        # feature-sparse retained map, where the steady-state re-bind's
        # strict ratio test finds nothing) may VOTE: the depth-ratio
        # consensus below is itself the verifier — wrong matches scatter
        # their ratios, genuine ones agree, and only consensus inliers bind
        near = d1 < _knn.BIG / 2
        vote = state.prev_valid & near
        n_rad = vote.sum(dtype=jnp.int32)
        n_okr = (state.prev_valid & ok_r).sum(dtype=jnp.int32)
        old_best = cand_ids[bestc]
        z_old = Xc1[bestc, 2]
        z_new = (X @ R1.T + t1)[:, 2]
        r_ok = vote & chir & (z_new > 1e-6) & (z_old > 1e-6)
        ratios = jnp.where(r_ok, z_old / jnp.maximum(z_new, 1e-6), _knn.BIG)
        n_r = r_ok.sum(dtype=jnp.int32)
        srt = jnp.sort(ratios)
        med = srt[jnp.clip(n_r // 2, 0, K_slots - 1)]
        inlier = r_ok & (jnp.abs(ratios - med) < 0.25 * med)
        n_in = inlier.sum(dtype=jnp.int32)
        # all-or-nothing: apply the scale and the binds only when enough
        # votes exist AND a majority agrees — otherwise fall back to the
        # reference behaviour (s = 1, nothing shared)
        consensus = (n_r >= 8) & (n_in >= (n_r + 1) // 2)
        scale_s = jnp.where(consensus, jnp.clip(med, 0.05, 20.0), 1.0)
        bind = inlier & consensus
        old_row_ids = jnp.where(bind, old_best, -1)
        n_bind = bind.sum(dtype=jnp.int32)
        # apply the scale: baseline and triangulated points scale together
        # around the first camera's center
        t2 = pose["R"] @ t1 + scale_s * pose["t"]
        C1 = -R1.T @ t1
        X = C1 + scale_s * (X - C1)

    colors = state.ring_colors[slot][train_s]
    desc_new = state.ring_desc[slot][train_s]
    add_mask = chir & ~bind
    state, ids, n_new = _append_points(state, X, colors, desc_new, add_mask)

    q = jnp.arange(K_slots)
    row_corr = jnp.where(bind, old_row_ids,
                         jnp.where(add_mask, ids, -1))
    first_corr = jnp.full((K_slots,), -1, jnp.int32).at[q].set(row_corr)
    row_ok = bind | add_mask
    second_corr = jnp.full((K_slots,), -1, jnp.int32).at[
        jnp.where(row_ok & mask, train_s, K_slots)
    ].set(jnp.where(row_ok & mask, row_corr, -1), mode="drop")

    aa1 = matrix_to_rodrigues(state.pose_R)
    aa2 = matrix_to_rodrigues(R2)
    win_xy = state.win_xy.at[0].set(uv1).at[1].set(new_xy)
    win_corr = state.win_corr.at[0].set(first_corr).at[1].set(second_corr)
    win_cams = state.win_cams.at[0].set(
        jnp.concatenate([aa1, state.pose_t])).at[1].set(
        jnp.concatenate([aa2, t2]))
    win_used = state.win_used.at[0].set(True).at[1].set(True)

    # track anchors for the new prev frame: matched features inherit the
    # FIRST frame as their anchor (their track started there); fresh features
    # anchor at this second frame
    cam2 = jnp.concatenate([aa2, t2])
    anchor_cam = jnp.broadcast_to(cam2, (K_slots, 6))
    anchor_xy = new_xy
    cam1 = jnp.concatenate([aa1, state.pose_t])
    anchor_cam = anchor_cam.at[jnp.where(mask, train_s, K_slots)].set(
        jnp.broadcast_to(cam1, (K_slots, 6)), mode="drop")
    anchor_xy = anchor_xy.at[jnp.where(mask, train_s, K_slots)].set(
        uv1, mode="drop")

    state = state._replace(
        prev_xy=new_xy,
        prev_valid=state.ring_valid[slot],
        prev_desc=state.ring_desc[slot],
        prev_corr=second_corr,
        prev_anchor_cam=anchor_cam,
        prev_anchor_xy=anchor_xy,
        pose_R=R2,
        pose_t=t2,
        win_xy=win_xy, win_corr=win_corr, win_cams=win_cams, win_used=win_used,
        # seed the pose-jump gate's motion scale with the bootstrap
        # baseline (slightly loose if the pair spans >1 source frame —
        # the EMA tightens within a few accepted steps)
        step_ema=jnp.linalg.norm((-R2.T @ t2) - (-R1.T @ t1)),
    )
    # two extra trailer entries (restart-rescue audit: consensus scale +
    # shared-landmark count) — _unpack reads only the first 17, so the
    # trailer is backward compatible
    out = jnp.concatenate([
        _pose_out(jnp.asarray(True), chir.sum(), pose["num_passed"],
                  n_new, mask.sum(), R2, t2),
        jnp.stack([scale_s, n_bind.astype(jnp.float32),
                   n_rad.astype(jnp.float32), n_okr.astype(jnp.float32),
                   state.win_map_base.astype(jnp.float32)]),
    ])
    return state, out


# ------------------------------------------------------------- track step
def _track_core(cfg: EngineConfig, state: TrackerState, slot: jnp.ndarray,
                train: jnp.ndarray, mask: jnp.ndarray,
                win_pos: jnp.ndarray, key):
    """Accept the chosen candidate: PnP pose, triangulate, verified map
    merge, window bookkeeping (mainCycle.cpp:111-219).  All state updates are
    gated on ok = enough PnP correspondences, so a failed frame leaves the
    state untouched (the host then breaks, mirroring the reference)."""
    K = _K_matrix(state.K4)
    new_xy = state.ring_xy[slot]
    new_valid = state.ring_valid[slot]
    new_desc = state.ring_desc[slot]
    train_s = jnp.where(mask, train, 0)

    # 3D↔2D harvest (getOldSpatialPointsAndNewFrameFeatureCoords)
    struct = jnp.where(mask, state.prev_corr, -1)
    pm = struct >= 0
    Xh = state.map_points[jnp.where(pm, struct, 0)]
    uvh = new_xy[train_s]
    n_corr = pm.sum(dtype=jnp.int32)
    ok = n_corr >= 4

    pnp = solve_pnp_ransac(key, K, Xh, uvh, pm, num_hypotheses=cfg.pnp_iters,
                           reproj_threshold_px=cfg.reproj_gate_px,
                           prior_R=state.pose_R, prior_t=state.pose_t)
    Rn, tn = pnp["R"], pnp["t"]

    # pose-jump gate: a PnP solution that teleports the camera far beyond
    # the recent motion scale (EMA of accepted steps) is a consensus over
    # degenerate geometry, not motion — reject the frame (ok=False breaks
    # the scan; the restart then carries the LAST GOOD pose, which is what
    # the restart re-bind needs to re-anchor).  Measured: one accepted
    # 43-unit jump vs 0.25-unit steps bent a 384-frame corridor's tail from
    # ~2% to 9-14% ATE.  step_ema==0 (no history yet) leaves the gate open.
    step_len = jnp.linalg.norm((-Rn.T @ tn) - (-state.pose_R.T @ state.pose_t))
    if cfg.pose_jump_gate > 0:
        ok = ok & ((state.step_ema <= 0)
                   | (step_len <= cfg.pose_jump_gate * state.step_ema + 1e-3))

    # triangulate all matches — against each track's ANCHOR view (delayed
    # triangulation) or, classically, against the adjacent prev frame.
    # Consecutive-frame baselines are tiny; their far-point depths are pure
    # noise and feeding them to PnP collapses the monocular scale
    # exponentially (measured: est/gt step-scale decayed 3.9→0.0 over 96
    # frames).  The anchor path only creates a landmark once the ray angle
    # passes the parallax gate.
    uv1 = state.prev_xy
    uv2 = uvh
    if cfg.anchored_tri:
        from ..geometry.triangulate import triangulate_midpoint_anchored

        R1s = jax.vmap(rodrigues_to_matrix)(state.prev_anchor_cam[:, :3])
        t1s = state.prev_anchor_cam[:, 3:]
        auv1 = state.prev_anchor_xy
        X, cospar = triangulate_midpoint_anchored(
            K, R1s, t1s, Rn, tn, auv1, uv2, mask)
        verified = _verify_gates_anchored(cfg, K, R1s, t1s, Rn, tn,
                                          X, auv1, uv2)
        import math as _math

        par_ok = cospar < _math.cos(_math.radians(cfg.parallax_min_deg))
        verified = verified & par_ok
    else:
        X = reconstruct(K, state.pose_R, state.pose_t, Rn, tn, uv1, uv2, mask)
        verified = _verify_gates(cfg, K, state.pose_R, state.pose_t, Rn, tn,
                                 X, uv1, uv2)

    # existing-binding re-verification before propagation
    e_old, z_old = (lambda Xc: (jnp.linalg.norm(
        (Xc @ K.T)[:, :2] / jnp.maximum(jnp.abs((Xc @ K.T)[:, 2:3]), 1e-9)
        - uv2, axis=1), Xc[:, 2]))(Xh @ Rn.T + tn)
    # softer gate than new-landmark creation: a momentarily imprecise pose
    # must not strip existing bindings (that spiral is worse than keeping a
    # few loose ones — BA's robust loss handles those)
    prop_ok = (e_old < 2.0 * cfg.reproj_gate_px) & (z_old > 0)

    K_slots = uv1.shape[0]
    is_old = mask & (state.prev_corr >= 0) & prop_ok
    new_corr = jnp.full((K_slots,), -1, jnp.int32)
    new_corr = new_corr.at[jnp.where(is_old, train_s, K_slots)].set(
        jnp.where(is_old, state.prev_corr, -1), mode="drop")

    # ---- map re-binding (anti-drift; no reference counterpart — bindings
    # there only propagate frame-to-frame and die at the first missed match,
    # so PnP progressively anchors on younger, already-drifted landmarks).
    # Runs BEFORE landmark creation: a feature that re-binds to existing
    # geometry must not spawn a duplicate landmark.  Candidates are sampled
    # UNIFORMLY over the map's age range (strided by map_count), not
    # recency-limited: long-range ties to old landmarks are what (a) anchor
    # PnP against accumulated drift and (b) give the final global BA the
    # long-track signal without which smooth drift is an unobservable gauge
    # direction (see tests/test_ba.py windowed-graph test).  A bind needs:
    # projected within rebind_radius px under the PnP pose, descriptor ratio
    # test within the radius set, and an adaptive absolute gate.
    if cfg.rebind_cap > 0:
        from ..ops import knn as _knn

        Mr = cfg.rebind_cap
        stride_n = jnp.maximum(state.map_count, Mr)
        cand_ids = ((jnp.arange(Mr, dtype=jnp.int32)
                     * stride_n) // Mr).astype(jnp.int32)
        cand_real = cand_ids < state.map_count      # pre-append landmarks
        cand_X = state.map_points[cand_ids]
        cand_desc = state.map_desc[cand_ids]
        Xc = cand_X @ Rn.T + tn
        pix = Xc @ K.T
        safe = jnp.where(jnp.abs(pix[:, 2:3]) < 1e-9, 1e-9, pix[:, 2:3])
        pc = pix[:, :2] / safe                      # [M,2]
        if cfg.metric == "hamming":
            d = _knn.distance_matrix(new_desc, cand_desc, cfg.metric)
        else:
            # candidate RANKING tolerates bf16: run the [K,M,D] product on
            # the MXU at default precision instead of the package-wide
            # 'highest' (6 passes) — this matmul runs inside EVERY scan step
            a16 = new_desc.astype(jnp.bfloat16)
            b16 = cand_desc.astype(jnp.bfloat16)
            ab = jax.lax.dot_general(
                a16, b16, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            a2 = jnp.sum(jnp.square(new_desc.astype(jnp.float32)), -1,
                         keepdims=True)
            b2 = jnp.sum(jnp.square(cand_desc.astype(jnp.float32)), -1)
            d = jnp.maximum(a2 + b2[None, :] - 2.0 * ab, 0.0)
            if cfg.metric == "l1":
                # l1 configs rank by the exact metric (rare path)
                d = _knn.distance_matrix(new_desc, cand_desc, cfg.metric)
        pixd2 = jnp.sum((new_xy[:, None, :] - pc[None, :, :]) ** 2, -1)
        allowed = (cand_real & (Xc[:, 2] > 0))[None, :] & (
            pixd2 < cfg.rebind_radius * cfg.rebind_radius)
        dm = jnp.where(allowed, d, _knn.BIG)
        bestc = jnp.argmin(dm, axis=1)
        d1 = jnp.take_along_axis(dm, bestc[:, None], 1)[:, 0]
        d2 = (dm + jax.nn.one_hot(bestc, Mr, dtype=dm.dtype) * _knn.BIG
              ).min(axis=1)
        ratio = cfg.ratio * cfg.ratio if cfg.metric == "l2" else cfg.ratio
        # the ratio test REQUIRES a real second candidate: a lone candidate
        # inside the radius carries no evidence the descriptor match is
        # discriminative, and a wrong bind poisons the next PnP anchor set
        # (measured: permissive lone-accept tripled ATE under pooled-gray
        # descriptors) — sparse-map frames simply rebind less
        ok_r = (d1 < ratio * d2) & (d2 < _knn.BIG / 2)
        # adaptive absolute gate, self-calibrated per frame: propagated
        # bindings are known-good feature↔landmark pairs, so the 90th
        # percentile of THEIR descriptor distances bounds what a genuine
        # re-bind may look like at the current descriptor quality (pooled
        # ingest, blur, resolution all shift this scale — a fixed constant
        # can't track it)
        # is_old lives on the prev-keypoint (match) axis: row i's propagated
        # binding is landmark state.prev_corr[i] observed as feature
        # new_desc[train_s[i]] — the same pairing the new_corr scatter uses
        lm_ids = jnp.where(is_old, state.prev_corr, 0)
        lm_desc = state.map_desc[lm_ids]
        feat = new_desc[train_s]
        if cfg.metric == "hamming":
            good_d = jax.lax.population_count(
                jnp.bitwise_xor(feat, lm_desc)).sum(-1).astype(jnp.float32)
        else:
            diff = feat.astype(jnp.float32) - lm_desc.astype(jnp.float32)
            good_d = jnp.sum(diff * diff, -1)
            if cfg.metric == "l1":
                good_d = jnp.sum(jnp.abs(diff), -1)
        good_d = jnp.where(is_old, good_d, _knn.BIG)
        n_good = is_old.sum(dtype=jnp.int32)
        srt = jnp.sort(good_d)
        q_idx = jnp.clip((n_good * 9) // 10, 0, good_d.shape[0] - 1)
        tau = jnp.where(n_good >= 8, srt[q_idx], jnp.float32(-1.0))
        bind = new_valid & (new_corr < 0) & ok_r & (d1 <= tau)
        new_corr = jnp.where(bind, cand_ids[bestc], new_corr)

    # landmark creation AFTER re-binding: only matched+verified features that
    # are still unbound triangulate a new landmark (pushNewSpatialPoints
    # dedup semantics, mainCycleInternals.cpp:222-246 — the reference dedups
    # against the prev frame's bindings; re-binding extends the dedup to the
    # whole map)
    bound_after = new_corr[train_s] >= 0
    add_mask = mask & (state.prev_corr < 0) & verified & ok & ~bound_after
    colors = state.ring_colors[slot][train_s]
    desc_created = state.ring_desc[slot][train_s]
    state2, ids, n_new = _append_points(state, X, colors, desc_created,
                                        add_mask)
    new_corr = new_corr.at[jnp.where(add_mask, train_s, K_slots)].set(
        ids, mode="drop")

    aa = matrix_to_rodrigues(Rn)
    # window bookkeeping gated through the scatter index (win_pos→F drops the
    # write when the frame is rejected) — NOT through a whole-state select
    widx = jnp.where(ok, win_pos, jnp.int32(cfg.window))
    win_xy = state2.win_xy.at[widx].set(new_xy, mode="drop")
    win_corr = state2.win_corr.at[widx].set(new_corr, mode="drop")
    win_cams = state2.win_cams.at[widx].set(
        jnp.concatenate([aa, tn]), mode="drop")
    win_used = state2.win_used.at[widx].set(True, mode="drop")

    # anchor inheritance: a matched feature keeps its track's anchor
    # (pose+pixel of first observation); fresh features anchor at this frame
    cam_n = jnp.concatenate([aa, tn])
    anchor_cam_new = jnp.broadcast_to(cam_n, (K_slots, 6))
    anchor_xy_new = new_xy
    if cfg.anchored_tri:
        scat = jnp.where(mask, train_s, K_slots)
        anchor_cam_new = anchor_cam_new.at[scat].set(
            state.prev_anchor_cam, mode="drop")
        anchor_xy_new = anchor_xy_new.at[scat].set(
            state.prev_anchor_xy, mode="drop")

    # Fine-grained accept gating.  A rejected frame (ok=False) must leave the
    # state untouched; the map arena/ring buffers are ALREADY untouched in
    # that case (add_mask includes `ok`, so every arena scatter dropped), and
    # a tree_map select over the whole TrackerState would rewrite ~400 MB of
    # HBM per scan step just to re-assert that.  Only the small per-frame
    # leaves need a real select.
    def g(new, old):
        return jnp.where(ok, new, old)

    state_out = state2._replace(
        prev_xy=g(new_xy, state.prev_xy),
        prev_valid=g(new_valid, state.prev_valid),
        prev_desc=g(new_desc, state.prev_desc),
        prev_corr=g(new_corr, state.prev_corr),
        prev_anchor_cam=g(anchor_cam_new, state.prev_anchor_cam),
        prev_anchor_xy=g(anchor_xy_new, state.prev_anchor_xy),
        pose_R=g(Rn, state.pose_R), pose_t=g(tn, state.pose_t),
        win_xy=win_xy, win_corr=win_corr, win_cams=win_cams, win_used=win_used,
        step_ema=g(jnp.where(state.step_ema > 0,
                             0.7 * state.step_ema + 0.3 * step_len,
                             step_len), state.step_ema),
    )

    out = _pose_out(ok, n_corr, pnp["num_inliers"], n_new, mask.sum(), Rn, tn)
    return state_out, out


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def track_step(cfg: EngineConfig, state: TrackerState, slot: jnp.ndarray,
               train_all: jnp.ndarray, mask_all: jnp.ndarray,
               good_pos: jnp.ndarray, win_pos: jnp.ndarray, key):
    """Standalone track dispatch (see _track_core); the steady-state loop
    uses the fused ``advance_step`` instead."""
    return _track_core(cfg, state, slot, train_all[good_pos],
                       mask_all[good_pos], win_pos, key)


# ----------------------------------------------------------------- BA step
def ba_packed_len(cfg: EngineConfig) -> int:
    """Length of the packed BA stats/poses vector (see _ba_core)."""
    return 4 + cfg.window * 6 + cfg.window * 9


def _ba_core_small(cfg: EngineConfig, K4, map_points, win_used, win_corr,
                   win_xy, win_cams, win_map_base, map_count,
                   win_fill: jnp.ndarray):
    """Windowed BA over the device-resident window + map arena
    (mainCycle.cpp:201-210 semantics: BA adjusts the shared intrinsics,
    window poses, and observed landmarks in place).

    Operates on EXPLICIT small pieces instead of the whole TrackerState so
    the in-scan ``lax.cond`` in advance_stream only carries the arrays BA
    actually writes (~3 MB) — a cond over the full state forced XLA to copy
    the untouched ring/descriptor/map arenas (~700 MB of HBM traffic) every
    scan step, measured 25→13 fps end to end.

    Returns (K4', map_points', pose_R', pose_t', win_used', win_corr',
    win_map_base', packed)."""
    F = cfg.window
    Pw = cfg.window_points
    BIG = jnp.int32(2**30)

    corr = jnp.where(win_used[:, None], win_corr, -1)
    obs_mask = corr >= 0
    sentinel = jnp.where(obs_mask, corr, BIG)
    uids = jnp.unique(sentinel.reshape(-1), size=Pw, fill_value=BIG)
    pmask = uids < BIG
    local = jnp.searchsorted(uids, sentinel).astype(jnp.int32)
    local = jnp.where(obs_mask, jnp.minimum(local, Pw - 1), 0)
    # When the window holds more unique landmarks than Pw, jnp.unique's size
    # cap drops the overflow ids — observations of a dropped landmark must be
    # masked out, NOT clamp-aliased onto whatever landmark sits at the edge.
    obs_mask = obs_mask & (uids[local] == sentinel)
    pts = map_points[jnp.where(pmask, uids, 0)]

    bacfg = BAConfig(loss=cfg.ba_loss, loss_param=cfg.ba_loss_param,
                     max_iters=cfg.ba_iters, obs_cap=cfg.ba_obs_cap,
                     fix_intrinsics=not cfg.ba_adjust_intrinsics,
                     shard_obs=bool(cfg.mesh_shape),
                     gauge_frame0=not cfg.ba_freeze_old)
    # fixed-landmark anchoring: only landmarks born in THIS window may move;
    # earlier windows' landmarks constrain the poses but stay put, so a
    # window cannot bend the settled map toward its own drift
    pfree = None
    if cfg.ba_freeze_old:
        pfree = jnp.where(pmask, uids, 0) >= win_map_base
    K4f, camsf, ptsf, info = bundle_adjust_window(
        bacfg, K4, win_cams, pts, win_xy, local,
        obs_mask, pmask, pfree,
    )

    P = map_points.shape[0]
    scatter_idx = jnp.where(pmask, uids, P)
    map_points = map_points.at[scatter_idx].set(ptsf, mode="drop")
    # resync prev pose to the adjusted last window frame
    last = jnp.maximum(win_fill - 1, 0)
    aa_t = camsf[last]
    # ONE packed download: [rmse0, rmse1, num_res, n_iters, cams (F*6),
    # Rmats (F*9)] — per-frame host-side rodrigues conversions each cost a
    # full ~28 ms relay round-trip, so rotation matrices are produced here
    packed = jnp.concatenate([
        jnp.stack([info["initial_rmse"], info["final_rmse"],
                   info["num_residuals"].astype(camsf.dtype),
                   info["num_iters"].astype(camsf.dtype)]),
        camsf.reshape(-1),
        jax.vmap(lambda aa: rodrigues_to_matrix(aa))(camsf[:, :3]).reshape(-1),
    ])
    return (K4f, map_points, rodrigues_to_matrix(aa_t[:3]), aa_t[3:],
            jnp.zeros_like(win_used), jnp.full_like(win_corr, -1),
            # this window's landmarks are now settled: next window freezes them
            map_count, packed)


def _ba_core(cfg: EngineConfig, state: TrackerState, win_fill: jnp.ndarray):
    """Whole-state wrapper of _ba_core_small (standalone ba_step dispatch +
    classic loop)."""
    (K4f, mp, Rn, tn, wu, wc, wmb, packed) = _ba_core_small(
        cfg, state.K4, state.map_points, state.win_used, state.win_corr,
        state.win_xy, state.win_cams, state.win_map_base, state.map_count,
        win_fill)
    state = state._replace(
        K4=K4f, map_points=mp, pose_R=Rn, pose_t=tn,
        win_used=wu, win_corr=wc, win_map_base=wmb,
    )
    return state, packed


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def ba_step(cfg: EngineConfig, state: TrackerState, win_fill: jnp.ndarray):
    """Standalone windowed-BA dispatch (classic loop + final partial-window
    flush; the streaming loop solves in-scan via ``advance_stream``)."""
    return _ba_core(cfg, state, win_fill)


def _win_reset(state: TrackerState) -> TrackerState:
    """Window reset WITHOUT a solve (useBundleAdjustment=false flush —
    moveProcessedDataToGlobalStruct keeps the PnP poses as-is)."""
    return state._replace(
        win_used=jnp.zeros_like(state.win_used),
        win_corr=jnp.full_like(state.win_corr, -1),
        win_map_base=state.map_count,
    )


# ------------------------------------------------------- fused frame advance
@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def advance_step(cfg: EngineConfig, state: TrackerState, order: jnp.ndarray,
                 order_mask: jnp.ndarray, win_pos: jnp.ndarray, key):
    """match_select + track_step fused into ONE dispatch — the steady-state
    per-frame program.  Per-dispatch sync costs ~28 ms through the remote
    tunnel, so halving the dispatches matters more than any FLOP here.

    Returns (state', packed) where packed = [found, good_pos, count_good,
    ok, n_corr, n_inl, n_new, n_matches, R(9), t(3), counts(B)] — one small
    download carries everything the host needs (control flow + pose logging
    + reference-style per-index match counts)."""
    fcfg = _frontend_cfg(cfg)
    desc_b, valid_b = _maybe_shard(cfg, state.ring_desc[order],
                                   state.ring_valid[order])
    res = fe.match_against_batch(
        fcfg, state.prev_desc, state.prev_valid, desc_b, valid_b, order_mask
    )
    counts = res["num_matches"].astype(jnp.int32)
    B = counts.shape[0]
    pos_arr = jnp.arange(B, dtype=jnp.int32)
    eligible = (pos_arr >= cfg.skip_from_head) & order_mask & (
        counts >= cfg.required_matched)
    any_ok = eligible.any()
    good = jnp.where(any_ok, _select_good(cfg, eligible, counts, pos_arr), 0)

    slot = order[good]
    train = res["train_idx"][good]
    mask = res["is_match"][good] & any_ok
    # any_ok=False ⇒ mask all-False ⇒ ok=False inside _track_core ⇒ the state
    # comes back untouched — no outer whole-state select needed
    state_out, out = _track_core(cfg, state, slot, train, mask, win_pos, key)

    head = jnp.stack([
        any_ok.astype(jnp.float32),
        jnp.where(any_ok, good, -1).astype(jnp.float32),
        jnp.where(any_ok, counts[good], 0).astype(jnp.float32),
    ])
    packed = jnp.concatenate([head, out, counts.astype(jnp.float32)])
    return state_out, packed


# ----------------------------------------------------- windowed device loop
@partial(jax.jit, static_argnames=("cfg", "t_steps", "visible"),
         donate_argnums=(1,))
def advance_window(cfg: EngineConfig, state: TrackerState,
                   queue: jnp.ndarray, q_head: jnp.ndarray,
                   q_len: jnp.ndarray, win_fill: jnp.ndarray,
                   keys: jnp.ndarray, t_steps: int, visible: int = 0):
    """Process up to ``t_steps`` frames in ONE dispatch via a device loop.

    The candidate queue (ring-slot ids, circular over Q entries) is consumed
    on device exactly like the per-frame path: each scan step matches the
    previous frame against the remaining queue, applies the good-frame rule,
    and tracks the winner.  The loop goes inactive (idempotent no-op) once a
    frame is not found / PnP fails (the reference's break) or the BA window
    fills.  One ~1 KB download replaces up to F round-trips — the host sync
    cost per frame drops from ~28 ms to ~28/F ms.

    Returns (state', packed [t_steps, 22], q_head', q_len').
    packed[t] = [stepped, found, good_pos, count_good, ok, n_corr, n_inl,
                 n_new, n_matches, R(9), t(3), win_pos]."""
    Q = queue.shape[0]
    fcfg = _frontend_cfg(cfg)
    # Each step only ever scans the first `visible` unconsumed entries, so
    # the per-step gather + matcher run over Qv lanes, NOT the whole queue
    # buffer — at ring≈3·batch_size the un-sliced version tripled the
    # matcher work for lanes that were always masked out.
    Qv = min(visible, Q) if visible > 0 else Q
    iota_q = jnp.arange(Qv, dtype=jnp.int32)

    def body(carry, key):
        state, q_head, q_len, win_pos, alive = carry
        active = alive & (q_len > 0) & (win_pos < cfg.window)

        order_idx = (q_head + iota_q) % Q
        order = queue[order_idx]
        # `visible` caps the candidate window each step scans to the
        # reference's framesBatchSize (batch.cpp:120-148 scans exactly one
        # filled batch).  This also makes the candidate set a deterministic
        # function of the consumption point: without the cap it depends on
        # ingest chunk phase (how far prefetch admitted past batch_size),
        # which a resumed run cannot reconstruct — kill-and-resume would
        # legally diverge from the uninterrupted run.
        vis = jnp.minimum(q_len, Qv)
        order_mask = (iota_q < vis) & active

        desc_b, valid_b = _maybe_shard(cfg, state.ring_desc[order],
                                       state.ring_valid[order])
        res = fe.match_against_batch(
            fcfg, state.prev_desc, state.prev_valid, desc_b, valid_b,
            order_mask)
        counts = res["num_matches"].astype(jnp.int32)
        eligible = (iota_q >= cfg.skip_from_head) & order_mask & (
            counts >= cfg.required_matched)
        any_ok = eligible.any()
        good = jnp.where(any_ok,
                         _select_good(cfg, eligible, counts, iota_q), 0)
        found = any_ok & active

        slot = order[good]
        train = res["train_idx"][good]
        mask = res["is_match"][good] & found
        # found=False ⇒ mask all-False ⇒ ok=False in _track_core ⇒ state
        # untouched; _track_core's internal fine-grained gating covers the
        # accept, so no whole-state tree_map select here (each one rewrote
        # the full map arena + ring buffers per scan step)
        state, out = _track_core(cfg, state, slot, train, mask, win_pos, key)
        ok = out[0] > 0.5
        accept = found & ok

        q_head = jnp.where(found, (q_head + good + 1) % Q, q_head)
        q_len = jnp.where(found, q_len - good - 1, q_len)
        win_pos = jnp.where(accept, win_pos + 1, win_pos)
        alive = alive & found & ok

        packed = jnp.concatenate([
            jnp.stack([
                active.astype(jnp.float32), found.astype(jnp.float32),
                good.astype(jnp.float32),
                jnp.where(found, counts[good], 0).astype(jnp.float32),
            ]),
            out,
            win_pos.astype(jnp.float32)[None],
        ])
        return (state, q_head, q_len, win_pos, alive), packed

    carry0 = (state, q_head.astype(jnp.int32), q_len.astype(jnp.int32),
              win_fill.astype(jnp.int32), jnp.asarray(True))
    (state, q_head, q_len, win_pos, _), packed = jax.lax.scan(
        body, carry0, keys, length=t_steps)
    return state, packed, q_head, q_len


# ------------------------------------------------------- streaming device loop
#
# The classic loop pays one host sync (packed download, ~28 ms relay round
# trip + host bookkeeping) per window before it can dispatch the next one —
# measured ~55 ms/window of pure overhead at FHD (ROUND3.md §2).  The
# streaming design removes the host from the critical path entirely:
#
#   * the candidate QUEUE lives on device (slot ids + head/len cursors,
#     threaded through dispatches as device scalars the host never reads);
#   * ingest dispatches append admitted slots via ``queue_append``;
#   * ``advance_stream`` consumes the queue for T scan steps and — when an
#     accept fills the BA window — solves the windowed BA IN-SCAN (lax.cond,
#     executed only on the boundary step) and resets the window;
#   * the per-dispatch status download rides a background thread; the host
#     processes it 1-2 dispatches LATE, purely for logging/trajectory/stop
#     decisions, while the device streams window after window back-to-back.
#
# Determinism: each scan step still sees exactly min(q_len, visible)
# candidates from the head, so the candidate set remains a pure function of
# the consumption point (the kill-and-resume contract of advance_window),
# regardless of how far ingest over-admitted or how late the host collects.

@partial(jax.jit, donate_argnums=(0,))
def queue_append(queue: jnp.ndarray, q_head: jnp.ndarray, q_len: jnp.ndarray,
                 slots: jnp.ndarray, admit: jnp.ndarray):
    """Append admitted ring slots to the device candidate queue (circular).

    Returns (queue', q_len').  Issued right after the chunk's ingest
    dispatch; device program order makes it visible to every later
    ``advance_stream``."""
    Q = queue.shape[0]
    off = jnp.cumsum(admit.astype(jnp.int32)) - 1
    pos = (q_head + q_len + off) % Q
    idx = jnp.where(admit, pos, Q)
    queue = queue.at[idx].set(slots, mode="drop")
    return queue, q_len + admit.sum(dtype=jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "t_steps", "visible", "collect_obs"),
         donate_argnums=(1,))
def advance_stream(cfg: EngineConfig, state: TrackerState,
                   queue: jnp.ndarray, q_head: jnp.ndarray,
                   q_len: jnp.ndarray, win_fill: jnp.ndarray,
                   dead: jnp.ndarray, keys: jnp.ndarray, t_steps: int,
                   visible: int = 0, collect_obs: bool = False,
                   tail: jnp.ndarray | bool = False):
    """Streaming window advance: up to ``t_steps`` tracked frames AND the
    windowed-BA flush in ONE dispatch, queue cursors device-resident.

    Requires t_steps ≤ cfg.window so at most ONE window boundary can be
    crossed per dispatch (after a flush resets win_pos to 0, the remaining
    steps ≤ entry win_fill < window cannot refill it).

    Returns (state', q_head', q_len', win_fill', dead', packed [t_steps,24],
             ba_vec [ba_packed_len], obs_xy [F,K,2], obs_corr [F,K]).
    packed[t] = [active, found, good_pos, count_good, out(17: ok, n_corr,
    n_inl, n_new, n_matches, R9, t3), win_pos_after, q_len_after, ba_fired].
    ``ba_vec`` is the flushed window's BA stats+poses (zeros when no flush
    happened; at most one per dispatch).  ``obs_xy/obs_corr`` are the
    flushed window's PRE-SOLVE observations for the final global BA — only
    populated when ``collect_obs`` (a separate compiled variant).

    ``tail``: the host sets True only once the media is exhausted and every
    staged chunk is admitted.  Until then a step requires a FULL ``visible``
    candidate window to run (idling otherwise): the host's dispatch throttle
    budgets one consumed entry per step, but a step may legally consume up
    to ``visible`` (head skips), and letting a drained step scan a SHORT
    window would make the candidate set depend on ingest wall-clock timing —
    breaking the determinism/kill-and-resume contract.  Idled steps consume
    nothing and the host simply re-dispatches once admissions catch up."""
    assert t_steps <= cfg.window, "advance_stream: t_steps must be <= window"
    Q = queue.shape[0]
    F = cfg.window
    Kk = cfg.max_keypoints
    fcfg = _frontend_cfg(cfg)
    # per-step candidate window sliced to `visible` lanes (the scheduler can
    # never choose beyond it) — the queue buffer is ~3× larger and matching
    # every lane masked-off tripled the per-step matcher cost
    Qv = min(visible, Q) if visible > 0 else Q
    iota_q = jnp.arange(Qv, dtype=jnp.int32)
    BA_LEN = ba_packed_len(cfg)

    # The flush cond carries ONLY the pieces BA writes (K4 + map points +
    # pose + window bookkeeping, ~3 MB); a cond over the whole TrackerState
    # made XLA copy the untouched ring/descriptor arenas (~700 MB of HBM
    # traffic) through the no-flush branch at EVERY scan step — measured
    # 25→13 fps end to end.  Read-only inputs (win_xy, win_cams, map_count)
    # enter through the operand too so both branches see the same values.
    def flush(op):
        """Window-full flush: solve (or plain reset when BA is off)."""
        K4, mp, Rp, tp, wu, wc, wmb, wxy, wcams, mcount = op
        if cfg.use_ba:
            (K4, mp, Rp, tp, wu, wc, wmb, ba_vec) = _ba_core_small(
                cfg, K4, mp, wu, wc, wxy, wcams, wmb, mcount,
                jnp.asarray(F, jnp.int32))
        else:
            wu = jnp.zeros_like(wu)
            wc = jnp.full_like(wc, -1)
            wmb = mcount
            ba_vec = jnp.zeros((BA_LEN,), jnp.float32)
        return (K4, mp, Rp, tp, wu, wc, wmb), ba_vec

    def no_flush(op):
        K4, mp, Rp, tp, wu, wc, wmb, _wxy, _wcams, _mc = op
        return (K4, mp, Rp, tp, wu, wc, wmb), jnp.zeros((BA_LEN,), jnp.float32)

    def body(carry, key):
        state, q_head, q_len, win_pos, alive, ba_out, obs_xy, obs_corr = carry
        enough = jnp.where(jnp.asarray(tail), q_len > 0, q_len >= Qv)
        active = alive & enough & (win_pos < F)

        order_idx = (q_head + iota_q) % Q
        order = queue[order_idx]
        vis = jnp.minimum(q_len, Qv)
        order_mask = (iota_q < vis) & active

        desc_b, valid_b = _maybe_shard(cfg, state.ring_desc[order],
                                       state.ring_valid[order])
        res = fe.match_against_batch(
            fcfg, state.prev_desc, state.prev_valid, desc_b, valid_b,
            order_mask)
        counts = res["num_matches"].astype(jnp.int32)
        eligible = (iota_q >= cfg.skip_from_head) & order_mask & (
            counts >= cfg.required_matched)
        any_ok = eligible.any()
        good = jnp.where(any_ok,
                         _select_good(cfg, eligible, counts, iota_q), 0)
        found = any_ok & active

        slot = order[good]
        train = res["train_idx"][good]
        mask = res["is_match"][good] & found
        state, out = _track_core(cfg, state, slot, train, mask, win_pos, key)
        ok = out[0] > 0.5
        accept = found & ok

        q_head = jnp.where(found, (q_head + good + 1) % Q, q_head)
        q_len = jnp.where(found, q_len - good - 1, q_len)
        win_pos = jnp.where(accept, win_pos + 1, win_pos)
        # only an ACTIVE step's failure kills the stream: an idle step
        # (queue below the visible floor while ingest catches up) has
        # found=0 by construction, and `alive & found` here would latch the
        # persistent dead flag with NO failure row for the host to see —
        # every later dispatch then no-ops while the host keeps feeding the
        # queue (measured: a permanent empty-dispatch spin at ≥256 frames)
        alive = alive & (~active | (found & ok))

        # in-scan window flush (the classic loop's separate ba_step dispatch)
        full = accept & (win_pos >= F)
        if collect_obs:
            # pre-solve observation snapshot of the flushed window
            obs_xy = jnp.where(full, state.win_xy, obs_xy)
            obs_corr = jnp.where(
                full, jnp.where(state.win_used[:, None], state.win_corr, -1),
                obs_corr)
        op = (state.K4, state.map_points, state.pose_R, state.pose_t,
              state.win_used, state.win_corr, state.win_map_base,
              state.win_xy, state.win_cams, state.map_count)
        (K4, mp, Rp, tp, wu, wc, wmb), ba_vec = jax.lax.cond(
            full, flush, no_flush, op)
        state = state._replace(K4=K4, map_points=mp, pose_R=Rp, pose_t=tp,
                               win_used=wu, win_corr=wc, win_map_base=wmb)
        ba_out = jnp.where(full, ba_vec, ba_out)
        win_pos = jnp.where(full, 0, win_pos)

        packed = jnp.concatenate([
            jnp.stack([
                active.astype(jnp.float32), found.astype(jnp.float32),
                good.astype(jnp.float32),
                jnp.where(found, counts[good], 0).astype(jnp.float32),
            ]),
            out,
            jnp.stack([win_pos.astype(jnp.float32),
                       q_len.astype(jnp.float32),
                       full.astype(jnp.float32)]),
            # per-candidate match counts of the scanned window: the host
            # logs a cause line for every skipped candidate (its count vs
            # the chosen frame's — batch.cpp:93-98 max-matches semantics)
            counts.astype(jnp.float32) if visible > 0
            else counts[:0].astype(jnp.float32),
        ])
        return (state, q_head, q_len, win_pos, alive, ba_out,
                obs_xy, obs_corr), packed

    obs_xy0 = jnp.zeros((F, Kk, 2) if collect_obs else (0,), jnp.float32)
    obs_corr0 = jnp.full((F, Kk) if collect_obs else (0,), -1, jnp.int32)
    carry0 = (state, q_head.astype(jnp.int32), q_len.astype(jnp.int32),
              win_fill.astype(jnp.int32), ~dead,
              jnp.zeros((BA_LEN,), jnp.float32), obs_xy0, obs_corr0)
    (state, q_head, q_len, win_pos, alive, ba_out, obs_xy, obs_corr), packed \
        = jax.lax.scan(body, carry0, keys, length=t_steps)
    return (state, q_head, q_len, win_pos, ~alive, packed, ba_out,
            obs_xy, obs_corr)
