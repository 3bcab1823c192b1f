"""The flagship feature-frontend model: gray → FAST → describe → match, as
jitted fixed-shape programs.

This is the framework's "forward step": it replaces the reference's per-frame
host loop of ``fastExtractor`` + ``extractDescriptor`` +
``matchFramesPairFeatures`` (batch.cpp:101-160) with two compiled programs —
``extract_and_describe`` over a frame batch and ``match_against_batch`` for
the previous-frame-vs-batch fan-out.  All heavy work (top-K, patch gathers,
the [B,N,M] distance tensor) is MXU/VPU-friendly; per-config shapes are
static so each config compiles exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fast, image, knn, orb, sift


@dataclass(frozen=True)
class FrontendConfig:
    """Static (hashable) frontend parameters — shape-defining."""

    max_keypoints: int = 2048
    threshold: float = 20.0
    descriptor: str = "sift"   # 'sift' | 'orb'
    ratio: float = 0.7
    metric: str = "l2"         # 'l2' | 'l1' | 'hamming'
    descriptor_downscale: int = 1  # sift dense maps at 1/d resolution
    sift_nearest: str = "auto"  # cell-sample interpolation (sift.describe)


def _describe(cfg: "FrontendConfig", gray, xy, valid):
    if cfg.descriptor == "orb":
        return orb.describe(gray, xy, valid)
    return sift.describe(gray, xy, valid, downscale=cfg.descriptor_downscale,
                         nearest=cfg.sift_nearest)


@partial(jax.jit, static_argnames=("cfg",))
def extract_and_describe(cfg: FrontendConfig, rgb: jnp.ndarray):
    """One frame [H,W,3] uint8 → keypoints + descriptors + colors.

    Returns dict: xy [K,2], valid [K], score [K], desc [K,D], colors [K,3],
    num_corners scalar."""
    gray = image.rgb_to_gray(rgb)
    det = fast.detect(gray, cfg.threshold, cfg.max_keypoints)
    d = _describe(cfg, gray, det["xy"], det["valid"])
    colors = image.extract_patch_colors(rgb, det["xy"])
    return {
        "xy": det["xy"],
        "valid": det["valid"],
        "score": det["score"],
        "desc": d["desc"],
        "colors": colors,
        "num_corners": det["num_corners"],
    }


@partial(jax.jit, static_argnames=("cfg",))
def extract_and_describe_batch(cfg: FrontendConfig, rgb_batch: jnp.ndarray):
    """[B,H,W,3] → batched keypoints/descriptors (one compiled program for the
    whole candidate batch — the reference's fillVideoFrameBatch+thread pool)."""
    return jax.vmap(lambda f: extract_and_describe(cfg, f))(rgb_batch)


def pack_frames(frames, color_downscale: int = 4):
    """Host-side ingest payload packer: RGB uint8 frames → (gray [C,H,W] u8,
    rgb_small [C,H/d,W/d,3] u8).

    Keypoint colors only feed visualization (saveFrameColorOfKeyPoint,
    mainCycleInternals.cpp:28-35), so the color plane travels at 1/d
    resolution — the full-RGB upload was the single largest byte stream in
    the pipeline and the host↔device link is the end-to-end bottleneck.
    Gray uses OpenCV's fixed-point BT.601 weights (77,150,29)/256 so device
    detection matches the reference's cvtColor within ±1 intensity level."""
    d = color_downscale
    gray = np.empty((len(frames),) + frames[0].shape[:2], np.uint8)
    small = np.empty((len(frames), frames[0].shape[0] // d,
                      frames[0].shape[1] // d, 3), np.uint8)
    for i, f in enumerate(frames):
        # in-place uint16 accumulation: ~2x faster than the vectorized
        # expression (no wide temporaries)
        acc = f[..., 0].astype(np.uint16)
        acc *= 77
        g = f[..., 1].astype(np.uint16)
        g *= 150
        acc += g
        b = f[..., 2].astype(np.uint16)
        b *= 29
        acc += b
        acc += 128
        acc >>= 8
        gray[i] = acc.astype(np.uint8)
        small[i] = f[: small.shape[1] * d : d, : small.shape[2] * d : d]
    return gray, small


def _extract_and_describe_gray(cfg: FrontendConfig, gray_u8: jnp.ndarray,
                               rgb_small: jnp.ndarray, color_downscale: int):
    """One packed frame (gray [H,W] u8 + rgb_small [h,w,3] u8) → keypoints +
    descriptors + colors (same contract as extract_and_describe)."""
    gray = gray_u8.astype(jnp.float32)
    det = fast.detect(gray, cfg.threshold, cfg.max_keypoints)
    d = _describe(cfg, gray, det["xy"], det["valid"])
    colors = image.extract_patch_colors(
        rgb_small, det["xy"] / float(color_downscale))
    return {
        "xy": det["xy"],
        "valid": det["valid"],
        "score": det["score"],
        "desc": d["desc"],
        "colors": colors,
        "num_corners": det["num_corners"],
    }


@partial(jax.jit, static_argnames=("cfg", "color_downscale"))
def extract_and_describe_gray_batch(cfg: FrontendConfig, gray_u8: jnp.ndarray,
                                    rgb_small: jnp.ndarray,
                                    color_downscale: int = 4):
    """[C,H,W] u8 + [C,h,w,3] u8 → batched keypoints/descriptors.  The
    packed-payload twin of extract_and_describe_batch (see pack_frames)."""
    return jax.vmap(lambda g, s: _extract_and_describe_gray(
        cfg, g, s, color_downscale))(gray_u8, rgb_small)


# --------------------------------------------------------------------------
# Host-detect ingest: FAST on the host (the exact OpenCV detector the
# reference wraps, fastExtractor.cpp:7-14), descriptors and everything
# downstream on the device.
#
# Motivation: on a tunneled/remote accelerator the host→device link is the
# end-to-end bottleneck (measured ~45 MB/s; an FHD gray+color payload is
# ~2.5 MB/frame = an ~18 fps hard ceiling).  Detecting on the host lets the
# payload shrink to a mean-pooled gray plane (feeds the dense SIFT/ORB maps,
# which run at 1/2 resolution at FHD anyway), full-res keypoint coords, and
# host-sampled keypoint colors — ~0.55 MB/frame.  The dense describe/match/
# geometry path is unchanged and stays on the TPU.
# --------------------------------------------------------------------------

_CV2_FAST = {}


def _cv2_fast(threshold: int, nms: bool = False):
    import cv2

    det = _CV2_FAST.get((threshold, nms))
    if det is None:
        det = cv2.FastFeatureDetector_create(
            threshold=int(threshold), nonmaxSuppression=nms,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
        _CV2_FAST[(threshold, nms)] = det
    return det


def _fast_scores_at(gray: np.ndarray, ys: np.ndarray, xs: np.ndarray,
                    threshold: float) -> np.ndarray:
    """OpenCV-style FAST-9/16 corner scores at arbitrary positions [N]
    (numpy twin of ops.fast.fast_score_map, evaluated sparsely).  Positions
    are assumed pre-clipped to [BORDER, dim-BORDER-1]; scores are gated to 0
    below threshold, like the dense map.

    Accepts the u8 image directly and runs the ring passes in int16 —
    differences of u8 are exact in int16 and the narrow dtype halves the
    memory traffic of the N×24 window passes (at 4K the raw corner set is
    ~75k positions; this path is on the host's 2-core budget)."""
    from ..ops.fast import ARC_LEN, RING_OFFSETS

    rx = RING_OFFSETS[:, 0].astype(np.int64)
    ry = RING_OFFSETS[:, 1].astype(np.int64)
    g16 = gray if gray.dtype == np.int16 else gray.astype(np.int16)
    # flat-index gather: one [N,16] fancy index on the raveled plane is
    # ~2.7x faster than the equivalent 2-D (row, col) fancy index (numpy
    # materializes both [N,16] int64 index planes for the 2-D form; this
    # path runs on the host's 2-core budget at ~30k raw corners/frame)
    W = g16.shape[1]
    flat = ys * W + xs
    gr = g16.ravel()
    vals = gr[flat[:, None] + (ry * W + rx)[None, :]]
    d = vals - gr[flat][:, None]                           # [N,16] int16
    doubled = np.concatenate([d, d[:, : ARC_LEN - 1]], axis=1)

    def _win9(x, op):
        # min/max over 9 consecutive entries by doubling: 4 elementwise
        # passes instead of a strided [N,16,9] reduction (~10× faster)
        w2 = op(x[:, :-1], x[:, 1:])
        w4 = op(w2[:, :-2], w2[:, 2:])
        w8 = op(w4[:, :-4], w4[:, 4:])
        return op(w8[:, :16], x[:, 8:])

    bright = _win9(doubled, np.minimum).max(-1)
    dark = -_win9(doubled, np.maximum).min(-1)
    score = np.maximum(bright, dark).astype(np.float32)
    return np.where(score > threshold, score, 0.0)


# Neighbor offsets in _nms3x3's iteration order ((dy,dx), center skipped).
_NEIGH8 = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if not (dy == 0 and dx == 0)], np.int64)


def _host_detect_frame(gray: np.ndarray, threshold: float):
    """FAST detection of one gray frame, host-side, with the SAME semantics
    as the device detector (ops.fast.detect): OpenCV raw corners (verified
    bit-identical to our dense arc test), our corner score at each, 3×3 NMS
    with the raster-index tiebreak (keeps one survivor per score plateau —
    OpenCV's own NMS kills tied plateaus entirely, costing ~2× the corners),
    and quadratic-fit subpixel refinement on the score neighborhood.

    Returns (xy [N,2] f32 subpixel coords sorted strongest-first,
    ixy [N,2] i64 integer coords in the same order, num_corners int)."""
    import cv2

    H, W = gray.shape
    kps = _cv2_fast(int(threshold)).detect(gray)
    if not kps:
        return (np.zeros((0, 2), np.float32), np.zeros((0, 2), np.int64), 0)
    pts = cv2.KeyPoint_convert(kps)
    xs = pts[:, 0].astype(np.int64)
    ys = pts[:, 1].astype(np.int64)
    score = _fast_scores_at(gray, ys, xs, threshold)

    # sparse score plane (non-corner pixels are 0, like the dense map)
    S = np.zeros((H, W), np.float32)
    S[ys, xs] = score
    ny = ys[:, None] + _NEIGH8[None, :, 0]          # [N,8]; raw corners are
    nx = xs[:, None] + _NEIGH8[None, :, 1]          # ≥3px from the border
    s_n = S[ny, nx]
    eps = np.float32(1e-7)
    tb_c = score - (ys * W + xs).astype(np.float32) * eps
    tb_n = s_n - (ny * W + nx).astype(np.float32) * eps
    keep = tb_c > tb_n.max(axis=1)

    # strongest-first cut happens on the survivors
    order = np.flatnonzero(keep)
    order = order[np.argsort(-score[order], kind="stable")]
    sc, sn = score[order], s_n[order]
    c = sc
    dxm, dxp = sn[:, 3], sn[:, 4]
    dym, dyp = sn[:, 1], sn[:, 6]
    denx = dxm + dxp - 2.0 * c
    deny = dym + dyp - 2.0 * c
    offx = np.where(np.abs(denx) > 1e-6, 0.5 * (dxm - dxp) / denx, 0.0)
    offy = np.where(np.abs(deny) > 1e-6, 0.5 * (dym - dyp) / deny, 0.0)
    xy = np.stack([xs[order] + np.clip(offx, -0.5, 0.5),
                   ys[order] + np.clip(offy, -0.5, 0.5)], -1).astype(np.float32)
    ixy = np.stack([xs[order], ys[order]], -1)
    return xy, ixy, int(keep.sum())


_CV2_ORB = {}


def _cv2_orb():
    import cv2

    orb = _CV2_ORB.get(0)
    if orb is None:
        orb = cv2.ORB_create()
        _CV2_ORB[0] = orb
    return orb


def _host_orb_bits(gray: np.ndarray, xy: np.ndarray, valid: np.ndarray,
                   max_keypoints: int) -> np.ndarray:
    """cv2 ORB descriptors at the detected keypoints, FULL resolution —
    the reference's own split (descriptors on the host CPU even in its CUDA
    build, featureMatchingCUDA.cpp:86-108).  Returns packed bits [K,32] u8
    (zeros where ORB dropped a border keypoint)."""
    import cv2

    K = max_keypoints
    out = np.zeros((K, 32), np.uint8)
    # compute() may drop border keypoints and is free to reorder; carry each
    # input slot index in KeyPoint.class_id and scatter descriptors back by
    # the returned keypoints' class_id (robust to drops, duplicates, and any
    # reordering — a positional walk desynchronizes on all three)
    kps = [cv2.KeyPoint(float(x), float(y), 31, -1, 0.0, 0, int(i))
           for i, ((x, y), v) in enumerate(zip(xy, valid)) if v]
    if not kps:
        return out
    kk, desc = _cv2_orb().compute(gray, kps)
    if desc is None:
        return out
    for k, d in zip(kk, desc):
        if 0 <= k.class_id < K:
            out[k.class_id] = d
    return out


def host_detect_pack(frames, threshold: float, max_keypoints: int,
                     ingest_downscale: int = 2, host_desc: str = "same"):
    """Host-side ingest for a chunk of RGB uint8 frames.

    Per frame: BT.601 gray (cv2, matching the reference's cvtColor), FAST
    detection with device-detector semantics (_host_detect_frame),
    strongest-``max_keypoints`` cut, keypoint colors sampled at full
    resolution (saveFrameColorOfKeyPoint semantics), and a 1/d mean-pooled
    gray plane for the device-side dense descriptor maps.

    ``host_desc`` adds full-resolution descriptor content the pooled gray
    cannot carry (measured: pooling costs ~2/3 of the ratio-test matches):
      - "orb":    cv2 ORB bits per keypoint; the device skips dense describe
                  entirely and matches by Hamming.  Upload ≈ 90 KB/frame.
      - "hybrid": ORB bits shipped ALONGSIDE the pooled gray; the device
                  concatenates pooled-SIFT(128) ⊕ α·bits(256) into one L2
                  descriptor (Hamming rides L2 exactly on 0/1 vectors).
      - "same":   pooled gray only (status quo).

    Returns dict of numpy arrays:
      gray_small [C,H/d,W/d] u8 (absent for "orb"), xy [C,K,2] f32 (full-res
      coords), valid [C,K] bool, colors [C,K,3] u8, counts [C] i32
      (post-NMS corner totals — the requiredExtractedPointsCount gate,
      batch.cpp:242-247), desc_bits [C,K,32] u8 (for "orb"/"hybrid").
    """
    import cv2

    d = ingest_downscale
    C = len(frames)
    H, W = frames[0].shape[:2]
    K = max_keypoints
    want_gray = host_desc != "orb"
    gray_small = (np.empty((C, H // d, W // d), np.uint8)
                  if want_gray else None)
    xy = np.zeros((C, K, 2), np.float32)
    valid = np.zeros((C, K), bool)
    colors = np.zeros((C, K, 3), np.uint8)
    counts = np.zeros((C,), np.int32)
    bits = (np.zeros((C, K, 32), np.uint8)
            if host_desc in ("orb", "hybrid") else None)
    for i, f in enumerate(frames):
        gray = cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)
        kxy, ixy, num = _host_detect_frame(gray, threshold)
        counts[i] = num
        n = min(len(kxy), K)
        if n:
            xy[i, :n] = kxy[:n]
            valid[i, :n] = True
            colors[i, :n] = f[ixy[:n, 1], ixy[:n, 0]]
        if bits is not None:
            bits[i] = _host_orb_bits(gray, xy[i], valid[i], K)
        if want_gray:
            if d > 1:
                # INTER_AREA == exact d×d mean: identical pooling to the
                # device path's describe(downscale=d)
                gray_small[i] = cv2.resize(gray, (W // d, H // d),
                                           interpolation=cv2.INTER_AREA)
            else:
                gray_small[i] = gray
    out = {"xy": xy, "valid": valid, "colors": colors, "counts": counts}
    if want_gray:
        out["gray_small"] = gray_small
    if bits is not None:
        out["desc_bits"] = bits
    return out


@partial(jax.jit, static_argnames=("cfg", "ingest_downscale"))
def describe_packed_batch(cfg: FrontendConfig, gray_small: jnp.ndarray,
                          xy: jnp.ndarray, valid: jnp.ndarray,
                          ingest_downscale: int = 2):
    """Device half of host-detect ingest: [C,h,w] u8 pooled gray + full-res
    keypoints → descriptors [C,K,D] (dense maps at 1/(d·descriptor_downscale)
    of coordinate space — the same math as the all-device path)."""
    gray = gray_small.astype(jnp.float32)

    def one(g, kxy, kv):
        if cfg.descriptor == "orb":
            return orb.describe(g, kxy, kv, pre_downscale=ingest_downscale)
        return sift.describe(g, kxy, kv, downscale=cfg.descriptor_downscale,
                             pre_downscale=ingest_downscale,
                             nearest=cfg.sift_nearest)

    return jax.vmap(one)(gray, xy, valid)["desc"]


@partial(jax.jit, static_argnames=("cfg",))
def detect_only_batch(cfg: FrontendConfig, rgb_batch: jnp.ndarray):
    """[B,H,W,3] → FAST corner counts + keypoints (batch-fill gate:
    requiredExtractedPointsCount check, batch.cpp:242-247)."""
    gray = image.rgb_to_gray(rgb_batch)
    return fast.detect_batch(gray, cfg.threshold, cfg.max_keypoints, True)


@partial(jax.jit, static_argnames=("cfg",))
def match_against_batch(
    cfg: FrontendConfig,
    desc_prev: jnp.ndarray,
    valid_prev: jnp.ndarray,
    desc_batch: jnp.ndarray,
    valid_batch: jnp.ndarray,
    frame_mask: jnp.ndarray,
):
    """Previous frame vs all B candidates in one program (2-NN + Lowe ratio).

    Returns per-frame train_idx [B,K], is_match [B,K], num_matches [B]."""
    return knn.match_batch(
        desc_prev, valid_prev, desc_batch, valid_batch, frame_mask,
        ratio=cfg.ratio, metric=cfg.metric,
    )


def frontend_config_from(cfg) -> FrontendConfig:
    """Build from a full framework Config (config.py)."""
    return FrontendConfig(
        max_keypoints=cfg.tpu.max_keypoints,
        threshold=float(cfg.featureExtractingThreshold),
        descriptor=cfg.descriptor_kind,
        ratio=float(cfg.knnMatcherDistance),
        metric=cfg.match_metric,
        descriptor_downscale=cfg.tpu.descriptor_downscale,
        sift_nearest=cfg.tpu.sift_nearest_sampling,
    )
