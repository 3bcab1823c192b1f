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


def _describe(cfg: "FrontendConfig", gray, xy, valid):
    if cfg.descriptor == "orb":
        return orb.describe(gray, xy, valid)
    return sift.describe(gray, xy, valid, downscale=cfg.descriptor_downscale)


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
    )
