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
