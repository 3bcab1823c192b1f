"""Oriented-BRIEF (ORB-style) binary descriptors, batched and fixed-shape.

The reference computes ORB descriptors on its FAST keypoints via
``cv::ORB::create()->compute`` and matches them with Hamming distance
(src/mainModule/featureMatching/featureMatchingCPU.cpp:45-66, matcher choice
at featureMatchingCommon.cpp:13-21).  TPU-native design: orientation by
intensity centroid (two weighted-window convolutions evaluated *at the
keypoints* via gather), then 256 BRIEF comparisons sampled with one batched
bilinear gather of 512 rotated offsets per keypoint, packed into 8×uint32
words for XOR/popcount matching.

The sampling pattern is a deterministic seeded Gaussian pattern (σ = patch/5,
the BRIEF-32 recipe) rather than OpenCV's learned table: descriptors are not
bit-compatible with OpenCV, matching is (trajectory-level ATE is the parity
oracle, per SURVEY.md §7 step 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .image import bilinear_sample, gaussian_blur

PATCH_RADIUS = 15          # ORB patch 31×31
N_BITS = 256
N_WORDS = N_BITS // 32


def _brief_pattern(seed: int = 7) -> np.ndarray:
    """[256,2,2] (pair, endpoint, xy) Gaussian BRIEF pattern, σ = patch/5,
    clipped to the patch."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    return np.clip(pts, -PATCH_RADIUS + 1, PATCH_RADIUS - 1).astype(np.float32)


_PATTERN = _brief_pattern()

# Circular-window offsets for the intensity centroid (radius 15).
def _centroid_offsets() -> np.ndarray:
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = xs**2 + ys**2 <= r**2
    return np.stack([xs[mask], ys[mask]], axis=-1).astype(np.float32)  # [M,2]


_CENTROID = _centroid_offsets()


def orientations(gray_blur: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Keypoint orientations by intensity centroid: θ = atan2(m01, m10)
    over a radius-15 circular patch.  xy: [K,2] → [K] radians."""
    offs = jnp.asarray(_CENTROID)  # [M,2]
    coords = xy[:, None, :] + offs[None, :, :]  # [K,M,2]
    vals = bilinear_sample(gray_blur, coords)  # [K,M]
    m10 = (vals * offs[None, :, 0]).sum(axis=1)
    m01 = (vals * offs[None, :, 1]).sum(axis=1)
    return jnp.arctan2(m01, m10)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[K,256] bool → [K,8] uint32 (little-endian bit order per word)."""
    K = bits.shape[0]
    b = bits.reshape(K, N_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (b << shifts[None, None, :]).sum(axis=-1).astype(jnp.uint32)


@partial(jax.jit, static_argnames=())
def describe(gray: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray):
    """ORB descriptors for K keypoints of one [H,W] frame.

    Returns dict: desc [K,8] uint32 packed bits, angle [K] float32 radians,
    valid [K] bool (propagated)."""
    blur = gaussian_blur(gray, sigma=2.0, radius=4)
    theta = orientations(blur, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Rotate pattern endpoints per keypoint: [K,256,2,2]
    pat = jnp.asarray(_PATTERN)  # [256,2,2]
    px, py = pat[..., 0], pat[..., 1]  # [256,2]
    rx = c[:, None, None] * px[None] - s[:, None, None] * py[None]
    ry = s[:, None, None] * px[None] + c[:, None, None] * py[None]
    coords = jnp.stack([rx, ry], axis=-1) + xy[:, None, None, :]  # [K,256,2,2]
    vals = bilinear_sample(blur, coords)  # [K,256,2]
    bits = vals[..., 0] < vals[..., 1]  # [K,256]
    desc = pack_bits(bits)
    desc = jnp.where(valid[:, None], desc, 0)
    return {"desc": desc, "angle": theta, "valid": valid}


describe_batch = jax.vmap(describe, in_axes=(0, 0, 0))
"""[B,H,W] × [B,K,2] × [B,K] → batched descriptors (the reference's
per-batch-element extractDescriptor loop, batch.cpp:120-148, as one program)."""
