"""Oriented-BRIEF (ORB-style) binary descriptors — dense-first TPU design.

The reference computes ORB descriptors on its FAST keypoints via
``cv::ORB::create()->compute`` and matches with Hamming distance
(featureMatchingCPU.cpp:45-66).  TPU redesign of the two gather-heavy parts:

- the intensity-centroid orientation (a 709-pixel circular sum per keypoint)
  becomes two dense separable moment maps (m10/m01, two 1-D passes each) read
  back with ONE two-channel gather per keypoint;
- the 512 BRIEF sample points are nearest-sampled from the blurred image
  (the blur already provides the anti-aliasing bilinear would).

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

from .image import gaussian_blur, nearest_sample, sample_maps, separable_conv

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


_RAMP = np.arange(-PATCH_RADIUS, PATCH_RADIUS + 1, dtype=np.float32)
_ONES = np.ones(2 * PATCH_RADIUS + 1, dtype=np.float32)


def orientation_maps(gray_blur: jnp.ndarray) -> jnp.ndarray:
    """Dense centroid moments over a (2r+1)² square window: [H,W] → [H,W,2]
    (m10, m01).  The square window makes the weighted sums separable — two
    1-D passes each instead of a 31×31 conv (which XLA lowers terribly for a
    single channel on TPU); orientation differs negligibly from the circular
    window and stays consistent across frames, which is all matching needs."""
    m10 = separable_conv(gray_blur, _RAMP, _ONES)
    m01 = separable_conv(gray_blur, _ONES, _RAMP)
    return jnp.stack([m10, m01], axis=-1)


def orientations(gray_blur: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Keypoint orientations θ = atan2(m01, m10) via the dense moment maps."""
    m = sample_maps(orientation_maps(gray_blur), xy)  # [K,2]
    return jnp.arctan2(m[:, 1], m[:, 0])


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[K,256] bool → [K,8] uint32 (little-endian bit order per word)."""
    K = bits.shape[0]
    b = bits.reshape(K, N_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (b << shifts[None, None, :]).sum(axis=-1).astype(jnp.uint32)


@partial(jax.jit, static_argnames=("pre_downscale",))
def describe(gray: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray,
             pre_downscale: int = 1):
    """ORB descriptors for K keypoints of one [H,W] frame.

    ``pre_downscale`` declares that ``gray`` is already at 1/p of the
    coordinate resolution of ``xy`` (host-detect ingest uploads a mean-pooled
    gray plane); the pattern and orientation sampling scale accordingly —
    descriptors stay self-consistent across frames, which is all Hamming
    matching needs (bit-parity with full-res is not a goal).

    Returns dict: desc [K,8] uint32 packed bits, angle [K] float32 radians,
    valid [K] bool (propagated)."""
    cs = 1.0 / pre_downscale
    blur = gaussian_blur(gray, sigma=2.0, radius=4)
    theta = orientations(blur, xy * cs)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Rotate pattern endpoints per keypoint: [K,256,2] coords per endpoint
    pat = jnp.asarray(_PATTERN)  # [256,2,2]
    px, py = pat[..., 0], pat[..., 1]  # [256,2]
    rx = c[:, None, None] * px[None] - s[:, None, None] * py[None]
    ry = s[:, None, None] * px[None] + c[:, None, None] * py[None]
    coords = (jnp.stack([rx, ry], axis=-1) + xy[:, None, None, :]) * cs  # [K,256,2,2]
    vals = nearest_sample(blur, coords)  # [K,256,2]
    bits = vals[..., 0] < vals[..., 1]  # [K,256]
    desc = pack_bits(bits)
    desc = jnp.where(valid[:, None], desc, 0)
    return {"desc": desc, "angle": theta, "valid": valid}


describe_batch = jax.vmap(describe, in_axes=(0, 0, 0))
"""[B,H,W] × [B,K,2] × [B,K] → batched descriptors (the reference's
per-batch-element extractDescriptor loop, batch.cpp:120-148, as one program)."""
