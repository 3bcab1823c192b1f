"""SIFT-style 128-float descriptors at FAST keypoints, batched & fixed-shape.

The reference runs ``cv::SIFT::create()->compute`` on its FAST keypoints (no
SIFT detection — descriptors only, featureMatchingCPU.cpp:45-66) and matches
with L2.  TPU-native design: single-scale descriptors (FAST provides no
scale) — dominant gradient orientation from a 36-bin Gaussian-weighted
histogram, then the classic 4×4 spatial × 8 orientation-bin histogram over a
rotated 16×16 sample grid, with soft orientation binning, Gaussian spatial
weighting, normalize → clip 0.2 → renormalize.  Everything is one batched
gather + dense einsum work over [K,256] samples; no data-dependent shapes.

Bit-compatibility with OpenCV SIFT is explicitly not a goal (SURVEY.md §7
step 3 accepts statistical parity; the oracle is trajectory ATE)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .image import bilinear_sample, gaussian_blur, sobel_gradients

DESC_DIM = 128
GRID = 4               # 4×4 spatial cells
ORI_BINS = 8
SAMPLES = 16           # 16×16 sample grid
SPACING = 1.0          # pixels between samples at base scale
WINDOW_SIGMA = 0.5 * SAMPLES * SPACING


def _sample_offsets() -> np.ndarray:
    """[256,2] unrotated sample offsets centered on the keypoint."""
    half = SAMPLES / 2.0 - 0.5
    ys, xs = np.mgrid[0:SAMPLES, 0:SAMPLES].astype(np.float32)
    xs = (xs - half) * SPACING
    ys = (ys - half) * SPACING
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


def _spatial_weights() -> np.ndarray:
    """Gaussian window + hard cell assignment: [256, 16] sample→cell weights."""
    offs = _sample_offsets()
    w = np.exp(-(offs**2).sum(-1) / (2 * WINDOW_SIGMA**2)).astype(np.float32)
    cell_x = np.clip(((offs[:, 0] / SPACING + SAMPLES / 2) / (SAMPLES / GRID)).astype(int), 0, GRID - 1)
    cell_y = np.clip(((offs[:, 1] / SPACING + SAMPLES / 2) / (SAMPLES / GRID)).astype(int), 0, GRID - 1)
    cell = cell_y * GRID + cell_x
    W = np.zeros((SAMPLES * SAMPLES, GRID * GRID), np.float32)
    W[np.arange(len(cell)), cell] = w
    return W


_OFFSETS = _sample_offsets()
_SPATIAL_W = _spatial_weights()


def _dominant_orientation(dx_img, dy_img, xy):
    """36-bin orientation histogram around each keypoint → dominant angle [K]."""
    offs = jnp.asarray(_OFFSETS)
    coords = xy[:, None, :] + offs[None]  # [K,256,2]
    gx = bilinear_sample(dx_img, coords)
    gy = bilinear_sample(dy_img, coords)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-π, π]
    w = jnp.asarray(_SPATIAL_W.sum(axis=1))  # Gaussian window [256]
    nbins = 36
    bin_f = (ang / (2 * jnp.pi) + 0.5) * nbins
    b0 = jnp.floor(bin_f).astype(jnp.int32) % nbins
    frac = bin_f - jnp.floor(bin_f)
    weights = mag * w[None]
    hist = jnp.zeros((xy.shape[0], nbins), mag.dtype)
    hist = hist.at[jnp.arange(xy.shape[0])[:, None], b0].add(weights * (1 - frac))
    hist = hist.at[jnp.arange(xy.shape[0])[:, None], (b0 + 1) % nbins].add(weights * frac)
    # smooth the circular histogram once
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    return (peak.astype(jnp.float32) + 0.5) / nbins * 2 * jnp.pi - jnp.pi


@partial(jax.jit, static_argnames=())
def describe(gray: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray):
    """SIFT descriptors for K keypoints of one [H,W] frame.

    Returns dict: desc [K,128] float32 (L2-normalized, 0.2-clipped),
    angle [K], valid [K]."""
    blur = gaussian_blur(gray, sigma=1.6, radius=4)
    dx_img, dy_img = sobel_gradients(blur)
    theta = _dominant_orientation(dx_img, dy_img, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)

    offs = jnp.asarray(_OFFSETS)  # [256,2]
    rx = c[:, None] * offs[None, :, 0] - s[:, None] * offs[None, :, 1]
    ry = s[:, None] * offs[None, :, 0] + c[:, None] * offs[None, :, 1]
    coords = jnp.stack([rx, ry], axis=-1) + xy[:, None, :]  # [K,256,2]
    gx = bilinear_sample(dx_img, coords)
    gy = bilinear_sample(dy_img, coords)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx) - theta[:, None]  # gradient dir relative to kp

    bin_f = (ang / (2 * jnp.pi) + 0.5) * ORI_BINS
    b0 = jnp.floor(bin_f).astype(jnp.int32) % ORI_BINS
    frac = bin_f - jnp.floor(bin_f)
    # orientation one-hot with linear interpolation: [K,256,8]
    oh = (
        jax.nn.one_hot(b0, ORI_BINS, dtype=mag.dtype) * (1 - frac)[..., None]
        + jax.nn.one_hot((b0 + 1) % ORI_BINS, ORI_BINS, dtype=mag.dtype) * frac[..., None]
    )
    contrib = oh * mag[..., None]  # [K,256,8]
    # spatial pooling into 16 cells: einsum over samples — MXU work
    spatial = jnp.asarray(_SPATIAL_W)  # [256,16]
    desc = jnp.einsum("kso,sc->kco", contrib, spatial).reshape(-1, DESC_DIM)

    # SIFT normalization: L2 → clip 0.2 → L2
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    desc = jnp.clip(desc / norm, 0.0, 0.2)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    desc = desc / norm
    desc = jnp.where(valid[:, None], desc, 0.0)
    return {"desc": desc, "angle": theta, "valid": valid}


describe_batch = jax.vmap(describe, in_axes=(0, 0, 0))
