"""SIFT-style 128-float descriptors at FAST keypoints — dense-first TPU design.

The reference runs ``cv::SIFT::create()->compute`` on its FAST keypoints (no
SIFT detection — descriptors only, featureMatchingCPU.cpp:45-66) and matches
with L2.  A naive port samples ~256 rotated points per keypoint; on TPU,
arbitrary gathers cost per *index* (~13 ns each through HBM), which measured
at ~900 ms per 8-frame chunk — the pipeline's dominant cost.

Dense-first redesign: all the per-pixel work happens once as fused VPU map
algebra —

  gradients → 8 soft-binned orientation-energy maps → Gaussian spatial
  pooling (≈ the cell histogram integration)

— and each keypoint then reads a tiny number of values out of the pooled
stack: 8 channels at the keypoint for orientation assignment, and 8 channels
at 16 rotated cell centers for the 4×4×8 descriptor.  Per-keypoint gather
work drops from ~1k indices to 17, with each index fetching a whole channel
vector (ops.image.sample_maps).  Rotation invariance is preserved by rotating
the cell-center pattern and circularly interpolating the orientation bins.

Bit-compatibility with OpenCV SIFT is explicitly not a goal (SURVEY.md §7
step 3 accepts statistical parity; the oracle is trajectory ATE)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur, sample_maps, sample_maps_bilinear, sobel_gradients

DESC_DIM = 128
GRID = 4               # 4×4 spatial cells
ORI_BINS = 8
CELL_SPACING = 4.0     # pixels between cell centers at base scale
POOL_SIGMA = 2.5       # spatial pooling ≈ cell-sized integration window


def _cell_offsets() -> np.ndarray:
    """[16,2] unrotated cell-center offsets around the keypoint."""
    half = (GRID - 1) / 2.0
    ys, xs = np.mgrid[0:GRID, 0:GRID].astype(np.float32)
    xs = (xs - half) * CELL_SPACING
    ys = (ys - half) * CELL_SPACING
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


_OFFSETS = _cell_offsets()


def orientation_energy_maps(gray: jnp.ndarray, blur_sigma: float = 1.6,
                            blur_radius: int = 4,
                            pool_sigma: float = POOL_SIGMA,
                            pool_radius: int = 5) -> jnp.ndarray:
    """[H,W] → pooled orientation-energy stack [H,W,8] (dense, fused VPU).

    Sigmas are in MAP pixels; callers computing maps at 1/m of coordinate
    resolution pass sigmas/m so the full-resolution support stays constant
    (otherwise a pooled ingest plane silently doubles every smoothing window
    and the descriptors lose the fine texture that separates neighbours —
    measured at FHD: ATE 11.3% with naive 1/2-res pooling vs 1.8% full-res)."""
    blur = gaussian_blur(gray, sigma=blur_sigma, radius=blur_radius)
    dx, dy = sobel_gradients(blur)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)                       # [-π, π]
    bin_f = (ang / (2.0 * jnp.pi) + 0.5) * ORI_BINS
    b0 = jnp.floor(bin_f)
    frac = bin_f - b0
    b0 = b0.astype(jnp.int32) % ORI_BINS
    b1 = (b0 + 1) % ORI_BINS
    o = jnp.arange(ORI_BINS, dtype=jnp.int32)
    maps = (
        mag[..., None]
        * (
            (b0[..., None] == o) * (1.0 - frac[..., None])
            + (b1[..., None] == o) * frac[..., None]
        )
    )  # [H,W,8]
    pooled = gaussian_blur(jnp.moveaxis(maps, -1, 0), sigma=pool_sigma,
                           radius=pool_radius)
    return jnp.moveaxis(pooled, 0, -1)


def _dominant_orientation(hist: jnp.ndarray) -> jnp.ndarray:
    """[K,8] pooled energies at the keypoint → angle [K] (parabolic refine
    over the circular argmax)."""
    b = jnp.argmax(hist, axis=-1)
    K = hist.shape[0]
    rows = jnp.arange(K)
    h0 = hist[rows, (b - 1) % ORI_BINS]
    h1 = hist[rows, b]
    h2 = hist[rows, (b + 1) % ORI_BINS]
    denom = h0 - 2.0 * h1 + h2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (h0 - h2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    bin_center = b.astype(jnp.float32) + delta
    return (bin_center / ORI_BINS) * 2.0 * jnp.pi - jnp.pi


@partial(jax.jit, static_argnames=("downscale", "pre_downscale", "nearest"))
def describe(gray: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray,
             downscale: int = 1, pre_downscale: int = 1,
             nearest: str = "auto"):
    """SIFT descriptors for K keypoints of one [H,W] frame.

    ``downscale`` computes the dense orientation-energy maps at 1/d
    resolution (d×d mean pooling) — the maps are smooth, so descriptor
    quality barely moves while the dense work shrinks ×d² (matters at FHD).

    ``pre_downscale`` declares that ``gray`` is *already* at 1/p of the
    coordinate resolution of ``xy`` (host-detect ingest uploads a mean-pooled
    gray plane to cut link bytes; keypoint coords stay full-res).  The two
    compose: maps live at 1/(d·p) of coordinate space.

    ``nearest`` selects the cell-sample interpolation: "on" = nearest map
    cell (~4× fewer gathers; ≤0.5 px jitter inside the pooled maps'
    smoothing support), "off" = 4-corner bilinear, "auto" = nearest only in
    the dense-keypoint deep-pooled regime (K≥4096 and maps at ≥1/4 of
    coordinate space — the measured 4K/10k operating point).

    Returns dict: desc [K,128] float32 (L2-normalized, 0.2-clipped),
    angle [K], valid [K]."""
    # keep smoothing support constant in FULL-RES terms: maps at 1/m of
    # coordinate space get sigmas/m (floored at the Nyquist-ish minimum)
    m = downscale * pre_downscale
    blur_sigma = max(1.6 / m, 0.6)
    pool_sigma = max(POOL_SIGMA / m, 1.0)
    blur_radius = max(int(np.ceil(2.5 * blur_sigma)), 2)
    pool_radius = max(int(np.ceil(2.0 * pool_sigma)), 2)
    if downscale > 1:
        d = downscale
        H, W = gray.shape
        Hc, Wc = (H // d) * d, (W // d) * d
        small = gray[:Hc, :Wc].reshape(Hc // d, d, Wc // d, d).mean((1, 3))
        pooled = orientation_energy_maps(small, blur_sigma, blur_radius,
                                         pool_sigma, pool_radius)
        scale = 1.0 / m
    else:
        pooled = orientation_energy_maps(gray, blur_sigma, blur_radius,
                                         pool_sigma, pool_radius)
        scale = 1.0 / pre_downscale

    # orientation from the pooled stack at the keypoint itself
    h_kp = sample_maps(pooled, xy * scale)          # [K,8]
    theta = _dominant_orientation(h_kp)
    c, s = jnp.cos(theta), jnp.sin(theta)

    # rotated 4×4 cell centers: [K,16,8]
    offs = jnp.asarray(_OFFSETS)
    rx = c[:, None] * offs[None, :, 0] - s[:, None] * offs[None, :, 1]
    ry = s[:, None] * offs[None, :, 0] + c[:, None] * offs[None, :, 1]
    coords = (jnp.stack([rx, ry], axis=-1) + xy[:, None, :]) * scale
    # cell-sample interpolation: "on"/"off" force nearest/bilinear; "auto"
    # infers the dense-keypoint deep-pooled regime from shape (the 4K/10k
    # operating point where the switch was measured) — an explicit config
    # flag exists so other large-K configs are never switched silently
    # (TpuConfig.sift_nearest_sampling)
    use_nearest = (nearest == "on" or
                   (nearest == "auto" and xy.shape[0] >= 4096 and m >= 4))
    if use_nearest:
        # dense-keypoint, deep-pooled regime (the 4K/10k config, maps at
        # 1/4 of coordinate space): TPU gathers cost per-index and the
        # 4-corner bilinear fetch is a large share of the ingest (measured
        # 88.7 ms/frame at K=10240 — 4.3 s of a 48-frame run).  The cell
        # samples read a blurred+pooled map (σ_pool = 1 map-px at m=4 on
        # top of the anti-alias pooling), so nearest sampling adds ≤0.5 px
        # of jitter inside the smoothing support — measured at the 4K
        # operating point the ATE got BETTER, ~4× fewer gathers.  Gated on
        # BOTH slot count and m: a dense-keypoint config at full map
        # resolution keeps bilinear (its pooling support is smaller and
        # the jitter would no longer be negligible).
        samples = sample_maps(pooled, coords)       # [K,16,8] nearest
    else:
        samples = sample_maps_bilinear(pooled, coords)  # [K,16,8]

    # rotate orientation bins by θ with circular linear interpolation —
    # expressed as a per-keypoint one-hot 8×8 rotation matrix applied by a
    # batched matmul: gather-free (two take_along_axis over [K,16,8] were
    # ~2.6M element-gathers per frame, a real cost at 10k keypoints)
    shift_f = (theta / (2.0 * jnp.pi) + 0.5) * ORI_BINS   # bins to rotate by
    s0 = jnp.floor(shift_f)
    frac = (shift_f - s0)[:, None, None]
    s0 = s0.astype(jnp.int32)
    o = jnp.arange(ORI_BINS, dtype=jnp.int32)
    # R[k, i, j] = weight of source bin j in output bin i
    src0 = (o[None, :, None] + s0[:, None, None]) % ORI_BINS  # [K,8,1]
    hit0 = (src0 == o[None, None, :]).astype(samples.dtype)   # [K,8,8]
    src1 = (src0 + 1) % ORI_BINS
    hit1 = (src1 == o[None, None, :]).astype(samples.dtype)
    R = hit0 * (1.0 - frac) + hit1 * frac                     # [K,8,8]
    rotated = jnp.einsum("kcj,kij->kci", samples, R)          # [K,16,8]

    desc = rotated.reshape(-1, DESC_DIM)
    # SIFT normalization: L2 → clip 0.2 → L2
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    desc = jnp.clip(desc / norm, 0.0, 0.2)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
    desc = desc / norm
    desc = jnp.where(valid[:, None], desc, 0.0)
    return {"desc": desc, "angle": theta, "valid": valid}


def describe_batch(gray, xy, valid, downscale: int = 1):
    return jax.vmap(lambda g, x, v: describe(g, x, v, downscale))(gray, xy, valid)
