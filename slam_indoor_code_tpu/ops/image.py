"""Image primitives: grayscale, separable Gaussian blur, gradients, bilinear
sampling.  All pure jnp on fixed-shape [H,W] / [B,H,W] arrays; XLA fuses these
into surrounding kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[...,H,W,3] uint8/float → [...,H,W] float32 luma (ITU-R BT.601 weights,
    matching OpenCV's cvtColor used implicitly by the reference's detectors)."""
    img = img.astype(jnp.float32)
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def _gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur on [...,H,W] via two 1-D convolutions."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    k = jnp.asarray(_gaussian_kernel(sigma, radius))

    def conv1d(x, axis):
        # reflect-pad then correlate along `axis`
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return conv1d(conv1d(img, -1), -2)


def sobel_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (dx, dy) on [...,H,W]."""
    dx = 0.5 * (jnp.roll(img, -1, axis=-1) - jnp.roll(img, 1, axis=-1))
    dy = 0.5 * (jnp.roll(img, -1, axis=-2) - jnp.roll(img, 1, axis=-2))
    return dx, dy


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [H,W] image at xy [...,2] (x=col, y=row) with edge
    clamping.  Backbone of descriptor patch gathers."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def extract_patch_colors(img_rgb: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-pixel RGB at keypoint coords — the reference samples
    ``frame.at<Vec3b>(pt.y, pt.x)`` for landmark colors
    (saveFrameColorOfKeyPoint, mainCycleInternals.cpp:28-35)."""
    H, W = img_rgb.shape[:2]
    xi = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return img_rgb[yi, xi]
