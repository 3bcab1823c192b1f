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


def nearest_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample of [H,W] at xy [...,2] with edge clamping.
    4× fewer gather indices than bilinear — the right trade for smooth
    (pooled/blurred) maps on TPU, where gathers cost per-index."""
    H, W = img.shape
    xi = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return img[yi, xi]


def sample_maps(maps_hwc: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-sample a channel stack [H,W,C] at xy [...,2] → [...,C].

    One gather whose indices cost scales with the number of *positions*, not
    elements: each index fetches a whole C-vector (the TPU-friendly way to
    read per-keypoint descriptors out of dense feature maps)."""
    H, W, _ = maps_hwc.shape
    xi = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return maps_hwc[yi, xi]


def sample_maps_bilinear(maps_hwc: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear variant of ``sample_maps``: [H,W,C] at xy [...,2] → [...,C].
    4 channel-vector gathers per position."""
    H, W, _ = maps_hwc.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = maps_hwc[y0, x0]
    v01 = maps_hwc[y0, x1]
    v10 = maps_hwc[y1, x0]
    v11 = maps_hwc[y1, x1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def separable_conv(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """'Same' correlation with the separable kernel ky⊗kx on [...,H,W] via
    two 1-D passes (edge-padded) — shift/multiply VPU work, no XLA conv."""
    rx = (len(kx) - 1) // 2
    ry = (len(ky) - 1) // 2

    def conv1d(x, k, radius, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for i in range(len(k)):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return conv1d(conv1d(img, jnp.asarray(kx), rx, -1), jnp.asarray(ky), ry, -2)


def conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2-D 'same' correlation of [H,W] with [kh,kw] via XLA conv (MXU)."""
    import jax.lax as lax

    out = lax.conv_general_dilated(
        img[None, None, :, :].astype(jnp.float32),
        kernel[None, None, :, :].astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def extract_patch_colors(img_rgb: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-pixel RGB at keypoint coords — the reference samples
    ``frame.at<Vec3b>(pt.y, pt.x)`` for landmark colors
    (saveFrameColorOfKeyPoint, mainCycleInternals.cpp:28-35)."""
    H, W = img_rgb.shape[:2]
    xi = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return img_rgb[yi, xi]
