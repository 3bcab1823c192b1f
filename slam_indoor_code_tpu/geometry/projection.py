"""Camera model: projection, normalization, undistortion.

Conventions (everywhere in this framework, see testing/synthetic.py):
  world→camera extrinsics (R, t):  X_cam = R X_world + t
  projection:                      uv ~ K [R | t] X̃_world
The reference builds identical P = K·[R|t] projections for triangulation
(src/mainModule/triangulation/triangulate.cpp:78-88).
"""

from __future__ import annotations

import jax.numpy as jnp


def project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Project world points X [...,N,3] with extrinsics (R [...,3,3], t [...,3])
    and intrinsics K [3,3] → pixel uv [...,N,2]."""
    Xc = X @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    uvw = Xc @ K.T
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)


def camera_depths(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate of world points in the camera frame."""
    return (X @ jnp.swapaxes(R, -1, -2) + t[..., None, :])[..., 2]


def normalize_pixels(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords → K-normalized image coords: x = (u-cx)/fx, y = (v-cy)/fy.

    (Analytic K⁻¹ for a zero-skew intrinsic matrix.)"""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def denormalize(K: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    """[...,D] → [...,D+1] with appended 1 (reference: addHomogeneousRow,
    cameraTranslation.cpp:79-83)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def projection_matrix(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t], shape [...,3,4]."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def undistort_points(K: jnp.ndarray, dist: jnp.ndarray, uv: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Iteratively undistort pixel coords with the OpenCV 5-coefficient model
    (k1,k2,p1,p2,k3) — the reference stores DC as 1×5
    (src/misc/IOmisc.cpp:68-76) and gates undistortion on ``useUndistortion``.

    Returns undistorted *pixel* coordinates."""
    k1, k2, p1, p2, k3 = (dist.reshape(-1)[i] for i in range(5))
    xy_d = normalize_pixels(K, uv)
    x, y = xy_d[..., 0], xy_d[..., 1]
    xu, yu = x, y
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * xu * yu + p2 * (r2 + 2.0 * xu * xu)
        dy = p1 * (r2 + 2.0 * yu * yu) + 2.0 * p2 * xu * yu
        xu = (x - dx) / radial
        yu = (y - dy) / radial
    return denormalize(K, jnp.stack([xu, yu], axis=-1))
