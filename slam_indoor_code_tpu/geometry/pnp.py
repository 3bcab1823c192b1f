"""Batched-RANSAC PnP: camera pose from 3D↔2D correspondences.

The reference tracks every new frame with OpenCV ``solvePnPRansac`` +
``Rodrigues`` (src/mainModule/cycleProcessing/mainCycle.cpp:155-161, using
OpenCV defaults: 100 iterations, 8 px reprojection threshold, iterative
refinement on inliers).  TPU-native design: S 6-point DLT hypotheses solved
as one batched [S,12,12] nullspace problem, every hypothesis scored against
all N correspondences in one reprojection tensor, then a fixed number of
Gauss–Newton steps on the inlier set of the winner (masked IRLS-style, all
shapes static).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import denormalize, normalize_pixels
from .rotations import matrix_to_rodrigues, project_to_so3, rodrigues_to_matrix


def _dlt_pnp(X: jnp.ndarray, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Minimal DLT pose from 6 points (batched).

    X: [S,6,3] world points; x: [S,6,2] K-normalized image coords.
    Returns (R [S,3,3], t [S,3]) with X_cam = R X + t."""
    S, m, _ = X.shape
    ones = jnp.ones((S, m, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=-1)  # [S,6,4]
    zeros = jnp.zeros_like(Xh)
    u = x[..., 0:1]
    v = x[..., 1:2]
    # Rows: [Xh 0 -u*Xh] and [0 Xh -v*Xh] for P (3x4) row-major 12-vector.
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # [S,6,12]
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # [S,12,12]
    AtA = jnp.einsum("sij,sik->sjk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., 0]  # [S,12]
    P = p.reshape(S, 3, 4)
    # Fix sign: centroid of sample points must have positive depth.
    centroid = jnp.concatenate([X.mean(axis=1), jnp.ones((S, 1), X.dtype)], axis=-1)
    depth = jnp.einsum("sj,sj->s", P[:, 2], centroid)
    P = P * jnp.where(depth < 0, -1.0, 1.0)[:, None, None]
    M = P[:, :, :3]
    # Orthogonalize M → R, recover scale from singular values.
    U, s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * D[:, None, :]) @ Vt
    scale = jnp.where(s.mean(axis=-1) > 1e-12, 1.0 / jnp.maximum(s.mean(axis=-1), 1e-12), 0.0)
    t = P[:, :, 3] * scale[:, None]
    return R, t


def _reproj_err_px(K, R, t, X, uv):
    """Pixel reprojection error: R [S,3,3], t [S,3], X [N,3], uv [N,2] → [S,N]."""
    Xc = jnp.einsum("sij,nj->sni", R, X) + t[:, None, :]
    z = jnp.maximum(Xc[..., 2], 1e-9)
    xy = Xc[..., :2] / z[..., None]
    uv_hat = denormalize(K, xy)
    return jnp.linalg.norm(uv_hat - uv[None], axis=-1), Xc[..., 2]


def _gauss_newton_refine(K, R0, t0, X, uv, weights, iters: int = 8):
    """Masked Gauss–Newton on (angle-axis, t) minimizing pixel reprojection.

    Mirrors OpenCV's SOLVEPNP_ITERATIVE refinement-on-inliers step."""
    aa0 = matrix_to_rodrigues(R0)
    params0 = jnp.concatenate([aa0, t0])
    fx, fy = K[0, 0], K[1, 1]

    def residuals(params):
        R = rodrigues_to_matrix(params[:3])
        Xc = X @ R.T + params[3:]
        z = jnp.maximum(Xc[:, 2], 1e-9)
        u_hat = fx * Xc[:, 0] / z + K[0, 2]
        v_hat = fy * Xc[:, 1] / z + K[1, 2]
        r = jnp.stack([u_hat - uv[:, 0], v_hat - uv[:, 1]], axis=-1)  # [N,2]
        return (r * weights[:, None]).reshape(-1)

    def step(params, _):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)  # [2N,6]
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=params.dtype)
        g = J.T @ r
        delta = jnp.linalg.solve(H, g)
        new_params = params - delta
        # Keep the step only if it reduces the cost.
        better = jnp.sum(residuals(new_params) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new_params, params), None

    params, _ = jax.lax.scan(step, params0, None, length=iters)
    return rodrigues_to_matrix(params[:3]), params[3:]


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def solve_pnp_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    reproj_threshold_px: float | jnp.ndarray = 8.0,
    num_hypotheses: int = 256,
    refine_iters: int = 6,
    prior_R: jnp.ndarray | None = None,
    prior_t: jnp.ndarray | None = None,
):
    """RANSAC PnP over N fixed correspondence slots.

    Args:
      X: [N,3] world points, uv: [N,2] pixel observations, mask: [N] validity.
      reproj_threshold_px: inlier gate (OpenCV solvePnPRansac default 8.0,
        as used at mainCycle.cpp:155-161).
      prior_R/prior_t: optional motion-prior pose injected as an extra
        hypothesis — in incremental tracking the previous frame's pose is an
        excellent candidate and caps RANSAC's worst case.

    Two local-optimization rounds (LO-RANSAC style): GN on the winner's
    inliers, re-gate, GN again — stabilizes the occasional weak draw.

    Returns dict with R [3,3], t [3] (world→camera), inliers [N],
    num_inliers."""
    n = X.shape[0]
    x_norm = normalize_pixels(K, uv)

    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 6), p=probs)
    R_c, t_c = _dlt_pnp(X[idx], x_norm[idx])
    if prior_R is not None and prior_t is not None:
        R_c = jnp.concatenate([R_c, prior_R[None]], axis=0)
        t_c = jnp.concatenate([t_c, prior_t[None]], axis=0)

    err, depth = _reproj_err_px(K, R_c, t_c, X, uv)
    inlier_mat = (err < reproj_threshold_px) & (depth > 0) & mask[None, :]
    counts = inlier_mat.sum(axis=1)
    best = jnp.argmax(counts)
    inliers = inlier_mat[best]

    R, t = _gauss_newton_refine(
        K, R_c[best], t_c[best], X, uv, inliers.astype(X.dtype), iters=refine_iters
    )
    # LO round 2: re-gate under the refined pose, refine again.
    err_1, depth_1 = _reproj_err_px(K, R[None], t[None], X, uv)
    inliers_1 = (err_1[0] < reproj_threshold_px) & (depth_1[0] > 0) & mask
    R, t = _gauss_newton_refine(
        K, R, t, X, uv, inliers_1.astype(X.dtype), iters=refine_iters // 2 + 1
    )
    # Final inlier set under the refined pose.
    err_f, depth_f = _reproj_err_px(K, R[None], t[None], X, uv)
    inliers_f = (err_f[0] < reproj_threshold_px) & (depth_f[0] > 0) & mask
    return {"R": R, "t": t, "inliers": inliers_f, "num_inliers": inliers_f.sum()}
