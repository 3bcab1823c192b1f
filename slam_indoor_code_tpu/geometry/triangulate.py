"""Batched two-view DLT triangulation.

The reference hand-rolls per-point 4×4 linear systems and runs one SVD per
point in a host loop (``reconstructPointsFor3D``,
src/mainModule/triangulation/triangulate.cpp:17-55, ~4-6 ms/frame in its
logs).  TPU-native design: build all N 4×4 systems as one [N,4,4] tensor and
solve them with a single batched self-adjoint eigensolve of AᵀA — the
smallest eigenvector of AᵀA equals the smallest right singular vector of A,
and batched ``eigh`` maps well onto TPU.  Row normalization keeps the squared
system well-conditioned in float32.
"""

from __future__ import annotations

import jax.numpy as jnp

from .projection import projection_matrix


def triangulate_dlt(
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Linear triangulation of N correspondences.

    Args:
      P1, P2: [3,4] projection matrices (pixel or normalized — any consistent
        scale; rows are internally normalized).
      uv1, uv2: [N,2] point coordinates in the same scale as P.
      mask: optional [N] validity mask — invalid rows still compute (garbage
        in, garbage out) but are zeroed in the result.

    Returns: [N,3] euclidean points (reference equivalent:
    ``convertHomogeneousPointsMatrixToSpatialPointsVector``,
    triangulate.cpp:102-119)."""
    # A rows: u*P[2] - P[0], v*P[2] - P[1] for each view
    def rows(P, uv):
        r0 = uv[:, 0:1] * P[2][None, :] - P[0][None, :]
        r1 = uv[:, 1:2] * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    a2, a3 = rows(P2, uv2)
    A = jnp.stack([a0, a1, a2, a3], axis=1)  # [N,4,4]
    # Row-normalize for float32 conditioning before squaring.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    Xh = vecs[..., 0]  # [N,4] smallest eigenvector
    w = Xh[:, 3:4]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    X = Xh[:, :3] / safe_w
    if mask is not None:
        X = jnp.where(mask[:, None], X, 0.0)
    return X


def triangulate_midpoint(
    K: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Closed-form midpoint triangulation of N correspondences.

    The geometric alternative to DLT: intersect the two viewing rays by the
    closest-point 2×2 linear system — pure elementwise math (no batched
    eigensolve, ~3× faster on TPU than the [N,4,4] eigh) and numerically
    graceful at low parallax, where the inhomogeneous DLT form breaks.
    Accuracy is equivalent for SLAM purposes (BA polishes all survivors;
    degenerate/parallel rays produce far points that the chirality and
    reprojection gates cull)."""
    Kinv = jnp.linalg.inv(K)

    def ray(R, t, uv):
        ones = jnp.ones((uv.shape[0], 1), uv.dtype)
        pix = jnp.concatenate([uv, ones], axis=-1)
        d = (pix @ Kinv.T) @ R  # R^T K^{-1} pix, batched
        C = -R.T @ t
        return d, C

    d1, C1 = ray(R1, t1, uv1)
    d2, C2 = ray(R2, t2, uv2)
    b = C2 - C1  # [3]
    a11 = jnp.sum(d1 * d1, -1)
    a12 = jnp.sum(d1 * d2, -1)
    a22 = jnp.sum(d2 * d2, -1)
    b1 = d1 @ b
    b2 = d2 @ b
    det = a11 * a22 - a12 * a12
    safe_det = jnp.maximum(det, 1e-12 * jnp.maximum(a11 * a22, 1e-20))
    s = (b1 * a22 - b2 * a12) / safe_det       # depth along ray 1
    u = (b1 * a12 - b2 * a11) / safe_det       # depth along ray 2
    X = 0.5 * ((C1[None] + s[:, None] * d1) + (C2[None] + u[:, None] * d2))
    if mask is not None:
        X = jnp.where(mask[:, None], X, 0.0)
    return X


def triangulate_midpoint_anchored(
    K: jnp.ndarray,
    R1: jnp.ndarray,        # [N,3,3] PER-ROW first-view rotations
    t1: jnp.ndarray,        # [N,3]   per-row first-view translations
    R2: jnp.ndarray,        # [3,3]   shared second view
    t2: jnp.ndarray,        # [3]
    uv1: jnp.ndarray,       # [N,2]
    uv2: jnp.ndarray,       # [N,2]
    mask: jnp.ndarray | None = None,
):
    """Midpoint triangulation where every correspondence has its OWN first
    view — the delayed-triangulation primitive: a feature track carries its
    first-observation (anchor) pose+pixel forward, and triangulates against
    the current frame only once the anchor baseline has real parallax.
    Returns (X [N,3], cos_parallax [N]) — cos of the ray angle, the gate the
    caller applies (low parallax ⇒ cos→1 ⇒ depth unobservable; consecutive-
    frame triangulation of far points is what collapses monocular scale).

    No reference counterpart: the reference always triangulates consecutive
    accepted frames (mainCycle.cpp:187, triangulate.cpp:74-100) and relies on
    feature decay to space its frames."""
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    pix1 = jnp.concatenate([uv1, ones], axis=-1)
    pix2 = jnp.concatenate([uv2, ones], axis=-1)
    # d = Rᵀ K⁻¹ pix per row; C = -Rᵀ t per row
    d1 = jnp.einsum("nij,nj->ni", R1.transpose(0, 2, 1), pix1 @ Kinv.T)
    C1 = -jnp.einsum("nij,nj->ni", R1.transpose(0, 2, 1), t1)
    d2 = (pix2 @ Kinv.T) @ R2
    C2 = -R2.T @ t2
    b = C2[None, :] - C1                      # [N,3]
    a11 = jnp.sum(d1 * d1, -1)
    a12 = jnp.sum(d1 * d2, -1)
    a22 = jnp.sum(d2 * d2, -1)
    b1 = jnp.sum(d1 * b, -1)
    b2 = jnp.sum(d2 * b, -1)
    det = a11 * a22 - a12 * a12
    safe_det = jnp.maximum(det, 1e-12 * jnp.maximum(a11 * a22, 1e-20))
    s = (b1 * a22 - b2 * a12) / safe_det
    u = (b1 * a12 - b2 * a11) / safe_det
    X = 0.5 * ((C1 + s[:, None] * d1) + (C2[None, :] + u[:, None] * d2))
    cosang = a12 / jnp.sqrt(jnp.maximum(a11 * a22, 1e-20))
    if mask is not None:
        X = jnp.where(mask[:, None], X, 0.0)
    return X, cosang


def reconstruct(
    K: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Triangulate matched pixel coords between two posed frames — the batched
    equivalent of the reference's ``reconstruct`` (triangulate.cpp:74-100).
    Uses the closed-form midpoint method (see triangulate_midpoint); the
    reference's DLT form remains available as triangulate_dlt."""
    return triangulate_midpoint(K, R1, t1, R2, t2, uv1, uv2, mask)
