"""Batched rotation parameterizations (angle-axis ⇄ matrix).

The reference round-trips rotations through OpenCV's ``Rodrigues`` when
packing BA parameters (src/mainModule/bundleAdjustment/bundleAdjustment.cpp:
153-201) and when converting PnP results (mainCycle.cpp:161).  Here both
directions are pure jnp, fully batched, and differentiable — the BA solver
autodiffs through ``rodrigues_to_matrix``.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[...,3] → [...,3,3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def rodrigues_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis [...,3] → rotation matrix [...,3,3] (Rodrigues formula).

    Uses the Taylor-safe form around θ→0 so it is differentiable everywhere.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    K = skew(aa)
    K2 = K @ K
    # sin(θ)/θ and (1-cos(θ))/θ² with small-angle expansions.  The untaken
    # branch of a `where` still backprops, so feed it a safe θ (the classic
    # double-where trick keeps gradients finite at θ=0).
    small = theta2 < 1e-8
    safe_theta2 = jnp.where(small, 1.0, theta2)
    safe_theta = jnp.sqrt(safe_theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + a * K + b * K2


def matrix_to_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [...,3,3] → angle-axis [...,3].

    Stable for θ near 0 and near π (uses the diagonal-based axis extraction
    in the π branch)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)

    # Axis (×2 sinθ) from the antisymmetric part.
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # sinθ from ‖w‖ (well-conditioned everywhere, unlike arccos of the trace)
    sin_theta = 0.5 * jnp.linalg.norm(w, axis=-1)
    theta = jnp.arctan2(sin_theta, cos_theta)

    # θ/(2 sinθ) with small-angle limit 1/2 (+ θ²/12 correction)
    t2 = (theta * theta)[..., None]
    scale = jnp.where(
        sin_theta[..., None] < 1e-6,
        0.5 + t2 / 12.0,
        theta[..., None] / jnp.maximum(2.0 * sin_theta[..., None], 1e-24),
    )
    aa_generic = w * scale
    sin_theta = sin_theta[..., None]

    # Near-π branch: axis from diagonal of (R + I)/2 = I - (1-cosθ)(I - nnᵀ)… →
    # nnᵀ = (R + I + (R+I)ᵀ)/ (2(1+cosθ)); take sqrt of diagonal, signs from w.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag - cos_theta[..., None]) / jnp.maximum(1.0 - cos_theta[..., None], 1e-12), 0.0)
    axis = jnp.sqrt(axis2)
    # Resolve signs: use the off-diagonal sums (n_i n_j terms) to fix relative
    # signs, anchored on the largest component.
    offd = jnp.stack(
        [
            R[..., 0, 1] + R[..., 1, 0],  # 2 n0 n1 (1-cosθ)
            R[..., 0, 2] + R[..., 2, 0],  # 2 n0 n2
            R[..., 1, 2] + R[..., 2, 1],  # 2 n1 n2
        ],
        axis=-1,
    )
    largest = jnp.argmax(axis, axis=-1)

    def _signed_axis(axis, offd, largest):
        s01 = jnp.sign(offd[..., 0]) + (offd[..., 0] == 0)
        s02 = jnp.sign(offd[..., 1]) + (offd[..., 1] == 0)
        s12 = jnp.sign(offd[..., 2]) + (offd[..., 2] == 0)
        n0 = jnp.stack([axis[..., 0], s01 * axis[..., 1], s02 * axis[..., 2]], -1)
        n1 = jnp.stack([s01 * axis[..., 0], axis[..., 1], s12 * axis[..., 2]], -1)
        n2 = jnp.stack([s02 * axis[..., 0], s12 * axis[..., 1], axis[..., 2]], -1)
        stacked = jnp.stack([n0, n1, n2], axis=-2)  # [...,3 anchors,3]
        return jnp.take_along_axis(stacked, largest[..., None, None], axis=-2)[..., 0, :]

    aa_pi = _signed_axis(axis, offd, largest) * theta[..., None]

    near_pi = (jnp.abs(sin_theta[..., 0]) < 1e-3) & (cos_theta < 0.0)
    return jnp.where(near_pi[..., None], aa_pi, aa_generic)


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix to M via SVD (det-corrected)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(M.shape[:-2] + (2,), M.dtype), det[..., None]], axis=-1
    )
    return (U * D[..., None, :]) @ Vt
