"""Two-view relative pose: batched-RANSAC essential matrix + pose recovery.

Reference behaviour being reproduced (src/mainModule/translation/
cameraTranslation.cpp:32-69): ``findEssentialMat(RANSAC, prob, threshold)``
followed by ``recoverPose(E, …, distanceThreshold)`` which returns R, t and a
chirality mask over the matches.

TPU-native design: RANSAC's adaptive host loop becomes a *fixed* fan-out — S
minimal samples drawn at once, S hypotheses solved as one batched [S,8,9]
nullspace problem, all hypotheses scored against all N matches in one
[S,N] Sampson-distance tensor, argmax inlier count (SURVEY.md §7 "RANSAC
control flow").  S is chosen from the config's RANSAC probability: with the
8-point solver, S ≥ log(1-prob)/log(1-w⁸); the default S=1024 covers
inlier ratios down to ~45% at prob=0.999.

Everything is float32, fixed-shape, mask-aware, and jit-compatible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import normalize_pixels
from .triangulate import triangulate_dlt


def _nullspace_last(AtA: jnp.ndarray) -> jnp.ndarray:
    """Smallest eigenvector of a batched symmetric matrix [S,D,D] → [S,D]."""
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., 0]


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point essential estimate from K-normalized coords.

    x1, x2: [S,8,2] sampled correspondences → E [S,3,3] (rank-2 enforced)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    # Row of A for constraint x2ᵀ E x1 = 0, E flattened row-major.
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # [S,8,9]
    AtA = jnp.einsum("sij,sik->sjk", A, A)
    e = _nullspace_last(AtA)  # [S,9]
    E = e.reshape(-1, 3, 3)
    # Project onto essential manifold: singular values (1,1,0).
    U, s, Vt = jnp.linalg.svd(E)
    D = jnp.zeros_like(E).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    return U @ D @ Vt


def _sampson_sq(E: jnp.ndarray, x1h: jnp.ndarray, x2h: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance of N correspondences under S hypotheses.

    E: [S,3,3]; x1h, x2h: [N,3] homogeneous normalized coords → [S,N]."""
    Ex1 = jnp.einsum("sij,nj->sni", E, x1h)
    Etx2 = jnp.einsum("sji,nj->sni", E, x2h)
    x2Ex1 = jnp.einsum("ni,sni->sn", x2h, Ex1)
    denom = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return (x2Ex1 * x2Ex1) / jnp.maximum(denom, 1e-18)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def find_essential_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    threshold_px: float | jnp.ndarray = 1.0,
    num_hypotheses: int = 1024,
):
    """Fixed-fan-out RANSAC essential-matrix estimation.

    Args:
      key: PRNG key for hypothesis sampling.
      K: [3,3] intrinsics; uv1, uv2: [N,2] matched pixel coords; mask: [N]
        validity (padding slots False).
      threshold_px: inlier threshold in pixels (the reference's
        RPRANSACThreshold; OpenCV divides by focal internally — so do we).

    Returns dict with E [3,3], inliers [N] bool, num_inliers scalar."""
    n = uv1.shape[0]
    x1 = normalize_pixels(K, uv1)
    x2 = normalize_pixels(K, uv2)
    x1h = jnp.concatenate([x1, jnp.ones((n, 1), x1.dtype)], axis=1)
    x2h = jnp.concatenate([x2, jnp.ones((n, 1), x2.dtype)], axis=1)

    # Sample S×8 valid match indices (with replacement, biased to valid slots).
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 8), p=probs)
    E = _eight_point(x1[idx], x2[idx])  # [S,3,3]

    f_mean = 0.5 * (K[0, 0] + K[1, 1])
    thr = (threshold_px / f_mean) ** 2
    d2 = _sampson_sq(E, x1h, x2h)  # [S,N]
    inlier_mat = (d2 < thr) & mask[None, :]
    counts = inlier_mat.sum(axis=1)
    best = jnp.argmax(counts)
    best_inliers = inlier_mat[best]

    # Refit on all inliers of the best hypothesis (weighted 8-point over N).
    w = best_inliers.astype(x1.dtype)[:, None]
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)],
        axis=-1,
    )
    Aw = A * w
    AtA = Aw.T @ Aw
    e = _nullspace_last(AtA[None])[0]
    E_refined = e.reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E_refined)
    E_refined = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E_refined.dtype)) @ Vt

    # Re-score the refined E; keep it only if it doesn't lose inliers.
    d2_ref = _sampson_sq(E_refined[None], x1h, x2h)[0]
    inliers_ref = (d2_ref < thr) & mask
    use_ref = inliers_ref.sum() >= counts[best]
    E_best = jnp.where(use_ref, E_refined, E[best])
    inliers = jnp.where(use_ref, inliers_ref, best_inliers)
    return {"E": E_best, "inliers": inliers, "num_inliers": inliers.sum()}


@jax.jit
def recover_pose(
    E: jnp.ndarray,
    K: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    distance_threshold: float | jnp.ndarray = 50.0,
):
    """Choose the (R, t) decomposition of E by chirality voting.

    Mirrors OpenCV ``recoverPose`` as used by the reference
    (cameraTranslation.cpp:59-66): four candidate decompositions, triangulate
    all masked matches under each, count points in front of both cameras and
    closer than ``distance_threshold`` (the reference's RPDistanceThreshold),
    return the winner and its chirality mask.

    Returns dict with R [3,3], t [3] (unit norm, X_c2 = R X_c1 + t),
    chirality_mask [N], num_passed."""
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    cand_R = jnp.stack([R1, R1, R2, R2])
    cand_t = jnp.stack([t, -t, t, -t])

    x1 = normalize_pixels(K, uv1)
    x2 = normalize_pixels(K, uv2)
    eye = jnp.eye(3, dtype=E.dtype)
    zero = jnp.zeros(3, dtype=E.dtype)
    P1 = jnp.concatenate([eye, zero[:, None]], axis=1)  # normalized-coord P

    def chirality(Rc, tc):
        P2 = jnp.concatenate([Rc, tc[:, None]], axis=1)
        X = triangulate_dlt(P1, P2, x1, x2)  # frame-1 camera coords
        z1 = X[:, 2]
        X2 = X @ Rc.T + tc
        z2 = X2[:, 2]
        ok = (z1 > 0) & (z2 > 0) & (z1 < distance_threshold) & (z2 < distance_threshold) & mask
        return ok

    votes = jax.vmap(chirality)(cand_R, cand_t)  # [4,N]
    counts = votes.sum(axis=1)
    best = jnp.argmax(counts)
    return {
        "R": cand_R[best],
        "t": cand_t[best],
        "chirality_mask": votes[best],
        "num_passed": counts[best],
    }


def estimate_transformation(
    key: jax.Array,
    K: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    use_ransac: bool = True,
    threshold_px: float = 1.0,
    distance_threshold: float = 50.0,
    num_hypotheses: int = 1024,
):
    """End-to-end two-view pose: E-RANSAC + recoverPose, the TPU equivalent of
    the reference's ``estimateTransformation`` (cameraTranslation.cpp:32-69).

    With ``use_ransac=False`` all (masked) matches feed one least-squares
    8-point fit, mirroring the reference's non-RANSAC ``findEssentialMat``
    branch."""
    if use_ransac:
        est = find_essential_ransac(
            key, K, uv1, uv2, mask,
            threshold_px=threshold_px, num_hypotheses=num_hypotheses,
        )
        E, support = est["E"], est["inliers"]
    else:
        x1 = normalize_pixels(K, uv1)
        x2 = normalize_pixels(K, uv2)
        u1, v1, u2, v2 = x1[:, 0], x1[:, 1], x2[:, 0], x2[:, 1]
        A = jnp.stack(
            [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)],
            axis=-1,
        ) * mask.astype(x1.dtype)[:, None]
        e = _nullspace_last((A.T @ A)[None])[0]
        E = e.reshape(3, 3)
        U, _, Vt = jnp.linalg.svd(E)
        E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt
        support = mask
    pose = recover_pose(E, K, uv1, uv2, support, distance_threshold=distance_threshold)
    pose["E"] = E
    pose["ransac_inliers"] = support
    return pose
