"""Geometry-core tests against synthetic ground truth (SURVEY.md §4 oracle (a)).

Each op is validated on exact and noisy projected correspondences with known
K / poses / points — an oracle the reference never had."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_indoor_code_tpu.geometry import (
    compose_with_world,
    estimate_transformation,
    find_essential_ransac,
    matrix_to_rodrigues,
    project,
    recover_pose,
    reconstruct,
    rodrigues_to_matrix,
    solve_pnp_ransac,
    triangulate_dlt,
    undistort_points,
)
from slam_indoor_code_tpu.geometry.projection import projection_matrix


def _pair_correspondences(scene, i, j, noise=0.0, rng=None):
    uv1, vis1 = scene.project(i)
    uv2, vis2 = scene.project(j)
    vis = vis1 & vis2
    if noise:
        rng = rng or np.random.default_rng(0)
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    return (
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.asarray(vis),
    )


# ---------------------------------------------------------------- rotations
def test_rodrigues_roundtrip(rng):
    # angle-axis is only unique for |θ| < π — sample inside that ball
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    aa = jnp.asarray(axes * rng.uniform(0.01, 3.0, (64, 1)), jnp.float32)
    R = rodrigues_to_matrix(aa)
    # valid rotations
    eyes = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eyes, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    aa2 = matrix_to_rodrigues(R)
    np.testing.assert_allclose(aa2, aa, atol=1e-4)


def test_rodrigues_small_and_pi_angles():
    for theta in [1e-9, 1e-5, 3.1, np.pi - 1e-4]:
        axis = np.array([0.3, -0.5, 0.8])
        axis /= np.linalg.norm(axis)
        aa = jnp.asarray(theta * axis, jnp.float32)
        R = rodrigues_to_matrix(aa)
        aa2 = matrix_to_rodrigues(R)
        np.testing.assert_allclose(np.asarray(aa2), theta * axis, atol=5e-3)


def test_rodrigues_differentiable():
    g = jax.grad(lambda aa: rodrigues_to_matrix(aa).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------- triangulation
def test_triangulate_exact(scene):
    uv1, uv2, vis = _pair_correspondences(scene, 0, 4)
    K = jnp.asarray(scene.K, jnp.float32)
    P1 = projection_matrix(K, jnp.asarray(scene.rotations[0], jnp.float32),
                           jnp.asarray(scene.translations[0], jnp.float32))
    P2 = projection_matrix(K, jnp.asarray(scene.rotations[4], jnp.float32),
                           jnp.asarray(scene.translations[4], jnp.float32))
    X = triangulate_dlt(P1, P2, uv1, uv2, vis)
    err = np.linalg.norm(np.asarray(X) - scene.points, axis=1)[np.asarray(vis)]
    assert np.median(err) < 5e-2
    assert err.mean() < 0.1


def test_reconstruct_matches_triangulate(scene):
    uv1, uv2, vis = _pair_correspondences(scene, 0, 3)
    K = jnp.asarray(scene.K, jnp.float32)
    X = reconstruct(
        K,
        jnp.asarray(scene.rotations[0], jnp.float32),
        jnp.asarray(scene.translations[0], jnp.float32),
        jnp.asarray(scene.rotations[3], jnp.float32),
        jnp.asarray(scene.translations[3], jnp.float32),
        uv1, uv2, vis,
    )
    # reprojection must be tight for visible points
    uv_hat = project(K, jnp.asarray(scene.rotations[3], jnp.float32),
                     jnp.asarray(scene.translations[3], jnp.float32), X)
    reproj = np.linalg.norm(np.asarray(uv_hat - uv2), axis=1)[np.asarray(vis)]
    assert np.median(reproj) < 0.5


# ------------------------------------------------------------ essential/pose
def test_essential_ransac_rejects_outliers(scene, rng):
    uv1, uv2, vis = _pair_correspondences(scene, 0, 5, noise=0.3, rng=rng)
    uv1 = np.asarray(uv1).copy()
    uv2 = np.asarray(uv2).copy()
    vis_np = np.asarray(vis)
    # corrupt 30% of the visible matches
    vis_idx = np.flatnonzero(vis_np)
    bad = rng.choice(vis_idx, size=len(vis_idx) // 3, replace=False)
    uv2[bad] += rng.uniform(40, 120, (len(bad), 2))
    est = find_essential_ransac(
        jax.random.PRNGKey(0), jnp.asarray(scene.K, jnp.float32),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(vis_np), threshold_px=1.5,
    )
    inl = np.asarray(est["inliers"])
    # most corrupted matches excluded, most clean ones kept
    assert inl[bad].mean() < 0.1
    clean = np.setdiff1d(vis_idx, bad)
    assert inl[clean].mean() > 0.7


def test_recover_pose_direction(scene, rng):
    i, j = 0, 5
    uv1, uv2, vis = _pair_correspondences(scene, i, j, noise=0.2, rng=rng)
    K = jnp.asarray(scene.K, jnp.float32)
    pose = estimate_transformation(
        jax.random.PRNGKey(1), K, uv1, uv2, vis, threshold_px=1.5
    )
    # ground-truth relative pose: X_cj = R_rel X_ci + t_rel
    R_rel_gt = scene.rotations[j] @ scene.rotations[i].T
    t_rel_gt = scene.translations[j] - R_rel_gt @ scene.translations[i]
    R_err = np.asarray(pose["R"]) @ R_rel_gt.T
    angle = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert angle < 1.0, f"rotation error {angle} deg"
    # translation direction (scale is unobservable)
    t_est = np.asarray(pose["t"])
    cos = abs(t_est @ t_rel_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_rel_gt))
    assert cos > 0.995
    assert int(pose["num_passed"]) > 0.5 * int(np.asarray(vis).sum())


def test_recover_pose_chirality_filters_behind_camera(scene):
    uv1, uv2, vis = _pair_correspondences(scene, 0, 5)
    K = jnp.asarray(scene.K, jnp.float32)
    est = find_essential_ransac(jax.random.PRNGKey(0), K, uv1, uv2, vis)
    pose = recover_pose(est["E"], K, uv1, uv2, est["inliers"])
    assert int(pose["num_passed"]) > 0
    # chirality mask is a subset of the ransac support
    assert np.all(~np.asarray(pose["chirality_mask"]) | np.asarray(est["inliers"]))


def test_compose_with_world(scene):
    i, j = 2, 6
    R_rel = scene.rotations[j] @ scene.rotations[i].T
    t_rel = scene.translations[j] - R_rel @ scene.translations[i]
    R2, t2 = compose_with_world(
        jnp.asarray(scene.rotations[i]), jnp.asarray(scene.translations[i]),
        jnp.asarray(R_rel), jnp.asarray(t_rel),
    )
    np.testing.assert_allclose(np.asarray(R2), scene.rotations[j], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), scene.translations[j], atol=1e-6)


# -------------------------------------------------------------------- PnP
def test_pnp_ransac_with_outliers(scene, rng):
    f = 7
    uv, vis = scene.project(f)
    uv = uv + rng.normal(0, 0.3, uv.shape)
    vis_idx = np.flatnonzero(vis)
    bad = rng.choice(vis_idx, size=len(vis_idx) // 4, replace=False)
    uv[bad] += rng.uniform(30, 90, (len(bad), 2))
    res = solve_pnp_ransac(
        jax.random.PRNGKey(2),
        jnp.asarray(scene.K, jnp.float32),
        jnp.asarray(scene.points, jnp.float32),
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(vis),
    )
    R_err = np.asarray(res["R"]) @ scene.rotations[f].T
    angle = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert angle < 0.5, f"rotation error {angle} deg"
    t_err = np.linalg.norm(np.asarray(res["t"]) - scene.translations[f])
    assert t_err < 0.05, f"translation error {t_err}"
    assert np.asarray(res["inliers"])[bad].mean() < 0.05


def test_pnp_minimum_points(scene):
    # Degenerate input (few points) must not produce NaNs
    uv, vis = scene.project(0)
    keep = np.zeros_like(vis)
    keep[np.flatnonzero(vis)[:8]] = True
    res = solve_pnp_ransac(
        jax.random.PRNGKey(3),
        jnp.asarray(scene.K, jnp.float32),
        jnp.asarray(scene.points, jnp.float32),
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(keep),
        num_hypotheses=64,
    )
    assert np.all(np.isfinite(np.asarray(res["R"])))
    assert np.all(np.isfinite(np.asarray(res["t"])))


# -------------------------------------------------------------- undistortion
def test_undistort_roundtrip(scene, rng):
    K = jnp.asarray(scene.K, jnp.float32)
    dist = jnp.asarray([0.12, -0.04, 0.001, -0.002, 0.01], jnp.float32)
    from slam_indoor_code_tpu.geometry.projection import denormalize, normalize_pixels

    uv_u = jnp.asarray(rng.uniform(100, 500, (200, 2)), jnp.float32)
    # distort forward
    xy = normalize_pixels(K, uv_u)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    k1, k2, p1, p2, k3 = dist
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    uv_d = denormalize(K, jnp.stack([xd, yd], -1))
    uv_rec = undistort_points(K, dist, uv_d, iters=8)
    np.testing.assert_allclose(np.asarray(uv_rec), np.asarray(uv_u), atol=0.1)


# ------------------------------------------------------------ RANSAC fan-out
def test_ransac_fanout_matches_probability_bound():
    """Fixed fan-out sized to the RPRANSACProb success bound
    (cameraTranslation.cpp:38-52 passes prob to findEssentialMat; the
    adaptive loop there stops at the same S = log(1-p)/log(1-w^n))."""
    import math

    from slam_indoor_code_tpu.geometry.ransac import ransac_fanout

    # default confidence saturates the configured compute budget
    assert ransac_fanout(0.999, 8, 1024) == 1024
    # lower confidence genuinely shrinks the fan-out (RPRANSACProb is live)
    s90 = ransac_fanout(0.90, 8, 1024)
    assert 64 <= s90 < 1024
    exact = math.log(1 - 0.90) / math.log(1 - 0.5**8)
    assert exact <= s90 <= exact + 64  # ceil to lane multiple
    assert s90 % 64 == 0
    # PnP (6-pt sample) needs fewer hypotheses than essential (8-pt)
    assert ransac_fanout(0.999, 6, 4096) < ransac_fanout(0.999, 8, 4096)


def test_rpransacprob_drives_engine_fanout():
    from slam_indoor_code_tpu.config import Config, TpuConfig
    from slam_indoor_code_tpu.runtime.state import EngineConfig

    base = dict(usePhotosCycle=True, outputDataDir="/tmp/x",
                requiredExtractedPointsCount=10,
                featureExtractingThreshold=10, framesBatchSize=4,
                requiredMatchedPointsCount=5, knnMatcherDistance=0.8,
                RPDistanceThreshold=500.0,
                tpu=TpuConfig(ransac_iters=1024, pnp_ransac_iters=256))
    hi = EngineConfig.from_config(Config(**base))
    lo = EngineConfig.from_config(Config(RPRANSACProb=0.9, **base))
    assert hi.ransac_iters == 1024 and hi.pnp_iters == 256
    assert lo.ransac_iters < hi.ransac_iters
    assert lo.pnp_iters < hi.pnp_iters


def test_triangulate_midpoint_anchored_matches_shared_pose(rng):
    """Per-row-anchor midpoint triangulation (delayed triangulation
    primitive): with every row anchored at the SAME first view it must
    reproduce reconstruct(), and its cos-parallax must reflect the true ray
    angle (→1 for a short baseline, smaller for a wide one)."""
    import jax.numpy as jnp

    from slam_indoor_code_tpu.geometry.triangulate import (
        reconstruct, triangulate_midpoint_anchored)
    from slam_indoor_code_tpu.testing import make_scene

    sc = make_scene(n_points=200, n_frames=10, seed=5, baseline=0.3,
                    kind="hallway")
    K = jnp.asarray(sc.K, jnp.float32)
    f1, f2 = 0, 6
    uv1, v1 = sc.project(f1)
    uv2, v2 = sc.project(f2)
    m = v1 & v2
    R1 = jnp.asarray(sc.rotations[f1], jnp.float32)
    t1 = jnp.asarray(sc.translations[f1], jnp.float32)
    R2 = jnp.asarray(sc.rotations[f2], jnp.float32)
    t2 = jnp.asarray(sc.translations[f2], jnp.float32)
    uv1 = jnp.asarray(uv1, jnp.float32)
    uv2 = jnp.asarray(uv2, jnp.float32)
    mask = jnp.asarray(m)

    X_ref = np.asarray(reconstruct(K, R1, t1, R2, t2, uv1, uv2, mask))
    N = uv1.shape[0]
    R1s = jnp.broadcast_to(R1, (N, 3, 3))
    t1s = jnp.broadcast_to(t1, (N, 3))
    X_anc, cos_wide = triangulate_midpoint_anchored(
        K, R1s, t1s, R2, t2, uv1, uv2, mask)
    np.testing.assert_allclose(np.asarray(X_anc), X_ref, rtol=1e-4, atol=1e-4)
    # triangulated points land on the ground truth
    err = np.linalg.norm(np.asarray(X_anc)[m] - sc.points[m], axis=1)
    assert np.median(err) < 0.05

    # parallax ordering: 6-frame baseline opens a wider ray angle than a
    # 1-frame baseline for the same landmarks
    uv2n, v2n = sc.project(f1 + 1)
    mn = v1 & v2n
    _, cos_narrow = triangulate_midpoint_anchored(
        K, R1s, t1s, jnp.asarray(sc.rotations[f1 + 1], jnp.float32),
        jnp.asarray(sc.translations[f1 + 1], jnp.float32),
        uv1, jnp.asarray(uv2n, jnp.float32), jnp.asarray(mn))
    both = m & mn
    assert (np.asarray(cos_narrow)[both] > np.asarray(cos_wide)[both]).mean() > 0.9
    # narrow-baseline rays are nearly parallel
    assert np.median(np.asarray(cos_narrow)[both]) > 0.999
