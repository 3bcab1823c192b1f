"""Oracle self-tests: the synthetic scene must be geometrically consistent and
the ATE harness must report ~0 for perfect trajectories."""

import numpy as np

from slam_indoor_code_tpu.metrics import absolute_trajectory_error, umeyama_alignment
from slam_indoor_code_tpu.metrics.ate import camera_centers


def test_projection_consistency(scene):
    uv, vis = scene.project(0)
    assert vis.sum() > 100
    # Reproject a visible point by hand
    i = int(np.argmax(vis))
    R, t = scene.rotations[0], scene.translations[0]
    Xc = R @ scene.points[i] + t
    expect = scene.K @ Xc
    expect = expect[:2] / expect[2]
    np.testing.assert_allclose(uv[i], expect, atol=1e-9)


def test_rotations_are_valid(scene):
    for R in scene.rotations:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert abs(np.linalg.det(R) - 1.0) < 1e-10


def test_render_has_texture(scene):
    img = scene.render(0)
    assert img.shape == (*scene.image_size, 3)
    assert img.std() > 10  # blobs present


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(50, 3))
    # random rotation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    s, t = 2.7, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama_alignment(src, dst)
    assert abs(s2 - s) < 1e-9
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-9)


def test_ate_zero_for_scaled_trajectory(scene):
    centers = scene.centers()
    est = 3.0 * centers @ np.eye(3) + np.array([5.0, 0, 0])
    assert absolute_trajectory_error(est, centers) < 1e-9


def test_camera_centers_roundtrip(scene):
    C = camera_centers(scene.rotations, scene.translations)
    np.testing.assert_allclose(C, scene.centers(), atol=1e-12)
