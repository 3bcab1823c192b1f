"""Calibration tests: Zhang + LM refinement recovers known K/distortion from
synthetic planar views (no image processing involved — the math path)."""

import numpy as np
import pytest

from slam_indoor_code_tpu.calibration import calibrate_camera, make_object_points


def _project_board(K, dist, R, t, obj):
    Xc = obj @ R.T + t
    x = Xc[:, 0] / Xc[:, 2]
    y = Xc[:, 1] / Xc[:, 2]
    r2 = x * x + y * y
    k1, k2, p1, p2, k3 = dist
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]], axis=1)


def _rot(rng, scale=0.35):
    aa = rng.normal(0, scale, 3)
    th = np.linalg.norm(aa)
    if th < 1e-9:
        return np.eye(3)
    k = aa / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


@pytest.fixture(scope="module")
def calib_views():
    rng = np.random.default_rng(9)
    K_gt = np.array([[900.0, 0, 330.0], [0, 910.0, 250.0], [0, 0, 1.0]])
    dist_gt = np.array([0.08, -0.15, 0.001, -0.0005, 0.0])
    obj = make_object_points()
    views = []
    for _ in range(8):
        R = _rot(rng)
        t = np.array([rng.uniform(-40, 40), rng.uniform(-40, 40),
                      rng.uniform(320, 520)])
        uv = _project_board(K_gt, dist_gt, R, t, obj)
        uv += rng.normal(0, 0.1, uv.shape)  # subpixel detection noise
        views.append(uv)
    return K_gt, dist_gt, obj, views


def test_calibrate_recovers_intrinsics(calib_views):
    K_gt, dist_gt, obj, views = calib_views
    K, dist, rvecs, tvecs, rms = calibrate_camera(obj, views)
    assert rms < 0.3, f"rms {rms}"
    assert abs(K[0, 0] - K_gt[0, 0]) / K_gt[0, 0] < 0.01
    assert abs(K[1, 1] - K_gt[1, 1]) / K_gt[1, 1] < 0.01
    assert abs(K[0, 2] - K_gt[0, 2]) < 6
    assert abs(K[1, 2] - K_gt[1, 2]) < 6
    # leading distortion terms in the right ballpark
    assert abs(dist[0] - dist_gt[0]) < 0.03
    assert abs(dist[1] - dist_gt[1]) < 0.1


def test_calibrate_saves_reference_xml(calib_views, tmp_path):
    from slam_indoor_code_tpu.io.xmlio import load_matrix_from_xml, save_calib_parameters_to_xml

    K_gt, dist_gt, obj, views = calib_views
    K, dist, rvecs, tvecs, rms = calibrate_camera(obj, views[:4])
    p = str(tmp_path / "cam.xml")
    save_calib_parameters_to_xml(p, K, dist.reshape(1, 5), rvecs, tvecs)
    K2 = load_matrix_from_xml(p, "K")
    np.testing.assert_allclose(K2, K, atol=1e-8)
    assert load_matrix_from_xml(p, "DC").shape == (1, 5)
    assert load_matrix_from_xml(p, "R").shape == (4, 3)
