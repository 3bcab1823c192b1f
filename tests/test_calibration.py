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


def test_video_calibration_entry_point(tmp_path):
    """main_calibration_entry_point's VIDEO branch end-to-end from pixels
    (reference: chessboardVideoCalibration, cameraCalibration.cpp:81-140):
    render a checkerboard under known K through per-view homographies,
    encode to a video file, calibrate, and recover the intrinsics."""
    import cv2
    import dataclasses

    from slam_indoor_code_tpu.calibration.chessboard import (
        CELL_SIZE, PATTERN_SIZE, main_calibration_entry_point)
    from slam_indoor_code_tpu.config import Config, TpuConfig
    from slam_indoor_code_tpu.io.xmlio import load_matrix_from_xml

    rng = np.random.default_rng(3)
    K_gt = np.array([[800.0, 0, 320.0], [0, 810.0, 240.0], [0, 0, 1.0]])
    W, H = 640, 480
    # flat checkerboard texture in board coords: (inner+1) squares per side,
    # white border so corner detection sees the full pattern
    nsq = PATTERN_SIZE[0] + 1
    px_per_cell = 20
    border = 2 * px_per_cell
    side = nsq * px_per_cell + 2 * border
    tex = np.full((side, side), 255, np.uint8)
    for by in range(nsq):
        for bx in range(nsq):
            if (bx + by) % 2 == 0:
                y0 = border + by * px_per_cell
                x0 = border + bx * px_per_cell
                tex[y0:y0 + px_per_cell, x0:x0 + px_per_cell] = 0
    # board-units -> texture-pixels: corner (i*CELL, j*CELL) sits at
    # border + (i+1)*px_per_cell (inner corners start one square in)
    s = px_per_cell / CELL_SIZE
    T_tex = np.array([[s, 0, border + px_per_cell],
                      [0, s, border + px_per_cell],
                      [0, 0, 1.0]])

    path = str(tmp_path / "calib.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (W, H))
    assert vw.isOpened()
    n_views = 0
    while n_views < 8:
        R = _rot(rng, scale=0.25)
        t = np.array([rng.uniform(-30, 30), rng.uniform(-25, 25),
                      rng.uniform(380, 560)])
        # planar board (Z=0): pixel = K [r1 r2 t] (X, Y, 1)
        H_board = K_gt @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        corners = _project_board(K_gt, np.zeros(5), R, t,
                                 make_object_points())
        if (corners.min() < 20 or corners[:, 0].max() > W - 20
                or corners[:, 1].max() > H - 20):
            continue
        H_pix = H_board @ np.linalg.inv(T_tex)
        img = cv2.warpPerspective(tex, H_pix.astype(np.float64), (W, H),
                                  flags=cv2.INTER_LINEAR,
                                  borderValue=255)
        # the video branch samples every 10th frame — repeat each view
        for _ in range(10):
            vw.write(cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
        n_views += 1
    vw.release()

    xml = str(tmp_path / "cam.xml")
    cfg = Config(usePhotosCycle=False, videoSourcePath=path,
                 calibrationPath=xml, calibrate=True,
                 outputDataDir=str(tmp_path),
                 requiredExtractedPointsCount=100,
                 featureExtractingThreshold=20, framesBatchSize=4,
                 requiredMatchedPointsCount=10, knnMatcherDistance=0.8,
                 RPDistanceThreshold=100.0, tpu=TpuConfig())
    K, dist, rms = main_calibration_entry_point(cfg)
    assert rms < 1.5
    np.testing.assert_allclose(K[0, 0], K_gt[0, 0], rtol=0.05)
    np.testing.assert_allclose(K[1, 1], K_gt[1, 1], rtol=0.05)
    np.testing.assert_allclose(K[0, 2], K_gt[0, 2], rtol=0.08)
    # persisted XML round-trips
    K_x = load_matrix_from_xml(xml, "K")
    np.testing.assert_allclose(K_x, K, atol=1e-6)
