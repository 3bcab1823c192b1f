"""Chessboard camera calibration: Zhang's method + JAX LM refinement.

Reference counterpart: src/calibration/cameraCalibration.cpp — 7×7 inner
corners, sub-pixel refinement, ``cv::calibrateCamera``, K + 5 distortion
coefficients + per-view R,T persisted to XML (chessboardVideoCalibration
:81-140, chessboardPhotosCalibration :142-203, entry point :18-32).

Rebuild split: corner *detection* is a host-side image-processing step (cv2
when present — the reference also used OpenCV for it); the *calibration math*
is ours: per-view DLT homographies, closed-form intrinsics from Zhang's
B-matrix constraints, extrinsics recovery, then a joint Levenberg–Marquardt
refinement over (fx,fy,cx,cy, k1,k2,p1,p2,k3, per-view R|t) with residuals
and Jacobians from JAX autodiff — the same solver machinery as our BA.
"""

from __future__ import annotations

import glob as _glob

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix
from ..io.xmlio import save_calib_parameters_to_xml

PATTERN_SIZE = (7, 7)  # inner corners, reference cameraCalibration.cpp:15
CELL_SIZE = 20.0       # arbitrary board units (reference uses unit cells)


def make_object_points(pattern_size=PATTERN_SIZE, cell: float = CELL_SIZE) -> np.ndarray:
    """Planar board corner coordinates [N,3] (z=0)."""
    w, h = pattern_size
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([xs.ravel() * cell, ys.ravel() * cell,
                     np.zeros(w * h)], axis=1).astype(np.float64)


def find_chessboard_corners(gray: np.ndarray, pattern_size=PATTERN_SIZE):
    """Detect inner corners (host-side).  Returns [N,2] or None."""
    try:
        import cv2
    except ImportError as e:
        raise RuntimeError(
            "chessboard corner detection needs cv2 (host-side only)"
        ) from e
    img8 = gray.astype(np.uint8)
    found, corners = cv2.findChessboardCorners(img8, pattern_size)
    if not found:
        return None
    corners = cv2.cornerSubPix(
        img8, corners, (11, 11), (-1, -1),
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3),
    )
    return corners.reshape(-1, 2).astype(np.float64)


# ------------------------------------------------------------- Zhang closed form
def _homography_dlt(obj_xy: np.ndarray, img_xy: np.ndarray) -> np.ndarray:
    """Normalized DLT homography board→image, [3,3]."""

    def normalize(pts):
        mu = pts.mean(0)
        scale = np.sqrt(2) / max(np.linalg.norm(pts - mu, axis=1).mean(), 1e-12)
        T = np.array([[scale, 0, -scale * mu[0]],
                      [0, scale, -scale * mu[1]],
                      [0, 0, 1.0]])
        ph = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ T.T
        return ph[:, :2], T

    src, Ts = normalize(obj_xy)
    dst, Td = normalize(img_xy)
    n = len(src)
    A = np.zeros((2 * n, 9))
    for i in range(n):
        X, Y = src[i]
        u, v = dst[i]
        A[2 * i] = [-X, -Y, -1, 0, 0, 0, u * X, u * Y, u]
        A[2 * i + 1] = [0, 0, 0, -X, -Y, -1, v * X, v * Y, v]
    _, _, Vt = np.linalg.svd(A)
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


def _intrinsics_from_homographies(Hs: list[np.ndarray]) -> np.ndarray:
    """Closed-form K from ≥3 homographies via Zhang's B-matrix constraints
    (zero-skew parameterization recovered afterwards)."""

    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ])

    V = []
    for H in Hs:
        V.append(v(H, 0, 1))
        V.append(v(H, 0, 0) - v(H, 1, 1))
    V = np.asarray(V)
    _, _, Vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def _extrinsics_from_homography(K: np.ndarray, H: np.ndarray):
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / max(np.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * Kinv @ h1
    r2 = lam * Kinv @ h2
    t = lam * Kinv @ h3
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = -R
    if t[2] < 0:  # board must be in front of the camera
        R[:, :2] *= -1
        t = -t
    return R, t


# ------------------------------------------------------ joint LM refinement
def _residual_view(params, obj, uv):
    """Reprojection residual of one view: params = [fx,fy,cx,cy,
    k1,k2,p1,p2,k3, aa(3), t(3)]."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    R = rodrigues_to_matrix(params[9:12])
    t = params[12:15]
    Xc = obj @ R.T + t
    x = Xc[:, 0] / Xc[:, 2]
    y = Xc[:, 1] / Xc[:, 2]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    u = fx * xd + cx
    v = fy * yd + cy
    return jnp.stack([u - uv[:, 0], v - uv[:, 1]], -1).reshape(-1)


def calibrate_camera(
    obj_points: np.ndarray,
    image_points: list[np.ndarray],
    iters: int = 40,
):
    """Full calibration from V views of a planar target.

    Returns (K [3,3], dist [5], rvecs [V,3], tvecs [V,3], rms)."""
    V = len(image_points)
    assert V >= 3, "need ≥3 views for Zhang initialization"
    obj_xy = obj_points[:, :2]
    Hs = [_homography_dlt(obj_xy, uv) for uv in image_points]
    K0 = _intrinsics_from_homographies(Hs)
    exts = [_extrinsics_from_homography(K0, H) for H in Hs]

    obj_j = jnp.asarray(obj_points, jnp.float32)
    uvs = jnp.asarray(np.stack(image_points), jnp.float32)

    intr0 = np.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2],
                      0, 0, 0, 0, 0], np.float32)
    views0 = np.zeros((V, 6), np.float32)
    for i, (R, t) in enumerate(exts):
        views0[i, :3] = np.asarray(
            matrix_to_rodrigues(jnp.asarray(R, jnp.float32)))
        views0[i, 3:] = t

    def all_residuals(intr, views):
        def one(view, uv):
            return _residual_view(jnp.concatenate([intr, view]), obj_j, uv)
        return jax.vmap(one)(views, uvs).reshape(-1)

    @jax.jit
    def lm_iterate(intr, views, lam):
        flat = jnp.concatenate([intr, views.reshape(-1)])

        def f(p):
            return all_residuals(p[:9], p[9:].reshape(V, 6))

        r = f(flat)
        J = jax.jacfwd(f)(flat)
        H = J.T @ J
        g = J.T @ r
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
        delta = jnp.linalg.solve(Hd, g)
        new = flat - delta
        r_new = f(new)
        better = jnp.sum(r_new**2) < jnp.sum(r**2)
        flat = jnp.where(better, new, flat)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return flat[:9], flat[9:].reshape(V, 6), lam, jnp.sum(f(flat) ** 2)

    intr, views, lam = jnp.asarray(intr0), jnp.asarray(views0), jnp.float32(1e-3)
    cost = None
    for _ in range(iters):
        intr, views, lam, cost = lm_iterate(intr, views, lam)

    intr = np.asarray(intr, np.float64)
    views = np.asarray(views, np.float64)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1.0]])
    dist = intr[4:9]
    n_res = 2 * V * len(obj_points)
    rms = float(np.sqrt(float(cost) / n_res))
    return K, dist, views[:, :3], views[:, 3:], rms


# --------------------------------------------------------------- entry points
def _save_corner_overlay(img: np.ndarray, corners: np.ndarray, path: str):
    """Headless stand-in for the reference's visualCalibration corner display
    (drawChessboardCorners + imshow): save an overlay artifact instead."""
    out = np.array(img, copy=True)
    for u, v in corners:
        ui, vi = int(round(u)), int(round(v))
        out[max(0, vi - 2):vi + 3, max(0, ui - 2):ui + 3] = [255, 0, 0]
    try:
        from PIL import Image

        Image.fromarray(out).save(path)
    except Exception:
        pass


def chessboard_photos_calibration(photo_paths, save_path, pattern_size=PATTERN_SIZE,
                                  max_views: int = 20, visual_dir: str | None = None):
    """Calibrate from photo files and persist to XML (reference:
    chessboardPhotosCalibration, cameraCalibration.cpp:142-203)."""
    import os

    from ..io.media import _imread_rgb

    obj = make_object_points(pattern_size)
    img_pts = []
    shape = None
    for p in photo_paths[:max_views * 3]:
        img = _imread_rgb(p)
        if img is None:
            continue
        gray = (img @ np.array([0.299, 0.587, 0.114])).astype(np.float64)
        shape = gray.shape
        c = find_chessboard_corners(gray, pattern_size)
        if c is not None:
            img_pts.append(c)
            if visual_dir:
                os.makedirs(visual_dir, exist_ok=True)
                _save_corner_overlay(
                    img, c, os.path.join(
                        visual_dir, f"corners_{len(img_pts):02d}.png"))
        if len(img_pts) >= max_views:
            break
    if len(img_pts) < 3:
        raise RuntimeError(
            f"found chessboard in only {len(img_pts)} photos; need ≥3")
    K, dist, rvecs, tvecs, rms = calibrate_camera(obj, img_pts)
    save_calib_parameters_to_xml(save_path, K, dist.reshape(1, 5), rvecs, tvecs)
    return K, dist, rms


def main_calibration_entry_point(cfg):
    """Dispatch like the reference's mainCalibrationEntryPoint
    (cameraCalibration.cpp:18-32): photos glob or video source."""
    if cfg.usePhotosCycle:
        paths = sorted(_glob.glob(cfg.photosPathPattern))
        visual_dir = cfg.outputDataDir if cfg.visualCalibration else None
        return chessboard_photos_calibration(paths, cfg.calibrationPath,
                                             visual_dir=visual_dir)
    # video: sample frames uniformly
    import cv2

    cap = cv2.VideoCapture(cfg.videoSourcePath)
    obj = make_object_points()
    img_pts = []
    count = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        count += 1
        if count % 10:
            continue
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float64)
        c = find_chessboard_corners(gray)
        if c is not None:
            img_pts.append(c)
        if len(img_pts) >= 20:
            break
    if len(img_pts) < 3:
        raise RuntimeError("not enough chessboard views in video")
    K, dist, rvecs, tvecs, rms = calibrate_camera(obj, img_pts)
    save_calib_parameters_to_xml(cfg.calibrationPath, K, dist.reshape(1, 5),
                                 rvecs, tvecs)
    return K, dist, rms
