"""Real-texture scene renderer: end-to-end SLAM on real pixels.

The synthetic oracle (`testing/synthetic.py`) renders square blobs — the
easiest possible regime for the from-scratch descriptors.  This module
renders a geometrically exact multi-plane scene TEXTURED WITH REAL
PHOTOGRAPHS (e.g. the reference's own real indoor frames under
`/root/reference/docs/artifact/`): every frame is a homography warp of the
real texture through the true camera pose, so feature extraction, matching,
PnP, triangulation and BA all run on real image statistics while ground
truth poses stay exact.

Two planes at different depths give genuine parallax (a single plane is the
classic monocular degenerate configuration).  Frames are rendered far-to-
near with per-plane masks, so occlusion is consistent.

Reference counterpart: none — the reference was only ever validated by eye
on live footage (SURVEY.md §4); this is the rebuild's real-pixel oracle.
"""

from __future__ import annotations

import numpy as np


class RealTextureScene:
    """Textured multi-plane scene with exact ground-truth camera poses.

    ``planes``: list of (texture [Ht,Wt,3] u8, A, ex, ey) — the world
    rectangle X(s,t) = A + s*ex + t*ey, s in [0,Wt), t in [0,Ht), rendered
    far-to-near (painter's order as given).
    """

    def __init__(self, planes, K, rotations, translations,
                 image_size=(1080, 1920)):
        self.planes = planes
        self.K = np.asarray(K, np.float64)
        self.rotations = np.asarray(rotations, np.float64)
        self.translations = np.asarray(translations, np.float64)
        self.image_size = image_size

    @property
    def n_frames(self) -> int:
        return len(self.rotations)

    def centers(self) -> np.ndarray:
        R = self.rotations
        t = self.translations
        return np.einsum("nij,nj->ni", R.transpose(0, 2, 1), -t)

    def render(self, i: int) -> np.ndarray:
        import cv2

        H, W = self.image_size
        R, t = self.rotations[i], self.translations[i]
        frame = np.zeros((H, W, 3), np.uint8)
        for tex, A, ex, ey in self.planes:
            # homography (s, t, 1) -> pixel: K [R ex | R ey | R A + t]
            Hm = self.K @ np.column_stack([R @ ex, R @ ey, R @ A + t])
            warped = cv2.warpPerspective(tex, Hm, (W, H),
                                         flags=cv2.INTER_LINEAR)
            mask = cv2.warpPerspective(
                np.full(tex.shape[:2], 255, np.uint8), Hm, (W, H),
                flags=cv2.INTER_NEAREST)
            frame[mask > 0] = warped[mask > 0]
        return frame


def make_two_plane_scene(textures, n_frames: int = 24, step: float = 0.12,
                         image_size=(1080, 1920)):
    """A lateral-tracking camera over two real-textured walls at different
    depths (genuine parallax).  ``textures``: two RGB uint8 images.

    The far wall spans the whole sweep at depth 6; the near wall tiles a
    band at depth 3.5 across the lower half — both stay in view throughout
    so tracks persist and the essential bootstrap sees two depths."""
    H, W = image_size
    fx = fy = 0.9 * W
    K = np.array([[fx, 0, W / 2.0], [0, fy, H / 2.0], [0, 0, 1.0]])

    sweep = step * (n_frames - 1)
    t_far, t_near = textures[0], textures[1]
    planes = []
    # far wall: depth 6, width covering the FOV plus the sweep
    d_far = 6.0
    half_w = d_far * (W / 2.0) / fx
    x0, x1 = -half_w, half_w + sweep
    half_h = d_far * (H / 2.0) / fy
    Ht, Wt = t_far.shape[:2]
    planes.append((
        t_far,
        np.array([x0, -half_h, d_far]),
        np.array([(x1 - x0) / Wt, 0, 0]),
        np.array([0, 2.0 * half_h / Ht, 0]),
    ))
    # near band: depth 3.5, lower half of the view
    d_near = 3.5
    half_wn = d_near * (W / 2.0) / fx
    xn0, xn1 = -half_wn, half_wn + sweep
    y_top = 0.1 * d_near * (H / 2.0) / fy
    y_bot = d_near * (H / 2.0) / fy
    Hn, Wn = t_near.shape[:2]
    planes.append((
        t_near,
        np.array([xn0, y_top, d_near]),
        np.array([(xn1 - xn0) / Wn, 0, 0]),
        np.array([0, (y_bot - y_top) / Hn, 0]),
    ))

    rotations = np.tile(np.eye(3), (n_frames, 1, 1))
    centers = np.zeros((n_frames, 3))
    centers[:, 0] = step * np.arange(n_frames)
    translations = np.einsum("nij,nj->ni", rotations, -centers)
    return RealTextureScene(planes, K, rotations, translations, image_size)
