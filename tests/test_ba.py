"""Bundle-adjustment tests on synthetic toy problems with known optima
(SURVEY.md §4 oracle (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_indoor_code_tpu.geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix
from slam_indoor_code_tpu.solver import BAConfig, WindowedBA, bundle_adjust_window, loss_rho_and_weight
from slam_indoor_code_tpu.pipeline.structures import MapArena, TemporalFrameData


def _window_problem(scene, rng, n_frames=4, n_points=120, noise=0.3,
                    pose_jitter=0.02, point_jitter=0.05):
    """Build a BA window from the synthetic scene with perturbed initial
    values; ground truth is the scene itself."""
    F, P = n_frames, n_points
    pts_gt = scene.points[:P]
    K4 = np.array([scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]],
                  np.float32)
    Kslots = P
    uv = np.zeros((F, Kslots, 2), np.float32)
    idx = np.tile(np.arange(P, dtype=np.int32), (F, 1))
    mask = np.zeros((F, Kslots), bool)
    cams = np.zeros((F, 6), np.float32)
    for f in range(F):
        uvf, vis = scene.project(f, noise=noise, rng=rng)
        uv[f] = uvf[:P]
        mask[f] = vis[:P]
        aa = np.asarray(matrix_to_rodrigues(jnp.asarray(scene.rotations[f], jnp.float32)))
        jit_aa = aa + (rng.normal(0, pose_jitter, 3) if f > 0 else 0)
        jit_t = scene.translations[f] + (rng.normal(0, pose_jitter, 3) if f > 0 else 0)
        cams[f, :3] = jit_aa
        cams[f, 3:] = jit_t
    pts0 = (pts_gt + rng.normal(0, point_jitter, pts_gt.shape)).astype(np.float32)
    pmask = np.ones(P, bool)
    return K4, cams, pts0, uv, idx, mask, pmask, pts_gt


def _rmse(cfg, K4, cams, pts, uv, idx, mask, pmask):
    out = bundle_adjust_window(cfg, jnp.asarray(K4), jnp.asarray(cams),
                               jnp.asarray(pts), jnp.asarray(uv),
                               jnp.asarray(idx), jnp.asarray(mask),
                               jnp.asarray(pmask))
    return out


def test_ba_reduces_rmse_and_recovers_poses(scene, rng):
    K4, cams, pts0, uv, idx, mask, pmask, pts_gt = _window_problem(scene, rng)
    cfg = BAConfig(loss="trivial", max_iters=20)
    K4f, camsf, ptsf, info = _rmse(cfg, K4, cams, pts0, uv, idx, mask, pmask)
    assert float(info["final_rmse"]) < float(info["initial_rmse"]) * 0.5
    # ~pixel-noise floor
    assert float(info["final_rmse"]) < 0.6
    # poses recovered close to GT
    for f in range(1, 4):
        R = np.asarray(rodrigues_to_matrix(jnp.asarray(camsf[f, :3])))
        Rerr = R @ scene.rotations[f].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"frame {f} rot err {ang}"


def test_ba_gauge_frame0_fixed(scene, rng):
    K4, cams, pts0, uv, idx, mask, pmask, _ = _window_problem(scene, rng)
    cfg = BAConfig(loss="huber", loss_param=2.0, max_iters=10)
    K4f, camsf, ptsf, info = _rmse(cfg, K4, cams, pts0, uv, idx, mask, pmask)
    np.testing.assert_allclose(np.asarray(camsf[0]), cams[0], atol=1e-7)


def test_ba_huber_resists_outliers(scene, rng):
    K4, cams, pts0, uv, idx, mask, pmask, pts_gt = _window_problem(scene, rng)
    # corrupt 10% of observations massively
    bad = rng.random(mask.shape) < 0.1
    uv = uv + np.where(bad, 80.0, 0.0)[..., None].astype(np.float32)
    cfg_t = BAConfig(loss="trivial", max_iters=15)
    cfg_h = BAConfig(loss="huber", loss_param=1.5, max_iters=15)
    _, cams_t, _, _ = _rmse(cfg_t, K4, cams, pts0, uv, idx, mask, pmask)
    _, cams_h, _, _ = _rmse(cfg_h, K4, cams, pts0, uv, idx, mask, pmask)

    def pose_err(camsf):
        errs = []
        for f in range(1, 4):
            R = np.asarray(rodrigues_to_matrix(jnp.asarray(camsf[f, :3])))
            Rerr = R @ scene.rotations[f].T
            errs.append(np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1))))
        return np.mean(errs)

    assert pose_err(cams_h) < pose_err(cams_t)


@pytest.mark.parametrize("kind", ["trivial", "huber", "cauchy", "arctan", "tukey"])
def test_losses_shape_and_limits(kind):
    s = jnp.asarray([0.0, 0.01, 1.0, 100.0])
    rho, w = loss_rho_and_weight(s, kind, 1.0)
    assert rho.shape == s.shape and w.shape == s.shape
    assert float(w[0]) == pytest.approx(1.0, abs=1e-5)  # all behave like LS at 0
    assert np.all(np.asarray(w) <= 1.0 + 1e-6)
    if kind != "trivial":
        assert float(w[-1]) < 0.2  # big residuals downweighted


def test_windowed_ba_host_adapter(scene, rng):
    """WindowedBA packs frames + arena, solves, writes back in place."""
    P = 100
    arena = MapArena(1024)
    ids = arena.append(scene.points[:P] + rng.normal(0, 0.05, (P, 3)),
                       np.zeros((P, 3), np.uint8))
    frames = []
    for f in range(3):
        uvf, vis = scene.project(f, noise=0.2, rng=rng)
        fd = TemporalFrameData.empty(P, 1)
        fd.xy = uvf[:P].astype(np.float32)
        fd.valid = vis[:P]
        fd.correspond = np.where(vis[:P], ids, -1).astype(np.int32)
        aa_jit = rng.normal(0, 0.01, 3) if f else np.zeros(3)
        R = scene.rotations[f]
        fd.rotation = R @ np.asarray(
            rodrigues_to_matrix(jnp.asarray(aa_jit, jnp.float32)))
        fd.motion = scene.translations[f] + (rng.normal(0, 0.01, 3) if f else 0)
        frames.append(fd)
    ba = WindowedBA(loss="huber", loss_param=2.0, max_iters=15, window=4,
                    window_points=256)
    K_new = ba(scene.K.copy(), frames, arena)
    assert K_new.shape == (3, 3)
    # poses written back & improved
    for f in range(1, 3):
        Rerr = frames[f].rotation @ scene.rotations[f].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
        assert ang < 0.3
    # map points updated in place: final reprojection residual at the
    # pixel-noise floor (3-view geometry leaves ~0.08 depth uncertainty, so
    # compare in image space — the quantity BA minimizes)
    reproj = []
    for f in range(3):
        Xc = arena.points[:P] @ frames[f].rotation.T + frames[f].motion
        uv_hat = (Xc @ K_new.T)
        uv_hat = uv_hat[:, :2] / uv_hat[:, 2:3]
        e = np.linalg.norm(uv_hat - frames[f].xy, axis=1)
        reproj.append(e[frames[f].valid])
    rmse = np.sqrt((np.concatenate(reproj) ** 2).mean())
    assert rmse < 0.5, f"final reprojection RMSE {rmse:.3f}px"


# ------------------------------------------------------- global refinement
def test_global_ba_recovers_drifted_trajectory():
    """Matrix-free LM-PCG global BA (solver/global_ba.py): a trajectory with
    simulated accumulated drift must be pulled back to the ground truth.
    The windowed dense-Schur solver cannot scale to this camera count; the
    PCG solver touches only O(observations) memory."""
    import cv2
    import jax.numpy as jnp

    from slam_indoor_code_tpu.metrics import absolute_trajectory_error
    from slam_indoor_code_tpu.solver.global_ba import (GlobalBAConfig,
                                                       global_bundle_adjust)
    from slam_indoor_code_tpu.testing import make_scene

    N, P = 24, 800
    sc = make_scene(n_points=P, n_frames=N, seed=3, baseline=0.3,
                    kind="hallway")
    rng = np.random.default_rng(0)
    uv_l, ci_l, pi_l = [], [], []
    for f in range(N):
        uvf, vis = sc.project(f, noise=0.4, rng=rng)
        ids = np.flatnonzero(vis)[:400]
        uv_l.append(uvf[ids])
        ci_l.append(np.full(len(ids), f, np.int32))
        pi_l.append(ids.astype(np.int32))
    uv = np.concatenate(uv_l).astype(np.float32)
    ci = np.concatenate(ci_l)
    pi = np.concatenate(pi_l)
    O = len(uv)
    Opad = -(-O // 1024) * 1024
    uv = np.concatenate([uv, np.zeros((Opad - O, 2), np.float32)])
    ci = np.concatenate([ci, np.zeros(Opad - O, np.int32)])
    pi = np.concatenate([pi, np.zeros(Opad - O, np.int32)])
    mask = np.concatenate([np.ones(O, bool), np.zeros(Opad - O, bool)])

    cams = np.zeros((N, 6), np.float32)
    for f in range(N):
        aa, _ = cv2.Rodrigues(sc.rotations[f])
        drift = 0.03 * f / N
        cams[f, :3] = aa.ravel() + rng.normal(0, drift, 3)
        cams[f, 3:] = sc.translations[f] * (1 + drift) + rng.normal(0, drift, 3)
    pts = sc.points.astype(np.float32) + rng.normal(
        0, 0.05, (P, 3)).astype(np.float32)
    K4 = jnp.asarray([sc.K[0, 0], sc.K[1, 1], sc.K[0, 2], sc.K[1, 2]],
                     jnp.float32)
    cfg = GlobalBAConfig(max_iters=20, cg_iters=24)
    camsf, ptsf, info = global_bundle_adjust(
        cfg, K4, jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(uv),
        jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(mask))
    camsf = np.asarray(camsf)

    def centers(c6):
        out = []
        for i in range(N):
            R, _ = cv2.Rodrigues(np.asarray(c6[i, :3], np.float64))
            out.append(-R.T @ c6[i, 3:])
        return np.array(out)

    gt = sc.centers()
    ext = np.linalg.norm(gt.max(0) - gt.min(0))
    a0 = absolute_trajectory_error(centers(cams), gt) / ext
    a1 = absolute_trajectory_error(centers(camsf), gt) / ext
    assert a1 < 0.01, f"refined ATE {a1:.4f} of extent"
    assert a1 < 0.35 * a0, (a0, a1)
    # camera 0 is the gauge anchor — untouched
    np.testing.assert_allclose(camsf[0], cams[0])
    assert float(np.asarray(info["final_rmse"])) < 1.0


def test_global_ba_128_cameras_windowed_graph():
    """VERDICT r2 item 4: a genuinely drifted 128-camera trajectory with a
    REALISTIC observation graph — consistent drift (each landmark inherits
    the drift field of its creation frame, exactly how the engine
    triangulates into an already-drifted local frame), short-window tracks
    plus a long-lived fraction (what anchor-tracking/re-binding produce) —
    must have its ATE substantially reduced by the global solver, and final
    RMSE must not exceed the initial RMSE.

    The long-lived fraction is load-bearing: with ONLY short tracks a smooth
    drift field is an unobservable gauge direction of the reprojection cost
    (measured: ATE 1.16%→1.14%, no correction possible for any solver), and
    with 3%+ long tracks the same solver recovers ATE 0.52%→0.02%."""
    import cv2
    import jax.numpy as jnp

    from slam_indoor_code_tpu.metrics import absolute_trajectory_error
    from slam_indoor_code_tpu.solver.global_ba import (GlobalBAConfig,
                                                       global_bundle_adjust)
    from slam_indoor_code_tpu.testing import make_scene

    N, P = 128, 3000
    sc = make_scene(n_points=P, n_frames=N, seed=11, baseline=0.25,
                    image_size=(480, 640), kind="hallway")
    rng = np.random.default_rng(1)
    long_lived = rng.random(P) < 0.05
    # smooth per-frame drift field: scale creep + translation walk
    scale_f = 1.0 + np.cumsum(rng.normal(0.0006, 0.0004, N))
    trans_f = np.cumsum(rng.normal(0, 0.004, (N, 3)), axis=0)
    uv_l, ci_l, pi_l = [], [], []
    first_seen = np.full(P, -1)
    for f in range(N):
        uvf, vis = sc.project(f, noise=0.4, rng=rng)
        ids = np.flatnonzero(vis)
        new = first_seen[ids] < 0
        first_seen[ids[new]] = f
        keep = (f - first_seen[ids] < 12) | long_lived[ids]
        ids = ids[keep][:400]
        uv_l.append(uvf[ids])
        ci_l.append(np.full(len(ids), f, np.int32))
        pi_l.append(ids.astype(np.int32))
    uv = np.concatenate(uv_l).astype(np.float32)
    ci = np.concatenate(ci_l)
    pi = np.concatenate(pi_l)
    O = len(uv)
    Opad = -(-O // 4096) * 4096
    pad = Opad - O
    uv = np.concatenate([uv, np.zeros((pad, 2), np.float32)])
    ci = np.concatenate([ci, np.zeros(pad, np.int32)])
    pi = np.concatenate([pi, np.zeros(pad, np.int32)])
    mask = np.concatenate([np.ones(O, bool), np.zeros(pad, bool)])

    # consistent drift: camera centers through the field per frame; points
    # through the field at their CREATION frame.  Residuals appear exactly
    # where a track spans differing drift — the signal BA must exploit.
    cams = np.zeros((N, 6), np.float32)
    for f in range(N):
        aa, _ = cv2.Rodrigues(sc.rotations[f])
        C = -sc.rotations[f].T @ sc.translations[f]
        Cd = scale_f[f] * C + trans_f[f]
        cams[f, :3] = aa.ravel()
        cams[f, 3:] = -sc.rotations[f] @ Cd
    fs = np.clip(first_seen, 0, N - 1)
    pts = (sc.points * scale_f[fs][:, None] + trans_f[fs]).astype(np.float32)
    K4 = jnp.asarray([sc.K[0, 0], sc.K[1, 1], sc.K[0, 2], sc.K[1, 2]],
                     jnp.float32)
    cfg = GlobalBAConfig(max_iters=25, cg_iters=24)
    camsf, ptsf, info = global_bundle_adjust(
        cfg, K4, jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(uv),
        jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(mask))
    camsf = np.asarray(camsf)

    def centers(c6):
        out = []
        for i in range(N):
            R, _ = cv2.Rodrigues(np.asarray(c6[i, :3], np.float64))
            out.append(-R.T @ c6[i, 3:])
        return np.array(out)

    gt = sc.centers()
    ext = np.linalg.norm(gt.max(0) - gt.min(0))
    a0 = absolute_trajectory_error(centers(cams), gt) / ext
    a1 = absolute_trajectory_error(centers(camsf), gt) / ext
    r0 = float(np.asarray(info["initial_rmse"]))
    r1 = float(np.asarray(info["final_rmse"]))
    assert r1 <= r0, (r0, r1)
    assert a0 > 0.004, f"drift model too tame to be a meaningful test: {a0:.4f}"
    assert a1 < a0, f"ATE must strictly decrease: {a0:.4f} -> {a1:.4f}"
    assert a1 < 0.25 * a0, f"drift not substantially corrected: {a0:.4f} -> {a1:.4f}"
