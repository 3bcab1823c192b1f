"""End-to-end pipeline tests: full SLAM over rendered synthetic sequences,
trajectory checked by ATE against ground truth (SURVEY.md §4 oracle (a))."""

import numpy as np
import pytest

from slam_indoor_code_tpu.config import Config, TpuConfig
from slam_indoor_code_tpu.app import slam_main
from slam_indoor_code_tpu.io.logs import load_global_data_from_logs
from slam_indoor_code_tpu.metrics import absolute_trajectory_error
from slam_indoor_code_tpu.metrics.ate import camera_centers
from slam_indoor_code_tpu.testing import make_scene


@pytest.fixture(scope="module")
def e2e_scene():
    # baseline 0.3 at depth 4–8 → depth/baseline ≈ 13–27, comparable to the
    # reference's indoor sequences between accepted keyframes
    return make_scene(n_points=700, n_frames=16, seed=5, baseline=0.3)


def _cfg(tmp_path, **over):
    small_tpu = TpuConfig(max_keypoints=512, ransac_iters=256,
                          pnp_ransac_iters=128, window_points=4096,
                          ba_max_iters=12)
    base = dict(
        usePhotosCycle=True,
        outputDataDir=str(tmp_path),
        requiredExtractedPointsCount=80,
        featureExtractingThreshold=20,
        framesBatchSize=6,
        requiredMatchedPointsCount=30,
        knnMatcherDistance=0.8,
        # scene depth in map-scale units exceeds the reference default 50;
        # this is a config knob exactly as in the reference (recoverPose
        # distanceThresh, cameraTranslation.cpp:59-66)
        RPDistanceThreshold=500.0,
        useBundleAdjustment=False,
        tpu=small_tpu,
    )
    base.update(over)
    return Config(**base)


@pytest.fixture(scope="module")
def ba_off_run(e2e_scene, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ba_off")
    frames = [e2e_scene.render(i) for i in range(16)]
    cfg = _cfg(tmp)
    gd = slam_main(cfg, e2e_scene.K, frames=frames)
    return gd, tmp, e2e_scene


def test_e2e_trajectory_ba_off(ba_off_run):
    gd, _, scene = ba_off_run
    assert len(gd.rotations) >= 10, f"only {len(gd.rotations)} cameras tracked"
    est = camera_centers(gd.rotations, gd.positions)
    gt = scene.centers()[: len(est)]
    ate = absolute_trajectory_error(est, gt)
    traj_extent = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate < 0.05 * traj_extent, f"ATE {ate:.4f} vs extent {traj_extent:.3f}"


def test_e2e_map_nonempty_and_logged(ba_off_run):
    gd, tmp, scene = ba_off_run
    assert len(gd.points) > 200
    # logs round-trip (onlyViz reload path, src/main.cpp:55-56)
    reloaded = load_global_data_from_logs(str(tmp))
    assert len(reloaded.rotations) == len(gd.rotations)
    np.testing.assert_allclose(reloaded.positions, gd.positions, atol=1e-9)
    assert len(reloaded.points) == len(gd.points)
    # main.txt narrative exists
    assert (tmp / "main.txt").read_text() != ""
    assert "Batch size" in (tmp / "main.txt").read_text()


def test_e2e_with_bundle_adjustment(e2e_scene, tmp_path):
    frames = [e2e_scene.render(i) for i in range(16)]
    cfg = _cfg(tmp_path, useBundleAdjustment=True, BAMaxFramesCnt=6,
               BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0)
    gd = slam_main(cfg, e2e_scene.K, frames=frames)
    assert len(gd.rotations) >= 10
    est = camera_centers(gd.rotations, gd.positions)
    gt = e2e_scene.centers()[: len(est)]
    ate = absolute_trajectory_error(est, gt)
    traj_extent = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate < 0.05 * traj_extent, f"ATE with BA {ate:.4f}"
    assert "Bundle Adjustment statistics" in (tmp_path / "main.txt").read_text()


def test_e2e_track_loss_restart(e2e_scene, tmp_path):
    """Insert black frames mid-sequence: the pipeline must lose track, restart
    with pose carry-over (src/main.cpp:89-101), and still output both
    sub-trajectories."""
    frames = [e2e_scene.render(i) for i in range(8)]
    black = [np.zeros_like(frames[0]) for _ in range(3)]
    frames = frames + black + [e2e_scene.render(i) for i in range(8, 16)]
    cfg = _cfg(tmp_path)
    gd = slam_main(cfg, e2e_scene.K, frames=frames)
    # all real frames are matchable; black ones are skipped by the corner
    # gate, so tracking should survive (batch-skip design) OR restart —
    # either way we keep ≥ 12 cameras and a nonempty map.
    assert len(gd.rotations) >= 12
    assert len(gd.points) > 200


def test_classic_path_applies_undistortion(e2e_scene):
    """The classic conductor must correct keypoint coords with DC exactly
    like the device runtime does at ingest (parity between the two
    'identical semantics' paths, app.py:54-58) — capability the reference
    only stubs with TODOs (batch.cpp:247)."""
    import jax.numpy as jnp

    from slam_indoor_code_tpu.io.media import ArraySource
    from slam_indoor_code_tpu.models import frontend as fe
    from slam_indoor_code_tpu.pipeline.batch import BatchScheduler

    fcfg = fe.FrontendConfig(max_keypoints=256, threshold=20.0)
    dist = np.array([0.15, -0.05, 0.0, 0.0, 0.0])
    K = jnp.asarray(e2e_scene.K, jnp.float32)
    frames = [e2e_scene.render(0)]

    def xy_of(dist_arg):
        s = BatchScheduler(ArraySource(list(frames)), fcfg, batch_size=1,
                           required_extracted=10, required_matched=5,
                           K=K, dist=dist_arg)
        s.fill()
        el = s.batch[0]
        return np.asarray(el.xy)[np.asarray(el.valid)]

    xy_off = xy_of(None)
    xy_on = xy_of(jnp.asarray(dist, jnp.float32))
    c = np.array([e2e_scene.K[0, 2], e2e_scene.K[1, 2]])
    r_on = np.linalg.norm(xy_on - c, axis=1)
    r_off = np.linalg.norm(xy_off - c, axis=1)
    # barrel distortion: corrected points move outward from the center
    assert (r_on < r_off - 1e-3).mean() > 0.8
    assert np.abs(r_on - r_off).max() > 1.0
