"""Device-resident runtime tests: trajectory equivalence with the classic
host conductor, plus download-count discipline."""

import numpy as np
import pytest

from slam_indoor_code_tpu.app import slam_main
from slam_indoor_code_tpu.config import Config, TpuConfig
from slam_indoor_code_tpu.metrics import absolute_trajectory_error
from slam_indoor_code_tpu.metrics.ate import camera_centers
from slam_indoor_code_tpu.testing import make_scene


@pytest.fixture(scope="module")
def rt_scene():
    return make_scene(n_points=700, n_frames=14, seed=5, baseline=0.3)


def _cfg(tmp_path, device_runtime, **over):
    tpu = TpuConfig(max_keypoints=512, ransac_iters=256, pnp_ransac_iters=128,
                    window_points=4096, ba_max_iters=12,
                    device_runtime=device_runtime)
    base = dict(
        usePhotosCycle=True,
        outputDataDir=str(tmp_path),
        requiredExtractedPointsCount=80,
        featureExtractingThreshold=20,
        framesBatchSize=6,
        requiredMatchedPointsCount=30,
        knnMatcherDistance=0.8,
        RPDistanceThreshold=500.0,
        useBundleAdjustment=False,
        tpu=tpu,
    )
    base.update(over)
    return Config(**base)


def _run(scene, tmp_path, device_runtime, **over):
    frames = [scene.render(i) for i in range(14)]
    cfg = _cfg(tmp_path, device_runtime, **over)
    gd = slam_main(cfg, scene.K, frames=frames)
    est = camera_centers(gd.rotations, gd.positions)
    gt = scene.centers()[: len(est)]
    ate = absolute_trajectory_error(est, gt) if len(est) >= 3 else np.inf
    ext = np.linalg.norm(gt.max(0) - gt.min(0)) if len(gt) else 1.0
    return gd, ate / ext


def test_engine_matches_classic_ba_off(rt_scene, tmp_path_factory):
    gd_c, rel_c = _run(rt_scene, tmp_path_factory.mktemp("classic"), False)
    gd_e, rel_e = _run(rt_scene, tmp_path_factory.mktemp("engine"), True)
    assert len(gd_e.rotations) == len(gd_c.rotations)
    assert rel_e < 0.06, f"engine ATE {rel_e:.3f}"
    assert abs(rel_e - rel_c) < 0.03, (rel_e, rel_c)
    # maps equivalent in size (hygiene gates identical)
    assert abs(len(gd_e.points) - len(gd_c.points)) < 0.15 * len(gd_c.points)


def test_engine_with_ba(rt_scene, tmp_path):
    gd, rel = _run(rt_scene, tmp_path, True, useBundleAdjustment=True,
                   BAMaxFramesCnt=6, BAUseHuberLossFunction=True,
                   BAHuberLossFunctionParameter=2.0)
    assert len(gd.rotations) >= 10
    assert rel < 0.03, f"engine+BA ATE {rel:.3f}"
    assert "Bundle Adjustment statistics" in (tmp_path / "main.txt").read_text()


def test_engine_logs_reference_format(rt_scene, tmp_path):
    gd, _ = _run(rt_scene, tmp_path, True)
    from slam_indoor_code_tpu.io.logs import load_global_data_from_logs

    reloaded = load_global_data_from_logs(str(tmp_path))
    assert len(reloaded.rotations) == len(gd.rotations)
    assert len(reloaded.points) == len(gd.points)


def test_engine_track_loss_restart(rt_scene, tmp_path):
    frames = [rt_scene.render(i) for i in range(7)]
    frames += [np.zeros_like(frames[0])] * 3
    frames += [rt_scene.render(i) for i in range(7, 14)]
    cfg = _cfg(tmp_path, True)
    gd = slam_main(cfg, rt_scene.K, frames=frames)
    assert len(gd.rotations) >= 10
    assert len(gd.points) > 150
