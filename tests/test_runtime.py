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


def _cfg(tmp_path, device_runtime, rebind_cap=4096, **over):
    tpu = TpuConfig(max_keypoints=512, ransac_iters=256, pnp_ransac_iters=128,
                    window_points=4096, ba_max_iters=12,
                    device_runtime=device_runtime, rebind_cap=rebind_cap)
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


def _run(scene, tmp_path, device_runtime, rebind_cap=4096, **over):
    frames = [scene.render(i) for i in range(14)]
    cfg = _cfg(tmp_path, device_runtime, rebind_cap=rebind_cap, **over)
    gd = slam_main(cfg, scene.K, frames=frames)
    est = camera_centers(gd.rotations, gd.positions)
    gt = scene.centers()[: len(est)]
    ate = absolute_trajectory_error(est, gt) if len(est) >= 3 else np.inf
    ext = np.linalg.norm(gt.max(0) - gt.min(0)) if len(gt) else 1.0
    return gd, ate / ext


def test_engine_matches_classic_ba_off(rt_scene, tmp_path_factory):
    # rebind off: map re-binding is a deliberate engine-only improvement
    # over the classic conductor (fewer duplicate landmarks), so the
    # equivalence contract is checked in reference-parity mode
    gd_c, rel_c = _run(rt_scene, tmp_path_factory.mktemp("classic"), False,
                       rebind_cap=0)
    gd_e, rel_e = _run(rt_scene, tmp_path_factory.mktemp("engine"), True,
                       rebind_cap=0)
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


def test_engine_undistortion_applied(rt_scene):
    """useUndistortion corrects keypoint coords via the calibration's DC
    (capability the reference only stubs with TODOs, batch.cpp:247)."""
    import jax.numpy as jnp

    from slam_indoor_code_tpu.runtime import DeviceEngine, EngineConfig
    from slam_indoor_code_tpu.runtime import steps
    from slam_indoor_code_tpu.io.media import ArraySource

    frames = [rt_scene.render(0)]
    dist = np.array([0.15, -0.05, 0.0, 0.0, 0.0])
    cfg_on = EngineConfig(max_keypoints=256, ring=9, map_cap=1024, window=4,
                          window_points=256, use_undistortion=True)
    cfg_off = EngineConfig(max_keypoints=256, ring=9, map_cap=1024, window=4,
                           window_points=256, use_undistortion=False)
    e_on = DeviceEngine(ArraySource(frames), rt_scene.K, cfg_on,
                        batch_size=4, required_extracted=10, dist=dist)
    e_off = DeviceEngine(ArraySource(frames), rt_scene.K, cfg_off,
                         batch_size=4, required_extracted=10, dist=dist)
    from slam_indoor_code_tpu.models.frontend import pack_frames

    gray, small = pack_frames(frames * 8, cfg_on.color_downscale)
    gray, small = jnp.asarray(gray), jnp.asarray(small)
    slots = jnp.arange(8, dtype=jnp.int32)
    e_on.state, _ = steps.ingest(cfg_on, e_on.state, gray, small, slots)
    e_off.state, _ = steps.ingest(cfg_off, e_off.state, gray, small, slots)
    xy_on = np.asarray(e_on.state.ring_xy[0])
    xy_off = np.asarray(e_off.state.ring_xy[0])
    v = np.asarray(e_off.state.ring_valid[0])
    # barrel distortion: corrected points move outward from the center
    c = np.array([rt_scene.K[0, 2], rt_scene.K[1, 2]])
    r_on = np.linalg.norm(xy_on[v] - c, axis=1)
    r_off = np.linalg.norm(xy_off[v] - c, axis=1)
    assert (r_on < r_off - 1e-3).mean() > 0.8
    assert np.abs(r_on - r_off).max() > 1.0  # correction is substantial


def test_checkpoint_roundtrip(rt_scene, tmp_path):
    """save/load of the full device state resumes a run exactly
    (SURVEY.md §5.4 — capability the reference lacks)."""
    from slam_indoor_code_tpu.io.media import ArraySource
    from slam_indoor_code_tpu.runtime import (DeviceEngine, EngineConfig,
                                              load_checkpoint, save_checkpoint)

    frames = [rt_scene.render(i) for i in range(14)]
    cfg = EngineConfig(max_keypoints=256, ring=14, map_cap=8192, window=4,
                       window_points=1024, required_matched=30,
                       distance_threshold=500.0, ransac_iters=128,
                       pnp_iters=64, ratio=0.8, threshold=20.0)
    e1 = DeviceEngine(ArraySource(frames[:8]), rt_scene.K, cfg,
                      batch_size=6, required_extracted=50)
    e1.run()
    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, e1)

    e2 = DeviceEngine(ArraySource(frames[8:]), rt_scene.K, cfg,
                      batch_size=6, required_extracted=50)
    load_checkpoint(ck, e2)
    assert int(np.asarray(e2.state.map_count)) == int(np.asarray(e1.state.map_count))
    np.testing.assert_allclose(np.asarray(e2.state.pose_t),
                               np.asarray(e1.state.pose_t))
    # resumed engine continues tracking on the remaining frames
    r = e2.run(np.asarray(e1.state.pose_R), np.asarray(e1.state.pose_t))
    assert e2.frames_accepted >= e1.frames_accepted  # cumulative counter restored
    assert int(np.asarray(e2.state.map_count)) > int(np.asarray(e1.state.map_count))


def test_matches_overlay_artifact(rt_scene, tmp_path):
    from slam_indoor_code_tpu.viz import pointcloud as pc
    import jax.numpy as jnp
    from slam_indoor_code_tpu.models import frontend as fe

    fcfg = fe.FrontendConfig(max_keypoints=128, threshold=20.0,
                             descriptor="orb", ratio=0.85, metric="hamming")
    fa, fb = rt_scene.render(0), rt_scene.render(1)
    ra = fe.extract_and_describe(fcfg, jnp.asarray(fa))
    rb = fe.extract_and_describe(fcfg, jnp.asarray(fb))
    from slam_indoor_code_tpu.ops import knn

    m = knn.match_pair(ra["desc"], ra["valid"], rb["desc"], rb["valid"],
                       0.85, "hamming")
    out = tmp_path / "matches.png"
    pc.matches_overlay(str(out), fa, np.asarray(ra["xy"]), fb,
                       np.asarray(rb["xy"]), np.asarray(m["train_idx"]),
                       np.asarray(m["is_match"]))
    assert out.stat().st_size > 5000


def test_ba_window_point_overflow_masked(rt_scene, tmp_path):
    """When a window holds more landmarks than window_points, overflow
    observations must be dropped, not aliased (regression: clamped
    searchsorted corrupted BA constraints and wrecked long trajectories)."""
    cfg = _cfg(tmp_path, True, useBundleAdjustment=True, BAMaxFramesCnt=6,
               BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0)
    # tiny landmark capacity: every window overflows
    import dataclasses

    cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, window_points=256))
    frames = [rt_scene.render(i) for i in range(14)]
    gd = slam_main(cfg, rt_scene.K, frames=frames)
    assert len(gd.rotations) >= 10
    est = camera_centers(gd.rotations, gd.positions)
    gt = rt_scene.centers()[: len(est)]
    ate = absolute_trajectory_error(est, gt)
    ext = np.linalg.norm(gt.max(0) - gt.min(0))
    # BA covers only part of the map, but must not make things WORSE than
    # pose-chaining (the aliasing bug produced >15% here)
    assert ate < 0.1 * ext, f"ATE {ate/ext:.3f} of extent"


def test_host_detect_matches_device_detector(rt_scene):
    """Host-detect ingest must produce the SAME corner set, subpixel coords,
    and post-NMS count as the device detector (ops.fast.detect) — raw arc
    semantics come from OpenCV (verified bit-identical) and NMS/subpixel
    reimplement the device math sparsely."""
    import cv2
    import jax.numpy as jnp

    from slam_indoor_code_tpu.models.frontend import _host_detect_frame
    from slam_indoor_code_tpu.ops import fast

    gray = cv2.cvtColor(rt_scene.render(0), cv2.COLOR_RGB2GRAY)
    d = fast.detect(jnp.asarray(gray, jnp.float32), 20.0, 4096)
    dxy = np.asarray(d["xy"])[np.asarray(d["valid"])]
    hxy, _ixy, hn = _host_detect_frame(gray, 20.0)
    assert hn == int(d["num_corners"])
    assert len(hxy) == len(dxy)
    ds = dxy[np.lexsort((dxy[:, 0], dxy[:, 1]))]
    hs = hxy[np.lexsort((hxy[:, 0], hxy[:, 1]))]
    np.testing.assert_allclose(ds, hs, atol=1e-4)


def test_engine_host_ingest_e2e(rt_scene, tmp_path):
    """Host-detect ingest runs the full pipeline with quality equivalent to
    the all-device path and carries source frame ids for every camera."""
    import dataclasses

    cfg = _cfg(tmp_path, True, useBundleAdjustment=True,
               BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0)
    cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, ingest="host",
                                     ingest_downscale=1))
    frames = [rt_scene.render(i) for i in range(14)]
    gd = slam_main(cfg, rt_scene.K, frames=frames)
    assert len(gd.rotations) >= 10
    assert len(gd.frame_ids) == len(gd.rotations)
    assert (np.diff(gd.frame_ids) > 0).all()  # ids strictly increasing
    est = camera_centers(gd.rotations, gd.positions)
    gt = rt_scene.centers()[gd.frame_ids]
    ate = absolute_trajectory_error(est, gt)
    ext = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate < 0.08 * ext, f"ATE {ate/ext:.3f} of extent"


def test_rebind_dedups_map(rt_scene, tmp_path_factory):
    """Map re-binding (anti-drift, no reference counterpart): unbound
    features re-bind to existing landmarks instead of triangulating
    duplicates, so the map shrinks substantially at equal trajectory
    quality."""
    gd_off, rel_off = _run(rt_scene, tmp_path_factory.mktemp("off"), True,
                           rebind_cap=0)
    gd_on, rel_on = _run(rt_scene, tmp_path_factory.mktemp("on"), True,
                         rebind_cap=4096)
    assert len(gd_on.points) < 0.85 * len(gd_off.points)
    assert rel_on < max(0.06, rel_off + 0.02)


def test_checkpoint_kill_and_resume_identical_tail(rt_scene, tmp_path):
    """Kill-and-resume through the PRODUCT surface (tpu.checkpoint_* config):
    a run killed after a periodic snapshot and resumed from it must produce
    exactly the trajectory an uninterrupted run produces (deterministic
    re-pull of in-flight frames — checkpoint.py resume contract).

    The kill is a mid-run media failure on the SAME workload (an exception
    out of next_frame), so the killed run is a true prefix of the
    uninterrupted one.  Truncating the frame list instead would change the
    workload: near the media end the candidate batch shrinks, the good-frame
    rule can pick different frames, and the snapshot would legitimately
    diverge from the uninterrupted trajectory before the kill."""
    import dataclasses

    from slam_indoor_code_tpu.io.media import ArraySource

    # long enough that the kill (a media exception) lands well after several
    # checkpoints despite the ingest prefetch running up to ~42 frames ahead
    # of acceptance (batch target + 3 staged chunks + the partial chunk);
    # the i%14 wrap makes the workload periodic, not truncated
    frames = [rt_scene.render(i % 14) for i in range(64)]
    base = _cfg(tmp_path / "a", True, useBundleAdjustment=True,
                BAMaxFramesCnt=4, BAUseHuberLossFunction=True,
                BAHuberLossFunctionParameter=2.0)
    gd_a = slam_main(base, rt_scene.K, frames=list(frames))

    class KilledSource(ArraySource):
        def __init__(self, frames, kill_after):
            super().__init__(frames)
            self._kill_after = kill_after

        def next_frame(self):
            if self._i >= self._kill_after:
                raise RuntimeError("simulated crash")
            return super().next_frame()

    ck = str(tmp_path / "run.npz")
    cfg_b1 = dataclasses.replace(
        base, outputDataDir=str(tmp_path / "b1"),
        tpu=dataclasses.replace(base.tpu, checkpoint_path=ck,
                                checkpoint_every=4))
    with pytest.raises(RuntimeError, match="simulated crash"):
        slam_main(cfg_b1, rt_scene.K,
                  frames=KilledSource(list(frames), kill_after=56))

    cfg_b2 = dataclasses.replace(
        base, outputDataDir=str(tmp_path / "b2"),
        tpu=dataclasses.replace(base.tpu, resume_path=ck))
    gd_b2 = slam_main(cfg_b2, rt_scene.K, frames=list(frames))

    assert len(gd_b2.rotations) > 0
    a_by_fid = {int(f): i for i, f in enumerate(gd_a.frame_ids)}
    matched = 0
    for j, fid in enumerate(gd_b2.frame_ids):
        if int(fid) in a_by_fid:
            i = a_by_fid[int(fid)]
            np.testing.assert_allclose(gd_b2.rotations[j], gd_a.rotations[i],
                                       atol=1e-5)
            np.testing.assert_allclose(gd_b2.positions[j], gd_a.positions[i],
                                       atol=1e-4)
            matched += 1
    assert matched >= 6  # the resumed tail really overlaps the full run
    # the resumed run continues to the end of the sequence
    assert max(int(f) for f in gd_b2.frame_ids) == max(
        int(f) for f in gd_a.frame_ids)


def test_profile_dir_writes_device_trace(rt_scene, tmp_path):
    """tpu.profile_dir integrates jax.profiler into the product run
    (SURVEY.md §5.1): the per-stage device-time breakdown lands on disk."""
    import dataclasses
    import glob

    cfg = _cfg(tmp_path / "out", True)
    cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu,
                                     profile_dir=str(tmp_path / "trace")))
    frames = [rt_scene.render(i) for i in range(8)]
    slam_main(cfg, rt_scene.K, frames=frames)
    dumps = glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                      recursive=True)
    assert dumps, "no xplane trace written"
    assert "Profiling device trace" in (tmp_path / "out" / "main.txt").read_text()


def test_engine_small_batch_large_window(rt_scene, tmp_path):
    """framesBatchSize < BA window: the fused window legitimately drains the
    scan pool mid-window (documented divergence from the classic per-frame
    refill, PARITY.md batch row) — the engine must still track the whole
    sequence across windows."""
    cfg = _cfg(tmp_path, True, framesBatchSize=3, useBundleAdjustment=True,
               BAMaxFramesCnt=8, BAUseHuberLossFunction=True,
               BAHuberLossFunctionParameter=2.0)
    frames = [rt_scene.render(i) for i in range(14)]
    gd = slam_main(cfg, rt_scene.K, frames=frames)
    assert len(gd.rotations) >= 10
    est = camera_centers(gd.rotations, gd.positions)
    gt = rt_scene.centers()[: len(est)]
    ate = absolute_trajectory_error(est, gt)
    ext = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate < 0.08 * ext, f"ATE {ate/ext:.3f} of extent"


def test_global_ba_bounds_long_run_drift(tmp_path_factory):
    """64-frame drift bound (BASELINE: ATE ≤ 5% of trajectory extent): the
    final global BA (matrix-free LM-PCG, solver/global_ba.py) must pull the
    accumulated monocular scale drift back under the bound, and must improve
    on the windowed-only trajectory."""
    import dataclasses

    scene = make_scene(n_points=1200, n_frames=64, seed=7, baseline=0.25,
                       image_size=(240, 320), kind="hallway")
    frames = [scene.render(i) for i in range(64)]

    def run(global_ba, out):
        cfg = _cfg(out, True, useBundleAdjustment=True, framesBatchSize=12,
                   BAMaxFramesCnt=8, BAUseHuberLossFunction=True,
                   BAHuberLossFunctionParameter=2.0,
                   requiredExtractedPointsCount=60,
                   requiredMatchedPointsCount=25)
        cfg = dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, global_ba=global_ba,
                                         max_keypoints=768))
        gd = slam_main(cfg, scene.K, frames=list(frames))
        est = camera_centers(gd.rotations, gd.positions)
        ids = (gd.frame_ids if len(gd.frame_ids) == len(est)
               else np.arange(len(est)))
        gt = scene.centers()[ids]
        ate = absolute_trajectory_error(est, gt)
        ext = np.linalg.norm(gt.max(0) - gt.min(0))
        return len(est), ate / ext

    n_off, rel_off = run(False, tmp_path_factory.mktemp("off"))
    n_on, rel_on = run(True, tmp_path_factory.mktemp("on"))
    assert n_on >= 48
    assert rel_on < 0.05, f"drift {rel_on:.3f} of extent (windowed-only {rel_off:.3f})"
    # no-harm, judged at materiality: the refine minimizes REPROJECTION cost
    # (reject-on-no-improvement guards that metric), so ATE may shift within
    # noise when the windowed trajectory is already deep under the bound —
    # observed ±0.3% relative flutter from platform-dependent float rounding.
    assert rel_on <= rel_off * 1.02 + 1e-5, (rel_on, rel_off)


def test_engine_host_descriptor_modes_e2e(rt_scene, tmp_path_factory):
    """Host-descriptor ingest (slow-link path): "orb" ships full-res cv2 ORB
    bits (Hamming matching, no image plane upload) and "hybrid" concatenates
    pooled-SIFT with α·bits into one L2 descriptor.  Both must track the
    whole sequence with ATE comparable to the all-device path."""
    import dataclasses

    for hd in ("orb", "hybrid"):
        cfg = _cfg(tmp_path_factory.mktemp(hd), True, useBundleAdjustment=True,
                   BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0)
        cfg = dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, ingest="host",
                                         ingest_downscale=1,
                                         host_descriptor=hd))
        frames = [rt_scene.render(i) for i in range(14)]
        gd = slam_main(cfg, rt_scene.K, frames=frames)
        assert len(gd.rotations) >= 10, hd
        est = camera_centers(gd.rotations, gd.positions)
        gt = rt_scene.centers()[gd.frame_ids]
        ate = absolute_trajectory_error(est, gt)
        ext = np.linalg.norm(gt.max(0) - gt.min(0))
        assert ate < 0.08 * ext, f"{hd}: ATE {ate/ext:.3f} of extent"


def test_host_orb_bits_roundtrip(rt_scene):
    """host_detect_pack(host_desc=...) returns packed ORB bits aligned with
    the keypoint slots; dropped border keypoints stay zero."""
    from slam_indoor_code_tpu.models.frontend import host_detect_pack

    frames = [rt_scene.render(0)]
    p = host_detect_pack(frames, 20.0, 256, 1, host_desc="orb")
    assert "gray_small" not in p          # no image plane for pure-orb
    assert p["desc_bits"].shape == (1, 256, 32)
    n_valid = int(p["valid"][0].sum())
    nz = (p["desc_bits"][0] != 0).any(axis=1)
    # most valid keypoints get a descriptor; none outside the valid range
    assert nz[:n_valid].mean() > 0.7
    assert not nz[n_valid:].any()
    ph = host_detect_pack(frames, 20.0, 256, 2, host_desc="hybrid")
    assert "gray_small" in ph and ph["desc_bits"].shape == (1, 256, 32)

def test_streaming_matches_classic_host_ingest(rt_scene, tmp_path_factory):
    """The streaming loop (device-held queue + in-scan BA flush,
    engine.run_streaming) must reproduce the classic per-window loop's
    scheduling decisions and accuracy on the same host-ingest workload.
    RANSAC keys map to steps differently across the two loops (the classic
    loop restarts a dispatch at each window boundary), so the contract is
    camera-for-camera schedule equality + matched ATE, not bitwise poses."""
    import dataclasses

    frames = [rt_scene.render(i) for i in range(14)]
    out = {}
    for name, stream in (("classic", False), ("stream", True)):
        cfg = _cfg(tmp_path_factory.mktemp(name), True,
                   useBundleAdjustment=True, BAMaxFramesCnt=4,
                   BAUseHuberLossFunction=True,
                   BAHuberLossFunctionParameter=2.0)
        cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(
            cfg.tpu, ingest="host", ingest_downscale=1, streaming=stream))
        gd = slam_main(cfg, rt_scene.K, frames=list(frames))
        est = camera_centers(gd.rotations, gd.positions)
        gt = rt_scene.centers()[[int(f) for f in gd.frame_ids]]
        ate = absolute_trajectory_error(est, gt)
        ext = np.linalg.norm(gt.max(0) - gt.min(0))
        out[name] = (gd, ate / ext)
    gd_c, rel_c = out["classic"]
    gd_s, rel_s = out["stream"]
    # identical frame schedule (same good-frame choices step for step)
    assert [int(f) for f in gd_s.frame_ids] == [int(f) for f in gd_c.frame_ids]
    assert rel_s < 0.05, f"streaming ATE {rel_s:.3f}"
    assert abs(rel_s - rel_c) < 0.02, (rel_s, rel_c)


def test_streaming_kill_and_resume_identical_tail(rt_scene, tmp_path):
    """Kill-and-resume determinism THROUGH THE STREAMING LOOP: mid-run
    checkpoints drain the in-flight dispatches to a settled device state, so
    a resumed run must be bitwise-identical to the uninterrupted one on
    every shared frame (same contract as the classic-loop test above)."""
    import dataclasses

    from slam_indoor_code_tpu.io.media import ArraySource

    # the streaming loop's admission budget legitimately runs ~40 frames
    # ahead of processed consumption (need + T*depth + staged prefetch), so
    # the kill must land deeper into the sequence than the classic test's
    # for checkpoints to precede it
    frames = [rt_scene.render(i % 14) for i in range(64)]
    base = _cfg(tmp_path / "a", True, useBundleAdjustment=True,
                BAMaxFramesCnt=4, BAUseHuberLossFunction=True,
                BAHuberLossFunctionParameter=2.0)
    base = dataclasses.replace(base, tpu=dataclasses.replace(
        base.tpu, ingest="host", ingest_downscale=1, streaming=True))
    gd_a = slam_main(base, rt_scene.K, frames=list(frames))

    class KilledSource(ArraySource):
        def __init__(self, frames, kill_after):
            super().__init__(frames)
            self._kill_after = kill_after

        def next_frame(self):
            if self._i >= self._kill_after:
                raise RuntimeError("simulated crash")
            return super().next_frame()

    ck = str(tmp_path / "run.npz")
    cfg_b1 = dataclasses.replace(
        base, outputDataDir=str(tmp_path / "b1"),
        tpu=dataclasses.replace(base.tpu, checkpoint_path=ck,
                                checkpoint_every=4))
    with pytest.raises(RuntimeError, match="simulated crash"):
        slam_main(cfg_b1, rt_scene.K,
                  frames=KilledSource(list(frames), kill_after=56))

    cfg_b2 = dataclasses.replace(
        base, outputDataDir=str(tmp_path / "b2"),
        tpu=dataclasses.replace(base.tpu, resume_path=ck))
    gd_b2 = slam_main(cfg_b2, rt_scene.K, frames=list(frames))

    assert len(gd_b2.rotations) > 0
    a_by_fid = {int(f): i for i, f in enumerate(gd_a.frame_ids)}
    matched = 0
    for j, fid in enumerate(gd_b2.frame_ids):
        if int(fid) in a_by_fid:
            i = a_by_fid[int(fid)]
            np.testing.assert_allclose(gd_b2.rotations[j], gd_a.rotations[i],
                                       atol=1e-5)
            np.testing.assert_allclose(gd_b2.positions[j], gd_a.positions[i],
                                       atol=1e-4)
            matched += 1
    assert matched >= 6
    assert max(int(f) for f in gd_b2.frame_ids) == max(
        int(f) for f in gd_a.frame_ids)


def test_per_frame_telemetry_mode(rt_scene, tmp_path):
    """tpu.per_frame_telemetry runs the classic loop with ONE-step
    dispatches: every "Matching time for index N" line in time.txt is a
    true per-dispatch measurement (VERDICT r3 #9; batch.cpp:155-157).  The
    trajectory must match the fused default loop's (same scheduling rule,
    just finer dispatch granularity)."""
    import dataclasses

    frames = [rt_scene.render(i) for i in range(14)]
    cfg = _cfg(tmp_path, True, useBundleAdjustment=True, BAMaxFramesCnt=4,
               BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0)
    cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(
        cfg.tpu, ingest="host", ingest_downscale=1,
        per_frame_telemetry=True))
    gd = slam_main(cfg, rt_scene.K, frames=list(frames))
    assert len(gd.rotations) >= 10
    lines = [ln for ln in (tmp_path / "time.txt").read_text().splitlines()
             if ln.startswith("Matching time for index")]
    # one line per tracked step (accepted frames beyond the bootstrap pair)
    assert len(lines) >= len(gd.rotations) - 2


def test_video_source_end_to_end(rt_scene, tmp_path):
    """usePhotosCycle=false + videoSourcePath (the reference's primary
    mode, defineMediaSources → cv::VideoCapture): encode the synthetic
    sequence to a video file, run the full pipeline off it, and match the
    photo-cycle run's camera count and accuracy class."""
    import cv2
    import dataclasses

    frames = [rt_scene.render(i) for i in range(14)]
    h, w = frames[0].shape[:2]
    path = str(tmp_path / "seq.avi")
    # MJPG-in-AVI encodes headlessly everywhere; lossy, so accuracy is
    # asserted at the class level, not bitwise vs the photo run
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (w, h))
    assert vw.isOpened()
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()

    cfg = _cfg(tmp_path / "out", True, useBundleAdjustment=True,
               BAMaxFramesCnt=4, BAUseHuberLossFunction=True,
               BAHuberLossFunctionParameter=2.0)
    cfg = dataclasses.replace(cfg, usePhotosCycle=False,
                              videoSourcePath=path,
                              outputDataDir=str(tmp_path / "out"))
    (tmp_path / "out").mkdir(exist_ok=True)
    gd = slam_main(cfg, rt_scene.K)
    assert len(gd.rotations) >= 10
    est = camera_centers(gd.rotations, gd.positions)
    gt = rt_scene.centers()[[int(f) for f in gd.frame_ids]]
    ate = absolute_trajectory_error(est, gt)
    ext = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate / ext < 0.08, f"video-path ATE {ate/ext:.3f}"


def test_streaming_track_loss_restart(rt_scene, tmp_path):
    """Track loss + restart THROUGH the streaming loop: black frames kill
    the scan mid-sequence, the app's restart do-while re-bootstraps with
    the carried pose, and the device queue re-initializes from the host
    mirror (zombie in-flight dispatches from before the death must not
    corrupt the restarted sub-map)."""
    import dataclasses

    frames = [rt_scene.render(i) for i in range(7)]
    frames += [np.zeros_like(frames[0])] * 3
    frames += [rt_scene.render(i) for i in range(7, 14)]
    cfg = _cfg(tmp_path, True)
    cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(
        cfg.tpu, ingest="host", ingest_downscale=1, streaming=True))
    gd = slam_main(cfg, rt_scene.K, frames=frames)
    assert len(gd.rotations) >= 10
    assert len(gd.points) > 150


def test_advance_stream_idle_steps_do_not_latch_dead(rt_scene):
    """An advance_stream dispatch whose steps IDLE (queue below the
    visible-lane floor while ingest catches up, tail=False) must come back
    with dead=False and zero consumption — the found=0 of an idle step is
    not a scan failure.  Regression: `alive &= found` latched the
    persistent dead flag with no failure row, and every later dispatch
    no-op'd while the host kept feeding the queue (a permanent
    empty-dispatch spin on ≥256-frame runs)."""
    import jax
    import jax.numpy as jnp

    from slam_indoor_code_tpu.runtime import DeviceEngine, EngineConfig
    from slam_indoor_code_tpu.runtime import steps
    from slam_indoor_code_tpu.io.media import ArraySource

    frames = [rt_scene.render(i) for i in range(4)]
    cfg = EngineConfig(max_keypoints=256, ring=12, map_cap=2048, window=4,
                       window_points=2048, threshold=20.0,
                       required_matched=30, ransac_iters=128, pnp_iters=64,
                       ingest_mode="host", ingest_downscale=1,
                       host_desc="hybrid")
    eng = DeviceEngine(ArraySource(frames), rt_scene.K, cfg,
                       batch_size=6, required_extracted=50)
    cfg = eng.cfg  # engine-resolved (ring headroom etc.)
    T = cfg.window
    queue = jnp.zeros((cfg.ring,), jnp.int32)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(T)])
    # q_len=3 < visible=6 and tail=False: every step must idle
    (state, q_head, q_len, win_fill, dead, packed, ba_vec, _ox, _oc) = \
        steps.advance_stream(
            cfg, eng.state, queue, jnp.zeros((), jnp.int32),
            jnp.asarray(3, jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), keys, T, visible=6,
            tail=jnp.asarray(False))
    packed = np.asarray(packed)
    assert not bool(np.asarray(dead)), "idle steps must not latch dead"
    assert int(np.asarray(q_len)) == 3, "idle steps must consume nothing"
    assert (packed[:, 0] < 0.5).all(), "all steps idle below the floor"
    # same dispatch with tail=True runs (short window is legal at the tail)
    (_s, _qh, q_len2, _wf, dead2, packed2, _b, _ox2, _oc2) = \
        steps.advance_stream(
            cfg, state, queue, q_head, jnp.asarray(3, jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((), bool), keys, T,
            visible=6, tail=jnp.asarray(True))
    assert np.asarray(packed2)[0, 0] > 0.5, "tail dispatch must step"


def test_window2_falls_back_to_classic_loop(rt_scene, tmp_path):
    """BAMaxFramesCnt=2 must not livelock the streaming loop: the bootstrap
    pair fills the window completely (win_fill=2) and advance_stream steps
    gate on win_pos < window with no flush-on-entry — every step would idle
    and run_streaming would re-dispatch empty windows forever.  The engine
    routes window<=2 to the classic loop (which flushes at its loop top)."""
    from slam_indoor_code_tpu.runtime import DeviceEngine, EngineConfig
    from slam_indoor_code_tpu.io.media import ArraySource

    cfg2 = EngineConfig(max_keypoints=256, window=2, ingest_mode="host",
                        streaming=True)
    eng = DeviceEngine(ArraySource([rt_scene.render(0)]), rt_scene.K, cfg2,
                       batch_size=4, required_extracted=50)
    assert not eng._will_stream, "window<=2 must use the classic loop"
    # and the full product path completes with BA flushing every 2 frames
    gd, rel = _run(rt_scene, tmp_path, True, useBundleAdjustment=True,
                   BAMaxFramesCnt=2, BAUseHuberLossFunction=True,
                   BAHuberLossFunctionParameter=2.0)
    assert len(gd.rotations) >= 10
    assert rel < 0.06, f"window=2 ATE {rel:.3f}"


def test_adaptive_threshold_lowers_and_recovers(rt_scene):
    """Adaptive extraction gate (engine._adapt_threshold): sagging post-NMS
    corner counts lower the host FAST threshold (bounded at 1/4 of the
    configured value, logged); recovered counts raise it back, never above
    the configured value; healthy counts leave it untouched."""
    import io

    from slam_indoor_code_tpu.runtime import DeviceEngine, EngineConfig
    from slam_indoor_code_tpu.io.media import ArraySource

    class _Logs:
        def __init__(self):
            self.main = io.StringIO()

    cfg = EngineConfig(max_keypoints=256, threshold=20.0, ingest_mode="host",
                       adaptive_threshold=True)
    eng = DeviceEngine(ArraySource([rt_scene.render(0)]), rt_scene.K, cfg,
                       batch_size=4, required_extracted=100)
    eng.logs = _Logs()
    # healthy chunk: no change
    eng._adapt_threshold(np.array([400, 380, 395]))
    assert eng._fast_threshold == 20.0
    # sparse chunks: lower, bounded at threshold/4
    for _ in range(12):
        eng._adapt_threshold(np.array([40, 35, 50]))
    assert eng._fast_threshold == eng._fast_floor == 5.0
    assert "Adaptive FAST threshold" in eng.logs.main.getvalue()
    # rich chunks (well above 4x required): raised back, capped at configured
    for _ in range(12):
        eng._adapt_threshold(np.array([900, 950, 880]))
    assert eng._fast_threshold == 20.0
    # disabled knob: no adaptation at all
    cfg_off = EngineConfig(max_keypoints=256, threshold=20.0,
                           ingest_mode="host", adaptive_threshold=False)
    eng2 = DeviceEngine(ArraySource([rt_scene.render(0)]), rt_scene.K,
                        cfg_off, batch_size=4, required_extracted=100)
    eng2._adapt_threshold(np.array([10, 10, 10]))
    assert eng2._fast_threshold == 20.0


def test_head_tie_tolerance_prefers_head():
    """head_tie_tolerance: strict rule (0.0) picks the head-most MAX; with a
    tolerance the head competes when within tol of the best (the audited
    near-tie skips: 1099 vs 1103).  Host scheduler and device _select_good
    agree."""
    import jax.numpy as jnp

    from slam_indoor_code_tpu.pipeline.batch import BatchScheduler
    from slam_indoor_code_tpu.runtime import EngineConfig
    from slam_indoor_code_tpu.runtime.steps import _select_good

    def host_pick(tol, counts):
        s = BatchScheduler.__new__(BatchScheduler)
        s.skip_from_head = 0
        s.required_matched = 30
        s.use_first_fit = False
        s.head_tie_tolerance = tol
        return s._select(np.asarray(counts))

    counts = [1099, 1103, 900]
    assert host_pick(0.0, counts) == 1       # strict: best wins
    assert host_pick(0.005, counts) == 0     # within 0.5%: head wins
    assert host_pick(0.005, [1000, 1103, 900]) == 1  # outside tol: best wins

    for tol, expect in [(0.0, 1), (0.005, 0)]:
        cfg = EngineConfig(head_tie_tolerance=tol, required_matched=30)
        eligible = jnp.asarray([True, True, True])
        got = int(_select_good(cfg, eligible,
                               jnp.asarray(counts, jnp.int32),
                               jnp.arange(3, dtype=jnp.int32)))
        assert got == expect, (tol, got)
    # non-eligible lanes can never win even with a huge count
    cfg = EngineConfig(head_tie_tolerance=0.0, required_matched=30)
    got = int(_select_good(cfg, jnp.asarray([False, True, False]),
                           jnp.asarray([5000, 100, 40], jnp.int32),
                           jnp.arange(3, dtype=jnp.int32)))
    assert got == 1


def test_restart_rebind_rescues_scale(rt_scene):
    """Restart-boundary re-binding (steps.bootstrap_step): at a track-loss
    restart the new first frame re-binds to the RETAINED map and the
    bootstrap baseline is rescaled from the matched depth ratios — the
    |t_rel|=1 re-seeding otherwise gives the new sub-map an arbitrary
    monocular scale (measured: a 43-unit teleport at a 384-frame corridor
    restart).  This drives the restart path directly with a DOUBLE-length
    restart baseline and asserts the consensus scale tracks the map's own
    local step scale."""
    import jax.numpy as jnp
    import jax.random as jr

    from slam_indoor_code_tpu.io.media import ArraySource
    from slam_indoor_code_tpu.metrics.ate import camera_centers
    from slam_indoor_code_tpu.models import frontend as fe
    from slam_indoor_code_tpu.runtime import DeviceEngine, EngineConfig, steps
    from slam_indoor_code_tpu.testing import make_scene

    scene = make_scene(n_points=900, n_frames=48, seed=5, baseline=0.3)
    cfg = EngineConfig(max_keypoints=512, ransac_iters=256, pnp_iters=128,
                      window_points=4096, rebind_cap=4096,
                      required_matched=30, ratio=0.8,
                      distance_threshold=500.0, use_ba=True, window=6,
                      ba_loss="huber", ba_loss_param=2.0, ba_iters=12)
    eng = DeviceEngine(ArraySource([scene.render(i) for i in range(12)]),
                       scene.K, cfg, batch_size=6, required_extracted=80)
    r = eng.run(np.eye(3), np.zeros(3))
    assert r["status"] == "video_over" and int(eng.state.map_count) > 200
    carried_R = np.asarray(eng.state.pose_R)
    carried_t = np.asarray(eng.state.pose_t)
    # the map's own LOCAL step scale at the boundary (map units per frame;
    # median over the last few steps — single monocular steps are noisy)
    c = camera_centers(np.stack(eng.trajectory_R), np.stack(eng.trajectory_t))
    d_est = np.linalg.norm(np.diff(c, axis=0), axis=1)
    last_step = float(np.median(d_est[-4:]))

    # simulated restart: first frame = scene 12 (adjacent to the carried
    # pose), second = scene 14 — a restart pair spanning TWO true steps
    gray, small = fe.pack_frames([scene.render(12), scene.render(14)],
                                 cfg.color_downscale)
    slots = jnp.asarray(np.array(eng._free[:2], np.int32))
    eng.state, counts = steps.ingest(eng.cfg, eng.state, jnp.asarray(gray),
                                     jnp.asarray(small), slots)
    eng.state = steps.set_prev_from_slot(
        eng.cfg, eng.state, slots[0], jnp.asarray(carried_R, jnp.float32),
        jnp.asarray(carried_t, jnp.float32))
    B = eng.batch_size + max(eng.cfg.fill_chunk, eng.cfg.window)
    order = np.zeros(B, np.int32)
    order[0] = int(slots[1])
    omask = np.zeros(B, bool)
    omask[0] = True
    train_all, mask_all, info, cnts = steps.match_select(
        eng.cfg, eng.state, jnp.asarray(order), jnp.asarray(omask))
    assert int(np.asarray(cnts)[0]) >= 30

    # bootstrap_step donates its state operand: keep copies so both the
    # knob-on and knob-off variants see the identical input state
    import jax as _jax

    keep = _jax.tree_util.tree_map(lambda x: jnp.array(x), eng.state)
    state2, out = steps.bootstrap_step(eng.cfg, eng.state, slots[1],
                                       train_all[0], mask_all[0],
                                       jr.PRNGKey(0))
    out = np.asarray(out)
    scale_s, n_bind = float(out[17]), int(out[18])
    assert n_bind >= 20, f"only {n_bind} restart binds"
    # consensus scale == the restart step in map units (|t_rel| = 1); it
    # must track ~2x the map's own local per-frame step
    # generous band: the BA-off gauge wobble of short monocular runs is
    # real; what matters is that the scale is MEASURED from the retained
    # map (two true steps of the map's local gauge), not re-seeded at 1
    expect = 2.0 * last_step
    assert abs(scale_s - expect) < 0.5 * expect, (scale_s, expect)
    # shared landmarks are NOT duplicated: bound rows are excluded from
    # the append, so strictly fewer landmarks are created than chirality
    # alone would admit (binds also cover non-chirality rows, so the two
    # counts don't decompose exactly)
    chir, n_new = int(out[1]), int(out[3])
    assert n_new < chir, (n_new, chir, n_bind)
    # and the actual restart camera lands ~2 local steps from the boundary
    R2 = out[5:14].reshape(3, 3)
    t2 = out[14:17]
    c_prev = -carried_R.T @ carried_t
    c_new = -R2.T @ t2
    step = float(np.linalg.norm(c_new - c_prev))
    assert abs(step - expect) < 0.5 * expect, (step, expect)

    # knob off: reference behaviour (s = 1, nothing shared)
    import dataclasses

    cfg_off = dataclasses.replace(eng.cfg, restart_rebind=False)
    _s, out_off = steps.bootstrap_step(cfg_off, keep, slots[1],
                                       train_all[0], mask_all[0],
                                       jr.PRNGKey(0))
    out_off = np.asarray(out_off)
    assert out_off[17] == 1.0 and out_off[18] == 0


def test_pose_jump_gate_rejects_teleport(rt_scene):
    """The pose-jump gate (tpu.pose_jump_gate): a PnP pose far beyond the
    EMA motion scale is rejected (frame not accepted, pose untouched);
    gate=0 disables; a fresh EMA (0) leaves the gate open.  Driven through
    _track_core by shrinking the engine's step EMA under a normal step."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from slam_indoor_code_tpu.io.media import ArraySource
    from slam_indoor_code_tpu.models import frontend as fe
    from slam_indoor_code_tpu.runtime import DeviceEngine, EngineConfig, steps

    cfg = EngineConfig(max_keypoints=512, ransac_iters=256, pnp_iters=128,
                      window_points=4096, rebind_cap=0,
                      required_matched=30, ratio=0.8,
                      distance_threshold=500.0, use_ba=False)
    frames = [rt_scene.render(i) for i in range(8)]
    eng = DeviceEngine(ArraySource(frames), rt_scene.K, cfg, batch_size=6,
                       required_extracted=80)
    r = eng.run(np.eye(3), np.zeros(3))
    assert r["status"] == "video_over" and len(r["global_data"].rotations) == 8

    # stage one more frame and track it under a poisoned (tiny) EMA: the
    # normal ~1-map-unit step now reads as a >32x teleport and must reject
    gray, small = fe.pack_frames([rt_scene.render(8)], cfg.color_downscale)
    gray = np.repeat(gray, cfg.fill_chunk, 0)
    small = np.repeat(small, cfg.fill_chunk, 0)
    slots = jnp.asarray(np.array(eng._free[:cfg.fill_chunk], np.int32))
    eng.state, _ = steps.ingest(eng.cfg, eng.state, jnp.asarray(gray),
                                jnp.asarray(small), slots)
    B = eng.batch_size + max(eng.cfg.fill_chunk, eng.cfg.window)
    order = np.zeros(B, np.int32)
    order[0] = int(slots[0])
    omask = np.zeros(B, bool)
    omask[0] = True
    train_all, mask_all, info, cnts = steps.match_select(
        eng.cfg, eng.state, jnp.asarray(order), jnp.asarray(omask))
    assert int(np.asarray(cnts)[0]) >= 30

    def track(state, c):
        keep = jax.tree_util.tree_map(jnp.array, state)
        s2, out = steps.track_step(c, keep, slots[0], train_all, mask_all,
                                   jnp.asarray(0), jnp.asarray(0, jnp.int32),
                                   jr.PRNGKey(1))
        return s2, np.asarray(out)

    poisoned = eng.state._replace(step_ema=jnp.asarray(1e-5, jnp.float32))
    _s, out = track(poisoned, eng.cfg)
    assert out[0] < 0.5, "teleporting step must be rejected"
    # pose untouched on rejection
    np.testing.assert_array_equal(np.asarray(_s.pose_t),
                                  np.asarray(eng.state.pose_t))
    # gate off: the same step is accepted
    cfg_off = dataclasses.replace(eng.cfg, pose_jump_gate=0.0)
    _s2, out2 = track(poisoned, cfg_off)
    assert out2[0] > 0.5
    # fresh EMA (0 = no history): gate open, accepted
    fresh = eng.state._replace(step_ema=jnp.zeros((), jnp.float32))
    _s3, out3 = track(fresh, eng.cfg)
    assert out3[0] > 0.5
