"""Application driver: the ``slamMain`` + ``main`` equivalent.

Mirrors src/main.cpp: dispatch to calibration / onlyViz-reload / SLAM; the
SLAM path runs the restart loop — when a cycle loses track it relaunches with
the last good pose carried over, and sub-map results are concatenated
(src/main.cpp:76-115, do-while at :89-101).
"""

from __future__ import annotations

import numpy as np

from .config import Config
from .io.logs import GlobalData, LogStreams, load_global_data_from_logs
from .io.media import ArraySource, MediaSource
from .io.xmlio import load_matrix_from_xml
from .models import frontend as fe
from .pipeline.main_cycle import CycleSettings, MainCycle
from .pipeline.structures import MapArena
from .solver.ba import WindowedBA
from .utils.timer import ChronoTimer


def make_media(cfg: Config, frames=None):
    if frames is not None:
        if hasattr(frames, "next_frame"):
            return frames  # an already-built MediaSource-compatible source
        return ArraySource(frames)
    return MediaSource(
        photos_pattern=cfg.photosPathPattern,
        video_path=cfg.videoSourcePath,
        use_photos=cfg.usePhotosCycle,
        threads=max(1, cfg.threadsCount),
    )


def load_calibration(cfg: Config) -> tuple[np.ndarray, np.ndarray]:
    """K and distortion coefficients from the configured XML
    (defineCalibrationMatrix, cameraCalibration.cpp:34-37 +
    defineDistortionCoeffs, mainCycleInternals.cpp:68-75)."""
    K = load_matrix_from_xml(cfg.calibrationPath, "K")
    try:
        dc = load_matrix_from_xml(cfg.calibrationPath, "DC").reshape(-1)
    except KeyError:
        dc = np.zeros(5)
    return K.astype(np.float64), dc.astype(np.float64)


def _load_dist(cfg: Config):
    """DC coefficients for useUndistortion (mainCycleInternals.cpp:68-75);
    None when disabled or the calibration has no DC entry."""
    if not (cfg.useUndistortion and cfg.calibrationPath):
        return None
    try:
        return load_matrix_from_xml(cfg.calibrationPath, "DC").reshape(-1)
    except Exception:
        return None


def slam_main(cfg: Config, K: np.ndarray, frames=None, seed: int = 0) -> GlobalData:
    """Run the full SLAM pipeline with restart-on-track-loss.

    ``frames``: optional in-memory frame list (tests/bench); otherwise media
    comes from the config.  Returns the accumulated GlobalData and writes the
    reference-format txt logs to cfg.outputDataDir.

    Two execution paths with identical semantics:
    - device-resident engine (default): all state on the accelerator, one
      tiny status download per frame — the performance path;
    - classic host conductor (tpu.device_runtime=false): the readable
      reference implementation."""
    if cfg.tpu.device_runtime:
        return _slam_main_device(cfg, K, frames=frames, seed=seed)
    timer = ChronoTimer()
    logs = LogStreams(cfg.outputDataDir)
    media = make_media(cfg, frames)
    fcfg = fe.frontend_config_from(cfg)
    settings = CycleSettings.from_config(cfg)
    arena = MapArena(cfg.tpu.max_map_points)

    ba_fn = None
    if cfg.useBundleAdjustment:
        loss, param = cfg.ba_loss
        ba_fn = WindowedBA(
            loss=loss, loss_param=param, max_iters=cfg.tpu.ba_max_iters,
            window=cfg.BAMaxFramesCnt, window_points=cfg.tpu.window_points,
            report=logs.main, adjust_intrinsics=cfg.tpu.ba_adjust_intrinsics,
        )

    global_data = GlobalData()
    cycle = MainCycle(media, K, settings, fcfg, arena, logs=logs, ba_fn=ba_fn,
                      seed=seed, dist=_load_dist(cfg))

    init_R, init_t = np.eye(3), np.zeros(3)
    launch = 0
    while True:
        logs.main.write(f"Launching main cycle...\n")
        result = cycle.run(init_R, init_t)
        global_data.extend(result["global_data"])
        launch += 1
        if result["status"] != "interrupted" or result["last_frame"] is None:
            break
        # restart with pose carry-over (defineCameraPosition,
        # mainCycleInternals.cpp:122-133)
        init_R = result["last_frame"].rotation
        init_t = result["last_frame"].motion
        if cycle.scheduler.media_exhausted:
            break

    pts, cols = arena.snapshot()
    global_data.points = pts
    global_data.colors = cols.astype(np.float64)
    logs.write_map(pts, cols)

    if global_data.empty:
        logs.main.write("Couldn't process image sequence. Too little data.\n")
    timer.print_start_delta("Whole time: ", logs.time)
    logs.close()
    return global_data


def _global_refine(engine, gd: GlobalData, logs, cfg: Config):
    """Final full-trajectory BA over every flushed camera + its window
    observations (solver/global_ba.py — matrix-free LM-PCG; no reference
    counterpart: the reference stops at its Ceres windows, which is why its
    long monocular runs keep their scale drift).  Updates ``gd`` poses in
    place and returns the refined landmark table (or None)."""
    import cv2
    import jax.numpy as jnp

    from .solver.global_ba import GlobalBAConfig, global_bundle_adjust

    obs = engine.global_observations()
    N = len(gd.rotations)
    if not obs or N < 12:
        return None
    # -1 placeholder frame ids (short windows / unknown slots) must not key
    # the camera map: duplicate -1 keys would collapse onto one camera and
    # attach another window's observations to it
    fid2idx = {int(f): i for i, f in enumerate(gd.frame_ids) if int(f) >= 0}
    Kslots = engine.cfg.max_keypoints
    rows, uv_l, pid_l = [], [], []
    for xy, corr, ids in obs:
        for r_i, fid in enumerate(ids):
            ci = fid2idx.get(int(fid), -1)
            if ci < 0:
                continue
            m = corr[r_i] >= 0
            sel = np.flatnonzero(m)
            rows.append(np.full(len(sel), ci, np.int32))
            uv_l.append(xy[r_i][sel])
            pid_l.append(corr[r_i][sel])
    if not rows:
        return None
    ci = np.concatenate(rows)
    uv = np.concatenate(uv_l).astype(np.float32)
    pid = np.concatenate(pid_l).astype(np.int32)
    O = len(ci)
    Opad = -(-O // 4096) * 4096  # bucketed shape: one compile across runs
    padn = Opad - O
    uv = np.concatenate([uv, np.zeros((padn, 2), np.float32)])
    ci = np.concatenate([ci, np.zeros(padn, np.int32)])
    pid = np.concatenate([pid, np.zeros(padn, np.int32)])
    mask = np.concatenate([np.ones(O, bool), np.zeros(padn, bool)])

    Npad = -(-N // 16) * 16
    cams6 = np.zeros((Npad, 6), np.float32)
    for i in range(N):
        aa, _ = cv2.Rodrigues(np.asarray(gd.rotations[i], np.float64))
        cams6[i, :3] = aa.ravel()
        cams6[i, 3:] = gd.positions[i]

    loss, param = cfg.ba_loss
    gcfg = GlobalBAConfig(loss=loss, loss_param=float(param),
                          max_iters=cfg.tpu.global_ba_iters,
                          cg_iters=cfg.tpu.global_ba_cg_iters)
    t0 = ChronoTimer()
    # Solve over the LIVE landmarks only (bucketed static slice), not the
    # full map arena: every per-point vector and segment_sum in the LM/CG
    # loop scales with the point table (the arena is 262k slots vs ~5k live
    # landmarks — a measured ~6 s solve is mostly arena-width scatters).
    n_pts = int(np.asarray(engine.state.map_count))
    Pcap = max(-(-n_pts // 4096) * 4096, 4096)
    pts_dev = engine.state.map_points[:Pcap]
    camsf, ptsf, info = global_bundle_adjust(
        gcfg, engine.state.K4, jnp.asarray(cams6), pts_dev,
        jnp.asarray(uv), jnp.asarray(ci), jnp.asarray(pid),
        jnp.asarray(mask))
    camsf = np.asarray(camsf, np.float64)
    # slice on device before downloading — only the live landmarks travel
    # over the relay link
    ptsf = np.asarray(ptsf[:n_pts], np.float64)
    rmse0 = float(np.asarray(info["initial_rmse"]))
    rmse1 = float(np.asarray(info["final_rmse"]))
    logs.main.write(
        "Global Bundle Adjustment statistics (approximated RMSE):\n"
        f" #residuals: {int(np.asarray(info['num_residuals']))}\n"
        f" #cameras: {N}\n"
        f" Initial RMSE: {rmse0:.6f}\n"
        f" Final RMSE: {rmse1:.6f}\n")
    t0.print_start_delta("Global bundle adjustment: ", logs.time)
    # Safety valve: the LM loop accepts steps only on cost decrease, so the
    # final RMSE cannot exceed the initial one on the SAME problem — but a
    # degenerate observation record (near-empty, or all-outlier) can leave
    # RMSE flat while the gauge slides.  Reject the refinement outright when
    # it failed to improve the reprojection error; the windowed trajectory is
    # then the final answer (exceeds bundleAdjustment.cpp:122-127, which
    # never validates its own windows).
    if not np.isfinite(rmse1) or rmse1 >= rmse0:
        logs.main.write("Global BA rejected (no RMSE improvement)\n")
        return None
    for i in range(N):
        R, _ = cv2.Rodrigues(camsf[i, :3])
        gd.rotations[i] = R
        gd.positions[i] = camsf[i, 3:]
    return ptsf


def _slam_main_device(cfg: Config, K: np.ndarray, frames=None,
                      seed: int = 0) -> GlobalData:
    """slam_main on the device-resident runtime (runtime/engine.py)."""
    from .runtime import DeviceEngine, EngineConfig

    timer = ChronoTimer()
    logs = LogStreams(cfg.outputDataDir)
    media = make_media(cfg, frames)
    ecfg = EngineConfig.from_config(cfg)
    dist = _load_dist(cfg)
    use_global_ba = cfg.useBundleAdjustment and cfg.tpu.global_ba
    engine = DeviceEngine(
        media, K, ecfg,
        batch_size=cfg.framesBatchSize,
        required_extracted=cfg.requiredExtractedPointsCount,
        logs=logs, seed=seed, dist=dist,
        checkpoint_path=cfg.tpu.checkpoint_path or None,
        checkpoint_every=cfg.tpu.checkpoint_every,
        collect_global_obs=use_global_ba,
    )

    resume = False
    global_data = GlobalData()
    if cfg.tpu.resume_path:
        from .runtime import checkpoint_next_fid, load_checkpoint

        load_checkpoint(cfg.tpu.resume_path, engine)
        # the snapshot's media cursor: everything consumed before it is
        # skipped; in-flight frames re-pull deterministically (checkpoint.py)
        for _ in range(checkpoint_next_fid(cfg.tpu.resume_path)):
            media.next_frame()
        # re-emit the pre-kill (post-BA) trajectory: a resumed run's output
        # is the FULL run's output, and pre-kill poses are logged again so
        # poses.txt / onlyViz reload stay complete
        if engine.flushed_R:
            global_data.append_cameras(
                np.stack(engine.flushed_R), np.stack(engine.flushed_t),
                list(engine.flushed_ids))
            for R, t in zip(engine.flushed_R, engine.flushed_t):
                logs.write_pose(np.asarray(R, np.float64).reshape(3, 3),
                                np.asarray(t, np.float64).reshape(3))
        resume = True
        logs.main.write(
            f"Resumed from {cfg.tpu.resume_path} at "
            f"{engine.frames_accepted} frames\n")
    init_R, init_t = np.eye(3), np.zeros(3)
    profiler = None
    if cfg.tpu.profile_dir:
        # per-stage device-time breakdown (SURVEY.md §5.1): every jitted step
        # is annotated by its function name in the trace; open the dump with
        # TensorBoard's profile plugin or Perfetto
        import jax as _jax

        profiler = _jax
        profiler.profiler.start_trace(cfg.tpu.profile_dir)
        logs.main.write(f"Profiling device trace to {cfg.tpu.profile_dir}\n")
    while True:
        logs.main.write("Launching main cycle...\n")
        result = engine.run(init_R, init_t, resume=resume)
        resume = False
        global_data.extend(result["global_data"])
        if result["status"] != "interrupted" or result["last_pose"] is None:
            break
        init_R, init_t = result["last_pose"]
        if engine.media_exhausted:
            break

    refined_pts = None
    if use_global_ba:
        refined_pts = _global_refine(engine, global_data, logs, cfg)
    pts, cols = engine.snapshot_map()
    if profiler is not None:
        profiler.profiler.stop_trace()
    if refined_pts is not None and len(refined_pts) == len(pts):
        pts = refined_pts
    global_data.points = pts
    global_data.colors = cols.astype(np.float64)
    logs.write_map(pts, cols)
    if global_data.empty:
        logs.main.write("Couldn't process image sequence. Too little data.\n")
    timer.print_start_delta("Whole time: ", logs.time)
    logs.close()
    return global_data


def run_from_config(cfg: Config, frames=None) -> GlobalData:
    """Top-level dispatch (main, src/main.cpp:28-74)."""
    if cfg.calibrate:
        from .calibration.chessboard import main_calibration_entry_point

        main_calibration_entry_point(cfg)
        return GlobalData()
    if cfg.onlyViz:
        return load_global_data_from_logs(cfg.outputDataDir)
    K, _dc = load_calibration(cfg)
    return slam_main(cfg, K, frames=frames)


def run_sequences_parallel(cfgs: list, Ks: list, frames_list: list | None = None,
                           seeds: list | None = None) -> list:
    """Multi-sequence data parallelism: run independent sequences
    concurrently, one device per sequence (BASELINE config #5 at single-host
    scale; across hosts each process runs its own shard of sequences and the
    DCN never sees per-frame traffic — sequences are embarrassingly
    parallel, exactly like the reference's independent sub-maps).

    Each worker pins its engine's arrays to a device via
    ``jax.default_device``; results are the per-sequence GlobalData."""
    import threading

    import jax as _jax

    devs = _jax.devices()
    n = len(cfgs)
    results: list = [None] * n
    errors: list = [None] * n

    def worker(i):
        try:
            with _jax.default_device(devs[i % len(devs)]):
                frames = frames_list[i] if frames_list else None
                seed = seeds[i] if seeds else i
                results[i] = slam_main(cfgs[i], Ks[i], frames=frames, seed=seed)
        except Exception as e:  # noqa: BLE001 — surface per-sequence failures
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, e in enumerate(errors):
        if e is not None:
            raise RuntimeError(f"sequence {i} failed") from e
    return results
