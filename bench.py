"""Headline benchmark: end-to-end SLAM frames/s on one TPU chip.

Baseline (BASELINE.md): the reference pipeline processes its FHD indoor
sequence at ≈3 frames/s on CPU (71.2 s whole run) and ≈10 frames/s with the
CUDA matcher.  ``vs_baseline`` reports our frames/s over the 3 fps CPU
anchor; the rebuild target is ≥10×.

Protocol: a synthetic FHD (1080×1920) indoor-like sequence is rendered on the
host, then the full pipeline (FAST → SIFT → batch matching → PnP-RANSAC →
triangulation → map merge, windowed Huber BA every 8 frames) runs end-to-end.
A short warm-up run triggers all jit compilations (the reference's timings
exclude build time too); the measured run starts with a cold map like the
reference's.

Prints exactly ONE JSON line on stdout.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_frames(n_frames: int, image_size=(1080, 1920), seed=7):
    from slam_indoor_code_tpu.testing import make_scene

    scene = make_scene(
        n_points=1500, n_frames=n_frames, image_size=image_size, seed=seed,
        baseline=0.25, kind="hallway",
    )
    log(f"rendering {n_frames} frames {image_size} ...")
    frames = [scene.render(i) for i in range(n_frames)]
    return scene, frames


def run_pipeline(scene, frames, outdir, ba=True):
    from slam_indoor_code_tpu.app import slam_main
    from slam_indoor_code_tpu.config import Config, TpuConfig

    cfg = Config(
        usePhotosCycle=True,
        outputDataDir=outdir,
        requiredExtractedPointsCount=300,
        featureExtractingThreshold=20,
        framesBatchSize=16,
        requiredMatchedPointsCount=80,
        knnMatcherDistance=0.8,
        RPDistanceThreshold=500.0,
        useBundleAdjustment=ba,
        BAMaxFramesCnt=8,
        BAUseHuberLossFunction=True,
        BAHuberLossFunctionParameter=2.0,
        tpu=TpuConfig(max_keypoints=2048, ransac_iters=1024,
                      pnp_ransac_iters=128, window_points=4096,
                      ba_max_iters=15),
    )
    return slam_main(cfg, scene.K, frames=frames), cfg


def main():
    os.makedirs("/tmp/bench_out", exist_ok=True)
    import jax

    log("devices:", jax.devices())

    # 128 frames: closer to the reference's own ~210-frame run, so the fixed
    # bootstrap cost (first batch upload before anything can overlap) is
    # weighted as it would be in a real sequence.
    n_frames = int(os.environ.get("BENCH_FRAMES", "128"))
    size = tuple(int(x) for x in os.environ.get("BENCH_SIZE", "1080x1920").split("x"))
    scene, frames = build_frames(n_frames, image_size=size)

    # Warm-up: full-coverage — run the entire measured workload once so every
    # program (all T-step variants, final-flush BA, snapshot) is compiled
    # before measurement.  A short-prefix warm-up leaves late-run programs
    # compiling inside the measured window and under-reports throughput by
    # ~3x through the remote-compile tunnel.  (The reference's timings also
    # exclude build time.)
    log("warm-up (compilation) ...")
    t0 = time.perf_counter()
    run_pipeline(scene, frames, "/tmp/bench_out/warm")
    log(f"warm-up took {time.perf_counter() - t0:.1f}s")

    # Measured end-to-end run.
    t0 = time.perf_counter()
    gd, cfg = run_pipeline(scene, frames, "/tmp/bench_out/run")
    elapsed = time.perf_counter() - t0
    fps = n_frames / elapsed

    # Sanity: the run must actually have reconstructed the sequence.
    from slam_indoor_code_tpu.metrics import absolute_trajectory_error
    from slam_indoor_code_tpu.metrics.ate import camera_centers

    n_cams = len(gd.rotations)
    ate = ate_pct = float("nan")
    if n_cams >= 8:
        est = camera_centers(gd.rotations, gd.positions)
        # pair each camera with its SOURCE frame's ground truth — the
        # scheduler may legally skip candidate frames (batch.cpp:93-98)
        ids = gd.frame_ids if len(gd.frame_ids) == n_cams else np.arange(n_cams)
        gt = scene.centers()[ids]
        ate = absolute_trajectory_error(est, gt)
        extent = float(np.linalg.norm(gt.max(0) - gt.min(0)))
        ate_pct = 100.0 * ate / max(extent, 1e-9)
    log(f"{n_frames} frames in {elapsed:.2f}s -> {fps:.2f} fps; "
        f"cameras {n_cams}, map {len(gd.points)}, ATE {ate:.4f} "
        f"({ate_pct:.1f}% of trajectory extent)")

    baseline_fps = 3.0  # reference CPU end-to-end anchor (BASELINE.md)
    print(json.dumps({
        "metric": "end_to_end_frames_per_second_fhd",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
