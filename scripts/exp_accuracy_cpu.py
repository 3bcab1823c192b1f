"""CPU accuracy testbed: small-resolution hallway through the full device
engine (forced onto CPU), for fast A/B of drift-reduction changes.

ATE trends at 640x480 transfer qualitatively to the FHD TPU bench; this loop
iterates in minutes instead of recompile-heavy TPU runs.

Usage: SLAM_TPU_PLATFORM=cpu python scripts/exp_accuracy_cpu.py [n_frames]
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("SLAM_TPU_PLATFORM", "cpu")
# TPU-host AOT artifacts in the shared cache change CPU float rounding
# (tests/conftest.py rationale) — keep this testbed on its own cache
os.environ.setdefault("SLAM_TPU_CACHE_DIR", "/tmp/jax_cache_cpu_testbed")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from slam_indoor_code_tpu.testing import make_scene  # noqa: E402


def run(cfg_patch, scene, frames, tag):
    import bench

    out = f"/tmp/bench_out/acc_{tag}"
    os.makedirs(out, exist_ok=True)
    cfg = bench.base_config(out)
    tpu_patch = cfg_patch.pop("tpu", {})
    cfg = dataclasses.replace(
        cfg, **cfg_patch,
        tpu=dataclasses.replace(cfg.tpu, **tpu_patch))
    t0 = time.perf_counter()
    gd, _ = bench.run_pipeline(scene, frames, out, cfg=cfg)
    dt = time.perf_counter() - t0
    n_cams, ate, ate_pct = bench.trajectory_quality(scene, gd)
    print(f"[{tag}] {len(frames) / dt:.2f} fps  cameras={n_cams} "
          f"ATE={ate:.4f} ({ate_pct:.1f}%)  map={len(gd.points)}", flush=True)
    return ate_pct


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    scene = make_scene(n_points=1500, n_frames=n_frames,
                       image_size=(480, 640), seed=7, baseline=0.25,
                       kind="hallway")
    frames = [scene.render(i) for i in range(n_frames)]
    variants = {
        "anc": {"tpu": {"global_ba": False, "rebind_cap": 8192}},
        "anc_gba": {"tpu": {"global_ba": True, "rebind_cap": 8192}},
        "anc_par2": {"tpu": {"global_ba": False, "rebind_cap": 8192,
                             "parallax_min_deg": 2.0}},
        "anc_fz": {"tpu": {"global_ba": False, "rebind_cap": 8192,
                           "ba_freeze_old": True}},
        "noanc": {"tpu": {"global_ba": False, "rebind_cap": 8192,
                          "anchored_triangulation": False}},
    }
    only = os.environ.get("ACC_VARIANTS")
    for tag, patch in variants.items():
        if only and tag not in only.split(","):
            continue
        run(dict(patch), scene, frames, tag)


if __name__ == "__main__":
    main()
