"""TPU grid: ingest fidelity (host pooled-gray vs device full-res) x global
BA, at FHD with the anchored-triangulation tracker."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "64"))
    scene, frames = bench.build_frames(n_frames)
    combos = [
        ("host_g0", "host", False), ("host_g1", "host", True),
        ("dev_g0", "device", False), ("dev_g1", "device", True),
    ]
    only = os.environ.get("GRID_ONLY")
    for tag, ingest, gba in combos:
        if only and tag not in only.split(","):
            continue
        out = f"/tmp/bench_out/g2_{tag}"
        os.makedirs(out, exist_ok=True)
        cfg = bench.base_config(out)
        cfg = dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, global_ba=gba,
                                         ingest=ingest))
        t0 = time.perf_counter()
        gd, _ = bench.run_pipeline(scene, frames, out, cfg=cfg)
        dt = time.perf_counter() - t0
        n_cams, ate, pct = bench.trajectory_quality(scene, gd)
        print(f"[{tag}] {n_frames / dt:.2f} fps  cameras={n_cams} "
              f"ATE={ate:.4f} ({pct:.1f}%)  map={len(gd.points)}", flush=True)


if __name__ == "__main__":
    main()
