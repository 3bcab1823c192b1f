"""Experiment grid: isolate the accuracy/throughput effect of
(ingest mode) x (map re-binding) x (global BA) on the 64-frame headline run.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "64"))
    scene, frames = bench.build_frames(n_frames)
    for ingest in ("host", "device"):
        for rebind in (4096, 0):
            for gba in (False, True):
                tag = f"{ingest}_rb{rebind}_g{int(gba)}"
                out = f"/tmp/bench_out/grid_{tag}"
                os.makedirs(out, exist_ok=True)
                cfg = bench.base_config(out)
                cfg = dataclasses.replace(
                    cfg, tpu=dataclasses.replace(
                        cfg.tpu, global_ba=gba, rebind_cap=rebind,
                        ingest=ingest))
                t0 = time.perf_counter()
                gd, _ = bench.run_pipeline(scene, frames, out, cfg=cfg)
                dt = time.perf_counter() - t0
                n_cams, ate, ate_pct = bench.trajectory_quality(scene, gd)
                print(f"[{tag}] {n_frames / dt:.2f} fps  cameras={n_cams} "
                      f"ATE={ate:.4f} ({ate_pct:.1f}%)  map={len(gd.points)}",
                      flush=True)


if __name__ == "__main__":
    main()
