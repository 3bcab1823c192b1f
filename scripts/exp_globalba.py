"""Experiment: isolate global BA's cost/benefit on the 64-frame headline run.

Runs the headline pipeline twice in one process (shared jit cache):
  1. tpu.global_ba = False  -> pre-refine trajectory quality + throughput
  2. tpu.global_ba = True   -> post-refine quality + throughput
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
    for tag, gba in (("noGBA", False), ("withGBA", True)):
        for rep in range(2):
            out = f"/tmp/bench_out/exp_{tag}_{rep}"
            os.makedirs(out, exist_ok=True)
            cfg = bench.base_config(out)
            cfg = dataclasses.replace(
                cfg, tpu=dataclasses.replace(cfg.tpu, global_ba=gba))
            t0 = time.perf_counter()
            gd, _ = bench.run_pipeline(scene, frames, out, cfg=cfg)
            dt = time.perf_counter() - t0
            n_cams, ate, ate_pct = bench.trajectory_quality(scene, gd)
            print(f"[{tag} rep{rep}] {n_frames / dt:.2f} fps  cameras={n_cams} "
                  f"ATE={ate:.4f} ({ate_pct:.1f}% extent)  map={len(gd.points)}",
                  flush=True)


if __name__ == "__main__":
    main()
