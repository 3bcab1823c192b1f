"""CLI entry point: ``python -m slam_indoor_code_tpu <config.json>``.

Matches the reference binary's contract (src/main.cpp:28-74): one argument —
the JSON config path; exit 2 on config errors; dispatches to calibration /
onlyViz / SLAM and finishes with visualization artifacts."""

from __future__ import annotations

import sys

from .app import run_from_config
from .config import ConfigError, load_config


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        print("Please specify path to JSON-config as the second argument",
              file=sys.stderr)
        return 2
    try:
        cfg = load_config(argv[0])
    except ConfigError as e:
        print(e, file=sys.stderr)
        return 2

    gd = run_from_config(cfg)
    if cfg.calibrate:
        return 0
    print(
        f"map points: {len(gd.points)}; cameras: {len(gd.rotations)}; "
        f"logs in {cfg.outputDataDir}"
    )
    if not cfg.calibrate and "--viz" in argv:
        from .viz.pointcloud import visualize_global_data

        visualize_global_data(gd, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
