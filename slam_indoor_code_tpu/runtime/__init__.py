"""Device-resident SLAM runtime — the performance path.

The classic conductor (``pipeline/``) mirrors the reference's host-driven
control flow and moves keypoints/matches/poses between host and device every
frame.  On a real TPU (especially behind a remote PJRT tunnel) those
round-trips dominate: measured ~100-150 ms per dispatch+download versus <2 ms
of actual compute.  This runtime keeps ALL pipeline state on the device —
the map arena, the previous-frame features, the candidate-frame ring buffer,
and the BA window — and advances one frame with two fused jitted calls:

  ``match_select``  — previous frame vs the whole ring, 2-NN + ratio + the
                      reference's good-frame rule, on device
  ``track_step``    — PnP-RANSAC + triangulation + verified map merge +
                      window bookkeeping, on device

The host downloads one tiny status vector per frame (~100 B) and uploads one
decoded frame chunk per fill.  Bundle adjustment (``ba_step``) runs on the
device-resident window and map with only its RMSE/pose summary coming back.
"""

from .checkpoint import checkpoint_next_fid, load_checkpoint, save_checkpoint
from .engine import DeviceEngine
from .state import EngineConfig, TrackerState, init_state

__all__ = ["DeviceEngine", "EngineConfig", "TrackerState", "init_state",
           "checkpoint_next_fid", "load_checkpoint", "save_checkpoint"]
