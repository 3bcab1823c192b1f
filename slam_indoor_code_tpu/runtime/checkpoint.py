"""Mid-run checkpoint / resume of the device-resident tracker state.

The reference's only persistence is its txt logs, reloadable for
visualization (`onlyViz`, IOmisc.cpp:133-178) — there is no mid-run resume
(SURVEY.md §5.4).  Here the full solver state — map arena, previous-frame
features, pose, BA window, intrinsics, plus the host-side cursors — round-
trips through one compressed npz, so a long run can resume exactly where it
stopped (the orbax-style capability SURVEY.md §5.4 calls for, in a single
dependency-free file)."""

from __future__ import annotations

import numpy as np

from .state import TrackerState


def save_checkpoint(path: str, engine) -> None:
    """Snapshot a DeviceEngine (state + host cursors) to ``path`` (.npz)."""
    arrays = {f"state_{k}": np.asarray(v) for k, v in
              zip(TrackerState._fields, engine.state)}
    arrays["host_key"] = np.asarray(engine._key)
    arrays["host_win_fill"] = np.asarray(engine._win_fill)
    arrays["host_frames_accepted"] = np.asarray(engine.frames_accepted)
    arrays["host_traj_R"] = (np.stack(engine.trajectory_R)
                             if engine.trajectory_R else np.zeros((0, 3, 3)))
    arrays["host_traj_t"] = (np.stack(engine.trajectory_t)
                             if engine.trajectory_t else np.zeros((0, 3)))
    # media cursor: frames with source id ≤ prev_fid are fully consumed
    # (consumption is head-first in id order); everything after re-pulls
    # deterministically on resume, so `next_fid` is the exact media restart
    # position for an identical continuation
    arrays["host_prev_fid"] = np.asarray(engine._prev_fid)
    arrays["host_win_ids"] = np.asarray(engine._win_ids, np.int64)
    # v5: live adaptive FAST threshold (engine._adapt_threshold) — a resumed
    # run keeps detecting at the adapted value instead of snapping back
    arrays["host_fast_threshold"] = np.asarray(engine._fast_threshold)
    # flushed (post-BA) trajectory so far: a resumed run re-emits the full
    # output trajectory, not just its tail (format v3)
    arrays["host_flushed_R"] = (np.stack(engine.flushed_R)
                                if engine.flushed_R else np.zeros((0, 3, 3)))
    arrays["host_flushed_t"] = (np.stack(engine.flushed_t)
                                if engine.flushed_t else np.zeros((0, 3)))
    arrays["host_flushed_ids"] = np.asarray(engine.flushed_ids, np.int64)
    # per-window observation record for the final global BA: without it a
    # resumed run would refine over a truncated problem and its trajectory
    # would legally diverge from the uninterrupted run's
    arrays["obs_n"] = np.asarray(len(engine._global_obs))
    for i, (fut, fill, ids) in enumerate(engine._global_obs):
        xy, corr = fut.result()
        arrays[f"obs_xy_{i}"] = np.asarray(xy[:fill])
        arrays[f"obs_corr_{i}"] = np.asarray(corr[:fill])
        arrays[f"obs_ids_{i}"] = np.asarray(ids[:fill], np.int64)
    np.savez_compressed(path, **arrays)


def checkpoint_next_fid(path: str) -> int:
    """Source frame index a resumed run must restart its media at (0 for a
    pre-v2 snapshot without media cursors — mirrors load_checkpoint's guard)."""
    data = np.load(path)
    return int(data["host_prev_fid"]) + 1 if "host_prev_fid" in data else 0


def load_checkpoint(path: str, engine) -> None:
    """Restore a DeviceEngine from ``save_checkpoint`` output in place.

    The engine must have been built with the same EngineConfig (shapes are
    validated array-by-array)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    fields = {}
    for k in TrackerState._fields:
        if f"state_{k}" not in data:
            # pre-v4 snapshot: sensible fresh defaults — BA freeze base at 0
            # (everything free) and track anchors re-seeded at the resume
            # frame (tracks transiently triangulate consecutively again)
            if k == "win_map_base":
                fields[k] = jnp.zeros((), jnp.int32)
                continue
            if k == "step_ema":
                # pre-v5 snapshot: 0 = unknown (pose-jump gate re-seeds at
                # the next accepted step)
                fields[k] = jnp.zeros((), jnp.float32)
                continue
            if k == "prev_anchor_xy":
                fields[k] = jnp.asarray(data["state_prev_xy"], jnp.float32)
                continue
            if k == "prev_anchor_cam":
                from ..geometry.rotations import matrix_to_rodrigues

                R = jnp.asarray(data["state_pose_R"], jnp.float32)
                t = jnp.asarray(data["state_pose_t"], jnp.float32)
                cam6 = jnp.concatenate([matrix_to_rodrigues(R), t])
                k_slots = data["state_prev_xy"].shape[0]
                fields[k] = jnp.broadcast_to(cam6, (k_slots, 6))
                continue
            raise ValueError(f"checkpoint missing field {k} (snapshot too old)")
        arr = data[f"state_{k}"]
        cur = getattr(engine.state, k)
        if tuple(arr.shape) != tuple(cur.shape):
            raise ValueError(
                f"checkpoint field {k}: shape {arr.shape} != engine {cur.shape} "
                "(EngineConfig mismatch)")
        fields[k] = jnp.asarray(arr, cur.dtype)
    engine.state = TrackerState(**fields)
    engine._key = jax.numpy.asarray(data["host_key"])
    engine._win_fill = int(data["host_win_fill"])
    engine.frames_accepted = int(data["host_frames_accepted"])
    engine.trajectory_R = list(data["host_traj_R"])
    engine.trajectory_t = list(data["host_traj_t"])
    if "host_prev_fid" in data:  # format v2 cursors
        engine._prev_fid = int(data["host_prev_fid"])
        engine._frame_counter = engine._prev_fid + 1
        engine._win_ids = [int(i) for i in data["host_win_ids"]]
    if "host_fast_threshold" in data:  # format v5: adaptive extraction gate
        engine._fast_threshold = float(data["host_fast_threshold"])
    if "host_flushed_ids" in data:  # format v3: flushed trajectory + obs
        engine.flushed_R = list(data["host_flushed_R"])
        engine.flushed_t = list(data["host_flushed_t"])
        engine.flushed_ids = [int(i) for i in data["host_flushed_ids"]]

        class _Resolved:
            """Future stand-in for an already-downloaded observation pair."""

            def __init__(self, value):
                self._value = value

            def result(self):
                return self._value

        engine._global_obs = []
        for i in range(int(data["obs_n"])):
            xy = data[f"obs_xy_{i}"]
            corr = data[f"obs_corr_{i}"]
            ids = [int(j) for j in data[f"obs_ids_{i}"]]
            engine._global_obs.append(
                (_Resolved((xy, corr)), xy.shape[0], ids))
