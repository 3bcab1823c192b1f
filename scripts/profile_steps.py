"""Microbenchmark the hot runtime dispatches on the real chip.

The axon relay is fake-async (block_until_ready returns early); true sync
requires a device->host download.  So each measurement chains N dispatches
and downloads one tiny output at the end.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from slam_indoor_code_tpu.runtime.state import EngineConfig, init_state
from slam_indoor_code_tpu.runtime import steps


def timeit(label, fn, n=5, sync=None):
    """fn() -> output; sync(out) downloads ~bytes to truly synchronize."""
    out = fn()  # compile
    if sync:
        sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    if sync:
        sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:34s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    cfg = EngineConfig(
        max_keypoints=2048, ring=24, map_cap=1 << 18, window=8,
        window_points=1 << 14, threshold=20.0, descriptor="sift",
        ratio=0.8, required_matched=80, use_ransac=True,
        distance_threshold=500.0, ransac_iters=1024, pnp_iters=256,
        use_ba=True, ba_loss="huber", ba_loss_param=2.0, ba_iters=15,
    )
    K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
    state = init_state(K, cfg)

    rng = np.random.default_rng(0)
    C = cfg.fill_chunk
    rgb_np = rng.integers(0, 255, (C, 1080, 1920, 3), np.uint8)
    slots = jnp.arange(C, dtype=jnp.int32)

    dl = lambda x: np.asarray(x)

    from slam_indoor_code_tpu.models.frontend import pack_frames
    t0 = time.perf_counter()
    gray_np, small_np = pack_frames(list(rgb_np), cfg.color_downscale)
    print(f"{'host pack_frames x8':34s} {(time.perf_counter()-t0)*1e3:8.1f} ms")
    payload = gray_np.nbytes + small_np.nbytes

    # raw upload cost of one packed chunk
    def upload():
        a = jnp.asarray(gray_np)
        b = jnp.asarray(small_np)
        return a[0, 0, 0] + b[0, 0, 0, 0].astype(jnp.uint8)
    timeit(f"upload packed chunk {payload/1e6:.0f}MB", upload, n=3, sync=dl)

    gray_dev, small_dev = jnp.asarray(gray_np), jnp.asarray(small_np)
    s = {"st": state}

    def run_ingest_pre():
        st2, counts = steps.ingest(cfg, s["st"], gray_dev, small_dev, slots)
        s["st"] = st2
        return counts
    timeit(f"ingest chunk={C} (pre-uploaded)", run_ingest_pre, n=3, sync=dl)

    def run_ingest_full():
        st2, counts = steps.ingest(cfg, s["st"], jnp.asarray(gray_np),
                                   jnp.asarray(small_np), slots)
        s["st"] = st2
        return counts
    timeit(f"ingest chunk={C} (incl upload)", run_ingest_full, n=3, sync=dl)

    # fill window state with plausible data for advance_window / ba
    st = s["st"]
    k = cfg.max_keypoints
    st = st._replace(
        prev_xy=jnp.asarray(rng.uniform(0, 1000, (k, 2)), jnp.float32),
        prev_valid=jnp.ones((k,), bool),
        prev_desc=st.ring_desc[0],
        prev_corr=jnp.asarray(rng.integers(-1, 5000, (k,)), jnp.int32),
        map_count=jnp.asarray(8000, jnp.int32),
        map_points=st.map_points.at[:8000].set(
            jnp.asarray(rng.normal(0, 2, (8000, 3)), jnp.float32)),
        win_used=jnp.ones((cfg.window,), bool),
        win_corr=jnp.asarray(rng.integers(-1, 8000, (cfg.window, k)), jnp.int32),
        win_xy=jnp.asarray(rng.uniform(0, 1000, (cfg.window, k, 2)), jnp.float32),
    )
    s["st"] = st

    B = 16 + cfg.fill_chunk
    queue = jnp.asarray(np.arange(B) % cfg.ring, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    def run_advance():
        st2, packed, qh, ql = steps.advance_window(
            cfg, s["st"], queue, jnp.asarray(0, jnp.int32),
            jnp.asarray(8, jnp.int32), jnp.asarray(0, jnp.int32), keys, 8)
        s["st"] = st2
        return packed
    timeit("advance_window T=8", run_advance, n=3, sync=dl)

    def run_ba():
        st2, out = steps.ba_step(cfg, s["st"], jnp.asarray(8, jnp.int32))
        s["st"] = st2
        return out
    timeit("ba_step (15 LM iters)", run_ba, n=3, sync=dl)

    # frontend sub-stages
    from slam_indoor_code_tpu.models import frontend as fe
    fcfg = steps._frontend_cfg(cfg)

    def run_fe():
        return fe.extract_and_describe_gray_batch(
            fcfg, gray_dev, small_dev, cfg.color_downscale)["num_corners"]
    timeit("frontend extract+describe x8", run_fe, n=3, sync=dl)


if __name__ == "__main__":
    main()
