"""Fine-grained stage profiling on the real chip: upload bandwidth curve,
FAST/top-k/SIFT sub-costs, and advance_window sub-ops.

Run from the repo root: python scripts/profile_fine.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, n=5):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync (relay needs download)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:44s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # ---- upload bandwidth curve
    for mb in (2, 8, 32, 64):
        buf = rng.integers(0, 255, (mb * 1 << 20,), np.uint8)
        dt = timeit(f"device_put {mb} MB", lambda b=buf: jnp.asarray(b)[0] + 0, n=3)
        print(f"    -> {mb / dt * 1000:.1f} MB/s")

    # two concurrent 16MB puts (does the tunnel parallelize?)
    bufs = [rng.integers(0, 255, (16 << 20,), np.uint8) for _ in range(2)]

    def dual():
        a = jnp.asarray(bufs[0])
        b = jnp.asarray(bufs[1])
        return a[0] + b[0]
    dt = timeit("device_put 2 x 16 MB", dual, n=3)
    print(f"    -> {32 / dt * 1000:.1f} MB/s")

    # ---- FAST breakdown at FHD
    from slam_indoor_code_tpu.ops import fast, image, sift
    gray = jnp.asarray(rng.integers(0, 255, (1080, 1920)).astype(np.float32))

    score_j = jax.jit(lambda g: fast.fast_score_map(g, 20.0))
    timeit("fast_score_map FHD", lambda: score_j(gray))
    nms_j = jax.jit(fast._nms3x3)
    score = score_j(gray)
    timeit("nms3x3 FHD", lambda: nms_j(score))
    sn = nms_j(score)
    topk_j = jax.jit(lambda s: jax.lax.top_k(s.reshape(-1), 2048))
    timeit("top_k 2048 of 2.1M", lambda: topk_j(sn))
    det_j = jax.jit(lambda g: fast.detect(g, 20.0, 2048))
    timeit("fast.detect full FHD", lambda: det_j(gray))

    det = det_j(gray)
    oem_j = jax.jit(sift.orientation_energy_maps)
    timeit("sift orientation maps FHD (d=1)", lambda: oem_j(gray))
    half = gray[:1080 // 2 * 2, :].reshape(540, 2, 1920 // 2, 2).mean((1, 3))
    timeit("sift orientation maps 540p (d=2)", lambda: oem_j(half))
    desc_j = jax.jit(lambda g, xy, v: sift.describe(g, xy, v, downscale=1))
    timeit("sift.describe FHD d=1", lambda: desc_j(gray, det["xy"], det["valid"]))
    desc2_j = jax.jit(lambda g, xy, v: sift.describe(g, xy, v, downscale=2))
    timeit("sift.describe FHD d=2", lambda: desc2_j(gray, det["xy"], det["valid"]))

    # ---- advance_window sub-ops
    from slam_indoor_code_tpu.ops import knn
    from slam_indoor_code_tpu.geometry import (
        reconstruct, solve_pnp_ransac)

    K = jnp.asarray([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]], jnp.float32)
    N = 2048
    B = 24
    da = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(B, N, 128)).astype(np.float32))
    va = jnp.ones((N,), bool)
    vb = jnp.ones((B, N), bool)
    fm = jnp.ones((B,), bool)
    mb_j = jax.jit(lambda a, va, b, vb, fm: knn.match_batch(a, va, b, vb, fm, 0.8, "l2"))
    timeit(f"match_batch B={B} N={N}", lambda: mb_j(da, va, db, vb, fm))

    X = jnp.asarray(rng.normal(0, 2, (N, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1000, (N, 2)).astype(np.float32))
    pm = jnp.asarray(rng.uniform(size=N) < 0.5)
    key = jax.random.PRNGKey(0)
    pnp_j = jax.jit(lambda k, K, X, uv, pm: solve_pnp_ransac(
        k, K, X, uv, pm, num_hypotheses=256, reproj_threshold_px=8.0,
        prior_R=jnp.eye(3), prior_t=jnp.zeros(3)))
    timeit("solve_pnp_ransac 256 hyp", lambda: pnp_j(key, K, X, uv, pm))

    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    R2 = R
    t2 = jnp.asarray([0.1, 0, 0], jnp.float32)
    rec_j = jax.jit(lambda: reconstruct(K, R, t, R2, t2, uv, uv, pm))
    timeit("reconstruct (triangulate) N=2048", rec_j)

    # ring gather cost
    ring = jnp.asarray(rng.normal(size=(40, N, 128)).astype(np.float32))
    order = jnp.asarray((np.arange(B) * 7) % 40, jnp.int32)
    g_j = jax.jit(lambda r, o: r[o] * 1.0)
    timeit("ring_desc gather [24,2048,128]", lambda: g_j(ring, order))

    # essential ransac (bootstrap only)
    from slam_indoor_code_tpu.geometry import estimate_transformation
    est_j = jax.jit(lambda k: estimate_transformation(
        k, K, uv, uv + 1.0, pm, use_ransac=True, threshold_px=1.0,
        distance_threshold=500.0, num_hypotheses=1024))
    timeit("estimate_transformation 1024 hyp", lambda: est_j(key))


if __name__ == "__main__":
    main()
