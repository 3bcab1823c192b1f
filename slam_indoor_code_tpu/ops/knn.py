"""2-NN descriptor matching with Lowe ratio filtering — the pipeline's
hottest op.

The reference brute-force kNN-matches the previous frame's descriptors
against every batch frame, one frame at a time, on CPU or CUDA
(featureMatchingCPU.cpp:17-43, featureMatchingCUDA.cpp:19-46; its logs put
this at 0.2–2.7 s *per batch index* — SURVEY.md §6).  TPU-native design: the
distance matrix is one [N,M] matmul (MXU) or XOR+popcount reduction (VPU),
top-2 is two masked row reductions, and the *entire batch* matches in one
[B,N,M] program (``match_batch``) — the reference's thread scheduler
dissolves into vectorization (SURVEY.md §2 item 1).

Metrics: 'l2' (SIFT, both BF and FLANN rank by L2 in the reference CPU
backend), 'l1' (the CUDA backend's SIFT_BF choice, featureMatchingCUDA.cpp),
'hamming' (ORB, packed uint32 words).

Lowe ratio semantics match getGoodMatches (featureMatchingCommon.cpp:37-50):
keep query i iff d0 < ratio · d1; match = (i → argmin_j).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as _np

# numpy scalar, NOT jnp: a module-level jnp constant would instantiate the
# XLA backend at import time, which breaks multi-host bring-up
# (jax.distributed.initialize must run before any backend init — see
# parallel.mesh.initialize_distributed and tests/test_parallel.py)
BIG = _np.float32(3.0e38)


def l2_distance_sq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,D] × [M,D] → [N,M] squared L2 via the matmul identity (MXU path)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = a @ b.T
    return jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)


def l1_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,D] × [M,D] → [N,M] L1 (used by the reference's CUDA SIFT_BF path,
    featureMatchingCUDA.cpp:19-46 NORM_L1).

    Tiled over the query axis with ``lax.map`` so the peak intermediate is
    [TILE,M,D], never [N,M,D] — at 10k×10k×128 the naive broadcast is a
    ~50 GB tensor; tiling bounds it to ~400 MB regardless of N.  (On TPU the
    Pallas fused kernel handles L1 instead — see ops/pallas_kernels.py.)"""
    TILE = 128
    n = a.shape[0]
    pad = (-n) % TILE
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    chunks = a_p.reshape(-1, TILE, a.shape[1])
    d = jax.lax.map(
        lambda ac: jnp.abs(ac[:, None, :] - b[None, :, :]).sum(-1), chunks)
    return d.reshape(-1, b.shape[0])[:n]


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Packed-bit Hamming: [N,W] uint32 × [M,W] uint32 → [N,M] float32.

    XOR + population count on the VPU (no unpacking)."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jax.lax.population_count(x).sum(-1).astype(jnp.float32)


def distance_matrix(a, b, metric: str) -> jnp.ndarray:
    if metric == "l2":
        return l2_distance_sq(a, b)  # squared; monotone for ranking & ratio²
    if metric == "l1":
        return l1_distance(a, b)
    if metric == "hamming":
        return hamming_distance(a, b)
    raise ValueError(f"unknown metric {metric!r}")


def _top2(d: jnp.ndarray):
    """Row-wise two smallest: [N,M] → (d1, idx1, d2). Two masked reductions —
    cheaper than a sort on TPU."""
    idx1 = jnp.argmin(d, axis=-1)
    d1 = jnp.take_along_axis(d, idx1[:, None], axis=-1)[:, 0]
    masked = d + jax.nn.one_hot(idx1, d.shape[-1], dtype=d.dtype) * BIG
    d2 = masked.min(axis=-1)
    return d1, idx1, d2


def _pallas_enabled(metric: str) -> bool:
    import os

    if os.environ.get("SLAM_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu" and metric in ("l2", "l1", "hamming")


@partial(jax.jit, static_argnames=("metric",))
def match_pair(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio: float | jnp.ndarray = 0.7,
    metric: str = "l2",
):
    """2-NN + ratio match of frame A's descriptors against frame B's.

    On TPU the fused Pallas distance+top-2 kernel runs
    (ops/pallas_kernels.py); elsewhere the jnp reference path.

    Returns dict:
      train_idx [N] int32 — best B index per A query
      is_match  [N] bool  — passed validity + ratio test
      num_matches int32
    """
    if _pallas_enabled(metric):
        from .pallas_kernels import top2_pallas

        d1, idx1, d2 = top2_pallas(desc_a, desc_b, valid_b, metric=metric)
    else:
        d = distance_matrix(desc_a, desc_b, metric)
        # Invalidate padding columns before the reduction; padding rows after.
        d = jnp.where(valid_b[None, :], d, BIG)
        d1, idx1, d2 = _top2(d)
    if metric == "l2":
        # distances are squared ⇒ compare against ratio² (ranking unchanged)
        ok_ratio = d1 < (ratio * ratio) * d2
    else:
        ok_ratio = d1 < ratio * d2
    is_match = ok_ratio & valid_a & (d1 < BIG / 2)
    return {
        "train_idx": idx1.astype(jnp.int32),
        "is_match": is_match,
        "distance": d1,
        "num_matches": is_match.sum(),
    }


@partial(jax.jit, static_argnames=("metric",))
def match_batch(
    desc_prev: jnp.ndarray,
    valid_prev: jnp.ndarray,
    desc_batch: jnp.ndarray,
    valid_batch: jnp.ndarray,
    frame_mask: jnp.ndarray,
    ratio: float | jnp.ndarray = 0.7,
    metric: str = "l2",
):
    """Match the previous frame against ALL B candidate frames at once.

    desc_prev [N,D], desc_batch [B,M,D], frame_mask [B] (real frames in the
    padded batch).  Returns per-frame match tensors with a leading B axis plus
    ``num_matches`` [B] — the quantity the batch scheduler's good-frame rule
    consumes (batch.cpp:120-148).

    On TPU all B pairs run in ONE batched Pallas launch (grid (B, N/TN,
    M/TM)) — the per-call dispatch cost is paid once, not B times.  (L1
    stays on the per-pair kernel: its VPU rank-1 accumulation overflows
    scoped VMEM under the batched grid.)"""
    if _pallas_enabled(metric) and metric != "l1":
        from .pallas_kernels import top2_pallas_batch

        d1, idx1, d2 = top2_pallas_batch(
            desc_prev, desc_batch, valid_batch, metric=metric)
        if metric == "l2":
            ok_ratio = d1 < (ratio * ratio) * d2
        else:
            ok_ratio = d1 < ratio * d2
        is_match = ok_ratio & valid_prev[None, :] & (d1 < BIG / 2)
        res = {
            "train_idx": idx1.astype(jnp.int32),
            "is_match": is_match,
            "distance": d1,
        }
    else:
        res = jax.vmap(
            lambda db, vb: match_pair(desc_prev, valid_prev, db, vb, ratio,
                                      metric)
        )(desc_batch, valid_batch)
    res["is_match"] = res["is_match"] & frame_mask[:, None]
    res["num_matches"] = res["is_match"].sum(axis=-1)
    return res
