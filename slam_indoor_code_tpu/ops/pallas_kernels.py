"""Pallas TPU kernels for the hot matching op: fused distance-matrix + top-2.

This is the "speed-of-light" kernel BASELINE.json names: the reference's
CUDA backend spends 0.2-1.0 s per batch frame brute-forcing 2-NN matches
(featureMatchingCUDA.cpp:19-46).  Here the [N,M] distance tile never leaves
VMEM: each grid step computes one (TN × TM) tile via one MXU matmul
(bf16 inputs, f32 accumulation; L2 ranking tolerates bf16, Hamming rides the
same kernel exactly via unpacked 0/1 bit-vectors) and folds it into a
running per-row top-2
(value₁, value₂, index₁) carried in the output refs across the M-tile loop.
HBM traffic is exactly A + B + 3 output vectors: the 16 MB distance matrix
is never materialized.

The jnp reference implementations live in ops/knn.py; ``ops.knn.match_pair``
dispatches here on TPU.  Everything also runs under ``interpret=True`` for
CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # python float: jnp scalars would be captured consts in kernels

# All per-row vectors (outputs, column mask) are carried as [X,128] 2-D
# arrays — 1-D refs hit XLA/Mosaic layout mismatches.  TN×TM chosen so the
# f32 tile + operands sit comfortably in VMEM.
TN, TM = 1024, 1024  # both /128 so the [X,128] vector blocks have sublane 8
LANE = 128


def _merge_top2(d1, i1, d2, tile_d, tile_base):
    """Fold a [TN,TM] distance tile into running per-row top-2.

    All per-row quantities stay [TN,1] (keepdims) — Mosaic cannot shape-cast
    across the lane dim, so nothing is ever a 1-D vector."""
    t_d1 = jnp.min(tile_d, axis=1, keepdims=True)
    t_i1_local = jnp.argmin(tile_d, axis=1, keepdims=True).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, tile_d.shape, 1)
    masked = jnp.where(col == t_i1_local, BIG, tile_d)
    t_d2 = jnp.min(masked, axis=1, keepdims=True)
    t_i1 = tile_base + t_i1_local

    # merge (d1,d2) with (t_d1,t_d2): new top-2 of the four candidates
    new_d1 = jnp.minimum(d1, t_d1)
    new_i1 = jnp.where(t_d1 < d1, t_i1, i1)
    # second-best = min of (max(d1, t_d1), d2, t_d2)
    new_d2 = jnp.minimum(jnp.minimum(d2, t_d2), jnp.maximum(d1, t_d1))
    return new_d1, new_i1, new_d2


def _l2_kernel(a_ref, b_ref, bmask_ref, d1_ref, i1_ref, d2_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d1_ref[:] = jnp.full_like(d1_ref, BIG)
        d2_ref[:] = jnp.full_like(d2_ref, BIG)
        i1_ref[:] = jnp.zeros_like(i1_ref)

    a = a_ref[:]                      # [TN,D] bf16
    b = b_ref[:]                      # [TM,D] bf16
    # precision must be DEFAULT: the package pins global matmul precision to
    # 'highest', which Mosaic cannot honor for a bf16 MXU matmul
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    a2 = jnp.sum(a.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    b2 = jnp.sum(b.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    tile = jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)
    tile = jnp.where(bmask_ref[0:1, :], tile, BIG)   # bmask row [1,TM]

    d1, i1, d2 = _merge_top2(
        d1_ref[:, 0:1], i1_ref[:, 0:1], d2_ref[:, 0:1], tile, j * TM)
    lanes = d1_ref.shape[1]
    d1_ref[:] = jnp.broadcast_to(d1, (d1.shape[0], lanes))
    i1_ref[:] = jnp.broadcast_to(i1, (i1.shape[0], lanes))
    d2_ref[:] = jnp.broadcast_to(d2, (d2.shape[0], lanes))


def _l1_kernel(a_ref, b_ref, bmask_ref, d1_ref, i1_ref, d2_ref):
    """Fused L1 distance + top-2 (the reference CUDA backend's SIFT_BF
    metric, NORM_L1 — featureMatchingCUDA.cpp:19-46).

    L1 has no matmul identity, so the tile is built on the VPU: one
    broadcast |a[:,d] − b[:,d]| accumulation per descriptor dim (D is
    static, the loop unrolls; each pass is a [TN1,TM1] rank-1 update —
    lane-parallel over the b axis).  The [N,M] matrix still never leaves
    VMEM."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d1_ref[:] = jnp.full_like(d1_ref, BIG)
        d2_ref[:] = jnp.full_like(d2_ref, BIG)
        i1_ref[:] = jnp.zeros_like(i1_ref)

    a = a_ref[:]                      # [TN1,D] f32
    b = b_ref[:]                      # [TM1,D] f32
    D = a.shape[1]
    acc = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for d in range(D):
        acc = acc + jnp.abs(a[:, d:d + 1] - b[:, d:d + 1].T)
    tile = jnp.where(bmask_ref[0:1, :], acc, BIG)

    d1, i1, d2 = _merge_top2(
        d1_ref[:, 0:1], i1_ref[:, 0:1], d2_ref[:, 0:1], tile,
        j * tile.shape[1])
    lanes = d1_ref.shape[1]
    d1_ref[:] = jnp.broadcast_to(d1, (d1.shape[0], lanes))
    i1_ref[:] = jnp.broadcast_to(i1, (i1.shape[0], lanes))
    d2_ref[:] = jnp.broadcast_to(d2, (d2.shape[0], lanes))


# L1 tiles are smaller: the VPU accumulation touches the [TN1,TM1] tile D
# times, so the tile must stay VMEM-resident alongside both operand tiles.
TN1, TM1 = 512, 512


def _pad_rows(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, n


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def top2_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                valid_b: jnp.ndarray, metric: str = "l2",
                interpret: bool = False):
    """Fused 2-NN distances: returns (d1 [N], idx1 [N], d2 [N]).

    L2 distances are squared (ranking-equivalent; compare ratio² like
    ops.knn).  Padding columns are masked with +inf via ``valid_b``."""
    if metric == "l2":
        a = desc_a.astype(jnp.bfloat16)
        b = desc_b.astype(jnp.bfloat16)
    elif metric == "hamming":
        # Exact trick: unpack the 256 packed bits to 0/1 bf16 vectors — the
        # squared L2 distance of bit vectors IS the Hamming distance
        # (integers ≤ 256 are exact in bf16 products/f32 accumulation), so
        # ORB matching rides the same MXU kernel.
        a = _unpack_bits(desc_a)
        b = _unpack_bits(desc_b)
    elif metric == "l1":
        a = desc_a.astype(jnp.float32)
        b = desc_b.astype(jnp.float32)
    else:
        raise ValueError(f"pallas top2: unsupported metric {metric!r}")
    kernel = _l1_kernel if metric == "l1" else _l2_kernel
    tn, tm = (TN1, TM1) if metric == "l1" else (TN, TM)

    a, n = _pad_rows(a, tn)
    b, m = _pad_rows(b, tm)
    vmask = jnp.pad(valid_b, (0, b.shape[0] - m), constant_values=False)
    N, D = a.shape
    M = b.shape[0]
    # column mask as a broadcast row [rows, M]: each (1?,TM) block slices it
    vmask2d = jnp.broadcast_to(vmask[None, :], (8, M))

    grid = (N // tn, M // tm)
    d1, i1, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, LANE), jnp.float32),
            jax.ShapeDtypeStruct((N, LANE), jnp.int32),
            jax.ShapeDtypeStruct((N, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, vmask2d)
    return (d1[:n, 0], i1[:n, 0], d2[:n, 0])


def _unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[N,W] uint32 → [N,W*32] bf16 of 0/1 bits (little-endian per word,
    matching ops.orb.pack_bits)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], -1).astype(jnp.bfloat16)


# --------------------------------------------------------------- batched 2-NN
#
# The scheduler matches ONE query frame against B candidate frames per scan
# step (batch.cpp:120-148).  Launching B separate kernels pays the
# per-`pallas_call` dispatch cost B times — at 2048² the fixed cost dominates
# the MXU work ~20:1.  One launch with a leading batch grid axis amortizes
# it: grid (B, N/TN, M/TM), j innermost so the running top-2 accumulates
# across M tiles exactly like the pair kernel.
#
# Round-5 decomposition (B-sweep inside one scan, same relay window:
# B=2→629 us, 4→731, 8→784, 16→901 per launch): the per-GRID-STEP marginal
# cost is ~9.7 us — within ~2x of the 4.8 us/step speed-of-light share —
# while the extrapolated steps→0 intercept is ~590 us of per-LAUNCH
# machinery (65% of the whole launch).  The kernel is launch-bound, not
# tile-bound: closing further toward the 9.6 us/pair SoL model needs fewer
# launches, not better tiles.  The `lanes_per_block` variant below was
# built to test the step-overhead hypothesis and LOSES (python-for over
# lanes serializes the merges; >2 lanes at product tiles exceeds VMEM) —
# kept off by default as the documented negative result.

def _l2_kernel_b(a_ref, b_ref, bmask_ref, d1_ref, i1_ref, d2_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d1_ref[:] = jnp.full_like(d1_ref, BIG)
        d2_ref[:] = jnp.full_like(d2_ref, BIG)
        i1_ref[:] = jnp.zeros_like(i1_ref)

    a = a_ref[:]                      # [TN,D] bf16
    b = b_ref[0]                      # [TM,D] bf16
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    a2 = jnp.sum(a.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    b2 = jnp.sum(b.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    tile = jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)
    tile = jnp.where(bmask_ref[0, 0:1, :], tile, BIG)

    d1, i1, d2 = _merge_top2(
        d1_ref[0, :, 0:1], i1_ref[0, :, 0:1], d2_ref[0, :, 0:1],
        tile, j * tile.shape[1])
    lanes = d1_ref.shape[2]
    d1_ref[:] = jnp.broadcast_to(d1, (1, d1.shape[0], lanes))
    i1_ref[:] = jnp.broadcast_to(i1, (1, i1.shape[0], lanes))
    d2_ref[:] = jnp.broadcast_to(d2, (1, d2.shape[0], lanes))


def _l2_kernel_b_multi(lpb, a_ref, b_ref, bmask_ref, d1_ref, i1_ref, d2_ref):
    """Multi-lane batched kernel: each grid step processes ``lpb`` candidate
    lanes against the shared query tile.  At the product shapes the M-tile
    loop is a SINGLE step, so the per-grid-step fixed cost (Mosaic loop
    machinery + block DMA latency) dominates the 2.7 us of MXU work — doing
    lpb lanes' matmuls+merges per step amortizes it (measured: see
    BENCH_SUITE kernel entry)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d1_ref[:] = jnp.full_like(d1_ref, BIG)
        d2_ref[:] = jnp.full_like(d2_ref, BIG)
        i1_ref[:] = jnp.zeros_like(i1_ref)

    a = a_ref[:]                      # [TN,D] bf16
    a2 = jnp.sum(a.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    lanes = d1_ref.shape[2]
    for l in range(lpb):
        b = b_ref[l]                  # [TM,D] bf16
        ab = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        b2 = jnp.sum(b.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        tile = jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)
        tile = jnp.where(bmask_ref[l, 0:1, :], tile, BIG)
        d1, i1, d2 = _merge_top2(
            d1_ref[l, :, 0:1], i1_ref[l, :, 0:1], d2_ref[l, :, 0:1],
            tile, j * tile.shape[1])
        d1_ref[l] = jnp.broadcast_to(d1, (d1.shape[0], lanes))
        i1_ref[l] = jnp.broadcast_to(i1, (i1.shape[0], lanes))
        d2_ref[l] = jnp.broadcast_to(d2, (d2.shape[0], lanes))


@functools.partial(jax.jit,
                   static_argnames=("metric", "interpret", "tn", "tm",
                                    "lanes_per_block"))
def top2_pallas_batch(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                      valid_b: jnp.ndarray, metric: str = "l2",
                      interpret: bool = False,
                      tn: int | None = None, tm: int | None = None,
                      lanes_per_block: int = 1):
    """Fused 2-NN of ONE query set against B candidate sets in ONE kernel
    launch: desc_a [N,D], desc_b [B,M,D], valid_b [B,M] →
    (d1 [B,N], idx1 [B,N], d2 [B,N]).  Same semantics per batch lane as
    ``top2_pallas`` (squared L2; +inf-masked padding columns).  Metrics:
    l2 + hamming (MXU path).  L1 is NOT offered here — its unrolled VPU
    rank-1 accumulation overflows scoped VMEM under the batched grid;
    callers keep L1 on the per-pair kernel."""
    if metric == "l2":
        a = desc_a.astype(jnp.bfloat16)
        b = desc_b.astype(jnp.bfloat16)
    elif metric == "hamming":
        a = _unpack_bits(desc_a)
        Bb, M, W = desc_b.shape
        b = _unpack_bits(desc_b.reshape(Bb * M, W)).reshape(Bb, M, W * 32)
    else:
        raise ValueError(f"pallas top2 batch: unsupported metric {metric!r}")
    kernel = _l2_kernel_b
    # measured on v5e at 2048x2048x128, B=16: (1024,2048) = 41.7 us/pair vs
    # (1024,1024) = 63.7 — a wider M tile halves the per-row top-2 merges
    # and the per-grid-step overhead dominates this kernel (see BENCH_SUITE
    # kernel entry for the speed-of-light accounting)
    tn = tn or 1024
    tm = tm or 2048

    a, n = _pad_rows(a, tn)
    m = b.shape[1]
    pad_m = (-m) % tm
    if pad_m:
        b = jnp.pad(b, ((0, 0), (0, pad_m), (0, 0)))
    vmask = jnp.pad(valid_b, ((0, 0), (0, pad_m)), constant_values=False)
    lpb = lanes_per_block
    if lpb > 1 and b.shape[0] % lpb:
        pad_b = (-b.shape[0]) % lpb
        b = jnp.pad(b, ((0, pad_b), (0, 0), (0, 0)))
        vmask = jnp.pad(vmask, ((0, pad_b), (0, 0)), constant_values=False)
    N, D = a.shape
    B, M = vmask.shape
    B_real = valid_b.shape[0]
    vmask3d = jnp.broadcast_to(vmask[:, None, :], (B, 8, M))

    grid = (B // lpb, N // tn, M // tm)
    kern = (functools.partial(_l2_kernel_b_multi, lpb) if lpb > 1
            else kernel)
    d1, i1, d2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D), lambda bb, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lpb, tm, D), lambda bb, i, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lpb, 8, tm), lambda bb, i, j: (bb, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lpb, tn, LANE), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lpb, tn, LANE), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lpb, tn, LANE), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, N, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, N, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, vmask3d)
    return (d1[:B_real, :n, 0], i1[:B_real, :n, 0], d2[:B_real, :n, 0])
