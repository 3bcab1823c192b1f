"""Pallas kernel tests (interpret mode on CPU): fused top-2 vs jnp reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_indoor_code_tpu.ops import knn
from slam_indoor_code_tpu.ops.pallas_kernels import top2_pallas


def test_l2_top2_matches_reference(rng):
    a = jnp.asarray(rng.normal(size=(100, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(300, 128)), jnp.float32)
    vb = jnp.asarray(rng.random(300) > 0.1)
    d1, i1, d2 = top2_pallas(a, b, vb, metric="l2", interpret=True)
    d_ref = np.array(knn.l2_distance_sq(a, b))
    d_ref[:, ~np.asarray(vb)] = 1e30
    # bf16 matmul inside the kernel: indices must agree except genuine
    # near-ties; distances agree to bf16 tolerance
    i_ref = d_ref.argmin(1)
    agree = (np.asarray(i1) == i_ref)
    assert agree.mean() > 0.97
    np.testing.assert_allclose(np.asarray(d1)[agree], d_ref.min(1)[agree],
                               rtol=0.05, atol=0.5)
    # second-best ≥ best everywhere
    assert np.all(np.asarray(d2) >= np.asarray(d1))


def test_hamming_top2_matches_reference(rng):
    a = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (200, 8), dtype=np.uint64).astype(np.uint32))
    vb = jnp.ones(200, bool)
    d1, i1, d2 = top2_pallas(a, b, vb, metric="hamming", interpret=True)
    d_ref = np.asarray(knn.hamming_distance(a, b))
    np.testing.assert_array_equal(np.asarray(i1), d_ref.argmin(1))
    np.testing.assert_array_equal(np.asarray(d1), d_ref.min(1))
    # exact second-best
    d_sorted = np.sort(d_ref, axis=1)
    np.testing.assert_array_equal(np.asarray(d2), d_sorted[:, 1])


def test_l1_top2_matches_reference(rng):
    a = jnp.asarray(rng.normal(size=(40, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(96, 32)), jnp.float32)
    vb = jnp.asarray(rng.random(96) > 0.1)
    d1, i1, d2 = top2_pallas(a, b, vb, metric="l1", interpret=True)
    d_ref = np.array(knn.l1_distance(a, b))
    d_ref[:, ~np.asarray(vb)] = 1e30
    # f32 VPU accumulation: exact up to float addition order
    np.testing.assert_array_equal(np.asarray(i1), d_ref.argmin(1))
    np.testing.assert_allclose(np.asarray(d1), d_ref.min(1), rtol=1e-5)
    d_sorted = np.sort(d_ref, axis=1)
    np.testing.assert_allclose(np.asarray(d2), d_sorted[:, 1], rtol=1e-5)


def test_l1_tiled_never_materializes_full_tensor(rng):
    # correctness of the lax.map tiling itself (odd N exercises padding)
    a = jnp.asarray(rng.normal(size=(131, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(77, 16)), jnp.float32)
    got = np.asarray(knn.l1_distance(a, b))
    want = np.abs(np.asarray(a)[:, None, :] - np.asarray(b)[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_column_mask_excludes_padding(rng):
    a = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    b = jnp.zeros((64, 16), jnp.float32)  # all-zero descs would win L2
    b = b.at[10].set(a[0])
    vb = jnp.zeros(64, bool).at[10].set(True)
    d1, i1, d2 = top2_pallas(a, b, vb, metric="l2", interpret=True)
    assert int(i1[0]) == 10
    assert float(d1[0]) < 1.0
    assert float(d2[0]) > 1e30  # only one valid column → ratio test will fail


def test_batched_top2_matches_pair_kernel(rng):
    """One batched launch (grid (B, N/TN, M/TM)) must equal B pair launches
    lane for lane — the batch scheduler's per-scan-step matcher rides this
    kernel (ops/knn.py match_batch)."""
    from slam_indoor_code_tpu.ops.pallas_kernels import top2_pallas_batch

    B, N, M, D = 3, 64, 200, 128
    a = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, M, D)), jnp.float32)
    vb = jnp.asarray(rng.random((B, M)) > 0.1)
    d1b, i1b, d2b = top2_pallas_batch(a, b, vb, metric="l2", interpret=True)
    assert d1b.shape == (B, N)
    for bb in range(B):
        d1, i1, d2 = top2_pallas(a, b[bb], vb[bb], metric="l2",
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(i1b[bb]), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d1b[bb]), np.asarray(d1))
        np.testing.assert_allclose(np.asarray(d2b[bb]), np.asarray(d2))


def test_batched_top2_hamming_matches_reference(rng):
    from slam_indoor_code_tpu.ops.pallas_kernels import top2_pallas_batch

    B, N, M, W = 2, 32, 100, 8
    a = jnp.asarray(
        rng.integers(0, 2**32, (N, W), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(
        rng.integers(0, 2**32, (B, M, W), dtype=np.uint64).astype(np.uint32))
    vb = jnp.ones((B, M), bool)
    d1, i1, d2 = top2_pallas_batch(a, b, vb, metric="hamming", interpret=True)
    for bb in range(B):
        d_ref = np.asarray(knn.hamming_distance(a, b[bb]))
        np.testing.assert_array_equal(np.asarray(i1[bb]), d_ref.argmin(1))
        np.testing.assert_array_equal(np.asarray(d1[bb]), d_ref.min(1))


def test_batched_multi_lane_kernel_parity(rng):
    """lanes_per_block > 1 (the launch-overhead experiment, kept off by
    default) matches the single-lane batched kernel exactly, including the
    lane padding path (B not divisible by lpb)."""
    import jax.numpy as jnp

    from slam_indoor_code_tpu.ops.pallas_kernels import top2_pallas_batch

    a = jnp.asarray(rng.normal(size=(200, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6, 300, 128)), jnp.float32)
    vb = jnp.asarray(rng.random((6, 300)) > 0.1)
    ref = top2_pallas_batch(a, b, vb, metric="l2", interpret=True)
    for lpb in (2, 4):
        got = top2_pallas_batch(a, b, vb, metric="l2", interpret=True,
                                lanes_per_block=lpb)
        for x, y in zip(ref, got):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5)
