"""Worker for the 2-process jax.distributed CPU test (tests/test_parallel.py).

Each process brings up jax.distributed via parallel.mesh.initialize_distributed
(the DCN path: TCP coordinator on process 0), contributes its local CPU
devices to a global 2-device mesh, and runs one psum under shard_map.  The
result — each process sees the GLOBAL sum — proves cross-process collectives
work, which is exactly what multi-host TPU bring-up needs from this layer.

Usage: _distributed_worker.py <coordinator> <num_processes> <process_id>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from slam_indoor_code_tpu.parallel.mesh import (batch_sharding,
                                                    initialize_distributed,
                                                    make_mesh)

    initialize_distributed(coordinator=coordinator, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc  # 1 cpu device per process

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((nproc,), ("batch",))

    def f(x):
        return jax.lax.psum(x.sum(), "batch")

    g = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("batch"),
                              out_specs=P()))
    # global array [nproc, 8]: row i = i+1 everywhere
    import numpy as np

    rows = np.arange(1, nproc + 1, dtype=np.float32)[:, None] * np.ones(
        (1, 8), np.float32)
    x = jax.make_array_from_process_local_data(
        batch_sharding(mesh), rows[pid:pid + 1])
    total = float(np.asarray(g(x)))
    expect = float(rows.sum())
    assert total == expect, (total, expect)
    print(f"proc {pid}: global psum {total} OK", flush=True)


if __name__ == "__main__":
    main()
