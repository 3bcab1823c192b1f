"""Device-mesh construction and distributed initialization.

The reference is single-process (SURVEY.md §2 'Distributed communication
backend: none') — this layer is the green-field capability BASELINE.json
demands: a `jax.sharding.Mesh` over ICI/DCN with named axes, multi-host
bring-up via `jax.distributed.initialize`, and helpers shared by the sharded
frontend / distributed BA.

Axis convention:
  "batch"  — candidate-frame fan-out + landmark blocks (intra-slice ICI)
  "seq"    — independent sequences / sub-maps (inter-host DCN, optional 2-D)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op when single-process).  Mirrors
    jax.distributed.initialize's env-driven defaults."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(shape: tuple = (), axis_names: tuple = ()) -> Mesh:
    """Build a mesh over available devices.

    () → all devices on one "batch" axis.  (a, b) with ("seq", "batch") →
    2-D mesh: sequences over hosts (DCN), batch fan-out over chips (ICI)."""
    devices = np.array(jax.devices())
    if not shape:
        shape = (len(devices),)
        axis_names = axis_names or ("batch",)
    if not axis_names:
        axis_names = tuple(f"axis{i}" for i in range(len(shape)))
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    return Mesh(devices[:n].reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Leading-axis sharding for frame batches / landmark blocks."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
