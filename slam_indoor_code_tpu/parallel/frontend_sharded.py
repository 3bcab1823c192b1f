"""Mesh-sharded feature frontend: the candidate-frame fan-out over devices.

SURVEY.md §2 item 1: the reference's "match previous frame against all B
batch frames" thread pool becomes, at multi-chip scale, a batch-axis-sharded
program — each device extracts/describes/matches its shard of the candidate
frames; the previous frame's descriptors are replicated.  XLA inserts the
final all-gather of per-frame match counts (tiny).  The matching itself needs
no cross-device communication: it is embarrassingly parallel over B, so
scaling efficiency is bounded only by the B/n_devices remainder.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import frontend as fe


class ShardedFrontend:
    """Wraps the frontend programs with batch-axis shardings on a mesh."""

    def __init__(self, mesh: Mesh, fcfg: fe.FrontendConfig, axis: str = "batch"):
        self.mesh = mesh
        self.fcfg = fcfg
        self.axis = axis
        self._shard_b = NamedSharding(mesh, P(axis))
        self._repl = NamedSharding(mesh, P())
        n = mesh.shape[axis]

        @partial(jax.jit, static_argnames=())
        def _extract(rgb_batch):
            return fe.extract_and_describe_batch(fcfg, rgb_batch)

        @partial(jax.jit, static_argnames=())
        def _match(desc_prev, valid_prev, desc_batch, valid_batch, frame_mask):
            return fe.match_against_batch(
                fcfg, desc_prev, valid_prev, desc_batch, valid_batch, frame_mask
            )

        self._extract = _extract
        self._match = _match
        self.devices_per_batch = n

    def pad_to_devices(self, b: int) -> int:
        n = self.devices_per_batch
        return -(-b // n) * n

    def extract_and_describe_batch(self, rgb_batch: jnp.ndarray):
        """[B,H,W,3] with B a multiple of mesh axis size → sharded outputs."""
        rgb = jax.device_put(rgb_batch, self._shard_b)
        return self._extract(rgb)

    def match_against_batch(self, desc_prev, valid_prev, desc_batch,
                            valid_batch, frame_mask):
        desc_prev = jax.device_put(desc_prev, self._repl)
        valid_prev = jax.device_put(valid_prev, self._repl)
        desc_batch = jax.device_put(desc_batch, self._shard_b)
        valid_batch = jax.device_put(valid_batch, self._shard_b)
        frame_mask = jax.device_put(frame_mask, self._shard_b)
        return self._match(desc_prev, valid_prev, desc_batch, valid_batch, frame_mask)
