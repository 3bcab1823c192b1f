"""Distributed bundle adjustment: Schur complement over a device mesh.

BASELINE.json north star: "distributed BA solving the reduced camera system
via psum/all-gather collectives and landmark back-substitution kept
host-local".  Design (textbook distributed Schur, cf. the scaling-book
recipe — pick a mesh, annotate shardings, let collectives ride ICI):

- **Landmarks are partitioned** across devices (round-robin), and every
  observation is co-located with the landmark it references.  All
  landmark-side work — per-point 3×3 blocks V_p, couplings G_p, back-
  substitution Δp — is device-local with NO communication.
- **Cameras are replicated** (the window is ≤ BAMaxFramesCnt frames — tiny).
  Each device computes its partial reduced camera system
  S_d = Hcc_d − Σ_{p∈d} G_p V_p⁻¹ G_pᵀ and partial rhs; one ``psum`` of a
  [D,D] matrix (D = 4+6F ≤ 52) reduces them — the only collective per LM
  iteration, a few KB over ICI.
- The tiny dense solve of S happens redundantly on every device (cheaper
  than communicating the factorization), then Δp back-substitutes locally.

The whole LM loop runs inside one ``shard_map``; cost accept/reject uses a
psum'd scalar.  Per-iteration comm: one [D,D]+[D]+[1] psum → scaling
efficiency is landmark-bound, matching SURVEY.md §7's guidance that
distribution pays off on the landmark side.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix
from ..solver.ba import (BAConfig, _inv3, _res_and_jac, _project_residual,
                         loss_rho_and_weight)


def _make_sharded_solver(mesh: Mesh, cfg: BAConfig, F: int, axis: str = "batch"):
    """Build the jitted shard_map LM solver for a fixed frame count F."""
    D = 4 + 6 * F
    ndev = mesh.shape[axis]

    def device_fn(K4, cams, pts, pmask, uv, fobs, pid, omask):
        # block shapes: pts [P_d,3], uv [O_d,2], ...; K4/cams replicated
        P_d = pts.shape[0]
        O_d = uv.shape[0]
        eyeF = jnp.eye(F, dtype=uv.dtype)
        pid_safe = jnp.where(omask, pid, 0)

        def cost_only(K4, cams, pts):
            p13 = jnp.concatenate(
                [jnp.broadcast_to(K4, (O_d, 4)), cams[fobs], pts[pid_safe]], axis=1)
            r = jax.vmap(_project_residual)(p13, uv)
            s = jnp.sum(r * r, axis=-1)
            rho, _ = loss_rho_and_weight(s, cfg.loss, cfg.loss_param)
            local = jnp.sum(jnp.where(omask, rho, 0.0))
            return jax.lax.psum(local, axis)

        def lm_step(state, _):
            K4, cams, pts, lam, cost_prev = state
            p13 = jnp.concatenate(
                [jnp.broadcast_to(K4, (O_d, 4)), cams[fobs], pts[pid_safe]], axis=1)
            r, J = _res_and_jac(p13, uv)
            s = jnp.sum(r * r, axis=-1)
            _, w = loss_rho_and_weight(s, cfg.loss, cfg.loss_param)
            w = jnp.where(omask, w, 0.0)
            J_K = J[:, :, 0:4]
            if cfg.fix_intrinsics:
                J_K = J_K * 0.0
            J_c = J[:, :, 4:10]
            J_p = J[:, :, 10:13]
            fhot = eyeF[fobs]
            a = jnp.concatenate(
                [J_K, jnp.einsum("of,oij->oifj", fhot, J_c).reshape(O_d, 2, 6 * F)],
                axis=2,
            )
            ws = w[:, None, None]
            Hcc = jnp.einsum("oid,oie->de", a * ws, a)
            b_c = jnp.einsum("oid,oi->d", a * ws, r)
            GP = jax.ops.segment_sum(
                jnp.einsum("oid,oie->ode", a * ws, J_p).reshape(O_d, D * 3),
                pid_safe, P_d).reshape(P_d, D, 3)
            V = jax.ops.segment_sum(
                jnp.einsum("oid,oie->ode", J_p * ws, J_p).reshape(O_d, 9),
                pid_safe, P_d).reshape(P_d, 3, 3)
            b_p = jax.ops.segment_sum(
                jnp.einsum("oid,oi->od", J_p * ws, r), pid_safe, P_d)

            lamV = lam * jnp.maximum(
                jnp.stack([V[:, 0, 0], V[:, 1, 1], V[:, 2, 2]], -1), 1e-9)
            Vd = V + jax.vmap(jnp.diag)(lamV)
            no_obs = ~pmask | (jnp.abs(Vd).sum((1, 2)) < 1e-12)
            Vd = jnp.where(no_obs[:, None, None], jnp.eye(3, dtype=V.dtype), Vd)
            Vinv = _inv3(Vd)  # closed-form 3x3 inverse (~5x faster than linalg.inv)
            Vinv = jnp.where(no_obs[:, None, None], 0.0, Vinv)

            GV = jnp.einsum("pdi,pij->pdj", GP, Vinv)
            S_local = Hcc - jnp.einsum("pdi,pei->de", GV, GP)
            rhs_local = b_c - jnp.einsum("pdi,pi->d", GV, b_p)
            # THE collective: reduce the camera system over the mesh
            S = jax.lax.psum(S_local, axis)
            rhs = jax.lax.psum(rhs_local, axis)

            gauge = jnp.concatenate([
                jnp.zeros((4,), bool) if cfg.fix_intrinsics else jnp.ones((4,), bool),
                jnp.zeros((6,), bool),
                jnp.ones((6 * (F - 1),), bool),
            ])
            gf = gauge.astype(S.dtype)
            S = S * gf[:, None] * gf[None, :] + jnp.diag(1.0 - gf)
            rhs = rhs * gf
            dead = jnp.abs(jnp.diag(S)) < 1e-8
            df = (~dead).astype(S.dtype)
            S = S * df[:, None] * df[None, :] + jnp.diag(dead.astype(S.dtype))
            rhs = rhs * df
            S = S + lam * jnp.diag(jnp.maximum(jnp.diag(S), 1e-9))

            dc = jnp.linalg.solve(S, rhs)  # replicated tiny solve
            dp = jnp.einsum("pij,pj->pi",
                            Vinv, b_p - jnp.einsum("pdi,d->pi", GP, dc))

            K4n = K4 - dc[:4]
            camsn = cams - dc[4:].reshape(F, 6)
            ptsn = jnp.where(pmask[:, None], pts - dp, pts)
            new_cost = cost_only(K4n, camsn, ptsn)
            accept = new_cost < cost_prev
            K4 = jnp.where(accept, K4n, K4)
            cams = jnp.where(accept, camsn, cams)
            pts = jnp.where(accept, ptsn, pts)
            lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-9),
                            jnp.minimum(lam * 4.0, 1e6))
            cost = jnp.where(accept, new_cost, cost_prev)
            return (K4, cams, pts, lam, cost), None

        init_cost = cost_only(K4, cams, pts)
        state0 = (K4, cams, pts, jnp.asarray(cfg.init_lambda, uv.dtype), init_cost)
        (K4f, camsf, ptsf, _, costf), _ = jax.lax.scan(
            lm_step, state0, None, length=cfg.max_iters)
        return K4f, camsf, ptsf, jnp.stack([init_cost, costf])

    sharded = jax.jit(
        jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P(axis), P()),
            check_vma=False,
        )
    )
    return sharded


def _dev_axis_index(mesh: Mesh, axis: str, dev) -> int:
    """Position of ``dev`` along ``axis`` in the mesh."""
    ax = mesh.axis_names.index(axis)
    pos = np.argwhere(mesh.devices == dev)
    return int(pos[0][ax])


@dataclass
class ShardedBAResult:
    K4: np.ndarray
    cams: np.ndarray
    points: np.ndarray      # [P] in the original uid order
    initial_cost: float
    final_cost: float


class ShardedBA:
    """Host adapter: partitions a BA window's landmarks over the mesh,
    co-locates observations, runs the shard_map LM solver."""

    def __init__(self, mesh: Mesh, cfg: BAConfig, window: int, axis: str = "batch"):
        self.mesh = mesh
        self.cfg = cfg
        self.window = window
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self._solver = _make_sharded_solver(mesh, cfg, window, axis)

    def pack(self, K4, cams, points, uv, local_idx, obs_mask, point_mask):
        """Partition the problem over the mesh: returns (device_args, owner,
        local_of) — device_args feed ``self._solver`` directly (exposed so
        harnesses can ``.lower(*device_args)`` and inspect the compiled
        collectives)."""
        np_args, owner, local_of = self._pack_np(
            K4, cams, points, uv, local_idx, obs_mask, point_mask)
        return tuple(jnp.asarray(a) for a in np_args), owner, local_of

    def _pack_np(self, K4, cams, points, uv, local_idx, obs_mask,
                 point_mask):
        """Numpy half of ``pack`` (multi-process callers build the global
        arrays themselves via make_array_from_process_local_data)."""
        F, Kslots = uv.shape[0], uv.shape[1]
        Pn = len(points)
        nd = self.ndev

        # --- partition points round-robin; build per-device remap.
        # Round-robin means device d owns points d, d+nd, d+2nd, … so the
        # local index is simply p // nd — all fully vectorized (the per-solve
        # Python loops here used to dominate the host side of every window).
        owner = np.arange(Pn, dtype=np.int64) % nd
        local_of = np.arange(Pn, dtype=np.int64) // nd
        P_cap = max(-(-Pn // nd), 1)
        pts_sh = np.zeros((nd, P_cap, 3), np.float32)
        pmask_sh = np.zeros((nd, P_cap), bool)
        pts_sh[owner, local_of] = points
        pmask_sh[owner, local_of] = point_mask

        # --- co-locate observations with their landmark's device: stable
        # sort by owning device, then rank-within-device via a cumulative
        # count — one argsort instead of nd flatnonzero passes.
        fobs_g = np.repeat(np.arange(F, dtype=np.int32), Kslots)
        uv_g = uv.reshape(-1, 2)
        pid_g = local_idx.reshape(-1)
        m_g = obs_mask.reshape(-1)
        sel = np.flatnonzero(m_g)
        dev_sel = owner[pid_g[sel]]
        order = np.argsort(dev_sel, kind="stable")
        sel = sel[order]
        dev_sel = dev_sel[order]
        counts = np.bincount(dev_sel, minlength=nd)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rank = np.arange(len(sel)) - starts[dev_sel]
        O_cap = max(int(counts.max()) if len(sel) else 0, 1)
        uv_sh = np.zeros((nd, O_cap, 2), np.float32)
        fobs_sh = np.zeros((nd, O_cap), np.int32)
        pid_sh = np.zeros((nd, O_cap), np.int32)
        omask_sh = np.zeros((nd, O_cap), bool)
        uv_sh[dev_sel, rank] = uv_g[sel]
        fobs_sh[dev_sel, rank] = fobs_g[sel]
        pid_sh[dev_sel, rank] = local_of[pid_g[sel]]
        omask_sh[dev_sel, rank] = True

        np_args = (
            np.asarray(K4, np.float32), np.asarray(cams, np.float32),
            pts_sh.reshape(nd * P_cap, 3),
            pmask_sh.reshape(-1),
            uv_sh.reshape(nd * O_cap, 2),
            fobs_sh.reshape(-1),
            pid_sh.reshape(-1),
            omask_sh.reshape(-1),
        )
        return np_args, owner, local_of

    def solve_multiprocess(self, K4, cams, points, uv, local_idx, obs_mask,
                           point_mask):
        """Cross-process solve over a multi-process global mesh: every
        process passes the SAME full problem (deterministic packing), the
        sharded axes are assembled from per-process local shards, and the
        per-LM-iteration [D,D] psum crosses the process (DCN) boundary.
        Returns (initial_cost, final_cost, cams') — the replicated outputs
        every process can download; the landmark shards stay process-local.

        This is the §5.8 cross-process execution path; the single-process
        ``solve`` remains the fast path (tests/test_parallel.py runs both
        and asserts cost parity)."""
        np_args, owner, local_of = self._pack_np(
            K4, cams, points, uv, local_idx, obs_mask, point_mask)
        mesh, axis = self.mesh, self.axis
        repl = NamedSharding(mesh, P())
        shrd = NamedSharding(mesh, P(axis))
        specs = (repl, repl, shrd, shrd, shrd, shrd, shrd, shrd)
        me = jax.process_index()
        gargs = []
        for a, sh in zip(np_args, specs):
            if sh is shrd:
                # leading axis = mesh axis (ndev * cap rows): this process
                # contributes the row blocks its local devices own
                per = a.shape[0] // self.ndev
                blocks = [a[per * _dev_axis_index(mesh, axis, d):
                            per * (_dev_axis_index(mesh, axis, d) + 1)]
                          for d in mesh.devices.flat if d.process_index == me]
                local = np.concatenate(blocks) if blocks else a[:0]
                gargs.append(jax.make_array_from_process_local_data(sh, local))
            else:
                gargs.append(jax.make_array_from_process_local_data(sh, a))
        K4f, camsf, ptsf, costs = self._solver(*gargs)
        costs = np.asarray(costs)
        return float(costs[0]), float(costs[1]), np.asarray(camsf, np.float64)

    def solve(
        self,
        K4: np.ndarray,            # [4]
        cams: np.ndarray,          # [F,6]
        points: np.ndarray,        # [P,3] window points (uid order)
        uv: np.ndarray,            # [F,K,2]
        local_idx: np.ndarray,     # [F,K] into points
        obs_mask: np.ndarray,      # [F,K]
        point_mask: np.ndarray,    # [P]
    ) -> ShardedBAResult:
        Pn = len(points)
        nd = self.ndev
        P_cap = max(-(-Pn // nd), 1)
        device_args, owner, local_of = self.pack(
            K4, cams, points, uv, local_idx, obs_mask, point_mask)
        K4f, camsf, ptsf, costs = self._solver(*device_args)
        ptsf = np.asarray(ptsf).reshape(nd, P_cap, 3)
        out_points = np.zeros((Pn, 3), np.float64)
        out_points[:] = ptsf[owner, local_of]
        costs = np.asarray(costs)
        return ShardedBAResult(
            K4=np.asarray(K4f, np.float64),
            cams=np.asarray(camsf, np.float64),
            points=out_points,
            initial_cost=float(costs[0]),
            final_cost=float(costs[1]),
        )
