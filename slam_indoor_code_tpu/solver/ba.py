"""Windowed bundle adjustment: Levenberg–Marquardt with Schur-complement
reduction and robust IRLS losses — the TPU replacement for Ceres.

What the reference does (src/mainModule/bundleAdjustment/bundleAdjustment.cpp):
a Ceres problem over shared 4-param intrinsics (fx,fy,cx,cy), per-frame
6-param extrinsics (angle-axis + t, frame 0 held constant, :88), 3-param
points; autodiff reprojection residual (functor :15-41 — AngleAxisRotatePoint,
translate, perspective divide, K); loss Trivial/Huber/Cauchy/Arctan/Tukey by
config priority (:131-151); SPARSE_SCHUR + JACOBI + EIGEN_SPARSE solver
(:108-114); adjusted K, poses and 3-D points written back in place.

TPU-native design: observations live in a fixed [F,K] slot grid (frame ×
keypoint-slot, mask for empty slots), residual Jacobians come from one
vmapped ``jacfwd`` over all F·K observations, and the normal equations are
assembled with ``segment_sum`` scatters into dense per-point blocks:

    H = [ Hcc  Hcp ]   c = (K4, cams[F,6])  — D = 4+6F ≤ 52 dims
        [ Hcpᵀ Hpp ]   p = points[P,3]      — Hpp block-diagonal 3×3

    S  = Hcc − Σ_p G_p V_p⁻¹ G_pᵀ          (reduced camera system, D×D)
    Δc = chol_solve(S + λ·diag, rhs)
    Δp = V_p⁻¹ (b_p − G_pᵀ Δc)             (landmark back-substitution)

The LM loop is a ``lax.fori_loop`` with multiplicative damping and
accept/reject on true cost — the whole solve is ONE compiled program per
(F, K, P) shape.  V_p inverses are batched closed-form 3×3 solves; S is tiny
and dense, exactly where Schur puts the sequential bottleneck.

Robustness: IRLS weights w = ρ'(s) with Ceres's loss definitions on squared
residual norm s; cost reported as Σ ρ(s) so RMSE logs are comparable to the
reference's (:122-127).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix

# ------------------------------------------------------------ mesh sharding
#
# When the product runs on a device mesh (tpu.mesh_shape), the observation
# axis of the solve is sharded: the vmapped Jacobian and the per-point
# segment_sums partition over devices and the SPMD partitioner reduces the
# per-point blocks / reduced camera system with psums over ICI — the
# jit-native sibling of parallel.ba_sharded's explicit shard_map solver.
# BAConfig.shard_obs keys the jit cache; runtime.steps.set_active_mesh
# registers the Mesh object itself.

_ACTIVE_MESH = None


def set_active_mesh(mesh) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def _shard_obs(x: jnp.ndarray) -> jnp.ndarray:
    if _ACTIVE_MESH is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*(("batch",) + (None,) * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE_MESH, spec))


# ------------------------------------------------------------------ losses
def loss_rho_and_weight(s: jnp.ndarray, kind: str, a: float):
    """Ceres-compatible robust losses on squared residual s.

    Returns (ρ(s), w=ρ'(s)) — w is the IRLS reweighting factor."""
    a2 = a * a
    if kind == "trivial":
        return s, jnp.ones_like(s)
    if kind == "huber":
        r = jnp.sqrt(jnp.maximum(s, 1e-18))
        rho = jnp.where(s <= a2, s, 2.0 * a * r - a2)
        w = jnp.where(s <= a2, 1.0, a / r)
        return rho, w
    if kind == "cauchy":
        rho = a2 * jnp.log1p(s / a2)
        w = 1.0 / (1.0 + s / a2)
        return rho, w
    if kind == "arctan":
        rho = a * jnp.arctan2(s, a)
        u = s / a
        w = 1.0 / (1.0 + u * u)
        return rho, w
    if kind == "tukey":
        u = s / a2
        rho = jnp.where(u <= 1.0, (a2 / 3.0) * (1.0 - (1.0 - u) ** 3), a2 / 3.0)
        w = jnp.where(u <= 1.0, (1.0 - u) ** 2, 0.0)
        return rho, w
    raise ValueError(f"unknown loss {kind!r}")


# ------------------------------------------------------------ residual model
def _project_residual(params13: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reprojection residual of one observation.

    params13 = [fx,fy,cx,cy, aa(3), t(3), X(3)] — identical model to the
    reference's ProjectionCostFunctor (bundleAdjustment.cpp:15-41)."""
    fx, fy, cx, cy = params13[0], params13[1], params13[2], params13[3]
    aa = params13[4:7]
    t = params13[7:10]
    X = params13[10:13]
    R = rodrigues_to_matrix(aa)
    Xc = R @ X + t
    z = Xc[2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[0] / safe_z + cx
    v = fy * Xc[1] / safe_z + cy
    return jnp.stack([u - uv[0], v - uv[1]])


_res_and_jac = jax.vmap(
    lambda p13, uv: (
        _project_residual(p13, uv),
        jax.jacfwd(_project_residual)(p13, uv),
    )
)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3×3 inverse (adjugate/determinant) — ~5x faster
    than jnp.linalg.inv's batched LU on TPU for the V landmark blocks."""
    a, b, c = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    d, e, f = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    g, h, i = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        jnp.stack([A, c * h - b * i, b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, c * d - a * f], -1),
        jnp.stack([C, b * g - a * h, a * e - b * d], -1),
    ], -2)
    return adj / det[:, None, None]


# ------------------------------------------------------------- the LM solver
@dataclass(frozen=True)
class BAConfig:
    loss: str = "trivial"
    loss_param: float = 1.0
    max_iters: int = 25
    init_lambda: float = 1e-3
    fix_intrinsics: bool = False
    obs_cap: int = 0   # >0: compact the [F,K] slot grid to this many
    #                    observations (valid-first) before solving — most
    #                    slots are masked padding and waste Jacobian work
    function_tolerance: float = 1e-6  # Ceres-style early exit: stop when an
    #                                   accepted step improves cost by less
    shard_obs: bool = False  # shard the observation axis over the active mesh
    gauge_frame0: bool = True  # freeze frame-0 extrinsics (the reference's
    #                            gauge, bundleAdjustment.cpp:88).  False when
    #                            frozen landmarks already pin the gauge
    #                            (point_free) — then every pose may move
    #                            toward the anchored map; LM damping keeps
    #                            the problem well-posed if a window happens
    #                            to contain no frozen observations


@partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust_window(
    cfg: BAConfig,
    K4: jnp.ndarray,        # [4] fx,fy,cx,cy
    cams: jnp.ndarray,      # [F,6] angle-axis + t  (world→camera)
    points: jnp.ndarray,    # [P,3]
    uv: jnp.ndarray,        # [F,K,2] observed pixels
    point_idx: jnp.ndarray, # [F,K] int32 local point index (any value where masked)
    obs_mask: jnp.ndarray,  # [F,K] bool
    point_mask: jnp.ndarray,  # [P] bool — real (non-padding) points
    point_free: jnp.ndarray | None = None,  # [P] bool — points the solver may
    #   MOVE.  Frozen points (False) still constrain the cameras through
    #   their residuals but are held constant (their J_p is dropped), the
    #   fixed-landmark anchoring that stops each window from bending the
    #   already-settled map to fit a drifted pose (runtime.steps.ba_step
    #   freezes everything created before the current window).  None = all
    #   real points free (the reference's behaviour: Ceres adjusts every
    #   window point, bundleAdjustment.cpp:88-106).
):
    """One windowed BA solve.  Returns (K4', cams', points', info dict)."""
    F, Kslots = uv.shape[0], uv.shape[1]
    P = points.shape[0]
    D = 4 + 6 * F
    O = F * Kslots

    f_of_obs = jnp.repeat(jnp.arange(F, dtype=jnp.int32), Kslots)
    uv_flat = uv.reshape(O, 2)
    pid = point_idx.reshape(O).astype(jnp.int32)
    m_obs = obs_mask.reshape(O)
    if cfg.obs_cap and cfg.obs_cap < O:
        # Valid-first compaction: keypoint slots are mostly padding, and the
        # per-observation jacfwd dominates the solve.  The tiebreak is
        # ROUND-ROBIN across frames (slot-major), so when valid observations
        # overflow the cap every frame keeps its strongest-slot share — a
        # frame-major order would silently drop entire frames and leave
        # their poses unconstrained.
        slot_in_frame = jnp.arange(O, dtype=jnp.int32) % Kslots
        rr = slot_in_frame * F + f_of_obs
        key_sort = jnp.where(m_obs, rr, O + rr)
        order = jnp.argsort(key_sort)[: cfg.obs_cap]
        f_of_obs = f_of_obs[order]
        uv_flat = uv_flat[order]
        pid = pid[order]
        m_obs = m_obs[order]
        O = cfg.obs_cap

    # Compact the point table to the points actually observed: O
    # observations can reference at most O distinct points, so every
    # per-point op in the LM loop (V blocks, inverses, segment_sums, GV)
    # shrinks from P to Pc = min(O, P).  Updated points scatter back at the
    # end; unobserved points never move (V empty ⇒ Δp = 0) so nothing is
    # lost.
    if point_free is None:
        point_free = jnp.ones_like(point_mask)
    Pc = min(O, P)
    pid_sent = jnp.where(m_obs, pid, P)      # P sorts after every real pid
    puids = jnp.unique(pid_sent, size=Pc, fill_value=P)
    pc_mask = puids < P
    gather_ids = jnp.where(pc_mask, puids, 0)
    points_full = points
    point_mask_full = point_mask
    points = points_full[gather_ids]
    point_mask = pc_mask & point_mask_full[gather_ids]
    point_free = pc_mask & point_free[gather_ids]
    loc = jnp.searchsorted(puids, pid_sent).astype(jnp.int32)
    loc = jnp.minimum(loc, Pc - 1)
    m_obs = m_obs & (puids[loc] == pid_sent)
    pid = loc
    P = Pc
    pid_safe = jnp.where(m_obs, pid, 0)
    if cfg.shard_obs:
        uv_flat, f_of_obs, pid_safe, m_obs = (
            _shard_obs(uv_flat), _shard_obs(f_of_obs),
            _shard_obs(pid_safe), _shard_obs(m_obs))

    def pack(K4, cams, points):
        return K4, cams, points

    def residuals_cost(K4, cams, points):
        p13 = jnp.concatenate(
            [
                jnp.broadcast_to(K4, (O, 4)),
                cams[f_of_obs],
                points[pid_safe],
            ],
            axis=1,
        )
        r, J = _res_and_jac(p13, uv_flat)  # r [O,2], J [O,2,13]
        s = jnp.sum(r * r, axis=-1)
        rho, w = loss_rho_and_weight(s, cfg.loss, cfg.loss_param)
        w = jnp.where(m_obs, w, 0.0)
        cost = jnp.sum(jnp.where(m_obs, rho, 0.0))
        return r, J, w, cost

    def cost_only(K4, cams, points):
        p13 = jnp.concatenate(
            [jnp.broadcast_to(K4, (O, 4)), cams[f_of_obs], points[pid_safe]], axis=1
        )
        r = jax.vmap(_project_residual)(p13, uv_flat)
        s = jnp.sum(r * r, axis=-1)
        rho, _ = loss_rho_and_weight(s, cfg.loss, cfg.loss_param)
        return jnp.sum(jnp.where(m_obs, rho, 0.0))

    # one-hot frame embedding for the dense reduced Jacobian a_o [2, D]
    eyeF = jnp.eye(F, dtype=uv.dtype)

    # Frame-0 gauge release (gauge_frame0=False) is only safe when frozen
    # landmarks actually pin the gauge; the first window after a
    # (re)bootstrap has every landmark free, leaving a 7-DOF null space held
    # only by LM damping.  Gate the release on the presence of at least one
    # frozen-landmark observation (traced — costs one reduction).
    if cfg.gauge_frame0:
        frame0_free = jnp.zeros((), bool)
    else:
        frame0_free = (m_obs & ~point_free[pid_safe]).any()

    def lm_step(state):
        K4, cams, points, lam, cost_prev, it, done = state
        r, J, w, _ = residuals_cost(K4, cams, points)
        J_K = J[:, :, 0:4]            # [O,2,4]
        J_c = J[:, :, 4:10]           # [O,2,6]
        J_p = J[:, :, 10:13]          # [O,2,3]
        # frozen landmarks: residuals keep constraining the cameras (J_c),
        # but the point block drops out — V=0 ⇒ Vinv=0 ⇒ Δp=0, S=Hcc
        J_p = J_p * point_free[pid_safe].astype(J_p.dtype)[:, None, None]
        if cfg.fix_intrinsics:
            J_K = J_K * 0.0
        # dense camera-side Jacobian [O,2,D]
        fhot = eyeF[f_of_obs]          # [O,F]
        a = jnp.concatenate(
            [J_K, jnp.einsum("of,oij->oifj", fhot, J_c).reshape(O, 2, 6 * F)],
            axis=2,
        )
        ws = w[:, None, None]
        # Hcc [D,D], b_c [D]
        Hcc = jnp.einsum("oid,oie->de", a * ws, a)
        b_c = jnp.einsum("oid,oi->d", a * ws, r)
        # per-point blocks via segment_sum
        GP = jax.ops.segment_sum(
            jnp.einsum("oid,oie->ode", a * ws, J_p).reshape(O, D * 3), pid_safe, P
        ).reshape(P, D, 3)
        V = jax.ops.segment_sum(
            jnp.einsum("oid,oie->ode", J_p * ws, J_p).reshape(O, 9), pid_safe, P
        ).reshape(P, 3, 3)
        b_p = jax.ops.segment_sum(jnp.einsum("oid,oi->od", J_p * ws, r), pid_safe, P)

        # damping + padding: unobserved points get identity V
        lamV = lam * jnp.maximum(
            jnp.stack([V[:, 0, 0], V[:, 1, 1], V[:, 2, 2]], -1), 1e-9
        )
        Vd = V + jax.vmap(jnp.diag)(lamV)
        no_obs = ~point_mask | ~point_free | (jnp.abs(Vd).sum((1, 2)) < 1e-12)
        Vd = jnp.where(no_obs[:, None, None], jnp.eye(3, dtype=V.dtype), Vd)
        Vinv = _inv3(Vd)
        Vinv = jnp.where(no_obs[:, None, None], 0.0, Vinv)

        # Schur complement
        GV = jnp.einsum("pdi,pij->pdj", GP, Vinv)
        S = Hcc - jnp.einsum("pdi,pei->de", GV, GP)
        rhs = b_c - jnp.einsum("pdi,pi->d", GV, b_p)

        # gauge: freeze frame-0 extrinsics (rows/cols 4..10)
        gauge = jnp.concatenate(
            [
                jnp.ones((4,), bool) if not cfg.fix_intrinsics else jnp.zeros((4,), bool),
                jnp.broadcast_to(frame0_free, (6,)),
                jnp.ones((6 * (F - 1),), bool),
            ]
        )
        gf = gauge.astype(S.dtype)
        S = S * gf[:, None] * gf[None, :] + jnp.diag(1.0 - gf)
        rhs = rhs * gf
        # dead parameters (padded frames with zero observations): freeze them
        dead = jnp.abs(jnp.diag(S)) < 1e-8
        df = (~dead).astype(S.dtype)
        S = S * df[:, None] * df[None, :] + jnp.diag(dead.astype(S.dtype))
        rhs = rhs * df
        # LM damping on the reduced system
        S = S + lam * jnp.diag(jnp.maximum(jnp.diag(S), 1e-9))

        dc = jnp.linalg.solve(S, rhs)
        dp = jnp.einsum("pij,pj->pi", Vinv, b_p - jnp.einsum("pdi,d->pi", GP, dc))

        K4_new = K4 - dc[:4]
        cams_new = cams - dc[4:].reshape(F, 6)
        points_new = jnp.where(point_mask[:, None], points - dp, points)

        new_cost = cost_only(K4_new, cams_new, points_new)
        accept = new_cost < cost_prev
        K4 = jnp.where(accept, K4_new, K4)
        cams = jnp.where(accept, cams_new, cams)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        cost = jnp.where(accept, new_cost, cost_prev)
        # Ceres-style function tolerance: an accepted step that barely
        # improves the cost means convergence — stop early (the reference's
        # solver exits the same way; fixed-length iteration wastes the
        # common case where LM converges in a handful of steps)
        converged = accept & (
            cost_prev - cost <= cfg.function_tolerance * jnp.maximum(cost, 1e-18))
        return (K4, cams, points, lam, cost, it + 1, done | converged)

    init_cost = cost_only(K4, cams, points)
    state0 = (K4, cams, points, jnp.asarray(cfg.init_lambda, uv.dtype),
              init_cost, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    K4f, camsf, pointsf, _, final_cost, n_iters, _ = jax.lax.while_loop(
        lambda s: (s[5] < cfg.max_iters) & ~s[6], lm_step, state0
    )
    # scatter adjusted points back into the full table
    pointsf = points_full.at[jnp.where(pc_mask, puids, points_full.shape[0])
                             ].set(pointsf, mode="drop")
    num_res = jnp.maximum(m_obs.sum(), 1)
    info = {
        "initial_cost": init_cost,
        "final_cost": final_cost,
        "num_iters": n_iters,
        "num_residuals": num_res,
        "initial_rmse": jnp.sqrt(init_cost / num_res),
        "final_rmse": jnp.sqrt(final_cost / num_res),
    }
    return K4f, camsf, pointsf, info


# -------------------------------------------------------------- host wrapper
class WindowedBA:
    """Host adapter: packs TemporalFrameData windows + the map arena into the
    fixed-shape device solve and writes results back in place — the drop-in
    for the reference's ``bundleAdjustment(calibrationMatrix, frames,
    globalData)`` contract."""

    def __init__(self, loss: str = "trivial", loss_param: float = 1.0,
                 max_iters: int = 25, window: int = 8, window_points: int = 1 << 14,
                 report=None, adjust_intrinsics: bool = False):
        self.cfg = BAConfig(loss=loss, loss_param=float(loss_param),
                            max_iters=int(max_iters),
                            fix_intrinsics=not adjust_intrinsics)
        self.window = int(window)
        self.window_points = int(window_points)
        self.report = report

    def __call__(self, K_host: np.ndarray, frames: list, arena) -> np.ndarray:
        F = self.window
        n = len(frames)
        if n < 2:
            return K_host
        Kslots = frames[0].xy.shape[0]

        uv = np.zeros((F, Kslots, 2), np.float32)
        corr = np.full((F, Kslots), -1, np.int64)
        for i, fd in enumerate(frames[:F]):
            uv[i] = fd.xy
            corr[i] = fd.correspond
        obs_mask = corr >= 0

        uids = np.unique(corr[obs_mask])
        if len(uids) == 0:
            return K_host
        if len(uids) > self.window_points:
            # Keep the most-observed points (silent truncation would skew BA).
            cnt = np.zeros(len(uids), np.int64)
            pos = np.searchsorted(uids, corr[obs_mask])
            np.add.at(cnt, pos, 1)
            keep = np.argsort(-cnt)[: self.window_points]
            uids = np.sort(uids[keep])
            obs_mask &= np.isin(corr, uids)
        P = self.window_points
        uids_pad = np.concatenate([uids, np.zeros(P - len(uids), np.int64)])
        point_mask = np.zeros(P, bool)
        point_mask[: len(uids)] = True

        local = np.searchsorted(uids, np.where(obs_mask, corr, uids[0]))
        local = np.where(obs_mask, local, 0).astype(np.int32)

        cams = np.zeros((F, 6), np.float32)
        for i, fd in enumerate(frames[:F]):
            aa = np.asarray(matrix_to_rodrigues(jnp.asarray(fd.rotation, jnp.float32)))
            cams[i, :3] = aa
            cams[i, 3:] = fd.motion
        K4 = np.array(
            [K_host[0, 0], K_host[1, 1], K_host[0, 2], K_host[1, 2]], np.float32
        )
        pts = arena.points[uids_pad].astype(np.float32)

        K4f, camsf, ptsf, info = bundle_adjust_window(
            self.cfg,
            jnp.asarray(K4), jnp.asarray(cams), jnp.asarray(pts),
            jnp.asarray(uv), jnp.asarray(local), jnp.asarray(obs_mask),
            jnp.asarray(point_mask),
        )

        # write back: K, poses, points (reference: convertDataFromBA
        # bundleAdjustment.cpp:176-201 + in-place spatialPoints update)
        K_new = K_host.copy()
        K4f = np.asarray(K4f, np.float64)
        K_new[0, 0], K_new[1, 1] = K4f[0], K4f[1]
        K_new[0, 2], K_new[1, 2] = K4f[2], K4f[3]
        camsf = np.asarray(camsf, np.float64)
        for i, fd in enumerate(frames[:F]):
            fd.rotation = np.asarray(
                rodrigues_to_matrix(jnp.asarray(camsf[i, :3], jnp.float32)), np.float64
            )
            fd.motion = camsf[i, 3:]
        arena.points[uids] = np.asarray(ptsf, np.float64)[: len(uids)]

        if self.report is not None:
            self.report.write(
                "Bundle Adjustment statistics (approximated RMSE):\n"
                f" #residuals: {int(info['num_residuals'])}\n"
                f" Initial RMSE: {float(info['initial_rmse']):.6f}\n"
                f" Final RMSE: {float(info['final_rmse']):.6f}\n"
            )
            self.report.flush()
        return K_new
