"""Global (full-trajectory) bundle adjustment via matrix-free LM + PCG.

The windowed solver (ba.py) reduces to a dense D×D camera system — right for
F ≤ 16 windows, memory-infeasible at F ≈ 128+ (its one-hot camera Jacobian
is [O,2,D] and its Schur cross blocks [P,D,3]).  Global refinement instead
solves each Levenberg–Marquardt step inexactly with a Jacobi-preconditioned
conjugate gradient on the damped normal equations:

    (JᵀWJ + λ·diag) δ = -JᵀWr

Every product is built from flat per-observation [O,2,9] Jacobian slices via
gather + segment_sum — memory O(observations), never O(obs × cameras) (the
"Bundle Adjustment in the Large" inexact-step recipe, mapped to TPU: the MXU
sees large batched einsums, control flow is two nested lax loops, shapes are
static).  The observation axis is embarrassingly shardable — each CG product
psums over observations, the same seam ShardedBA exploits.

No reference counterpart: the reference never refines globally — its Ceres
windows (bundleAdjustment.cpp) are as far as it goes, which is why its
monocular trajectories keep their accumulated scale drift.  This pass is what
lets long runs hold the ≤5 %-of-extent ATE bound.

Intrinsics stay fixed at the tracked values (the windowed BA already settled
them; freeing K against a drifted trajectory lets the optimizer trade focal
length against scene scale).  Camera 0 is the gauge anchor.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .ba import _res_and_jac, loss_rho_and_weight


@dataclass(frozen=True)
class GlobalBAConfig:
    loss: str = "huber"
    loss_param: float = 2.0
    max_iters: int = 30         # LM (outer) iterations
    cg_iters: int = 32          # CG (inner) iterations per LM step
    init_lambda: float = 1e-4
    function_tolerance: float = 1e-6  # anchored tracking hands this solver a
    #   near-converged problem; a tighter tolerance only buys dead iterations


@partial(jax.jit, static_argnames=("cfg",))
def global_bundle_adjust(
    cfg: GlobalBAConfig,
    K4: jnp.ndarray,        # [4] fx,fy,cx,cy (held fixed)
    cams: jnp.ndarray,      # [N,6] angle-axis + t (world→camera)
    points: jnp.ndarray,    # [P,3]
    uv: jnp.ndarray,        # [O,2] observed pixels (flat)
    cam_idx: jnp.ndarray,   # [O] int32 camera of each observation
    pid: jnp.ndarray,       # [O] int32 landmark of each observation
    mask: jnp.ndarray,      # [O] bool
):
    """Returns (cams', points', info)."""
    N, P, O = cams.shape[0], points.shape[0], uv.shape[0]
    f32 = cams.dtype
    ci = jnp.where(mask, cam_idx, 0).astype(jnp.int32)
    pi = jnp.where(mask, pid, 0).astype(jnp.int32)

    def linearize(cams, points):
        p13 = jnp.concatenate(
            [jnp.broadcast_to(K4, (O, 4)), cams[ci], points[pi]], axis=1)
        r, J = _res_and_jac(p13, uv)          # [O,2], [O,2,13]
        s = jnp.sum(r * r, -1)
        rho, w = loss_rho_and_weight(s, cfg.loss, cfg.loss_param)
        w = jnp.where(mask, w, 0.0)
        cost = jnp.sum(jnp.where(mask, rho, 0.0))
        return r, J[:, :, 4:10], J[:, :, 10:13], w, cost

    def cost_only(cams, points):
        from .ba import _project_residual

        p13 = jnp.concatenate(
            [jnp.broadcast_to(K4, (O, 4)), cams[ci], points[pi]], axis=1)
        r = jax.vmap(_project_residual)(p13, uv)
        s = jnp.sum(r * r, -1)
        rho, _ = loss_rho_and_weight(s, cfg.loss, cfg.loss_param)
        return jnp.sum(jnp.where(mask, rho, 0.0))

    # gauge: camera 0 frozen (updates masked to zero)
    cam_free = (jnp.arange(N) > 0)[:, None].astype(f32)     # [N,1]

    def lm_step(state):
        cams, points, lam, cost_prev, it, done = state
        r, Jc, Jp, w, _ = linearize(cams, points)
        ws = w[:, None]

        # gradient  g = JᵀWr  (flat gather/segment products)
        gc = jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jc, r * ws), ci, N) * cam_free
        gp = jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jp, r * ws), pi, P)

        # Jacobi diagonal of JᵀWJ (damping scale + preconditioner)
        dc = jax.ops.segment_sum(
            jnp.einsum("oij,oij->oj", Jc * ws[..., None], Jc), ci, N)
        dp = jax.ops.segment_sum(
            jnp.einsum("oij,oij->oj", Jp * ws[..., None], Jp), pi, P)
        dc = jnp.maximum(dc, 1e-9)
        dp = jnp.maximum(dp, 1e-9)
        damp_c = dc * lam
        damp_p = dp * lam
        free_p = (dp.max(-1) > 1e-8)[:, None].astype(f32)   # observed points
        gp = gp * free_p

        def Hv(vc, vp):
            Jv = (jnp.einsum("oij,oj->oi", Jc, vc[ci])
                  + jnp.einsum("oij,oj->oi", Jp, vp[pi])) * ws
            hc = jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jc, Jv), ci, N)
            hp = jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jp, Jv), pi, P)
            return ((hc + damp_c * vc) * cam_free,
                    (hp + damp_p * vp) * free_p)

        # PCG on (H+λD)δ = -g with Jacobi preconditioner
        Mc = cam_free / (dc + damp_c)
        Mp = free_p / (dp + damp_p)
        xc = jnp.zeros_like(gc)
        xp = jnp.zeros_like(gp)
        rc, rp = -gc, -gp
        zc, zp = Mc * rc, Mp * rp
        pc, pp = zc, zp
        rz = jnp.vdot(rc, zc) + jnp.vdot(rp, zp)

        def cg_iter(_, s):
            xc, xp, rc, rp, pc, pp, rz = s
            Ac, Ap = Hv(pc, pp)
            pAp = jnp.vdot(pc, Ac) + jnp.vdot(pp, Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-18, 1e-18, pAp)
            xc = xc + alpha * pc
            xp = xp + alpha * pp
            rc = rc - alpha * Ac
            rp = rp - alpha * Ap
            zc, zp = Mc * rc, Mp * rp
            rz_new = jnp.vdot(rc, zc) + jnp.vdot(rp, zp)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-18, 1e-18, rz)
            return xc, xp, rc, rp, zc + beta * pc, zp + beta * pp, rz_new

        xc, xp, *_ = jax.lax.fori_loop(
            0, cfg.cg_iters, cg_iter, (xc, xp, rc, rp, pc, pp, rz))

        cams_new = cams + xc
        points_new = points + xp
        new_cost = cost_only(cams_new, points_new)
        accept = new_cost < cost_prev
        cams = jnp.where(accept, cams_new, cams)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9),
                        jnp.minimum(lam * 5.0, 1e7))
        cost = jnp.where(accept, new_cost, cost_prev)
        converged = accept & (
            cost_prev - cost <= cfg.function_tolerance
            * jnp.maximum(cost, 1e-18))
        return cams, points, lam, cost, it + 1, done | converged

    init_cost = cost_only(cams, points)
    state0 = (cams, points, jnp.asarray(cfg.init_lambda, f32), init_cost,
              jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    camsf, pointsf, _, final_cost, n_iters, _ = jax.lax.while_loop(
        lambda s: (s[4] < cfg.max_iters) & ~s[5], lm_step, state0)
    num_res = jnp.maximum(mask.sum(), 1)
    info = {
        "initial_cost": init_cost,
        "final_cost": final_cost,
        "num_iters": n_iters,
        "num_residuals": num_res,
        "initial_rmse": jnp.sqrt(init_cost / num_res),
        "final_rmse": jnp.sqrt(final_cost / num_res),
    }
    return camsf, pointsf, info
