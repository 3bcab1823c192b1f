"""Microbenchmark BA solver internals on the real chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, n=10):
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:38s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    P, O, D = 16384, 4096, 52

    V = jnp.asarray(rng.normal(0, 1, (P, 3, 3)).astype(np.float32))
    V = V @ V.transpose(0, 2, 1) + 3 * jnp.eye(3)

    inv_lu = jax.jit(jnp.linalg.inv)
    timeit("inv LU [16384,3,3]", lambda: inv_lu(V)[0, 0, 0])

    @jax.jit
    def inv3(M):
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

    timeit("inv3 closed-form [16384,3,3]", lambda: inv3(V)[0, 0, 0])
    err = np.abs(np.asarray(inv3(V)) - np.asarray(inv_lu(V))).max()
    print(f"   max abs err vs LU: {err:.2e}")

    aw = jnp.asarray(rng.normal(0, 1, (O, 2, D)).astype(np.float32))
    Jp = jnp.asarray(rng.normal(0, 1, (O, 2, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(0, 1, (O, 2)).astype(np.float32))
    pid = jnp.asarray(rng.integers(0, P, (O,)).astype(np.int32))

    @jax.jit
    def seg_GP(aw, Jp, pid):
        return jax.ops.segment_sum(
            jnp.einsum("oid,oie->ode", aw, Jp).reshape(O, D * 3), pid, P)

    timeit("segment_sum GP [O->P, D*3]", lambda: seg_GP(aw, Jp, pid)[0, 0])

    @jax.jit
    def seg_V(Jp, pid):
        return jax.ops.segment_sum(
            jnp.einsum("oid,oie->ode", Jp, Jp).reshape(O, 9), pid, P)

    timeit("segment_sum V [O->P, 9]", lambda: seg_V(Jp, pid)[0, 0])

    S = jnp.asarray(rng.normal(0, 1, (D, D)).astype(np.float32))
    S = S @ S.T + 10 * jnp.eye(D)
    rhs = jnp.asarray(rng.normal(0, 1, (D,)).astype(np.float32))
    solve = jax.jit(jnp.linalg.solve)
    timeit("solve [52,52]", lambda: solve(S, rhs)[0])

    # unique/searchsorted as used by ba_step prologue
    corr = jnp.asarray(rng.integers(-1, 60000, (8, 2048)).astype(np.int32))
    BIG = jnp.int32(2**30)

    @jax.jit
    def uniq(corr):
        sent = jnp.where(corr >= 0, corr, BIG)
        uids = jnp.unique(sent.reshape(-1), size=P, fill_value=BIG)
        loc = jnp.searchsorted(uids, sent)
        return uids[0] + loc[0, 0]

    timeit("unique+searchsorted [16384]", lambda: uniq(corr))

    # full residual+jac eval
    from slam_indoor_code_tpu.solver.ba import _res_and_jac
    p13 = jnp.asarray(rng.normal(0, 1, (O, 13)).astype(np.float32))
    uvf = jnp.asarray(rng.normal(0, 1, (O, 2)).astype(np.float32))
    rj = jax.jit(lambda p, u: _res_and_jac(p, u)[1])
    timeit("res+jacfwd [4096,13]", lambda: rj(p13, uvf)[0, 0, 0])


if __name__ == "__main__":
    main()
