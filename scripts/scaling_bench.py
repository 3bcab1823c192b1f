"""Scaling measurement: distributed Schur BA over a virtual device mesh.

BASELINE.json asks for BA iterations/s at 1 chip / 1 host / N hosts and
>=75% scaling efficiency.  Multi-chip TPU hardware is not reachable from this
environment, so this harness measures the REAL sharded solver
(parallel.ba_sharded.ShardedBA — psum-reduced camera system, device-local
landmarks) on a virtual N-device CPU mesh and records, per mesh size:

- weak scaling: per-device landmark/observation load held constant
  (problem grows with N) — the pod-relevant regime;
- strong scaling: fixed problem split N ways;
- psum bytes/iteration (analytic: the [D,D]+[D] camera-system reduce and
  the two cost scalars are the ONLY collectives).

Writes SCALING.json; SCALING.md interprets the numbers and projects to ICI.

Run: python scripts/scaling_bench.py   (forces an 8-device CPU platform)
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SLAM_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the environment pre-imports jax on the TPU platform (axon sitecustomize),
# so the env var alone is too late — force via config, like tests/conftest.py
# (without this the harness would silently run on — and fight over — the TPU)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402


def build_problem(n_points, n_frames=8, obs_per_frame=2048, seed=0):
    import cv2

    from slam_indoor_code_tpu.testing import make_scene

    scene = make_scene(n_points=n_points, n_frames=n_frames, seed=seed,
                       baseline=0.3, image_size=(1080, 1920), kind="hallway")
    rng = np.random.default_rng(seed)
    pts = scene.points.astype(np.float32)
    K = scene.K
    F = n_frames
    Kslots = obs_per_frame
    uv = np.zeros((F, Kslots, 2), np.float32)
    pidx = np.zeros((F, Kslots), np.int32)
    mask = np.zeros((F, Kslots), bool)
    cams = np.zeros((F, 6), np.float32)
    for f in range(F):
        R, t = scene.rotations[f], scene.translations[f]
        aa, _ = cv2.Rodrigues(R)
        cams[f, :3] = aa.ravel()
        cams[f, 3:] = t
        Xc = pts @ R.T + t
        pix = Xc @ K.T
        z = pix[:, 2:]
        vis = (z[:, 0] > 0.1)
        uvf = pix[:, :2] / np.maximum(z, 1e-9)
        vis &= ((uvf[:, 0] >= 0) & (uvf[:, 0] < 1920)
                & (uvf[:, 1] >= 0) & (uvf[:, 1] < 1080))
        ids = np.flatnonzero(vis)
        ids = rng.permutation(ids)[:Kslots]
        k = len(ids)
        uv[f, :k] = uvf[ids] + rng.normal(0, 0.5, (k, 2))
        pidx[f, :k] = ids
        mask[f, :k] = True
    cams += rng.normal(0, 0.01, cams.shape).astype(np.float32)
    pts = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    K4 = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float32)
    pmask = np.ones(len(pts), bool)
    return K4, cams, pts, uv, pidx, mask, pmask, int(mask.sum())


def time_solver(mesh, cfg, problem, reps=5):
    from slam_indoor_code_tpu.parallel.ba_sharded import ShardedBA

    K4, cams, pts, uv, pidx, mask, pmask, n_obs = problem
    ba = ShardedBA(mesh, cfg, window=uv.shape[0])
    r = ba.solve(K4, cams, pts, uv, pidx, mask, pmask)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        r = ba.solve(K4, cams, pts, uv, pidx, mask, pmask)
    dt = (time.perf_counter() - t0) / reps
    assert r.final_cost < r.initial_cost
    return dt, n_obs


def main():
    import jax

    from slam_indoor_code_tpu.parallel.mesh import make_mesh
    from slam_indoor_code_tpu.solver.ba import BAConfig

    n_dev_avail = len(jax.devices())
    iters = 20
    cfg = BAConfig(loss="huber", loss_param=2.0, max_iters=iters,
                   fix_intrinsics=True)
    F = 8
    D = 4 + 6 * F
    psum_bytes_per_iter = 4 * (D * D + D + 2)   # S + rhs + 2 cost scalars

    results = {"device": "virtual-cpu", "lm_iters_per_solve": iters,
               "psum_bytes_per_iter": psum_bytes_per_iter,
               "weak": [], "strong": []}

    # ---- weak scaling: ~4096 points / ~16k obs PER DEVICE
    for nd in (1, 2, 4, 8):
        if nd > n_dev_avail:
            continue
        mesh = make_mesh((nd,), ("batch",))
        problem = build_problem(n_points=4096 * nd, n_frames=F,
                                obs_per_frame=2048 * nd)
        dt, n_obs = time_solver(mesh, cfg, problem)
        ips = iters / dt
        results["weak"].append(
            {"n_devices": nd, "n_obs": n_obs, "solve_s": round(dt, 4),
             "lm_iters_per_s": round(ips, 2)})
        print(f"[weak] n={nd}: obs={n_obs} {dt*1e3:.1f} ms/solve "
              f"-> {ips:.1f} LM iters/s", flush=True)

    # ---- strong scaling: fixed 32k-point / 16k-obs problem
    problem = build_problem(n_points=32768, n_frames=F, obs_per_frame=2048)
    for nd in (1, 2, 4, 8):
        if nd > n_dev_avail:
            continue
        mesh = make_mesh((nd,), ("batch",))
        dt, n_obs = time_solver(mesh, cfg, problem)
        ips = iters / dt
        results["strong"].append(
            {"n_devices": nd, "n_obs": n_obs, "solve_s": round(dt, 4),
             "lm_iters_per_s": round(ips, 2)})
        print(f"[strong] n={nd}: obs={n_obs} {dt*1e3:.1f} ms/solve "
              f"-> {ips:.1f} LM iters/s", flush=True)

    w1 = results["weak"][0]["solve_s"]
    wN = results["weak"][-1]["solve_s"]
    nN = results["weak"][-1]["n_devices"]
    # NB: the N virtual devices SHARE one physical CPU — wall-clock ratios
    # here measure host-core contention, not the algorithm (a weak-scaling
    # ratio of 1/N is the shared-silicon floor).  Real scaling evidence is
    # (a) correctness across mesh sizes (asserted in time_solver), and
    # (b) the measured collective traffic below vs per-device compute.
    results["virtual_mesh_caveat"] = (
        "virtual CPU devices share one socket; wall-clock ratios reflect "
        "core contention, not interconnect scaling")
    results["weak_time_ratio_1_to_N"] = round(w1 / wN, 3)
    s1 = results["strong"][0]["solve_s"]
    sN = results["strong"][-1]["solve_s"]
    results["strong_speedup_shared_cores"] = round(s1 / sN, 3)

    # ---- compiled-HLO collective audit at n=8: the REAL scaling quantity.
    # The sharded LM solver's only cross-device traffic is the psum of the
    # reduced camera system (+cost scalars); everything landmark-side is
    # device-local by construction.  Count it from the compiled module.
    import re

    from slam_indoor_code_tpu.parallel.ba_sharded import ShardedBA

    mesh = make_mesh((8,), ("batch",))
    ba = ShardedBA(mesh, cfg, window=F)
    problem = build_problem(n_points=4096 * 8, n_frames=F,
                            obs_per_frame=2048 * 8)
    K4, cams, pts, uv, pidx, mask, pmask, n_obs = problem
    device_args, _, _ = ba.pack(K4, cams, pts, uv, pidx, mask, pmask)
    hlo = ba._solver.lower(*device_args).compile().as_text()
    dtype_bytes = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1,
                   "bf16": 2}
    coll = []
    for m in re.finditer(
            r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
            r"[^=\n]*=?\s*\(?([a-z0-9]+)\[([0-9,]*)\]", hlo):
        op, dt, dims = m.group(1), m.group(2), m.group(3)
        n_el = 1
        for d in dims.split(","):
            if d:
                n_el *= int(d)
        coll.append({"op": op, "shape": f"{dt}[{dims}]",
                     "bytes": n_el * dtype_bytes.get(dt, 4)})
    per_iter = sum(c["bytes"] for c in coll)
    results["hlo_collectives"] = coll
    # the while-loop body executes once per LM iteration (+1 init cost psum)
    results["collective_bytes_per_lm_iter"] = per_iter

    # ---- comm invariance: the collective bytes must NOT grow with the
    # observation load (the reduced camera system is [D,D] regardless) —
    # re-audit the compiled module at 2x and 4x the per-device obs load
    invariance = [{"n_obs": n_obs, "bytes_per_iter": per_iter}]
    for scale in (2, 4):
        pr = build_problem(n_points=4096 * 8 * scale, n_frames=F,
                           obs_per_frame=2048 * scale)
        K4s, camss, ptss, uvs, pidxs, masks, pmasks, n_obs_s = pr
        da, _, _ = ba.pack(K4s, camss, ptss, uvs, pidxs, masks, pmasks)
        hlo_s = ba._solver.lower(*da).compile().as_text()
        b = 0
        for m in re.finditer(
                r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
                r"[^=\n]*=?\s*\(?([a-z0-9]+)\[([0-9,]*)\]", hlo_s):
            n_el = 1
            for d in m.group(3).split(","):
                if d:
                    n_el *= int(d)
            b += n_el * dtype_bytes.get(m.group(2), 4)
        invariance.append({"n_obs": n_obs_s, "bytes_per_iter": b})
        assert b == per_iter, (b, per_iter)
    results["comm_invariance"] = invariance

    # ---- efficiency from MEASURED single-chip compute (not a FLOP model):
    # bench.py `ba` mode measures the windowed Schur-LM solver on the real
    # TPU; BENCH_SUITE.json carries ms/LM-iteration at the 16k-obs operating
    # point.  t_psum comes from the interconnect model (the one quantity
    # this single-chip environment cannot measure).
    t_iter_ms = None
    suite = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SUITE.json")
    if os.path.exists(suite):
        with open(suite) as f:
            for entry in json.load(f):
                if entry.get("metric") == "ba_lm_iterations_per_second_w8" \
                        and entry.get("value"):
                    t_iter_ms = 1e3 / float(entry["value"])
                    results["measured_tpu_ms_per_lm_iter"] = round(
                        t_iter_ms, 4)
                    results["measured_tpu_obs"] = entry.get("observations")
    if t_iter_ms is not None:
        t_ici_s = per_iter / 45e9 + 2e-6     # v5e ICI: ~45 GB/s, ~1-2 us
        t_dcn_s = per_iter / 25e9 + 50e-6    # DCN: ~25 GB/s, ~50 us RTT
        results["measured_ici_efficiency"] = round(
            (t_iter_ms * 1e-3) / (t_iter_ms * 1e-3 + t_ici_s), 4)
        results["measured_dcn_efficiency"] = round(
            (t_iter_ms * 1e-3) / (t_iter_ms * 1e-3 + t_dcn_s), 4)
        print(f"measured t_iter {t_iter_ms:.3f} ms; efficiency "
              f"ICI {results['measured_ici_efficiency']} / "
              f"DCN {results['measured_dcn_efficiency']}", flush=True)
    print(f"collectives/iter: {per_iter} B across {len(coll)} ops "
          f"(invariant across {[e['n_obs'] for e in invariance]} obs)",
          flush=True)
    # ---- cross-process BA: the same psum crossing an OS-process (DCN-path)
    # boundary (scripts/_distributed_worker.py ba mode, also pinned by
    # tests/test_parallel.py::test_two_process_sharded_ba_solve)
    import socket
    import subprocess

    with socket.socket() as sck:
        sck.bind(("127.0.0.1", 0))
        port = sck.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    procs = [subprocess.Popen(
        [sys.executable, worker, "ba", f"127.0.0.1:{port}", "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p_ in procs:
        try:
            outs.append(p_.communicate(timeout=300)[0])
        except subprocess.TimeoutExpired:
            p_.kill()
            outs.append(p_.communicate()[0])
    m = re.search(r"cross-process BA cost ([0-9.]+)->([0-9.]+) "
                   r"\(local ref ([0-9.]+)\) OK", outs[0])
    if m and all(p_.returncode == 0 for p_ in procs):
        results["two_process_ba"] = {
            "initial_cost": float(m.group(1)),
            "final_cost": float(m.group(2)),
            "single_device_ref_cost": float(m.group(3)),
            "psum_bytes_per_lm_iter": per_iter,
            "note": "reduced-camera psum crossed an OS-process boundary; "
                    "cost parity with a single-device solve",
        }
        print("two-process BA:", results["two_process_ba"], flush=True)
    else:
        results["two_process_ba"] = {"error": outs[0][-300:]}

    run_two_process_pipeline(results)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


def run_two_process_pipeline(results: dict, nproc: int = 2) -> None:
    """The FULL slam_main across ``nproc`` OS processes (worker `pipeline`
    mode): global nproc-device mesh, ingest fan-out + matching + BA
    observation axis sharded one-device-per-process, trajectory parity
    asserted against each process's local single-device run.  Also pinned
    by tests/test_parallel.py::test_two_process_pipeline."""
    import re
    import socket
    import subprocess

    with socket.socket() as sck:
        sck.bind(("127.0.0.1", 0))
        port = sck.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    procs = [subprocess.Popen(
        [sys.executable, worker, "pipeline", f"127.0.0.1:{port}",
         str(nproc), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(nproc)]
    outs = []
    for p_ in procs:
        try:
            outs.append(p_.communicate(timeout=800)[0])
        except subprocess.TimeoutExpired:
            p_.kill()
            outs.append(p_.communicate()[0])
    m = re.search(r"two-process pipeline cameras (\d+) map (\d+) "
                  r"ate-vs-local ([0-9.]+)% ate-vs-gt ([0-9.]+)% OK",
                  outs[0])
    key = ("two_process_pipeline" if nproc == 2
           else f"{('four' if nproc == 4 else str(nproc))}_process_pipeline")
    if m and all(p_.returncode == 0 for p_ in procs):
        results[key] = {
            "cameras": int(m.group(1)),
            "map_points": int(m.group(2)),
            "ate_vs_local_pct_extent": float(m.group(3)),
            "ate_vs_gt_pct_extent": float(m.group(4)),
            "note": f"full slam_main on a global {nproc}-process mesh "
                    "(ingest fan-out, matching, BA observation axis sharded "
                    "one device per process); trajectory parity with each "
                    "process's local single-device run",
        }
        print(f"{nproc}-process pipeline:", results[key], flush=True)
    else:
        results[key] = {"error": outs[0][-300:]}


def pipeline_only():
    """Refresh only the two_process_pipeline entry of an existing
    SCALING.json (the full harness re-measures everything)."""
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out) as f:
        results = json.load(f)
    run_two_process_pipeline(results, nproc=2)
    run_two_process_pipeline(results, nproc=4)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    if "pipeline-only" in sys.argv[1:]:
        pipeline_only()
    else:
        main()
