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


if __name__ == "__main__" and sys.argv[1:2] not in (["ba"], ["pipeline"]):
    main()


def build_ba_problem(seed=0, F=4, Kslots=64, Pn=96):
    """Deterministic synthetic BA window both processes construct
    identically (same seed): points ahead of a small camera arc, projected
    with noise."""
    import numpy as np

    rng = np.random.default_rng(seed)
    K4 = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
    Km = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], np.float64)
    pts = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (Pn, 3)).astype(np.float32)
    cams = np.zeros((F, 6), np.float32)
    uv = np.zeros((F, Kslots, 2), np.float32)
    lidx = np.zeros((F, Kslots), np.int32)
    omask = np.zeros((F, Kslots), bool)
    for f in range(F):
        cams[f, 3] = -0.3 * f          # translate along x
        t = cams[f, 3:]
        pix = (pts + t) @ Km.T
        uvf = pix[:, :2] / pix[:, 2:]
        ids = rng.permutation(Pn)[:Kslots]
        uv[f] = uvf[ids] + rng.normal(0, 0.3, (Kslots, 2))
        lidx[f] = ids
        omask[f] = True
    cams_n = cams + rng.normal(0, 0.01, cams.shape).astype(np.float32)
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    pmask = np.ones(Pn, bool)
    return K4, cams_n, pts_n, uv, lidx, omask, pmask


def ba_main():
    """Cross-process ShardedBA: the per-LM-iteration [D,D] psum crosses the
    OS-process (DCN) boundary; each process also solves the same problem on
    a LOCAL single-device mesh and asserts cost parity."""
    coordinator, nproc, pid = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from slam_indoor_code_tpu.parallel.mesh import (initialize_distributed,
                                                    make_mesh)
    from slam_indoor_code_tpu.parallel.ba_sharded import ShardedBA
    from slam_indoor_code_tpu.solver.ba import BAConfig

    initialize_distributed(coordinator=coordinator, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc

    prob = build_ba_problem()
    cfg = BAConfig(loss="huber", loss_param=2.0, max_iters=8,
                   fix_intrinsics=True)

    # global mesh: one device per process — the solver's psum rides the
    # distributed (TCP) backend between the two OS processes
    gmesh = make_mesh((nproc,), ("batch",))
    assert len(set(d.process_index for d in gmesh.devices.flat)) == nproc
    sba = ShardedBA(gmesh, cfg, window=4)
    c0, c1, cams_g = sba.solve_multiprocess(*prob)
    assert c1 < c0, (c0, c1)

    # local reference: same problem, single-device mesh on THIS process
    import numpy as np
    from jax.sharding import Mesh

    local = [d for d in jax.devices() if d.process_index == pid]
    lmesh = Mesh(np.array(local[:1]), ("batch",))
    ref = ShardedBA(lmesh, cfg, window=4).solve(*prob)
    assert abs(c1 - ref.final_cost) / max(ref.final_cost, 1e-9) < 1e-3, (
        c1, ref.final_cost)
    np.testing.assert_allclose(cams_g, ref.cams, atol=5e-4)
    print(f"proc {pid}: cross-process BA cost {c0:.3f}->{c1:.3f} "
          f"(local ref {ref.final_cost:.3f}) OK", flush=True)


if __name__ == "__main__" and sys.argv[1:2] == ["ba"]:
    ba_main()
    sys.exit(0)


def pipeline_main():
    """The FULL product (`slam_main`) across two OS processes: a global
    2-device mesh (one CPU device per process), `tpu.mesh_shape=(2,)` —
    ingest payloads land pre-sharded over the chunk axis per process, the
    candidate-match fan-out and the BA observation axis run sharded, and
    XLA's collectives cross the OS-process (DCN-path) boundary inside every
    tracking dispatch.  Each process then re-runs the identical scene on a
    LOCAL single-device mesh and asserts the trajectories agree (the same
    contract as test_slam_main_on_mesh_matches_single_device)."""
    coordinator, nproc, pid = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from slam_indoor_code_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=coordinator, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc

    import tempfile

    import numpy as np

    from slam_indoor_code_tpu.app import slam_main
    from slam_indoor_code_tpu.config import Config, TpuConfig
    from slam_indoor_code_tpu.metrics import absolute_trajectory_error
    from slam_indoor_code_tpu.metrics.ate import camera_centers
    from slam_indoor_code_tpu.testing import make_scene

    # both processes build the identical scene (same seed) — the SPMD
    # contract: every process feeds the same global computation
    scene = make_scene(n_points=700, n_frames=12, seed=5, baseline=0.3)
    frames = [scene.render(i) for i in range(12)]

    def run(mesh_shape, tag):
        out = tempfile.mkdtemp(prefix=f"pipe2_{tag}_{pid}_")
        cfg = Config(
            usePhotosCycle=True, outputDataDir=out,
            requiredExtractedPointsCount=80, featureExtractingThreshold=20,
            framesBatchSize=6, requiredMatchedPointsCount=30,
            knnMatcherDistance=0.8, RPDistanceThreshold=500.0,
            useBundleAdjustment=True, BAMaxFramesCnt=8,
            BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0,
            tpu=TpuConfig(max_keypoints=512, ransac_iters=256,
                          pnp_ransac_iters=128, window_points=2048,
                          ba_max_iters=10, mesh_shape=mesh_shape,
                          ingest="host", ingest_downscale=1))
        return slam_main(cfg, scene.K, frames=list(frames))

    gd_g = run((nproc,), "global")
    from slam_indoor_code_tpu.runtime import steps

    steps.set_active_mesh(None)
    gd_l = run((), "local")

    assert len(gd_g.rotations) == len(gd_l.rotations), (
        len(gd_g.rotations), len(gd_l.rotations))
    assert (np.asarray(gd_g.frame_ids) == np.asarray(gd_l.frame_ids)).all()
    cg = camera_centers(gd_g.rotations, gd_g.positions)
    cl = camera_centers(gd_l.rotations, gd_l.positions)
    ext = float(np.linalg.norm(cl.max(0) - cl.min(0)))
    ate_rel = absolute_trajectory_error(cg, cl) / max(ext, 1e-9)
    assert ate_rel < 0.03, f"mesh-vs-local ATE {100 * ate_rel:.2f}%"
    gt = scene.centers()[gd_g.frame_ids]
    ate_gt = absolute_trajectory_error(cg, gt) / max(
        float(np.linalg.norm(gt.max(0) - gt.min(0))), 1e-9)
    print(f"proc {pid}: two-process pipeline cameras {len(gd_g.rotations)} "
          f"map {len(gd_g.points)} ate-vs-local {100 * ate_rel:.3f}% "
          f"ate-vs-gt {100 * ate_gt:.3f}% OK", flush=True)


if __name__ == "__main__" and sys.argv[1:2] == ["pipeline"]:
    pipeline_main()
    sys.exit(0)
