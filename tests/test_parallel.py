"""Mesh-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4 (d)):
sharded frontend equivalence and distributed-Schur BA equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_indoor_code_tpu.models import frontend as fe
from slam_indoor_code_tpu.parallel import ShardedBA, ShardedFrontend, make_mesh
from slam_indoor_code_tpu.solver import BAConfig, bundle_adjust_window
from slam_indoor_code_tpu.geometry.rotations import matrix_to_rodrigues


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_mesh((8,), ("batch",))


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["batch"] == 8


def test_sharded_frontend_matches_unsharded(mesh, scene):
    fcfg = fe.FrontendConfig(max_keypoints=256, threshold=20.0,
                             descriptor="orb", ratio=0.8, metric="hamming")
    frames = np.stack([scene.render(i) for i in range(8)])
    sf = ShardedFrontend(mesh, fcfg)
    rgb = jnp.asarray(frames)
    res_sh = sf.extract_and_describe_batch(rgb)
    res_ref = fe.extract_and_describe_batch(fcfg, rgb)
    np.testing.assert_array_equal(np.asarray(res_sh["valid"]),
                                  np.asarray(res_ref["valid"]))
    np.testing.assert_allclose(np.asarray(res_sh["xy"]),
                               np.asarray(res_ref["xy"]), atol=1e-5)

    prev = fe.extract_and_describe(fcfg, jnp.asarray(scene.render(0)))
    m_sh = sf.match_against_batch(prev["desc"], prev["valid"],
                                  res_sh["desc"], res_sh["valid"],
                                  jnp.ones(8, bool))
    m_ref = fe.match_against_batch(fcfg, prev["desc"], prev["valid"],
                                   res_ref["desc"], res_ref["valid"],
                                   jnp.ones(8, bool))
    np.testing.assert_array_equal(np.asarray(m_sh["num_matches"]),
                                  np.asarray(m_ref["num_matches"]))


def _ba_problem(scene, rng, F=4, Pn=120):
    pts_gt = scene.points[:Pn]
    K4 = np.array([scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]],
                  np.float32)
    uv = np.zeros((F, Pn, 2), np.float32)
    idx = np.tile(np.arange(Pn, dtype=np.int32), (F, 1))
    mask = np.zeros((F, Pn), bool)
    cams = np.zeros((F, 6), np.float32)
    for f in range(F):
        uvf, vis = scene.project(f, noise=0.3, rng=rng)
        uv[f] = uvf[:Pn]
        mask[f] = vis[:Pn]
        aa = np.asarray(matrix_to_rodrigues(jnp.asarray(scene.rotations[f], jnp.float32)))
        cams[f, :3] = aa + (rng.normal(0, 0.02, 3) if f else 0)
        cams[f, 3:] = scene.translations[f] + (rng.normal(0, 0.02, 3) if f else 0)
    pts0 = (pts_gt + rng.normal(0, 0.05, pts_gt.shape)).astype(np.float32)
    return K4, cams, pts0, uv, idx, mask, np.ones(Pn, bool)


def test_sharded_ba_matches_single_device(mesh, scene):
    rng = np.random.default_rng(77)
    K4, cams, pts0, uv, idx, mask, pmask = _ba_problem(scene, rng)
    cfg = BAConfig(loss="huber", loss_param=2.0, max_iters=12)

    K4_s, cams_s, pts_s, info = bundle_adjust_window(
        cfg, jnp.asarray(K4), jnp.asarray(cams), jnp.asarray(pts0),
        jnp.asarray(uv), jnp.asarray(idx), jnp.asarray(mask),
        jnp.asarray(pmask))

    sba = ShardedBA(mesh, cfg, window=4)
    res = sba.solve(K4, cams, pts0, uv, idx, mask, pmask)

    # distributed solve follows the same LM trajectory up to float reduction
    # order — poses must agree tightly, cost improvements equally
    np.testing.assert_allclose(res.cams, np.asarray(cams_s), atol=5e-3)
    assert res.final_cost < 0.2 * res.initial_cost
    assert abs(res.final_cost - float(info["final_cost"])) / float(info["final_cost"]) < 0.05
    # landmark back-substitution returns points in original order; the two
    # LM trajectories differ in float reduction order so individual points
    # wander within the triangulation noise floor
    np.testing.assert_allclose(res.points, np.asarray(pts_s), atol=0.15)
    assert np.median(np.linalg.norm(res.points - np.asarray(pts_s), axis=1)) < 0.05


def test_sharded_ba_improves_poses(mesh, scene):
    rng = np.random.default_rng(78)
    K4, cams, pts0, uv, idx, mask, pmask = _ba_problem(scene, rng)
    cfg = BAConfig(loss="trivial", max_iters=15)
    sba = ShardedBA(mesh, cfg, window=4)
    res = sba.solve(K4, cams, pts0, uv, idx, mask, pmask)
    from slam_indoor_code_tpu.geometry.rotations import rodrigues_to_matrix

    for f in range(1, 4):
        R = np.asarray(rodrigues_to_matrix(jnp.asarray(res.cams[f, :3],
                                                       jnp.float32)))
        Rerr = R @ scene.rotations[f].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
        assert ang < 0.3


def test_multi_sequence_parallel(tmp_path):
    """Two independent sequences tracked concurrently on separate devices of
    the virtual mesh (BASELINE config #5, single-host scale)."""
    from slam_indoor_code_tpu.app import run_sequences_parallel
    from slam_indoor_code_tpu.config import Config, TpuConfig
    from slam_indoor_code_tpu.metrics import absolute_trajectory_error
    from slam_indoor_code_tpu.metrics.ate import camera_centers
    from slam_indoor_code_tpu.testing import make_scene

    scenes = [make_scene(500, 10, seed=s, baseline=0.3, kind="hallway",
                         image_size=(120, 160)) for s in (1, 2)]
    cfgs, Ks, frames = [], [], []
    for i, sc in enumerate(scenes):
        cfgs.append(Config(
            usePhotosCycle=True, outputDataDir=str(tmp_path / f"seq{i}"),
            requiredExtractedPointsCount=40, featureExtractingThreshold=15,
            framesBatchSize=5, requiredMatchedPointsCount=20,
            knnMatcherDistance=0.85, RPDistanceThreshold=500.0,
            tpu=TpuConfig(max_keypoints=256, ransac_iters=128,
                          pnp_ransac_iters=64, window_points=1024)))
        Ks.append(sc.K)
        frames.append([sc.render(j) for j in range(10)])
    out = run_sequences_parallel(cfgs, Ks, frames)
    assert len(out) == 2
    for sc, gd in zip(scenes, out):
        assert len(gd.rotations) >= 6
        est = camera_centers(gd.rotations, gd.positions)
        gt = sc.centers()[: len(est)]
        ate = absolute_trajectory_error(est, gt)
        ext = np.linalg.norm(gt.max(0) - gt.min(0))
        assert ate < 0.15 * ext


def test_slam_main_on_mesh_matches_single_device(tmp_path):
    """tpu.mesh_shape wires the distributed layer into the PRODUCT: the same
    slam_main call runs with the ingest/match fan-out and BA observation axis
    sharded over an 8-device mesh, and must reproduce the single-device
    trajectory (collectives only change float reassociation)."""
    import os

    import numpy as np

    from slam_indoor_code_tpu.app import slam_main
    from slam_indoor_code_tpu.config import Config, TpuConfig
    from slam_indoor_code_tpu.metrics import absolute_trajectory_error
    from slam_indoor_code_tpu.metrics.ate import camera_centers
    from slam_indoor_code_tpu.testing import make_scene

    scene = make_scene(n_points=700, n_frames=12, seed=5, baseline=0.3)
    frames = [scene.render(i) for i in range(12)]

    def run(mesh_shape, sub):
        out = tmp_path / sub
        os.makedirs(out, exist_ok=True)
        cfg = Config(
            usePhotosCycle=True, outputDataDir=str(out),
            requiredExtractedPointsCount=80, featureExtractingThreshold=20,
            framesBatchSize=6, requiredMatchedPointsCount=30,
            knnMatcherDistance=0.8, RPDistanceThreshold=500.0,
            useBundleAdjustment=True, BAMaxFramesCnt=8,
            BAUseHuberLossFunction=True, BAHuberLossFunctionParameter=2.0,
            tpu=TpuConfig(max_keypoints=512, ransac_iters=256,
                          pnp_ransac_iters=128, window_points=2048,
                          ba_max_iters=10, mesh_shape=mesh_shape))
        return slam_main(cfg, scene.K, frames=frames)

    gd_1 = run((), "single")
    gd_8 = run((8,), "mesh8")
    # restore single-device behaviour for later tests in this process
    from slam_indoor_code_tpu.runtime import steps

    steps.set_active_mesh(None)

    assert len(gd_8.rotations) == len(gd_1.rotations)
    assert (gd_8.frame_ids == gd_1.frame_ids).all()
    c1 = camera_centers(gd_1.rotations, gd_1.positions)
    c8 = camera_centers(gd_8.rotations, gd_8.positions)
    ext = np.linalg.norm(c1.max(0) - c1.min(0))
    # Sim(3)-aligned trajectory-to-trajectory RMSE: float reassociation under
    # the collectives perturbs RANSAC votes slightly and the monocular gauge
    # amplifies that at the tail, so pointwise equality is not the oracle.
    assert absolute_trajectory_error(c8, c1) < 0.03 * ext
    gt = scene.centers()[gd_8.frame_ids]
    ate = absolute_trajectory_error(c8, gt)
    assert ate < 0.08 * np.linalg.norm(gt.max(0) - gt.min(0))


def test_two_process_distributed_initialize():
    """Multi-process DCN bring-up (SURVEY.md §5.8): two OS processes join via
    parallel.mesh.initialize_distributed (TCP coordinator on process 0),
    build a global 2-device mesh, and psum across the process boundary.
    Exercises the exact entry point multi-host TPU pods use.  Spawned clean
    (without the axon sitecustomize) because jax.distributed.initialize must
    run before any backend init."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "global psum 24.0 OK" in out, out[-2000:]


def test_two_process_sharded_ba_solve():
    """A FULL ShardedBA solve across two OS processes (SURVEY.md §5.8): the
    landmark blocks live one-per-process, and the per-LM-iteration [D,D]
    reduced-camera psum crosses the process (DCN) boundary.  Each worker
    also solves the identical problem on a local single-device mesh and
    asserts cost + camera parity — proving the cross-process all-reduce
    computes the same solve (scripts/_distributed_worker.py::ba_main)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    procs = [subprocess.Popen(
        [sys.executable, worker, "ba", coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "cross-process BA cost" in out and "OK" in out, out[-2000:]


def test_two_process_pipeline():
    """The FULL product across two OS processes (SURVEY.md §5.8, execution-
    complete): slam_main on a global 2-device mesh — one CPU device per
    process — with ingest payloads landing pre-sharded, the candidate-match
    fan-out and BA observation axis sharded, and XLA collectives crossing
    the OS-process (DCN-path) boundary inside every tracking dispatch.
    Each worker asserts trajectory parity against its own local
    single-device run (scripts/_distributed_worker.py::pipeline_main)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "scripts", "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": repo,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    procs = [subprocess.Popen(
        [sys.executable, worker, "pipeline", coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=700)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2500:]}"
        assert "two-process pipeline cameras" in out and "OK" in out, \
            out[-2500:]
