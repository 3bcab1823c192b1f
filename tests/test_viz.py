"""Viz/surfacing subsystem tests: clustering, plane fit, Delaunay, exports."""

import numpy as np
import pytest

from slam_indoor_code_tpu.viz import (
    best_fitting_plane,
    build_scene_meshes,
    clusterize_points,
    delaunay,
    delaunay_bowyer_watson,
    export_mesh_ply,
    export_ply,
    make_mesh,
    render_png,
)


def test_clusterize_two_blobs(rng):
    a = rng.normal(0, 0.1, (40, 3))
    b = rng.normal(0, 0.1, (30, 3)) + np.array([10.0, 0, 0])
    pts = np.vstack([a, b])
    cols = np.zeros((70, 3))
    comps = clusterize_points(pts, cols, max_distance=1.0)
    assert len(comps) == 2
    assert sorted(map(len, comps), reverse=True) == [40, 30]


def test_clusterize_color_weight_splits(rng):
    # same location, two distinct colors: color weight separates them
    pts = rng.normal(0, 0.05, (40, 3))
    cols = np.zeros((40, 3))
    cols[20:] = 200.0
    comps = clusterize_points(pts, cols, max_distance=1.0,
                              euclid_weight=1.0, color_weight=1.0)
    assert len(comps) == 2


def test_best_fitting_plane(rng):
    normal = np.array([1.0, 2.0, -1.0])
    normal /= np.linalg.norm(normal)
    e1 = np.cross(normal, [0, 0, 1.0]); e1 /= np.linalg.norm(e1)
    e2 = np.cross(normal, e1)
    uv = rng.normal(0, 1, (100, 2))
    pts = np.array([3.0, -1.0, 2.0]) + uv @ np.stack([e1, e2])
    pts += rng.normal(0, 0.001, pts.shape)
    c, n = best_fitting_plane(pts)
    assert abs(abs(n @ normal) - 1.0) < 1e-4


def test_delaunay_matches_bowyer_watson_coverage():
    uv = np.random.default_rng(123).uniform(0, 1, (25, 2))
    t_scipy = delaunay(uv)
    t_bw = delaunay_bowyer_watson(uv)
    assert len(t_scipy) > 20 and len(t_bw) > 20

    def area(tris):
        a, b, c = uv[tris[:, 0]], uv[tris[:, 1]], uv[tris[:, 2]]
        ab, ac = b - a, c - a
        return float(np.abs(ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0]).sum() / 2)

    # both must tile the convex hull (near-cocircular points may flip a
    # diagonal, so triangle counts can differ by one — area cannot)
    from scipy.spatial import ConvexHull

    hull_area = ConvexHull(uv).volume
    assert abs(area(t_scipy) - hull_area) < 1e-9
    assert abs(area(t_bw) - hull_area) < 1e-6


def test_make_mesh_edge_culling(rng):
    pts = np.concatenate([rng.uniform(0, 1, (30, 2)),
                          np.array([[100.0, 100.0]])])  # far outlier
    pts3 = np.concatenate([pts, np.zeros((31, 1))], axis=1)
    tris_all = make_mesh(pts3)
    tris_culled = make_mesh(pts3, max_edge=5.0)
    assert len(tris_culled) < len(tris_all)
    assert not (tris_culled == 30).any()  # outlier unreferenced


def test_build_scene_meshes(rng):
    pts = rng.normal(0, 0.3, (60, 3)) * np.array([1, 1, 0.01])
    cols = np.full((60, 3), 128.0)
    meshes = build_scene_meshes(pts, cols, max_distance=5.0,
                                euclid_weight=1.0, color_weight=0.01,
                                min_cluster_points=10)
    assert len(meshes) == 1
    comp, tris = meshes[0]
    assert len(comp) == 60 and len(tris) > 40


def test_export_mesh_ply_covers_plane(tmp_path, rng):
    """Triangles of a meshed synthetic plane must be written to the PLY and
    tile (cover) the plane's convex hull — the artifact counterpart of the
    reference's per-cluster WMesh rendering (bestFittingPlane.cpp:42-127)."""
    uv = rng.uniform(0, 2.0, (80, 2))
    pts = np.concatenate([uv, np.zeros((80, 1))], axis=1)
    cols = np.full((80, 3), 90.0)
    meshes = build_scene_meshes(pts, cols, max_distance=5.0,
                                euclid_weight=1.0, color_weight=0.01,
                                min_cluster_points=10)
    assert len(meshes) == 1
    out = tmp_path / "m.ply"
    n_faces = export_mesh_ply(str(out), pts, cols, meshes)
    text = out.read_text().splitlines()
    assert f"element face {n_faces}" in "\n".join(text)
    hdr_end = text.index("end_header")
    n_vert = int(next(l for l in text if l.startswith("element vertex")).split()[-1])
    verts = np.array([[float(x) for x in l.split()[:3]]
                      for l in text[hdr_end + 1: hdr_end + 1 + n_vert]])
    faces = np.array([[int(x) for x in l.split()[1:4]]
                      for l in text[hdr_end + 1 + n_vert:]])
    assert len(faces) == n_faces and faces.max() < n_vert
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = np.abs(np.cross(b - a, c - a))[:, 2].sum() / 2
    from scipy.spatial import ConvexHull

    assert abs(area - ConvexHull(uv).volume) < 1e-6


def test_exports(tmp_path, rng):
    pts = rng.normal(size=(50, 3))
    cols = rng.integers(0, 255, (50, 3))
    ply = tmp_path / "c.ply"
    export_ply(str(ply), pts, cols)
    text = ply.read_text()
    assert "element vertex 50" in text
    png = tmp_path / "c.png"
    R = np.tile(np.eye(3), (3, 1, 1))
    t = np.zeros((3, 3))
    render_png(str(png), pts, cols, R, t)
    assert png.stat().st_size > 1000


def test_flycam_callbacks_reference_semantics():
    """Key mapping mirrors KeyboardViz3d (vizualizationModule.cpp:187-250):
    W/S move ±forward, A/D strafe, space up / C down by speed², +/- clamp
    speed to [0.25, 2.5]."""
    from slam_indoor_code_tpu.viz.pointcloud import flycam_callbacks

    moves = []
    cbs = flycam_callbacks(moves.append, speed0=1.0)
    cbs["W"]()
    cbs["S"]()
    cbs["A"]()
    cbs["D"]()
    cbs[" "]()
    cbs["C"]()
    assert moves == [(0.0, 0.0, 1.0), (0.0, 0.0, -1.0), (-1.0, 0.0, 0.0),
                     (1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 1.0, 0.0)]
    # speed bump changes step size; space scales with speed^2 (reference)
    cbs["+"]()
    assert cbs["_speed"]["speed"] == 1.25
    moves.clear()
    cbs["W"]()
    cbs[" "]()
    assert moves[0] == (0.0, 0.0, 1.25)
    assert moves[1] == (0.0, -1.25 * 1.25, 0.0)
    # clamp: never below 0.25 or above 2.5
    for _ in range(20):
        cbs["-"]()
    assert cbs["_speed"]["speed"] == 0.25
    for _ in range(20):
        cbs["+"]()
    assert cbs["_speed"]["speed"] == 2.5
