"""IO format parity tests: txt logs round-trip, OpenCV-XML interop, natural
sort (reference: src/misc/IOmisc.cpp)."""

import numpy as np
import pytest

from slam_indoor_code_tpu.io import (
    GlobalData,
    LogStreams,
    format_matrix,
    load_global_data_from_logs,
    load_matrix_from_xml,
    natural_sort_paths,
    save_calib_parameters_to_xml,
    save_matrix_to_xml,
)


def test_format_matrix_12_decimals():
    # rawOutput writes fixed 12-decimal, space-separated (IOmisc.cpp:96)
    out = format_matrix(np.array([[1.0, 2.5], [3.0, -0.125]]))
    assert out == "1.000000000000 2.500000000000\n3.000000000000 -0.125000000000\n"


def test_logs_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    R = np.linalg.qr(rng.normal(size=(4, 3, 3)))[0]
    t = rng.normal(size=(4, 3))
    pts = rng.normal(size=(17, 3))
    cols = rng.integers(0, 255, size=(17, 3)).astype(np.uint8)
    with LogStreams(str(tmp_path)) as logs:
        for i in range(4):
            logs.write_pose(R[i], t[i])
        logs.write_map(pts, cols)
    gd = load_global_data_from_logs(str(tmp_path))
    np.testing.assert_allclose(gd.rotations, R, atol=1e-9)
    np.testing.assert_allclose(gd.positions, t, atol=1e-9)
    np.testing.assert_allclose(gd.points, pts, atol=1e-9)
    np.testing.assert_array_equal(gd.colors, cols)


def test_logs_count_mismatch_rejected(tmp_path):
    with LogStreams(str(tmp_path)) as logs:
        logs.write_pose(np.eye(3), np.zeros(3))
        # extra rotation with no pose
        from slam_indoor_code_tpu.io import write_matrix
        write_matrix(np.eye(3), logs.rotations)
    with pytest.raises(ValueError, match="rotations and translations"):
        load_global_data_from_logs(str(tmp_path))


def test_xml_roundtrip(tmp_path):
    K = np.array([[1700.0, 0, 920.0], [0, 1710.0, 500.0], [0, 0, 1]])
    dc = np.array([[-0.02, 1.36, -0.002, -0.004, -7.7]])
    path = str(tmp_path / "cam.xml")
    save_calib_parameters_to_xml(path, K, dc, np.zeros((3, 3)), np.ones((3, 3)))
    np.testing.assert_allclose(load_matrix_from_xml(path, "K"), K)
    np.testing.assert_allclose(load_matrix_from_xml(path, "DC"), dc)
    np.testing.assert_allclose(load_matrix_from_xml(path, "T"), np.ones((3, 3)))


def test_xml_reads_reference_device_profiles():
    # The reference ships 17 device calibration XMLs; read one directly.
    K = load_matrix_from_xml("/root/reference/config/samsung-hv-2.xml", "K")
    assert K.shape == (3, 3)
    assert abs(K[0, 0] - 1701.5821657657998) < 1e-6
    dc = load_matrix_from_xml("/root/reference/config/samsung-hv-2.xml", "DC")
    assert dc.shape == (1, 5)


def test_natural_sort_matches_reference_semantics():
    # shorter first, then lexicographic (sortGlobs, IOmisc.cpp:36-51)
    paths = ["ph/img10.jpg", "ph/img2.jpg", "ph/img1.jpg", "ph/img11.jpg"]
    assert natural_sort_paths(paths) == [
        "ph/img1.jpg",
        "ph/img2.jpg",
        "ph/img10.jpg",
        "ph/img11.jpg",
    ]


def test_global_data_extend():
    gd = GlobalData()
    sub = GlobalData()
    sub.append_points(np.ones((3, 3)), np.zeros((3, 3)))
    sub.append_cameras(np.stack([np.eye(3)] * 2), np.zeros((2, 3)))
    gd.extend(sub)
    gd.extend(sub)
    assert gd.points.shape == (6, 3)
    assert gd.rotations.shape == (4, 3, 3)
    assert not gd.empty


def test_native_io_decode_and_sequence(tmp_path, rng):
    """Native C++ decoder (libjpeg/libpng + prefetch ring) matches PIL."""
    from PIL import Image

    from slam_indoor_code_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native slamio not built")
    imgs = []
    for i in range(5):
        a = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
        Image.fromarray(a).save(tmp_path / f"f{i}.png")
        imgs.append(a)
    d = native.imread_rgb(str(tmp_path / "f0.png"))
    np.testing.assert_array_equal(d, imgs[0])
    seq = native.NativeSequence([str(tmp_path / f"f{i}.png") for i in range(5)],
                                capacity=2, threads=2)
    got = list(seq)
    assert len(got) == 5
    for g, a in zip(got, imgs):
        np.testing.assert_array_equal(g, a)


def test_media_source_uses_native(tmp_path, rng):
    from PIL import Image

    from slam_indoor_code_tpu.io import MediaSource, native

    for i in range(3):
        a = rng.integers(0, 255, (16, 20, 3)).astype(np.uint8)
        Image.fromarray(a).save(tmp_path / f"img{i+1}.png")
    ms = MediaSource(photos_pattern=str(tmp_path / "*.png"), use_photos=True)
    frames = list(ms)
    assert len(frames) == 3
    assert frames[0].shape == (16, 20, 3)
