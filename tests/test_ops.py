"""Feature-op tests: FAST vs cv2 oracle (statistical parity), descriptor
matching quality across synthetic views, kNN correctness vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_indoor_code_tpu.ops import fast, image, knn, orb, sift


@pytest.fixture(scope="module")
def frame(scene):
    return scene.render(0)


@pytest.fixture(scope="module")
def gray(frame):
    return jnp.asarray(image.rgb_to_gray(jnp.asarray(frame)))


# ------------------------------------------------------------------ FAST
def test_fast_finds_blob_corners(scene, gray):
    det = fast.detect(gray, threshold=20.0, max_keypoints=1024)
    n = int(det["valid"].sum())
    assert n > 100, f"only {n} corners"
    # detected corners should lie near projected blob centers
    uv, vis = scene.project(0)
    centers = uv[vis]
    xy = np.asarray(det["xy"])[np.asarray(det["valid"])]
    d = np.linalg.norm(xy[:, None, :] - centers[None], axis=-1).min(axis=1)
    assert np.median(d) < 4.0


def test_fast_against_cv2_oracle(gray):
    cv2 = pytest.importorskip("cv2")
    img8 = np.asarray(gray).astype(np.uint8)
    det_cv = cv2.FastFeatureDetector_create(20, True, cv2.FastFeatureDetector_TYPE_9_16)
    kps = det_cv.detect(img8, None)
    cv_xy = np.array([k.pt for k in kps]) if kps else np.zeros((0, 2))
    ours = fast.detect(jnp.asarray(img8, jnp.float32), 20.0, 2048)
    our_xy = np.asarray(ours["xy"])[np.asarray(ours["valid"])]
    assert len(our_xy) > 0 and len(cv_xy) > 0
    # statistical parity: most OpenCV corners have one of ours within 2px
    d = np.linalg.norm(cv_xy[:, None] - our_xy[None], axis=-1).min(axis=1)
    assert (d <= 2.0).mean() > 0.8, f"only {(d <= 2.0).mean():.2f} of cv2 corners matched"


def test_fast_threshold_monotone(gray):
    lo = fast.detect(gray, 10.0, 4096)
    hi = fast.detect(gray, 40.0, 4096)
    assert int(lo["num_corners"]) >= int(hi["num_corners"])


def test_fast_batch(gray):
    batch = jnp.stack([gray, gray * 0 + 96.0])  # textured + flat frame
    det = fast.detect_batch(batch, 20.0, 512, True)
    assert int(det["valid"][0].sum()) > 50
    assert int(det["valid"][1].sum()) == 0  # flat frame: no corners


# ------------------------------------------------------------- descriptors
def _detect_and_describe(scene, frame_idx, kind, k=512):
    g = jnp.asarray(image.rgb_to_gray(jnp.asarray(scene.render(frame_idx))))
    det = fast.detect(g, 20.0, k)
    mod = orb if kind == "orb" else sift
    d = mod.describe(g, det["xy"], det["valid"])
    return det, d


@pytest.mark.parametrize("kind,metric", [("orb", "hamming"), ("sift", "l2")])
def test_descriptor_matching_across_views(scene, kind, metric):
    det0, d0 = _detect_and_describe(scene, 0, kind)
    det1, d1 = _detect_and_describe(scene, 1, kind)
    m = knn.match_pair(d0["desc"], d0["valid"], d1["desc"], d1["valid"],
                       ratio=0.8, metric=metric)
    n = int(m["num_matches"])
    assert n > 50, f"{kind}: only {n} matches"

    # Verify matches are geometrically consistent: matched keypoints should
    # correspond to projections of the same landmark.
    uv0, vis0 = scene.project(0)
    uv1, vis1 = scene.project(1)
    xy0 = np.asarray(det0["xy"])
    xy1 = np.asarray(det1["xy"])
    is_m = np.asarray(m["is_match"])
    tr = np.asarray(m["train_idx"])
    # nearest landmark to each keypoint
    def nearest_lm(xy, uv):
        d = np.linalg.norm(xy[:, None] - uv[None], axis=-1)
        return d.argmin(1), d.min(1)
    lm0, d0_ = nearest_lm(xy0, uv0)
    lm1, d1_ = nearest_lm(xy1, uv1)
    qi = np.flatnonzero(is_m)
    # FAST corners sit on blob edges (~up to 5px from the landmark center),
    # so gate on blob radius and require landmark agreement.
    near = (d0_[qi] < 6) & (d1_[tr[qi]] < 6)
    agree = lm0[qi] == lm1[tr[qi]]
    assert near.mean() > 0.8
    assert agree[near].mean() > 0.9, f"{kind}: inlier rate {agree[near].mean():.2f}"


# ------------------------------------------------------------------- kNN
def test_top2_matches_numpy(rng):
    a = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(80, 32)), jnp.float32)
    m = knn.match_pair(a, jnp.ones(64, bool), b, jnp.ones(80, bool),
                       ratio=1.0, metric="l2")
    d_np = ((np.asarray(a)[:, None] - np.asarray(b)[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(m["train_idx"]), d_np.argmin(1))


def test_ratio_test_semantics(rng):
    # two identical train descriptors → d1==d2 → ratio test must fail
    a = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    b = jnp.concatenate([a, a], axis=0)
    m = knn.match_pair(a, jnp.ones(4, bool), b, jnp.ones(8, bool),
                       ratio=0.99, metric="l2")
    assert int(m["num_matches"]) == 0


def test_hamming_distance_exact():
    a = jnp.asarray([[0b1011, 0]], jnp.uint32)
    b = jnp.asarray([[0b0010, 0], [0b1011, 1]], jnp.uint32)
    d = knn.hamming_distance(a, b)
    np.testing.assert_array_equal(np.asarray(d), [[2.0, 1.0]])


def test_match_batch_counts(rng):
    a = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    # batch: frame 0 = same descriptors (all match), frame 1 = random
    b = jnp.stack([a + 0.001 * rng.normal(size=(32, 16)).astype(np.float32),
                   jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)])
    vb = jnp.ones((2, 32), bool)
    m = knn.match_batch(a, jnp.ones(32, bool), b, vb, jnp.asarray([True, True]),
                        ratio=0.7, metric="l2")
    counts = np.asarray(m["num_matches"])
    assert counts[0] > 25
    assert counts[0] > counts[1]
    # padding frame masked out
    m2 = knn.match_batch(a, jnp.ones(32, bool), b, vb, jnp.asarray([True, False]),
                         ratio=0.7, metric="l2")
    assert int(np.asarray(m2["num_matches"])[1]) == 0


def test_sift_downscale_quality(scene):
    """Half-res dense maps keep cross-view match quality (the FHD fast path)."""
    import jax.numpy as jnp

    def dd(i, ds):
        g = jnp.asarray(image.rgb_to_gray(jnp.asarray(scene.render(i))))
        det = fast.detect(g, 20.0, 512)
        d = sift.describe(g, det["xy"], det["valid"], downscale=ds)
        return det, d

    det0, d0 = dd(0, 2)
    det1, d1 = dd(1, 2)
    m = knn.match_pair(d0["desc"], d0["valid"], d1["desc"], d1["valid"],
                       ratio=0.8, metric="l2")
    assert int(m["num_matches"]) > 40
