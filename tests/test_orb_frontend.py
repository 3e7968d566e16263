import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.config import CameraConfig, ExtractorConfig, MatcherConfig
from coslam_tpu.ops import fast as fast_ops
from coslam_tpu.ops import hamming, matching, orb
from coslam_tpu.utils import synthetic

CAM = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
CFG = ExtractorConfig(n_features=500, max_keypoints=512)


def _np_fast_score_at(img, y, x):
    """Scalar oracle for the FAST-9 score at one pixel."""
    circle = fast_ops.CIRCLE
    c = float(img[y, x])
    vals = np.array([float(img[y + dy, x + dx]) for dy, dx in circle])
    best = -1e9
    for d in (vals - c, c - vals):
        for start in range(16):
            arc = [d[(start + j) % 16] for j in range(fast_ops.ARC_LEN)]
            best = max(best, min(arc))
    return best


def test_fast_score_matches_oracle(rng):
    img = rng.integers(0, 255, (64, 64)).astype(np.float32)
    score = np.asarray(fast_ops.fast_score(jnp.asarray(img)))
    for y, x in [(10, 10), (20, 40), (31, 17), (50, 50), (33, 33)]:
        assert abs(score[y, x] - _np_fast_score_at(img, y, x)) < 1e-3


def test_fast_detects_square_corner():
    img = np.full((64, 64), 50, np.float32)
    img[20:40, 20:40] = 200.0
    score = np.asarray(fast_ops.nms3(fast_ops.fast_score(jnp.asarray(img))))
    ys, xs = np.nonzero(score > 20)
    pts = set(zip(ys.tolist(), xs.tolist()))
    # all four square corners produce a strong response within 2 px
    for cy, cx in [(20, 20), (20, 39), (39, 20), (39, 39)]:
        assert any(abs(y - cy) <= 2 and abs(x - cx) <= 2 for y, x in pts), (cy, cx)


def test_extract_shapes_and_validity():
    scene = synthetic.make_scene(400, seed=0)
    traj = synthetic.make_trajectory(2)
    img = synthetic.render_frame(CAM, traj.poses_cw[0], scene)
    kp = orb.extract(jnp.asarray(img), CFG)
    N = CFG.max_keypoints
    assert kp["uv"].shape == (N, 2) and kp["desc"].shape == (N, 8)
    nv = int(kp["valid"].sum())
    assert nv > 150, f"only {nv} keypoints detected"
    uv = np.asarray(kp["uv"])[np.asarray(kp["valid"])]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] < CAM.width).all()
    assert (uv[:, 1] >= 0).all() and (uv[:, 1] < CAM.height).all()
    # multiple pyramid levels contribute
    lv = np.asarray(kp["level"])[np.asarray(kp["valid"])]
    assert len(np.unique(lv)) >= 3


def test_hamming_vpu_equals_mxu(rng):
    a = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, (96, 8), dtype=np.uint32))
    d1 = np.asarray(hamming.pairwise_hamming(a, b))
    d2 = np.asarray(hamming.pairwise_hamming_mxu(a, b))
    np.testing.assert_array_equal(d1, d2)
    # oracle on a few entries
    for i, j in [(0, 0), (5, 7), (63, 95)]:
        expected = bin(int(np.bitwise_xor(np.asarray(a)[i], np.asarray(b)[j]).astype(object).sum() if False else 0)).count("1")
    av, bv = np.asarray(a), np.asarray(b)
    for i, j in [(0, 0), (5, 7), (63, 95)]:
        expected = sum(bin(int(av[i, k]) ^ int(bv[j, k])).count("1") for k in range(8))
        assert d1[i, j] == expected


def test_descriptors_match_across_viewpoint():
    """Two nearby views of the synthetic scene: matcher should link a solid
    fraction of keypoints between the frames with low Hamming distance."""
    scene = synthetic.make_scene(350, seed=1)
    traj = synthetic.make_trajectory(12)
    img0 = synthetic.render_frame(CAM, traj.poses_cw[5], scene)
    img1 = synthetic.render_frame(CAM, traj.poses_cw[6], scene)
    kp0 = orb.extract(jnp.asarray(img0), CFG)
    kp1 = orb.extract(jnp.asarray(img1), CFG)
    mcfg = MatcherConfig()
    mask = matching.window_mask(kp0["uv"], kp1["uv"], 60.0)
    m = matching.match(kp0["desc"], kp0["valid"], kp1["desc"], kp1["valid"],
                       mcfg, mask=mask, max_dist=64, ratio=0.9, mutual=True,
                       angle_q=kp0["angle"], angle_t=kp1["angle"])
    n0 = int(kp0["valid"].sum())
    nm = int(m.valid.sum())
    assert nm > 0.25 * n0, f"only {nm}/{n0} matched"
    # matched distances should be small for true correspondences
    dists = np.asarray(m.dist)[np.asarray(m.valid)]
    assert np.median(dists) < 40


def test_rotation_consistency_rejects_outliers(rng):
    n = 200
    angle_q = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    # consistent rotation of 0.5 rad for 80%, random for 20%
    angle_t = angle_q - 0.5
    bad = rng.random(n) < 0.2
    angle_t = np.where(bad, rng.uniform(0, 2 * np.pi, n), angle_t).astype(np.float32)
    idx = jnp.arange(n, dtype=jnp.int32)
    ok = matching.rotation_consistency(jnp.asarray(angle_q), jnp.asarray(angle_t),
                                       idx, jnp.ones(n, bool))
    ok = np.asarray(ok)
    assert ok[~bad].mean() > 0.95
    assert ok[bad].mean() < 0.3
