"""Map-lifecycle machinery: compaction, geometric growth, index remapping.

The reference erases keyframes/points from its heap object graph and runs
indefinitely (reference ORB_SLAM2/src/Map.cc:55 EraseKeyFrame,
KeyFrame.cc:453 SetBadFlag, MapPoint.cc:141); the TPU map recycles
fixed-capacity SoA slots instead (models/compaction.py) and the System
remaps every host-side slot reference (trajectory anchors, DB rows, loop
edges, keypoint->landmark bindings).  These are the most index-bug-prone
paths in the repo — exercised here directly and through a forced-low-
capacity run in which compaction and growth fire repeatedly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig, TrackerConfig)
from coslam_tpu.models import compaction, map_state as ms
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, synthetic

CAM = CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320, height=240)


def _toy_map(cfg, n_kf=6, n_pt=40, drop_kf=(2, 4), drop_pt=(3, 7, 11)):
    """Small populated map with some culled rows."""
    rng = np.random.default_rng(0)
    m = ms.empty_map(cfg)
    K = cfg.mapper.max_keyframes
    P = cfg.mapper.max_points
    N = cfg.extractor.max_keypoints
    kf_valid = np.zeros(K, bool)
    kf_valid[:n_kf] = True
    kf_valid[list(drop_kf)] = False
    pt_valid = np.zeros(P, bool)
    pt_valid[:n_pt] = True
    pt_valid[list(drop_pt)] = False
    obs = np.full((K, N), -1, np.int32)
    for k in range(n_kf):
        # each keyframe observes a handful of points
        ids = rng.choice(n_pt, size=min(10, N), replace=False)
        obs[k, : len(ids)] = ids
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:n_kf, :3, 3] = rng.normal(0, 1, (n_kf, 3))
    return m._replace(
        kf_pose=jnp.asarray(poses),
        kf_valid=jnp.asarray(kf_valid),
        kf_frame_id=jnp.asarray(np.arange(K, dtype=np.int32)),
        kf_kp_valid=jnp.asarray(np.ones((K, N), bool)),
        kf_obs_pt=jnp.asarray(obs),
        pt_pos=jnp.asarray(rng.normal(0, 1, (P, 3)).astype(np.float32)),
        pt_valid=jnp.asarray(pt_valid),
        pt_ref_kf=jnp.asarray(
            rng.integers(0, n_kf, P).astype(np.int32)),
        pt_first_kf=jnp.asarray(np.full(P, 1, np.int32)),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_pt=jnp.asarray(n_pt, jnp.int32),
    )


def test_compact_invariants():
    cfg = SystemConfig(
        camera=CAM,
        extractor=ExtractorConfig(n_features=60, max_keypoints=64),
        mapper=MapperConfig(max_keyframes=8, max_points=64))
    m = _toy_map(cfg)
    new, kf_map, pt_map = compaction.compact(cfg, m)

    kf_valid = np.asarray(m.kf_valid)
    pt_valid = np.asarray(m.pt_valid)
    # every surviving row keeps its data at the remapped slot
    for old in np.nonzero(kf_valid)[0]:
        new_i = kf_map[old]
        assert new_i >= 0
        np.testing.assert_array_equal(
            np.asarray(m.kf_pose[old]), np.asarray(new.kf_pose[new_i]))
        assert int(m.kf_frame_id[old]) == int(new.kf_frame_id[new_i])
    for old in np.nonzero(pt_valid)[0]:
        new_i = pt_map[old]
        assert new_i >= 0
        np.testing.assert_array_equal(
            np.asarray(m.pt_pos[old]), np.asarray(new.pt_pos[new_i]))
    # culled rows map to -1 and nothing references them afterwards
    assert (kf_map[~kf_valid] == -1).all()
    assert (pt_map[~pt_valid] == -1).all()
    obs_new = np.asarray(new.kf_obs_pt)
    ok = obs_new >= 0
    assert np.asarray(new.pt_valid)[obs_new[ok]].all(), \
        "observation references a culled/unmapped landmark"
    # observations survive the remap: (kf, pt) pairs are preserved
    obs_old = np.asarray(m.kf_obs_pt)
    for old_k in np.nonzero(kf_valid)[0]:
        src = obs_old[old_k]
        src_ok = (src >= 0) & pt_valid[np.maximum(src, 0)]
        expected = set(pt_map[src[src_ok]].tolist())
        got = set(obs_new[kf_map[old_k]][obs_new[kf_map[old_k]] >= 0].tolist())
        assert expected == got
    # counters are compacted
    assert int(new.n_kf) == kf_valid.sum()
    assert int(new.n_pt) == pt_valid.sum()
    # slot order stays chronological (stable compaction)
    fid = np.asarray(new.kf_frame_id)[: int(new.n_kf)]
    assert (np.diff(fid) > 0).all()


def test_grow_preserves_contents():
    cfg = SystemConfig(
        camera=CAM,
        extractor=ExtractorConfig(n_features=60, max_keypoints=64),
        mapper=MapperConfig(max_keyframes=8, max_points=64))
    m = _toy_map(cfg)
    cfg2, big = compaction.grow(cfg, m, 16, 128)
    assert cfg2.mapper.max_keyframes == 16
    assert cfg2.mapper.max_points == 128
    assert big.kf_pose.shape[0] == 16 and big.pt_pos.shape[0] == 128
    np.testing.assert_array_equal(np.asarray(m.kf_obs_pt),
                                  np.asarray(big.kf_obs_pt)[:8])
    np.testing.assert_array_equal(np.asarray(m.pt_pos),
                                  np.asarray(big.pt_pos)[:64])
    assert not np.asarray(big.kf_valid)[8:].any()
    assert not np.asarray(big.pt_valid)[64:].any()
    assert int(big.n_kf) == int(m.n_kf) and int(big.n_pt) == int(m.n_pt)


@pytest.mark.slow
def test_long_run_bounded_memory():
    """Long-horizon smoke: ~2000 frames of a repeating orbit at tiny shapes.
    The slot-recycling lifecycle must keep the system running with BOUNDED
    capacities (compaction recycles culled slots; growth, if any, stays
    geometric) and roughly flat per-frame cost — the property the reference
    gets from erasing keyframes (Map.cc:55) and the round-2 review flagged
    as claimed-but-never-demonstrated."""
    import time

    cam = CameraConfig(fx=200, fy=200, cx=120, cy=90, width=240, height=180)
    cfg = SystemConfig(
        camera=cam,
        extractor=ExtractorConfig(n_features=200, max_keypoints=128,
                                  n_levels=4),
        mapper=MapperConfig(max_keyframes=24, max_points=2048,
                            triangulation_neighbors=4, ba_window=8),
        tracker=TrackerConfig(init_min_matches=40, init_min_good=25),
    )
    scene = synthetic.make_cylinder_scene(600, seed=9)
    n = 2000
    traj = synthetic.make_loop_trajectory(n, seed=9, frac=8.0)  # 8 laps
    slam = System(cfg, enable_loop_closing=False)
    t_half = t_full = None
    CHUNK = 250
    t0 = time.time()
    for lo in range(0, n, CHUNK):
        frames = [synthetic.render_frame(cam, traj.poses_cw[i], scene)
                  for i in range(lo, min(lo + CHUNK, n))]
        slam.run_sequence(frames, frame_ids=list(range(lo, lo + len(frames))))
        if lo + CHUNK == n // 2:
            t_half = time.time() - t0
    t_full = time.time() - t0

    assert slam.n_frames_tracked == n
    tracked = sum(1 for s in slam.stats if not s.get("lost"))
    assert tracked > 0.85 * len(slam.stats), \
        f"only {tracked}/{len(slam.stats)} frames tracked"
    # capacities stayed bounded: growth is geometric and must PLATEAU —
    # after 8 identical laps the map fits a small multiple of the initial
    # capacity.  (8x, not 4x: fuse no longer double-binds a landmark to two
    # keypoints of one keyframe, so observation counts are no longer
    # inflated and the keyframe-culling equilibrium sits higher.)
    # 16x, not 8x: mature landmarks are no longer found-ratio-culled (the
    # age gate of reference MapPointCulling, LocalMapping.cc:198-204), so
    # the keyframe-culling equilibrium sits higher; growth still has to
    # PLATEAU (geometric growth to 8 laps of identical content)
    assert slam.cfg.mapper.max_keyframes <= 24 * 16
    assert slam.cfg.mapper.max_points <= 2048 * 4
    # flat cost: the second half must not be dramatically slower (an O(K^2)
    # or leak-like blowup would at least double it)
    assert t_full - t_half < 2.5 * t_half, (t_half, t_full)
    # host mirrors stayed exact through every compaction
    assert slam._host_n_kf == int(np.asarray(slam.map.n_kf))


@pytest.mark.slow
def test_forced_compaction_and_growth_run():
    """End-to-end run with capacities forced LOW so compaction fires
    repeatedly and geometric growth triggers at least once — the remapping
    of trajectory anchors, DB rows and keypoint bindings must keep the
    system consistent (finite ATE, no crash, no index corruption)."""
    cfg = SystemConfig(
        camera=CAM,
        extractor=ExtractorConfig(n_features=300, max_keypoints=256),
        mapper=MapperConfig(max_keyframes=12, max_points=2048,
                            triangulation_neighbors=4),
        tracker=TrackerConfig(init_min_matches=50, init_min_good=30))
    scene = synthetic.make_scene(500, seed=7)
    traj = synthetic.make_trajectory(40, seed=7)
    seq = synthetic.render_sequence(CAM, traj, scene)
    slam = System(cfg)
    slam.run_sequence(seq)
    # growth/compaction must have fired given 12-KF capacity and a
    # ~10-keyframe trajectory with culling churn
    grew = slam.cfg.mapper.max_keyframes > 12 \
        or slam.cfg.mapper.max_points > 2048
    ids, poses = slam.trajectory_poses()
    assert len(ids) >= 30, f"only {len(ids)} frames tracked"
    est = evaluation.trajectory_xyz(poses)
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids])
    ate = evaluation.ate_rmse(est, gt)
    assert np.isfinite(ate) and ate < 0.10, f"ATE {ate:.3f} m after lifecycle churn"
    # index invariants after all the churn
    m = slam.map
    obs = np.asarray(m.kf_obs_pt)
    ok = obs >= 0
    assert (obs[ok] < m.pt_pos.shape[0]).all()
    # host mirrors stayed exact
    assert slam._host_n_kf == int(np.asarray(m.n_kf))
    # the DB rows track valid keyframes only
    assert slam.db.bows.shape[0] == slam.cfg.mapper.max_keyframes
    if grew:
        assert slam.db.has.shape[0] == slam.cfg.mapper.max_keyframes
