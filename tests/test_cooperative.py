"""Two-agent cooperative SLAM: keyframe exchange + cross-agent map merge.

The TPU-native analogue of the reference's two LCM-linked processes
(SURVEY.md section 0): agent 1 maps one arc of the cylinder scene, agent 0
maps an overlapping arc, then agent 0 receives agent 1's keyframe packets
(wire reconstruction, no images), place-recognizes the overlap, verifies a
Sim3, and aligns + fuses the foreign sub-map into its own frame.
"""

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, LoopConfig,
                               MapperConfig, SystemConfig, TrackerConfig)
from coslam_tpu.models import map_state as ms
from coslam_tpu.models.cooperative import CoopAgent, InMemoryBus
from coslam_tpu.utils import evaluation, synthetic

CFG = SystemConfig(
    camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
    extractor=ExtractorConfig(n_features=400, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=128, max_points=32768),
    loop=LoopConfig(min_kfs_between_loops=15, sim3_min_bow_matches=15,
                    sim3_min_inliers=12),
    tracker=TrackerConfig(init_min_matches=60, init_min_good=35),
)


@pytest.mark.slow
def test_two_agent_continued_correction():
    """Post-merge, cross-agent place recognition must stay ALIVE: with the
    receiver's loop closing ENABLED, later foreign keyframes arriving after
    the first Sim3 alignment keep correcting inter-map drift through the
    standard loop-closing path (reference: received keyframes enter
    LocalMapping at ros_mono.cc:2163 and LoopClosing keeps running —
    SURVEY.md section 3.5).  Requires >= 2 alignment/closure events."""
    cfg = CFG.replace(loop=LoopConfig(
        min_kfs_between_loops=8, sim3_min_bow_matches=15,
        sim3_min_inliers=12))
    scene = synthetic.make_cylinder_scene(700, seed=5)
    traj = synthetic.make_loop_trajectory(90, seed=5, frac=0.72)
    seq = synthetic.render_sequence(cfg.camera, traj, scene)

    a0 = CoopAgent(cfg, 0, enable_loop_closing=True)   # receiver: LC ON
    a1 = CoopAgent(cfg, 1, enable_loop_closing=False)
    for i in range(0, 38):
        a0.track_mono(seq[i], i)
    assert a0.state == "OK"

    bus = InMemoryBus()
    events = []
    # interleave sender tracking with periodic exchange (the reference's
    # cadence: batches published every ~8 frames while both nodes run)
    for i in range(30, 80):
        a1.track_mono(seq[i], i)
        if i % 8 == 0 or i == 79:
            bus.publish(1, a1.drain_packets(max_batch=10),
                        subscribers=[0, 1])
            for p in bus.drain(0):
                if a0.receive_packet(p):
                    events.append(i)
    assert a1.state == "OK"
    assert a0.n_merges >= 2, (
        f"only {a0.n_merges} alignment/closure events (at {events}) — "
        "post-merge cross-agent correction never fired")

    m = a0.map
    K = int(m.n_kf)
    valid = np.asarray(m.kf_valid[:K])
    fid = np.asarray(m.kf_frame_id[:K])
    centers = np.asarray(ms.kf_centers(m))[:K]
    gt_centers = evaluation.trajectory_xyz(traj.poses_cw[fid])
    ate_joint = evaluation.ate_rmse(centers[valid], gt_centers[valid])
    assert ate_joint < 0.3, f"joint ATE {ate_joint:.3f}"


@pytest.mark.slow
def test_two_agent_map_merge():
    scene = synthetic.make_cylinder_scene(700, seed=5)
    traj = synthetic.make_loop_trajectory(90, seed=5, frac=0.72)
    seq = synthetic.render_sequence(CFG.camera, traj, scene)

    a0 = CoopAgent(CFG, 0, enable_loop_closing=False)
    a1 = CoopAgent(CFG, 1, enable_loop_closing=False)
    for i in range(0, 38):
        a0.track_mono(seq[i], i)
    for i in range(30, 80):
        a1.track_mono(seq[i], i)
    assert a0.state == "OK" and a1.state == "OK"

    bus = InMemoryBus()
    bus.publish(1, a1.drain_packets(max_batch=1000), subscribers=[0, 1])
    pkts = bus.drain(0)
    # keyframe cadence on this arc settled at ~14 with the age-gated
    # point culling (reference MapPointCulling semantics); the functional
    # requirement is a batch big enough to exercise merging
    assert len(pkts) >= 10
    for p in pkts:
        a0.receive_packet(p)

    assert a0.n_merges >= 1, "foreign sub-map never aligned"
    m = a0.map
    K = int(m.n_kf)
    valid = np.asarray(m.kf_valid[:K])
    fid = np.asarray(m.kf_frame_id[:K])
    agent = np.asarray(a0.kf_agent[:K])
    # cadence note: the age-gated point culling (reference MapPointCulling
    # semantics) settled this arc at ~14 sender keyframes; the requirement
    # is that the batch integrates and merges
    assert (agent == 1).sum() >= 10, "foreign keyframes missing"

    centers = np.asarray(ms.kf_centers(m))[:K]
    gt_centers = evaluation.trajectory_xyz(traj.poses_cw[fid])
    ate_joint = evaluation.ate_rmse(centers[valid], gt_centers[valid])
    ate_own = evaluation.ate_rmse(centers[valid & (agent == 0)],
                                  gt_centers[valid & (agent == 0)])
    # merged map must be near the own-map accuracy, far below the
    # unaligned-frame error (~1.8 m before alignment)
    assert ate_joint < 0.3, f"joint ATE {ate_joint:.3f}"
    assert ate_joint < 4.0 * max(ate_own, 0.03)
