"""Loop-closure integration: a full circle around a cylinder scene.

Monocular drift accumulates over ~90 frames; on revisit the system must
detect the loop (place recognition + landmark match shortlist), verify it
geometrically (Sim3 RANSAC), and correct the map (fusion + essential-graph
optimization + global BA) — the reference LoopClosing thread's full path
(SURVEY.md 3.3)."""

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, LoopConfig,
                               MapperConfig, SystemConfig, TrackerConfig)
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, synthetic

CFG = SystemConfig(
    camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
    extractor=ExtractorConfig(n_features=400, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=96, max_points=16384),
    loop=LoopConfig(min_kfs_between_loops=15, sim3_min_bow_matches=15,
                    sim3_min_inliers=12),
    tracker=TrackerConfig(init_min_matches=60, init_min_good=35),
)


@pytest.mark.slow
def test_loop_closure_full_circle():
    # 1.25 laps: the revisit stretch must span several keyframes so the
    # covisibility-consistency chain (reference LoopClosing.cc:43,
    # mnCovisibilityConsistencyTh=3 CONSECUTIVE keyframes) can build — with
    # the reference-faithful keyframe policy a single-frame seam inserts
    # only one revisit keyframe and no chain can form (real sequences
    # always re-traverse the loop region over many frames)
    scene = synthetic.make_cylinder_scene(700, seed=5)
    traj = synthetic.make_loop_trajectory(115, seed=5, frac=1.25)
    seq = synthetic.render_sequence(CFG.camera, traj, scene)
    slam = System(CFG)
    for i, img in enumerate(seq):
        slam.track_mono(img, i)

    assert slam.state == "OK"
    assert slam.n_loops_closed >= 1, "no loop closure detected"
    ids, poses = slam.trajectory_poses()
    assert len(ids) > 100
    est = evaluation.trajectory_xyz(poses)
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids])
    ate = evaluation.ate_rmse(est, gt)
    # trajectory is a 6 m-circumference circle; corrected ATE must stay
    # well-bounded (pre-correction drift measured ~0.29 m)
    assert ate < 0.35, f"ATE {ate:.3f} m"
