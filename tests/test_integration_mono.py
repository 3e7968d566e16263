"""End-to-end monocular SLAM on a synthetic rendered sequence.

The TPU-native analogue of running the reference mono node on a dataset and
evaluating ATE offline (reference System::SaveTrajectoryTUM, System.cc:325;
SURVEY.md section 4).  Ground truth is exact, so this asserts the full
pipeline: extraction -> init -> tracking -> keyframes -> triangulation ->
local BA -> culling.
"""

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig)
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, synthetic

CAM = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
CFG = SystemConfig(
    camera=CAM,
    extractor=ExtractorConfig(n_features=500, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=32, max_points=4096),
)


@pytest.mark.slow
def test_mono_slam_ate():
    scene = synthetic.make_scene(600, seed=3)
    traj = synthetic.make_trajectory(30, seed=3)
    seq = synthetic.render_sequence(CAM, traj, scene)
    slam = System(CFG)
    for i, img in enumerate(seq):
        slam.track_mono(img, i)

    assert slam.state == "OK"
    ids, poses = slam.trajectory_poses()
    assert len(ids) >= 25, f"only {len(ids)} frames tracked"
    est_xyz = evaluation.trajectory_xyz(poses)
    gt_xyz = evaluation.trajectory_xyz(traj.poses_cw[ids])
    ate = evaluation.ate_rmse(est_xyz, gt_xyz)
    # trajectory extent is ~2.5 m; ORB-SLAM2-class accuracy is ~1 % of extent
    assert ate < 0.05, f"ATE {ate:.4f} m"
    # map should contain a healthy landmark set
    n_pts = int(slam.map.pt_valid.sum())
    assert n_pts > 250, f"only {n_pts} map points"
    # tracking quality: median inliers comfortably above the keyframe gates
    inl = [s["inliers"] for s in slam.stats if not s.get("lost")]
    assert np.median(inl) > 80
