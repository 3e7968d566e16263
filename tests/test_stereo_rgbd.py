"""Stereo and RGB-D pipelines: metric-scale tracking on synthetic sequences."""

import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig)
from coslam_tpu.models.system import System
from coslam_tpu.ops import orb, stereo as stereo_ops
from coslam_tpu.utils import evaluation, synthetic

CAM = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480,
                   bf=400 * 0.12)  # 12 cm baseline
CFG = SystemConfig(
    camera=CAM,
    extractor=ExtractorConfig(n_features=500, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=32, max_points=8192),
    sensor="stereo",
)


def test_stereo_depth_accuracy():
    scene = synthetic.make_scene(500, seed=7)
    traj = synthetic.make_trajectory(3, seed=7)
    left, right = synthetic.render_stereo_frame(CAM, traj.poses_cw[0], scene,
                                                baseline=0.12)
    kpsL = orb.extract(jnp.asarray(left), CFG.extractor)
    kpsR = orb.extract(jnp.asarray(right), CFG.extractor)
    sd = stereo_ops.match_stereo(CAM, CFG.extractor, CFG.matcher,
                                 kpsL, kpsR, jnp.asarray(left),
                                 jnp.asarray(right))
    n_valid = int(sd.valid.sum())
    assert n_valid > 100, f"only {n_valid} stereo matches"
    # compare against ground-truth depth at the keypoint locations
    gt_depth = synthetic.render_depth(CAM, traj.poses_cw[0], scene)
    uv = np.asarray(kpsL["uv"])
    est = np.asarray(sd.depth)
    ok = np.asarray(sd.valid)
    errs = []
    for i in np.nonzero(ok)[0]:
        x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if 0 <= x < CAM.width and 0 <= y < CAM.height and gt_depth[y, x] > 0:
            errs.append(abs(est[i] - gt_depth[y, x]) / gt_depth[y, x])
    assert len(errs) > 50
    assert np.median(errs) < 0.05, f"median rel depth err {np.median(errs)}"


@pytest.mark.slow
def test_rgbd_slam_metric_scale():
    scene = synthetic.make_scene(600, seed=3)
    traj = synthetic.make_trajectory(20, seed=3)
    cfg = CFG.replace(sensor="rgbd")
    slam = System(cfg)
    for i, T in enumerate(traj.poses_cw):
        img = synthetic.render_frame(CAM, T, scene)
        depth = synthetic.render_depth(CAM, T, scene)
        slam.track_rgbd(img, depth, i)
    assert slam.state == "OK"
    ids, poses = slam.trajectory_poses()
    assert len(ids) >= 18
    est = evaluation.trajectory_xyz(poses)
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids])
    # metric evaluation: NO scale alignment — depth fixes the scale
    ate = evaluation.ate_rmse(est, gt, with_scale=False)
    # synthetic billboards give corner keypoints their landmark-center
    # depth, which is view-dependent in 3D — an irreducible artifact of the
    # renderer, not the pipeline; the gate reflects it
    assert ate < 0.2, f"metric ATE {ate:.4f} m"


@pytest.mark.slow
def test_stereo_slam():
    scene = synthetic.make_scene(600, seed=4)
    traj = synthetic.make_trajectory(15, seed=4)
    slam = System(CFG)
    for i, T in enumerate(traj.poses_cw):
        left, right = synthetic.render_stereo_frame(CAM, T, scene,
                                                    baseline=0.12)
        slam.track_stereo(left, right, i)
    assert slam.state == "OK"
    ids, poses = slam.trajectory_poses()
    assert len(ids) >= 13
    est = evaluation.trajectory_xyz(poses)
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids])
    ate = evaluation.ate_rmse(est, gt, with_scale=False)
    assert ate < 0.25, f"metric ATE {ate:.4f} m"
