"""Map checkpoint/resume + CLI driver smoke test."""

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig)
from coslam_tpu.models.system import System
from coslam_tpu.utils import checkpoint, evaluation, synthetic

CAM = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
CFG = SystemConfig(
    camera=CAM,
    extractor=ExtractorConfig(n_features=500, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=32, max_points=4096),
)


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    scene = synthetic.make_scene(600, seed=3)
    traj = synthetic.make_trajectory(24, seed=3)
    seq = synthetic.render_sequence(CAM, traj, scene)

    # run half, checkpoint, restore into a fresh system, run the rest
    s1 = System(CFG)
    for i in range(12):
        s1.track_mono(seq[i], i)
    assert s1.state == "OK"
    path = str(tmp_path / "map.npz")
    checkpoint.save_system(path, s1)

    s2 = System(CFG)
    checkpoint.load_system(path, s2)
    assert s2.state == "OK"
    assert int(s2.map.n_kf) == int(s1.map.n_kf)
    for i in range(12, 24):
        T = s2.track_mono(seq[i], i)
    assert s2.state == "OK"
    ids, poses = s2.trajectory_poses()
    assert len(ids) >= 11  # frames after resume
    est = evaluation.trajectory_xyz(poses)
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids])
    assert evaluation.ate_rmse(est, gt) < 0.08


def test_cli_synthetic(capsys):
    from coslam_tpu import cli

    rc = cli.main(["synthetic", "--frames", "12"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ATE RMSE" in out and "frames tracked" in out
