"""Fast smoke tier: a few frames of the REAL pipeline at tiny shapes.

`pytest -m smoke` must stay under ~60 s on a 2-core CPU host: this is the
end-to-end health gate future changes (and the verify recipe) run first,
before committing to the ~10 min slow tier.  It exercises the same code
paths as the slow integration tests — init, fused tracking, fused backend
insertion (triangulation + windowed local BA + culling) — at reduced
capacities and frame counts.
"""

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig, TrackerConfig)
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, synthetic

CAM = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
CFG = SystemConfig(
    camera=CAM,
    extractor=ExtractorConfig(n_features=500, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=16, max_points=4096, ba_window=8),
    tracker=TrackerConfig(init_min_matches=60, init_min_good=35),
)


@pytest.mark.smoke
def test_smoke_mono_pipeline():
    scene = synthetic.make_scene(600, seed=3)
    traj = synthetic.make_trajectory(30, seed=3)
    seq = synthetic.render_sequence(CAM, traj, scene)[:8]
    slam = System(CFG, enable_loop_closing=False)
    for i, img in enumerate(seq):
        slam.track_mono(img, i)
    assert slam.state == "OK"
    ids, poses = slam.trajectory_poses()
    assert len(ids) >= 6
    ate = evaluation.ate_rmse(evaluation.trajectory_xyz(poses),
                              evaluation.trajectory_xyz(traj.poses_cw[ids]))
    assert ate < 0.08, f"smoke ATE {ate:.3f} m"
    assert int(np.asarray(slam.map.kf_valid).sum()) >= 2
    assert int(np.asarray(slam.map.pt_valid).sum()) > 50
