import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig)
from coslam_tpu.models.system import System
from coslam_tpu.ops import pnp
from coslam_tpu.utils import geometry as geo
from coslam_tpu.utils import synthetic

CAM = CameraConfig(fx=450, fy=450, cx=320, cy=240, width=640, height=480)


def test_ransac_pnp_recovers_pose(rng):
    n = 200
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], 1).astype(np.float32)
    T_gt = np.asarray(geo.exp_se3(jnp.asarray(
        [0.3, -0.2, 0.1, 0.05, -0.08, 0.12], jnp.float32)))
    pc = X @ T_gt[:3, :3].T + T_gt[:3, 3]
    uv = np.stack([pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx,
                   pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy], 1)
    uv += rng.normal(0, 0.3, uv.shape)
    out = rng.random(n) < 0.3
    uv[out] += rng.uniform(-100, 100, (int(out.sum()), 2))

    res = pnp.ransac_pnp(CAM, jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
                         jnp.ones(n, bool), jax.random.PRNGKey(0))
    T = np.asarray(res.T)
    dT = T @ np.linalg.inv(T_gt)
    ang = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rot err {ang}"
    assert np.linalg.norm(dT[:3, 3]) < 0.05
    inl = np.asarray(res.inliers)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.1


@pytest.mark.slow
def test_relocalization_after_kidnap():
    """Track a sequence, 'kidnap' the camera (blank frames break tracking),
    then return to a previously-seen viewpoint: the system must relocalize
    via place recognition + EPnP (reference Tracking.cc:1343)."""
    cam = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
    cfg = SystemConfig(
        camera=cam,
        extractor=ExtractorConfig(n_features=500, max_keypoints=512),
        mapper=MapperConfig(max_keyframes=48, max_points=8192),
    )
    scene = synthetic.make_scene(600, seed=3)
    traj = synthetic.make_trajectory(30, seed=3)
    seq = synthetic.render_sequence(cam, traj, scene)
    slam = System(cfg)
    for i in range(20):
        slam.track_mono(seq[i], i)
    assert slam.state == "OK"
    blank = np.full_like(seq[0], 96)
    for i in range(3):
        slam.track_mono(blank, 100 + i)
    assert slam.state == "LOST"
    # return near frame 10's viewpoint
    recovered = False
    for i in (10, 11, 12, 13):
        slam.track_mono(seq[i], 200 + i)
        if slam.state == "OK":
            recovered = True
            break
    assert recovered, "relocalization failed"
    assert getattr(slam, "n_relocalizations", 0) >= 1