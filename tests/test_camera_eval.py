import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import CameraConfig, tum_fr1_config
from coslam_tpu.utils import camera as cam_mod
from coslam_tpu.utils import evaluation, synthetic


def test_undistort_roundtrip():
    cam = tum_fr1_config().camera  # strong fr1 distortion
    rng = np.random.default_rng(0)
    xn = (rng.uniform(-0.3, 0.3, (200, 2))).astype(np.float32)
    xd = cam_mod.distort_normalized(cam, jnp.asarray(xn))
    xn2 = np.asarray(cam_mod.undistort_normalized(cam, xd, iters=12))
    np.testing.assert_allclose(xn2, xn, atol=1e-4)


def test_project_backproject():
    cam = CameraConfig(fx=500, fy=510, cx=320, cy=240, width=640, height=480)
    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(-2, 2, 50), rng.uniform(-1.5, 1.5, 50),
                    rng.uniform(2, 10, 50)], axis=1).astype(np.float32)
    uv, z = cam_mod.project(cam, jnp.asarray(pts))
    back = np.asarray(cam_mod.backproject(cam, uv, z))
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(2)
    src = rng.standard_normal((100, 3))
    from coslam_tpu.utils import geometry as geo
    R = np.asarray(geo.exp_so3(jnp.asarray([0.3, -0.4, 0.9], jnp.float32)))
    s, t = 1.9, np.array([2.0, -1.0, 0.5])
    dst = s * src @ R.T + t
    s2, R2, t2 = evaluation.umeyama_alignment(src, dst, with_scale=True)
    assert abs(float(s2) - s) < 1e-6
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
    assert evaluation.ate_rmse(src, dst, with_scale=True) < 1e-6


def test_synthetic_sequence_shapes():
    cam = CameraConfig(fx=400, fy=400, cx=160, cy=120, width=320, height=240)
    scene = synthetic.make_scene(300, seed=3)
    traj = synthetic.make_trajectory(5)
    seq = synthetic.render_sequence(cam, traj, scene)
    assert seq.shape == (5, 240, 320) and seq.dtype == np.uint8
    # landmarks must actually appear (bright pixels present)
    assert (seq > 150).mean() > 0.001


def test_feature_tracks_consistency():
    cam = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
    scene = synthetic.make_scene(500, seed=4)
    traj = synthetic.make_trajectory(10)
    uv, ids, valid = synthetic.feature_tracks(cam, traj, scene, max_obs=256,
                                              noise_px=0.0)
    # reproject a few ids and confirm they match the uv observations
    f = 3
    for k in range(0, 50, 7):
        if not valid[f, k]:
            continue
        p = scene.points[ids[f, k]]
        T = traj.poses_cw[f]
        pc = T[:3, :3] @ p + T[:3, 3]
        u = pc[0] / pc[2] * cam.fx + cam.cx
        v = pc[1] / pc[2] * cam.fy + cam.cy
        np.testing.assert_allclose(uv[f, k], [u, v], atol=1e-3)
    # trajectory ATE of ground truth against itself is ~0
    assert evaluation.ate_rmse(traj.centers, traj.centers) < 1e-9
