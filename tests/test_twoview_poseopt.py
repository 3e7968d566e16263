import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import CameraConfig, TrackerConfig
from coslam_tpu.ops import twoview
from coslam_tpu.optim import pose_opt
from coslam_tpu.utils import geometry as geo
from coslam_tpu.utils import synthetic

CAM = CameraConfig(fx=450, fy=450, cx=320, cy=240, width=640, height=480)


def _matched_pairs(f0, f1, n_max=512, noise=0.3, seed=0):
    scene = synthetic.make_scene(800, seed=seed)
    traj = synthetic.make_trajectory(20, seed=seed)
    uv, ids, valid = synthetic.feature_tracks(CAM, traj, scene, max_obs=1024,
                                              noise_px=noise, seed=seed)
    # correspondences between the two frames by landmark id
    id0 = {int(i): k for k, i in enumerate(ids[f0]) if i >= 0}
    uv1, uv2 = np.zeros((n_max, 2), np.float32), np.zeros((n_max, 2), np.float32)
    ok = np.zeros(n_max, bool)
    n = 0
    for k1, i in enumerate(ids[f1]):
        if i >= 0 and int(i) in id0 and n < n_max:
            uv1[n] = uv[f0, id0[int(i)]]
            uv2[n] = uv[f1, k1]
            ok[n] = True
            n += 1
    return traj, uv1, uv2, ok


def test_twoview_initialize_recovers_motion():
    f0, f1 = 0, 6
    traj, uv1, uv2, ok = _matched_pairs(f0, f1)
    assert ok.sum() > 200
    res = twoview.initialize(CAM, jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(ok), jax.random.PRNGKey(0))
    assert bool(res.success), f"init failed, n_good={int(res.n_good)}"
    # ground-truth relative pose T21 = Tcw1 @ inv(Tcw0)
    T_gt = traj.poses_cw[f1] @ np.linalg.inv(traj.poses_cw[f0])
    T_est = np.asarray(res.T21)
    # rotation error
    dR = T_est[:3, :3] @ T_gt[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang} deg"
    # translation direction error (scale-free)
    t_e = T_est[:3, 3] / (np.linalg.norm(T_est[:3, 3]) + 1e-12)
    t_g = T_gt[:3, 3] / (np.linalg.norm(T_gt[:3, 3]) + 1e-12)
    assert np.degrees(np.arccos(np.clip(abs(t_e @ t_g), -1, 1))) < 3.0
    # triangulated structure should be mostly accepted
    assert int(res.n_good) > 0.5 * ok.sum()


def test_pose_optimization_converges():
    rng = np.random.default_rng(0)
    n = 300
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], 1).astype(np.float32)
    T_gt = np.asarray(geo.exp_se3(jnp.asarray([0.2, -0.1, 0.05, 0.03, -0.04, 0.02],
                                              jnp.float32)))
    pc = X @ T_gt[:3, :3].T + T_gt[:3, 3]
    uv = np.stack([pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx,
                   pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy], 1)
    uv += rng.normal(0, 0.3, uv.shape)
    # inject 15 % outliers
    out = rng.random(n) < 0.15
    uv[out] += rng.uniform(-80, 80, (out.sum(), 2))
    T0 = np.asarray(geo.exp_se3(jnp.asarray([0.05, 0.05, -0.05, 0.02, 0.02, -0.02],
                                            jnp.float32))) @ T_gt

    res = pose_opt.optimize_pose(
        CAM, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n, bool), jnp.ones(n, jnp.float32))
    T = np.asarray(res.T)
    dT = T @ np.linalg.inv(T_gt)
    ang = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 0.1, f"rot err {ang}"
    assert np.linalg.norm(dT[:3, 3]) < 0.01
    inl = np.asarray(res.inliers)
    assert inl[~out].mean() > 0.97
    assert inl[out].mean() < 0.1


def test_pose_optimization_masks_invalid():
    # half the slots are padding; optimizer must ignore them
    rng = np.random.default_rng(1)
    n = 128
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                  rng.uniform(3, 8, n)], 1).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    uv = np.stack([X[:, 0] / X[:, 2] * CAM.fx + CAM.cx,
                   X[:, 1] / X[:, 2] * CAM.fy + CAM.cy], 1).astype(np.float32)
    valid = np.arange(n) < 64
    uv[~valid] = -1e6  # garbage in padding slots
    T0 = np.asarray(geo.exp_se3(jnp.asarray([0.03, 0, 0, 0, 0.01, 0], jnp.float32)))
    res = pose_opt.optimize_pose(CAM, jnp.asarray(T0), jnp.asarray(X),
                                 jnp.asarray(uv), jnp.asarray(valid),
                                 jnp.ones(n, jnp.float32))
    T = np.asarray(res.T)
    assert np.abs(T - T_gt).max() < 1e-2
    assert int(res.n_inliers) == 64
