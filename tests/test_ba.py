import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import CameraConfig
from coslam_tpu.optim import ba
from coslam_tpu.utils import geometry as geo

CAM = CameraConfig(fx=450, fy=450, cx=320, cy=240, width=640, height=480)


def _make_problem(rng, n_kf=8, n_pt=400, noise_px=0.4, perturb=True,
                  n_outliers=0):
    pts = np.stack([rng.uniform(-3, 3, n_pt), rng.uniform(-2, 2, n_pt),
                    rng.uniform(5, 12, n_pt)], 1).astype(np.float32)
    poses = []
    for k in range(n_kf):
        xi = np.array([0.25 * k, 0.02 * k, 0.01 * k, 0.0, 0.03 * k, 0.0],
                      np.float32)
        poses.append(np.asarray(geo.exp_se3(jnp.asarray(xi))))
    poses = np.stack(poses)

    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(n_kf):
        pc = pts @ poses[k][:3, :3].T + poses[k][:3, 3]
        uv = np.stack([pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx,
                       pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy], 1)
        vis = (pc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < CAM.width) \
            & (uv[:, 1] > 0) & (uv[:, 1] < CAM.height)
        for j in np.nonzero(vis)[0]:
            obs_kf.append(k)
            obs_pt.append(j)
            obs_uv.append(uv[j] + rng.normal(0, noise_px, 2))
    obs_kf = np.array(obs_kf, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_uv = np.array(obs_uv, np.float32)
    if n_outliers:
        sel = rng.choice(len(obs_kf), n_outliers, replace=False)
        obs_uv[sel] += rng.uniform(30, 120, (n_outliers, 2))

    poses_init = poses.copy()
    pts_init = pts.copy()
    if perturb:
        for k in range(2, n_kf):
            xi = rng.normal(0, 0.01, 6).astype(np.float32)
            poses_init[k] = np.asarray(geo.exp_se3(jnp.asarray(xi))) @ poses[k]
        pts_init = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)

    prob = ba.BAProblem(
        poses=jnp.asarray(poses_init), points=jnp.asarray(pts_init),
        obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.ones(len(obs_kf), jnp.float32),
        obs_valid=jnp.ones(len(obs_kf), bool),
        kf_fixed=jnp.asarray(np.arange(n_kf) < 2),
    )
    return prob, poses, pts


def test_ba_converges_to_ground_truth():
    rng = np.random.default_rng(0)
    prob, poses_gt, pts_gt = _make_problem(rng, noise_px=0.0)
    res = ba.solve(CAM, prob, iters=15, pcg_iters=50)
    poses = np.asarray(res.poses)
    for k in range(2, poses.shape[0]):
        dT = poses[k] @ np.linalg.inv(poses_gt[k])
        ang = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
        assert ang < 0.05, f"kf{k} rot err {ang}"
        assert np.linalg.norm(dT[:3, 3]) < 5e-3, f"kf{k} trans err"
    err = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(err) < 5e-3


def test_ba_reduces_cost_with_noise_and_outliers():
    rng = np.random.default_rng(1)
    prob, poses_gt, pts_gt = _make_problem(rng, noise_px=0.5, n_outliers=150)
    cost0 = None
    res = ba.solve(CAM, prob, iters=12, pcg_iters=50)
    # inlier classification should reject most injected outliers
    assert float(res.cost) < 1e5
    poses = np.asarray(res.poses)
    for k in range(2, poses.shape[0]):
        dT = poses[k] @ np.linalg.inv(poses_gt[k])
        ang = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"kf{k} rot err {ang}"


def test_ba_respects_fixed_and_invalid():
    rng = np.random.default_rng(2)
    prob, poses_gt, pts_gt = _make_problem(rng, noise_px=0.2)
    # invalidate half the observations; solution should still be sane
    ov = np.asarray(prob.obs_valid).copy()
    ov[:: 2] = False
    prob = prob._replace(obs_valid=jnp.asarray(ov))
    res = ba.solve(CAM, prob, iters=8, pcg_iters=40)
    poses = np.asarray(res.poses)
    np.testing.assert_allclose(poses[0], np.asarray(prob.poses)[0], atol=1e-7)
    np.testing.assert_allclose(poses[1], np.asarray(prob.poses)[1], atol=1e-7)
    dT = poses[3] @ np.linalg.inv(poses_gt[3])
    assert np.linalg.norm(dT[:3, 3]) < 0.02


def test_compact_matches_dense():
    """solve_dense_compact must equal solve_dense whenever the window's
    unique observed points fit the compact capacity — the windowed local
    BA's default regime (models/local_mapping.local_ba_body)."""
    rng = np.random.default_rng(7)
    prob, poses_gt, pts_gt = _make_problem(rng, n_kf=6, n_pt=300,
                                           noise_px=0.4)
    # embed the 300 points sparsely in a larger capacity with junk padding
    P_big = 2048
    pts_big = np.asarray(rng.normal(size=(P_big, 3)), np.float32)
    ids = rng.choice(P_big, 300, replace=False).astype(np.int32)
    pts_big[ids] = np.asarray(prob.points)
    prob_big = prob._replace(points=jnp.asarray(pts_big),
                             obs_pt=jnp.asarray(ids)[prob.obs_pt])
    res_d = ba.solve_dense(CAM, prob_big, iters=6)
    res_c = ba.solve_dense_compact(CAM, prob_big, 512, iters=6)
    np.testing.assert_allclose(np.asarray(res_c.poses),
                               np.asarray(res_d.poses), atol=2e-5)
    np.testing.assert_allclose(np.asarray(res_c.points)[ids],
                               np.asarray(res_d.points)[ids], atol=2e-4)
    # untouched padding slots keep their positions
    mask = np.ones(P_big, bool)
    mask[ids] = False
    np.testing.assert_allclose(np.asarray(res_c.points)[mask],
                               pts_big[mask], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_c.obs_inlier),
                                  np.asarray(res_d.obs_inlier))
