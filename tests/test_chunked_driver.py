"""Chunked steady-state driver (System.run_sequence) vs the per-frame path.

The chunk program (models/tracking.py track_chunk) tracks C frames per
device dispatch with cut-at-keyframe semantics, so its OUTPUT must match
per-frame driving up to f32 round-off: same survival (no LOST frames on a
well-conditioned scene), equivalent keyframe cadence and ATE.

Also pins the SO(3)-projection invariant (utils/geometry.py project_so3):
round-2's chunked driver collapsed because exp-update pose compositions
drifted off SO(3) and `se3_inverse` (R^T) re-injected the drift into every
velocity prediction, doubling it per frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig, TrackerConfig)
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, geometry as geo, synthetic

CAM = CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320, height=240)
CFG = SystemConfig(
    camera=CAM,
    extractor=ExtractorConfig(n_features=300, max_keypoints=256),
    mapper=MapperConfig(max_keyframes=96, max_points=16384,
                        triangulation_neighbors=6),
    tracker=TrackerConfig(init_min_matches=50, init_min_good=30),
)


def _run(mode: str, seq, traj):
    slam = System(CFG)
    if mode == "chunk":
        slam.run_sequence(seq)
    else:
        for i, img in enumerate(seq):
            slam.track_mono(img, i)
    ids, poses = slam.trajectory_poses()
    est = evaluation.trajectory_xyz(poses)
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids])
    return dict(
        ate=evaluation.ate_rmse(est, gt),
        lost=sum(1 for s in slam.stats if s.get("lost")),
        kf=sum(1 for s in slam.stats if s.get("keyframe")),
        frames=len(ids),
        ortho=float(np.abs(
            np.asarray(slam.last_T)[:3, :3].T
            @ np.asarray(slam.last_T)[:3, :3] - np.eye(3)).max()),
    )


@pytest.mark.slow
def test_chunked_matches_per_frame():
    scene = synthetic.make_scene(500, seed=7)
    traj = synthetic.make_trajectory(40, seed=7)
    seq = synthetic.render_sequence(CAM, traj, scene)
    ch = _run("chunk", seq, traj)
    pf = _run("perframe", seq, traj)
    assert ch["lost"] == 0, f"chunked driver lost {ch['lost']} frames"
    assert pf["lost"] == 0
    assert ch["frames"] == pf["frames"]
    assert ch["ate"] < 0.05, f"chunk ATE {ch['ate']:.4f} m"
    assert abs(ch["ate"] - pf["ate"]) < 0.02
    # keyframe cadence equivalent (f32 noise may flip a borderline decision)
    assert abs(ch["kf"] - pf["kf"]) <= max(3, pf["kf"] // 4)
    # poses stay on SO(3) — the round-2 drift collapse must not return
    assert ch["ortho"] < 1e-5


def test_project_so3_restores_rotation():
    rng = np.random.default_rng(0)
    R = np.asarray(geo.exp_se3(
        jnp.asarray([0.1, -0.2, 0.3, 0.2, -0.1, 0.15], jnp.float32)))[:3, :3]
    noisy = R + rng.normal(0, 1e-2, (3, 3)).astype(np.float32)
    P = np.asarray(geo.project_so3(jnp.asarray(noisy)))
    assert np.abs(P.T @ P - np.eye(3)).max() < 1e-6
    assert np.abs(np.linalg.det(P) - 1.0) < 1e-5
    assert np.abs(P - R).max() < 0.05  # stays near the true rotation


def test_velocity_chain_stays_orthonormal():
    """Compose exp-map poses and SE3 inverses 200 times — the projected
    pipeline must keep rotations orthonormal (the unprojected chain doubles
    its error per step)."""
    key = jax.random.PRNGKey(0)
    T = jnp.eye(4)
    T_prev = jnp.eye(4)
    for k in range(200):
        key, sub = jax.random.split(key)
        xi = 0.05 * jax.random.normal(sub, (6,))
        T_new = geo.project_se3(geo.exp_se3(xi) @ T)
        vel = T_new @ geo.se3_inverse(T)
        T_pred = vel @ T_new
        T_prev, T = T, geo.project_se3(T_pred)
    R = np.asarray(T)[:3, :3]
    assert np.abs(R.T @ R - np.eye(3)).max() < 1e-5
