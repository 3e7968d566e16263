import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import CameraConfig
from coslam_tpu.ops import sim3 as sim3_ops
from coslam_tpu.optim import pose_graph
from coslam_tpu.utils import geometry as geo

CAM = CameraConfig(fx=450, fy=450, cx=320, cy=240, width=640, height=480)


def _rand_sim3(rng, s_range=0.3):
    s = float(np.exp(rng.normal() * s_range))
    R = np.asarray(geo.exp_so3(jnp.asarray(rng.normal(0, 0.6, 3), jnp.float32)))
    t = rng.normal(0, 1.0, 3).astype(np.float32)
    return s, R, t


def test_horn_recovers_similarity(rng):
    s, R, t = _rand_sim3(rng)
    x1 = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
    x2 = (s * x1 @ R.T + t).astype(np.float32)
    se, Re, te = sim3_ops.horn_sim3(jnp.asarray(x1), jnp.asarray(x2))
    assert abs(float(se) - s) < 1e-3 * s
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-3)


def test_ransac_sim3_with_outliers(rng):
    # two keyframes observing the same landmarks; 30 % wrong matches
    n = 200
    X1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(4, 9, n)], 1).astype(np.float32)
    s_gt, R_gt, t_gt = 1.4, np.asarray(
        geo.exp_so3(jnp.asarray([0.1, -0.2, 0.15], jnp.float32))), \
        np.array([0.5, -0.3, 0.8], np.float32)
    X2 = (s_gt * X1 @ R_gt.T + t_gt).astype(np.float32)
    bad = rng.random(n) < 0.3
    X2[bad] += rng.uniform(1, 3, (bad.sum(), 3))

    def proj(X):
        return np.stack([X[:, 0] / X[:, 2] * CAM.fx + CAM.cx,
                         X[:, 1] / X[:, 2] * CAM.fy + CAM.cy], 1).astype(np.float32)

    res = sim3_ops.ransac_sim3(CAM, jnp.asarray(X1), jnp.asarray(X2),
                               jnp.asarray(proj(X1)), jnp.asarray(proj(X2)),
                               300, False, key=jax.random.PRNGKey(1))
    assert abs(float(res.s) - s_gt) < 0.02
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)
    inl = np.asarray(res.inliers)
    assert inl[~bad].mean() > 0.9 and inl[bad].mean() < 0.1


def test_pose_graph_closes_loop():
    """Square loop with accumulated drift (incl. scale): after adding the
    loop-closure edge and optimizing, the end-of-loop vertex must line up
    with the start."""
    K = 16
    # ground truth: poses around a square
    gt = [np.eye(4, dtype=np.float32)]
    step = np.asarray(geo.exp_se3(jnp.asarray([0.5, 0, 0, 0, 0, np.pi / 8],
                                              jnp.float32)))
    for k in range(1, K):
        gt.append((step @ gt[-1]).astype(np.float32))
    gt = np.stack(gt)

    # drifting odometry: each relative step slightly wrong + scale drift
    rng = np.random.default_rng(0)
    drift = []
    est = [gt[0]]
    for k in range(1, K):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(geo.exp_se3(jnp.asarray(
            rng.normal(0, 0.02, 6).astype(np.float32))))
        est.append((noise @ rel @ est[-1]).astype(np.float32))
    est = np.stack(est)

    v = pose_graph.vertices_from_se3(jnp.asarray(est))
    # edges: sequential odometry chain (measurements from drifting est —
    # they are self-consistent) + the loop edge with the TRUE relative pose
    ei = list(range(K - 1)) + [K - 1]
    ej = list(range(1, K)) + [0]
    edges_i = jnp.asarray(ei, jnp.int32)
    edges_j = jnp.asarray(ej, jnp.int32)
    meas_list = []
    for a, b in zip(ei, ej):
        if (a, b) == (K - 1, 0):
            rel = gt[0] @ np.linalg.inv(gt[K - 1])  # loop closure truth
        else:
            rel = est[b] @ np.linalg.inv(est[a])
        meas_list.append(rel)
    meas_np = np.stack(meas_list)
    meas = pose_graph.Sim3Vertices(
        s=jnp.ones(len(ei), jnp.float32),
        R=jnp.asarray(meas_np[:, :3, :3]), t=jnp.asarray(meas_np[:, :3, 3]))

    fixed = jnp.zeros(K, bool).at[0].set(True)
    out = pose_graph.optimize(v, edges_i, edges_j, meas, 15, fixed=fixed)
    poses = np.asarray(pose_graph.vertices_to_se3(out))

    # loop must close: residual of the loop edge near zero
    rel_end = poses[0] @ np.linalg.inv(poses[K - 1])
    rel_gt = gt[0] @ np.linalg.inv(gt[K - 1])
    d = rel_end @ np.linalg.inv(rel_gt)
    ang = np.degrees(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
    # the loop edge is one of K edges, so its residual shrinks but does not
    # vanish in the least-squares balance; require it far below the raw
    # accumulated drift
    rel_end0 = est[0] @ np.linalg.inv(est[K - 1])
    d0 = rel_end0 @ np.linalg.inv(rel_gt)
    ang0 = np.degrees(np.arccos(np.clip((np.trace(d0[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < max(0.35 * ang0, 1.0), f"loop gap {ang} deg (drift {ang0})"
    assert np.linalg.norm(d[:3, 3]) < max(
        0.35 * np.linalg.norm(d0[:3, 3]), 0.08)
    # drift should shrink vs the un-optimized chain
    def total_err(P):
        e = 0.0
        for k in range(K):
            dT = P[k] @ np.linalg.inv(gt[k])
            e += np.linalg.norm(dT[:3, 3])
        return e
    # one loop edge against a K-edge odometry chain: error redistributes
    # rather than vanishing; require a clear reduction
    assert total_err(poses) < 0.85 * total_err(est)


def test_sparse_pcg_matches_dense():
    """optimize_sparse (matrix-free block-Jacobi PCG over an explicit edge
    list) must reproduce the dense direct solver on the same graph — the
    scaling path (O(E) per CG step) may not change the answer."""
    K = 64
    gt = [np.eye(4, dtype=np.float32)]
    step = np.asarray(geo.exp_se3(jnp.asarray(
        [0.25, 0, 0, 0, 0, 2 * np.pi / K], jnp.float32)))
    for k in range(1, K):
        gt.append((step @ gt[-1]).astype(np.float32))
    gt = np.stack(gt)
    rng = np.random.default_rng(3)
    est = [gt[0]]
    for k in range(1, K):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(geo.exp_se3(jnp.asarray(
            rng.normal(0, 0.015, 6).astype(np.float32))))
        est.append((noise @ rel @ est[-1]).astype(np.float32))
    est = np.stack(est)

    ei = list(range(K - 1)) + [K - 1]
    ej = list(range(1, K)) + [0]
    meas_list = []
    for a, b in zip(ei, ej):
        if (a, b) == (K - 1, 0):
            rel = gt[0] @ np.linalg.inv(gt[K - 1])
        else:
            rel = est[b] @ np.linalg.inv(est[a])
        meas_list.append(rel)
    meas_np = np.stack(meas_list)
    meas = pose_graph.Sim3Vertices(
        s=jnp.ones(len(ei), jnp.float32),
        R=jnp.asarray(meas_np[:, :3, :3]), t=jnp.asarray(meas_np[:, :3, 3]))
    edges_i = jnp.asarray(ei, jnp.int32)
    edges_j = jnp.asarray(ej, jnp.int32)
    v = pose_graph.vertices_from_se3(jnp.asarray(est))
    fixed = jnp.zeros(K, bool).at[0].set(True)

    dense = pose_graph.optimize(v, edges_i, edges_j, meas, 10, fixed=fixed)
    sparse = pose_graph.optimize_sparse(v, edges_i, edges_j, meas, 10,
                                        fixed=fixed, pcg_iters=80)
    Pd = np.asarray(pose_graph.vertices_to_se3(dense))
    Ps = np.asarray(pose_graph.vertices_to_se3(sparse))
    # same optimum up to solver tolerance
    assert np.abs(Pd[:, :3, 3] - Ps[:, :3, 3]).max() < 5e-3, \
        np.abs(Pd[:, :3, 3] - Ps[:, :3, 3]).max()
    assert np.abs(Pd[:, :3, :3] - Ps[:, :3, :3]).max() < 5e-3
