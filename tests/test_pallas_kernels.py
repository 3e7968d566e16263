"""Pallas kernels vs their jnp reference implementations (interpret mode on
the CPU test mesh; on TPU the same asserts run compiled)."""

import jax.numpy as jnp
import numpy as np

from coslam_tpu.ops import fast as fast_ops
from coslam_tpu.ops import hamming, pallas_kernels as pk


def test_fast_score_nms_matches_reference(rng):
    img = rng.integers(0, 255, (64, 128)).astype(np.float32)
    ref = np.asarray(fast_ops.nms3(fast_ops.fast_score(jnp.asarray(img))))
    out = np.asarray(pk.fast_score_nms(jnp.asarray(img)))
    # interior only: the kernel's roll-based NMS wraps at borders, the
    # reference pads — both regions are masked by edge_threshold in use
    sl = np.s_[8:-8, 8:-8]
    np.testing.assert_allclose(out[sl], ref[sl], atol=1e-5)


def test_masked_match_matches_reference(rng):
    N, M = 256, 512
    dq = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32)
    dt = rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32)
    # make some true correspondences so best-dists aren't all ~128
    dt[:100] = dq[:100]
    for i in range(50):
        dt[i, 0] ^= np.uint32(0b1011)
    uvq = rng.uniform(0, 600, (N, 2)).astype(np.float32)
    uvt = rng.uniform(0, 600, (M, 2)).astype(np.float32)
    uvt[:100] = uvq[:100] + rng.normal(0, 3, (100, 2))
    r2 = np.full(N, 50.0 ** 2, np.float32)
    vq = np.ones(N, bool)
    vq[5] = False
    vt = np.ones(M, bool)
    vt[7] = False

    best, second, idx = pk.masked_match(
        jnp.asarray(dq), jnp.asarray(uvq), jnp.asarray(r2), jnp.asarray(vq),
        jnp.asarray(dt), jnp.asarray(uvt), jnp.asarray(vt),
        block_n=128, block_m=256)

    # reference: full masked distance matrix
    d = np.asarray(hamming.pairwise_hamming(jnp.asarray(dq), jnp.asarray(dt)))
    dd = uvq[:, None] - uvt[None]
    mask = ((dd ** 2).sum(-1) <= r2[:, None]) & vq[:, None] & vt[None, :]
    d = np.where(mask, d, int(pk.INF_I32))
    ref_best = d.min(1)
    ref_idx = d.argmin(1)
    d2 = d.copy()
    d2[np.arange(N), ref_idx] = int(pk.INF_I32)
    ref_second = d2.min(1)

    np.testing.assert_array_equal(np.asarray(best), ref_best)
    has = ref_best < int(pk.INF_I32)
    np.testing.assert_array_equal(np.asarray(idx)[has], ref_idx[has])
    np.testing.assert_array_equal(np.asarray(second), ref_second)


def test_pose_opt_lm_matches_reference(rng):
    """Fused LM kernel vs the XLA reference LM (optim/pose_opt.py body) on a
    synthetic pose-recovery problem with outliers."""
    from coslam_tpu.config import CameraConfig, TrackerConfig
    from coslam_tpu.optim import pose_opt
    from coslam_tpu.utils import geometry as geo

    cam = CameraConfig(fx=500., fy=500., cx=320., cy=240.,
                       width=640, height=480)
    cfg = TrackerConfig()
    N = 512
    X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
                  rng.uniform(4, 10, N)], 1).astype(np.float32)
    w = np.array([0.03, -0.02, 0.05])
    t = np.array([0.1, -0.05, 0.08])
    Rg = np.asarray(geo.exp_so3(jnp.asarray(w)))
    Tgt = np.eye(4, dtype=np.float32)
    Tgt[:3, :3] = Rg
    Tgt[:3, 3] = t
    pc = X @ Rg.T + t
    uv = np.stack([pc[:, 0] / pc[:, 2] * 500 + 320,
                   pc[:, 1] / pc[:, 2] * 500 + 240], 1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    out_idx = rng.choice(N, 60, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (60, 2)).astype(np.float32)
    isg = np.ones(N, np.float32)

    Tf, inl = pk.pose_opt_lm(
        jnp.eye(4), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(isg),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        rounds=cfg.pose_opt_rounds, iters=cfg.pose_opt_iters,
        chi2_th=cfg.chi2_mono)
    # recovers the pose and rejects the planted outliers
    assert float(jnp.abs(Tf - Tgt).max()) < 5e-3
    assert not bool(inl[out_idx].any())
    assert int(inl.sum()) > 0.85 * (N - 60)

    # agrees with the XLA reference formulation
    res = pose_opt._optimize_pose_xla_testonly(cam, jnp.eye(4),
                                               jnp.asarray(X),
                                               jnp.asarray(uv),
                                               jnp.ones(N, bool),
                                               jnp.asarray(isg), cfg)
    assert float(jnp.abs(Tf - res.T).max()) < 1e-2
    assert int((inl == res.inliers).sum()) >= N - 5
