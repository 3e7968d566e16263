"""EPnP + RANSAC camera relocalization.

TPU redesign of reference PnPsolver (ORB_SLAM2/src/PnPsolver.cc): the
sequential adaptive RANSAC (iterate :165) becomes a vmap over fixed
hypothesis count; each hypothesis runs a batched EPnP (choose_control_points
:375, compute_pose :477) — control points from a PCA of the sample, the
12-dim null vector from an eigh of M^T M, the single-beta scale case
resolved by least squares over control-point distances (the dominant EPnP
branch), and the final R, t from a closed-form rigid alignment (Horn).

The winning hypothesis is meant to be refined by motion-only BA
(optim/pose_opt.py), mirroring the reference's Refine (:260) +
PoseOptimization path in Tracking::Relocalization (Tracking.cc:1343).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig
from coslam_tpu.ops import sim3 as sim3_ops
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class PnPResult(NamedTuple):
    T: jnp.ndarray        # (4, 4) Tcw
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray


def _epnp_minimal(X, uvn):
    """EPnP on a small sample: X (n, 3) world, uvn (n, 2) normalized image
    coords.  Returns (R, t) with x_cam = R x + t."""
    n = X.shape[0]
    # control points: centroid + principal axes (choose_control_points)
    c0 = X.mean(0)
    Xc = X - c0
    cov = _he("ni,nj->ij", Xc, Xc) / n
    w, v = jnp.linalg.eigh(cov)
    sd = jnp.sqrt(jnp.maximum(w, 1e-10))
    C = jnp.concatenate([c0[None], c0[None] + (v * sd[None]).T], 0)  # (4, 3)

    # barycentric coordinates: X = alpha @ C with sum(alpha) = 1
    CtC = jnp.concatenate([C.T, jnp.ones((1, 4))], 0)         # (4, 4)
    Xh = jnp.concatenate([X.T, jnp.ones((1, n))], 0)          # (4, n)
    alpha = jnp.linalg.solve(CtC, Xh).T                       # (n, 4)

    # M v = 0 system (2n x 12)
    u, vv = uvn[:, 0], uvn[:, 1]
    zero = jnp.zeros((n, 4))
    r1 = jnp.stack([alpha, zero, -u[:, None] * alpha], -1).reshape(n, 12)
    r2 = jnp.stack([zero, alpha, -vv[:, None] * alpha], -1).reshape(n, 12)
    M = jnp.concatenate([r1, r2], 0)
    MtM = _he("mi,mj->ij", M, M)
    _, evec = jnp.linalg.eigh(MtM)
    vker = evec[:, 0]
    # camera control points up to scale (layout [x0,y0,z0, x1,y1,z1, ...])
    Cc = vker.reshape(4, 3)

    # single-beta case: scale so pairwise control distances match world
    ii, jj = jnp.triu_indices(4, 1)
    dw = jnp.linalg.norm(C[ii] - C[jj], axis=1)
    dc = jnp.linalg.norm(Cc[ii] - Cc[jj], axis=1)
    beta = jnp.sum(dw * dc) / (jnp.sum(dc * dc) + 1e-12)
    Cc = Cc * beta
    # cheirality: camera points must have positive depth on average
    Xcam = alpha @ Cc
    Cc = jnp.where(Xcam[:, 2].mean() < 0, -Cc, Cc)
    Xcam = alpha @ Cc

    # rigid alignment world -> camera
    s, R, t = sim3_ops.horn_sim3(X, Xcam, fix_scale=True)
    return R, t


@functools.partial(jax.jit, static_argnums=(0, 5))
def ransac_pnp(cam: CameraConfig, X, uv, valid, key,
               iters: int = 512, chi2_th: float = 5.991) -> PnPResult:
    """X: (N, 3) world points; uv: (N, 2) observed (undistorted) pixels.

    Reference Relocalization RANSAC parameters: 0.99, minInliers 10, 300
    iters, minSet 4 (Tracking.cc:1388).  This EPnP formulation solves the
    single-beta kernel case, which needs 2n >= 11 equations — so the
    minimal sample is SIX points, and the success probability per draw is
    w^6 at inlier fraction w.  Hypotheses are vmapped (compute-cheap), so
    the iteration count is set for w ~ 0.35 (0.35^6 * 512 ~ 0.9); the
    caller raises w by rotation-consistency filtering its seed matches.
    """
    n = X.shape[0]
    p = valid.astype(jnp.float32)
    p = p / (p.sum() + 1e-9)
    samples = jax.random.choice(key, n, shape=(iters, 6), replace=True, p=p)
    uvn = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                     (uv[:, 1] - cam.cy) / cam.fy], 1)

    def reproj_ok(R, t):
        pc = _he("ij,nj->ni", R, X) + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        u = pc[:, 0] / z * cam.fx + cam.cx
        v = pc[:, 1] / z * cam.fy + cam.cy
        e2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return valid & (pc[:, 2] > 0) & (e2 < chi2_th * 4.0)

    def one(idx):
        R, t = _epnp_minimal(X[idx], uvn[idx])
        ok = reproj_ok(R, t)
        return R, t, ok.sum()

    Rs, ts, counts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]
    ok = reproj_ok(R, t)
    return PnPResult(T=geo.se3(R, t), inliers=ok, n_inliers=ok.sum())
