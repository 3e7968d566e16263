"""Motion-only (pose-only) bundle adjustment.

Replaces g2o-based Optimizer::PoseOptimization (reference ORB_SLAM2/src/
Optimizer.cc:239-451): 4 rounds x 10 Levenberg-Marquardt iterations over a
single SE3 camera vertex with unary reprojection edges, Huber kernel
delta = sqrt(5.991), chi-square outlier re-classification between rounds, and
the robust kernel dropped for the final rounds — all reproduced here as a
fixed-shape lax loop over batched residuals.

The entire solve is closed-form on-device: residuals/Jacobians are batched
over observations (VPU), the normal equations reduce to a 6x6 solve.  No
dynamic control flow: rejected LM steps are `where`-masked.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig, TrackerConfig
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class PoseOptResult(NamedTuple):
    T: jnp.ndarray          # (4, 4) optimized Tcw
    inliers: jnp.ndarray    # (N,) bool final chi2 classification
    n_inliers: jnp.ndarray  # () int32


def _residuals_jac(cam: CameraConfig, T, X, uv):
    """Reprojection residuals (N, 2) and Jacobians (N, 2, 6) w.r.t. a left
    se3 perturbation of Tcw."""
    pc = geo.transform_points(T, X)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / zs
    u = x * iz * cam.fx + cam.cx
    v = y * iz * cam.fy + cam.cy
    r = jnp.stack([u, v], 1) - uv

    iz2 = iz * iz
    # d(u,v)/d(pc)
    J_uv = jnp.stack([
        jnp.stack([cam.fx * iz, jnp.zeros_like(z), -cam.fx * x * iz2], 1),
        jnp.stack([jnp.zeros_like(z), cam.fy * iz, -cam.fy * y * iz2], 1),
    ], 1)  # (N, 2, 3)
    # d(pc)/d(rho, phi) = [I | -hat(pc)]
    J_pc = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), (X.shape[0], 3, 3)),
        -geo.hat(pc)], 2)  # (N, 3, 6)
    J = _he("nij,njk->nik", J_uv, J_pc)
    behind = z <= 0.05
    return r, J, behind


def _weighted_normal_eq(r, J, w):
    """H = sum w J^T J (6, 6); b = sum w J^T r (6,)."""
    Jw = J * w[:, None, None]
    H = _he("nij,nik->jk", Jw, J)
    b = _he("nij,ni->j", Jw, r)
    return H, b


@functools.partial(jax.jit, static_argnums=(0, 6))
def optimize_pose(cam: CameraConfig, T_init, X, uv, valid, inv_sigma2,
                  cfg: TrackerConfig = TrackerConfig()) -> PoseOptResult:
    """X: (N, 3) world points; uv: (N, 2) observed (undistorted) pixels;
    valid: (N,) bool; inv_sigma2: (N,) per-observation information (1/sigma^2
    by octave, reference Frame.mvInvLevelSigma2)."""
    chi2_th = cfg.chi2_mono
    delta = jnp.sqrt(chi2_th)

    def chi2_of(T, active):
        r, _, behind = _residuals_jac(cam, T, X, uv)
        chi2 = jnp.sum(r * r, 1) * inv_sigma2
        return jnp.where(active & ~behind, chi2, jnp.inf)

    def lm_round(carry, robust):
        T, active = carry

        def lm_iter(i, st):
            T, lam = st
            r, J, behind = _residuals_jac(cam, T, X, uv)
            ok = active & ~behind
            chi2 = jnp.sum(r * r, 1) * inv_sigma2
            # Huber weight on the weighted norm
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_rob = jnp.where(robust & (e > delta), delta / e, 1.0)
            w = jnp.where(ok, inv_sigma2 * w_rob, 0.0)
            H, b = _weighted_normal_eq(r, J, w)
            cost = jnp.where(ok, jnp.where(robust & (e > delta),
                                           delta * (2 * e - delta), chi2), 0.0).sum()

            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            dx = -jnp.linalg.solve(Hd, b)
            T_new = geo.exp_se3(dx) @ T
            r2, _, behind2 = _residuals_jac(cam, T_new, X, uv)
            chi2n = jnp.sum(r2 * r2, 1) * inv_sigma2
            en = jnp.sqrt(jnp.maximum(chi2n, 1e-12))
            cost_new = jnp.where(active & ~behind2,
                                 jnp.where(robust & (en > delta),
                                           delta * (2 * en - delta), chi2n),
                                 0.0).sum()
            improved = cost_new < cost
            T = jnp.where(improved, T_new, T)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            return (T, jnp.clip(lam, 1e-6, 1e3))

        T, _ = jax.lax.fori_loop(0, cfg.pose_opt_iters, lm_iter, (T, 1e-3))
        # chi2 re-classification for the next round (Optimizer.cc:370-444)
        active_new = valid & (chi2_of(T, valid) < chi2_th)
        return (T, active_new), None

    state = (T_init, valid)
    # rounds 1-2 robust, rounds 3+ plain quadratic (robust kernel dropped)
    for rnd in range(cfg.pose_opt_rounds):
        state, _ = lm_round(state, rnd < 2)
    T, active = state
    inliers = valid & (chi2_of(T, valid) < chi2_th)
    return PoseOptResult(T=T, inliers=inliers, n_inliers=inliers.sum())
