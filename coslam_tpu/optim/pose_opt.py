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


def chol_solve6(H, b):
    """Unrolled 6x6 Cholesky solve.

    jnp.linalg.solve lowers to a generic pivoted LU that is ~2x slower on
    TPU for tiny SPD systems; the unrolled form is pure fused scalar ops.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


@functools.partial(jax.jit, static_argnums=(0, 6))
def optimize_pose(cam: CameraConfig, T_init, X, uv, valid, inv_sigma2,
                  cfg: TrackerConfig = TrackerConfig()) -> PoseOptResult:
    """X: (N, 3) world points; uv: (N, 2) observed (undistorted) pixels;
    valid: (N,) bool; inv_sigma2: (N,) per-observation information (1/sigma^2
    by octave, reference Frame.mvInvLevelSigma2).

    On TPU this dispatches to the fused Pallas kernel (ops/pallas_kernels.
    pose_opt_lm — whole LM in one Mosaic program, ~4.5x faster); the XLA
    formulation below is the reference implementation and the CPU path.
    """
    if jax.default_backend() == "tpu":
        from coslam_tpu.ops import pallas_kernels as _pk
        N = X.shape[0]
        pad = (-N) % 128
        isg_m = jnp.where(valid, inv_sigma2, 0.0).astype(jnp.float32)
        if pad:
            Xp = jnp.concatenate([X, jnp.ones((pad, 3), X.dtype)])
            uvp = jnp.concatenate([uv, jnp.zeros((pad, 2), uv.dtype)])
            wp = jnp.concatenate([isg_m, jnp.zeros(pad, jnp.float32)])
        else:
            Xp, uvp, wp = X, uv, isg_m
        T, inl = _pk.pose_opt_lm(
            T_init.astype(jnp.float32), Xp, uvp, wp,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            rounds=cfg.pose_opt_rounds, iters=cfg.pose_opt_iters,
            chi2_th=cfg.chi2_mono)
        inliers = inl[:N] & valid
        return PoseOptResult(T=geo.project_se3(T), inliers=inliers,
                             n_inliers=inliers.sum())

    return _optimize_pose_xla_testonly(cam, T_init, X, uv, valid, inv_sigma2,
                                       cfg)


def _optimize_pose_xla_testonly(cam: CameraConfig, T_init, X, uv, valid,
                                inv_sigma2, cfg: TrackerConfig
                                ) -> PoseOptResult:
    """The pure-XLA LM (the reference implementation the Pallas kernel is
    tested against; also the CPU execution path)."""
    chi2_th = cfg.chi2_mono
    delta = jnp.sqrt(chi2_th)

    # LM with a cached linearization: each iteration performs exactly ONE
    # residual/Jacobian evaluation (at the trial pose); the current pose's
    # evaluation is carried from the previous iteration.  Halves the
    # sequential op chain vs. the naive eval-twice formulation — the solve
    # itself is trivial; on TPU this loop is dispatch-latency-bound.
    def cost_of(r, behind, active, robust):
        chi2 = jnp.sum(r * r, 1) * inv_sigma2
        e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        rob = delta * (2 * e - delta)
        per = jnp.where(robust & (e > delta), rob, chi2)
        return jnp.where(active & ~behind, per, 0.0).sum()

    def lm_round(T, r, J, behind, active, robust):
        def lm_iter(i, st):
            T, lam, r, J, behind = st
            chi2 = jnp.sum(r * r, 1) * inv_sigma2
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_rob = jnp.where(robust & (e > delta), delta / e, 1.0)
            ok = active & ~behind
            w = jnp.where(ok, inv_sigma2 * w_rob, 0.0)
            H, b = _weighted_normal_eq(r, J, w)
            cost = cost_of(r, behind, active, robust)

            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            # measured on TPU: the generic LU pipelines better inside this
            # loop than an unrolled scalar Cholesky (scalar chains serialize)
            dx = -jnp.linalg.solve(Hd, b)
            T_new = geo.exp_se3(dx) @ T
            r2, J2, behind2 = _residuals_jac(cam, T_new, X, uv)
            cost_new = cost_of(r2, behind2, active, robust)
            improved = cost_new < cost
            T = jnp.where(improved, T_new, T)
            r = jnp.where(improved, r2, r)
            J = jnp.where(improved, J2, J)
            behind = jnp.where(improved, behind2, behind)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            return (T, jnp.clip(lam, 1e-6, 1e3), r, J, behind)

        T, _, r, J, behind = jax.lax.fori_loop(
            0, cfg.pose_opt_iters, lm_iter, (T, 1e-3, r, J, behind))
        return T, r, J, behind

    T = T_init
    r, J, behind = _residuals_jac(cam, T, X, uv)
    active = valid
    # rounds 1-2 robust, rounds 3+ plain quadratic (robust kernel dropped),
    # with chi2 outlier re-classification between rounds from the cached
    # residuals (Optimizer.cc:370-444)
    for rnd in range(cfg.pose_opt_rounds):
        T, r, J, behind = lm_round(T, r, J, behind, active, rnd < 2)
        chi2 = jnp.where(valid & ~behind,
                         jnp.sum(r * r, 1) * inv_sigma2, jnp.inf)
        active = valid & (chi2 < chi2_th)
    inliers = active
    # project back to SO(3): inherited drift otherwise compounds through
    # velocity-model compositions (see geo.project_so3)
    return PoseOptResult(T=geo.project_se3(T), inliers=inliers,
                         n_inliers=inliers.sum())
