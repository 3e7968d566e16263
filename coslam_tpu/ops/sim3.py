"""Sim3 estimation from 3D-3D correspondences: Horn closed form + RANSAC.

TPU redesign of reference Sim3Solver (ORB_SLAM2/src/Sim3Solver.cc): the
sequential RANSAC loop (iterate :140, 3-point minimal sets, mutual-
reprojection inlier check :340) becomes a vmap over all hypotheses; the
closed-form similarity (ComputeSim3 :226, Horn 1987 quaternion method via
the 4x4 N-matrix eigenvector) is batched eigh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class Sim3Result(NamedTuple):
    s: jnp.ndarray        # () scale
    R: jnp.ndarray        # (3, 3)
    t: jnp.ndarray        # (3,)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray


def horn_sim3(x1, x2, w=None, fix_scale: bool = False):
    """Closed-form similarity x2 ~ s R x1 + t from paired points (..., n, 3).

    Horn's quaternion method: R from the dominant eigenvector of the 4x4
    N matrix of the weighted correlation, then least-squares scale.
    """
    if w is None:
        w = jnp.ones(x1.shape[:-1], x1.dtype)
    wn = w / (w.sum(-1, keepdims=True) + 1e-12)
    c1 = (x1 * wn[..., None]).sum(-2)
    c2 = (x2 * wn[..., None]).sum(-2)
    a = x1 - c1[..., None, :]
    b = x2 - c2[..., None, :]
    M = _he("...ni,...nj->...ij", a * wn[..., None], b)  # sum w a b^T
    # N matrix (Horn 1987)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], -2)
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, 3]  # largest eigenvalue -> quaternion (w, x, y, z)
    R = geo.quat_to_rot(q)
    Ra = _he("...ij,...nj->...ni", R, a)
    if fix_scale:
        s = jnp.ones(M.shape[:-2], x1.dtype)
    else:
        s = (wn * jnp.sum(b * Ra, -1)).sum(-1) / (
            (wn * jnp.sum(Ra * Ra, -1)).sum(-1) + 1e-12)
    t = c2 - s[..., None] * _he("...ij,...j->...i", R, c1)
    return s, R, t


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def ransac_sim3(cam: CameraConfig, x1c, x2c, uv1, uv2, iters: int = 300,
                fix_scale: bool = False, valid=None, key=None,
                chi2_th: float = 10.0) -> Sim3Result:
    """RANSAC Sim3 between two keyframes' matched landmarks.

    x1c, x2c: (N, 3) matched points in each keyframe's *camera* frame;
    uv1, uv2: their observed pixels.  Inlier check mirrors Sim3Solver::
    CheckInliers (Sim3Solver.cc:340): mutual reprojection error in both
    frames under (S21, S21^-1) below chi2_th px^2.
    """
    n = x1c.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    if key is None:
        key = jax.random.PRNGKey(0)
    p = valid.astype(jnp.float32)
    p = p / (p.sum() + 1e-9)
    samples = jax.random.choice(key, n, shape=(iters, 3), replace=True, p=p)

    def project(pts):
        z = jnp.where(jnp.abs(pts[..., 2]) < 1e-6, 1e-6, pts[..., 2])
        return jnp.stack([pts[..., 0] / z * cam.fx + cam.cx,
                          pts[..., 1] / z * cam.fy + cam.cy], -1)

    def score(s, R, t):
        x2_pred = s * _he("ij,nj->ni", R, x1c) + t
        x1_pred = _he("ji,nj->ni", R, (x2c - t)) / jnp.maximum(s, 1e-9)
        e2 = jnp.sum((project(x2_pred) - uv2) ** 2, -1)
        e1 = jnp.sum((project(x1_pred) - uv1) ** 2, -1)
        # cheirality: a mapped point must sit in FRONT of the target
        # camera — negative-depth projections can accidentally land near
        # observed pixels and "verify" a mirrored/degenerate similarity
        ok = valid & (e1 < chi2_th) & (e2 < chi2_th) \
            & (x2_pred[:, 2] > 0.0) & (x1_pred[:, 2] > 0.0)
        return ok

    def one(idx):
        s, R, t = horn_sim3(x1c[idx], x2c[idx], fix_scale=fix_scale)
        ok = score(s, R, t)
        # a minimal set of near-coincident points yields an arbitrary
        # (often enormous) scale whose reprojections can still pass the
        # chi2 gate when translation is small relative to scene depth —
        # such hypotheses must not win the vote
        s_ok = (s > 1.0 / 16.0) & (s < 16.0)
        return s, R, t, jnp.where(s_ok, ok.sum(), -1)

    ss, Rs, ts, counts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    s, R, t = ss[best], Rs[best], ts[best]
    ok = score(s, R, t)
    # refine on all inliers (one weighted Horn pass, then re-classify)
    s2, R2, t2 = horn_sim3(x1c, x2c, w=ok.astype(jnp.float32),
                           fix_scale=fix_scale)
    ok2 = score(s2, R2, t2)
    better = ok2.sum() >= ok.sum()
    s = jnp.where(better, s2, s)
    R = jnp.where(better, R2, R)
    t = jnp.where(better, t2, t)
    ok = jnp.where(better, ok2, ok)
    # iterative LM refinement with forward+inverse projection edge pairs and
    # inlier pruning between rounds (reference Optimizer::OptimizeSim3,
    # Optimizer.cc:1046: 5 its -> prune -> 10 its) — the marginal loop
    # candidates depend on this polish
    s, R, t, ok = refine_sim3(cam, x1c, x2c, uv1, uv2, s, R, t, ok,
                              fix_scale=fix_scale, chi2_th=chi2_th)
    return Sim3Result(s=s, R=R, t=t, inliers=ok, n_inliers=ok.sum())


def refine_sim3(cam: CameraConfig, x1c, x2c, uv1, uv2, s0, R0, t0, valid,
                fix_scale: bool = False, chi2_th: float = 10.0,
                iters1: int = 5, iters2: int = 10):
    """Levenberg-Marquardt polish of a Sim3 S21 over matched camera-frame
    landmark pairs, minimizing BOTH projection directions (the reference's
    EdgeSim3ProjectXYZ + EdgeInverseSim3ProjectXYZ pairs, Optimizer.cc:
    1094-1133) with Huber robustification; outliers are pruned after the
    first round and the remainder re-optimized (Optimizer.cc:1149-1177).

    Parameterization: delta = (omega, nu, sigma) applied as
    R <- exp(omega) R,  t <- t + nu,  s <- s * exp(sigma) (sigma frozen when
    fix_scale).  Jacobians by forward-mode autodiff at delta = 0.
    """
    delta_huber2 = chi2_th  # Huber at the chi2 threshold (deltaHuber^2)

    def project(pts):
        z = jnp.where(jnp.abs(pts[..., 2]) < 1e-6, 1e-6, pts[..., 2])
        return jnp.stack([pts[..., 0] / z * cam.fx + cam.cx,
                          pts[..., 1] / z * cam.fy + cam.cy], -1)

    def residuals(delta, s, R, t):
        dR = geo.exp_so3(delta[:3])
        Rn = dR @ R
        tn = t + delta[3:6]
        sn = s * (1.0 if fix_scale else jnp.exp(delta[6]))
        x2_pred = sn * _he("ij,nj->ni", Rn, x1c) + tn
        x1_pred = _he("ji,nj->ni", Rn, (x2c - tn)) / jnp.maximum(sn, 1e-9)
        r2 = project(x2_pred) - uv2
        r1 = project(x1_pred) - uv1
        return jnp.concatenate([r1, r2], -1)          # (N, 4)

    def lm_rounds(s, R, t, w_in, n_iters):
        def step(carry, _):
            s, R, t, lam = carry
            z = jnp.zeros(7, jnp.float32)
            r = residuals(z, s, R, t)                 # (N, 4)
            J = jax.jacfwd(residuals)(z, s, R, t)     # (N, 4, 7)
            chi2 = jnp.sum(r * r, -1)
            wrob = jnp.where(chi2 > delta_huber2,
                             jnp.sqrt(delta_huber2 / jnp.maximum(chi2, 1e-12)),
                             1.0) * w_in
            Jw = J * wrob[:, None, None]
            H = _he("nij,nik->jk", Jw, J)
            g = _he("nij,ni->j", Jw, r)
            H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            if fix_scale:
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            d = -jnp.linalg.solve(H + 1e-9 * jnp.eye(7), g)
            r_new = residuals(d, s, R, t)
            c_old = (wrob * chi2).sum()
            c_new = (wrob * jnp.sum(r_new * r_new, -1)).sum()
            accept = c_new < c_old
            sn = s if fix_scale else jnp.where(accept, s * jnp.exp(d[6]), s)
            Rn = jnp.where(accept, geo.exp_so3(d[:3]) @ R, R)
            tn = jnp.where(accept, t + d[3:6], t)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-6, 1e4)
            return (sn, Rn, tn, lam), None

        (s, R, t, _), _ = jax.lax.scan(
            step, (s, R, t, jnp.float32(1e-3)), None, length=n_iters)
        return s, R, t

    w = valid.astype(jnp.float32)
    s, R, t = lm_rounds(s0, R0, t0, w, iters1)
    # prune: mutual reprojection gate at the current estimate
    r = residuals(jnp.zeros(7, jnp.float32), s, R, t)
    ok = valid & (jnp.sum(r[:, :2] ** 2, -1) < chi2_th) \
        & (jnp.sum(r[:, 2:] ** 2, -1) < chi2_th)
    s, R, t = lm_rounds(s, R, t, ok.astype(jnp.float32), iters2)
    r = residuals(jnp.zeros(7, jnp.float32), s, R, t)
    ok = valid & (jnp.sum(r[:, :2] ** 2, -1) < chi2_th) \
        & (jnp.sum(r[:, 2:] ** 2, -1) < chi2_th)
    return s, R, t, ok
