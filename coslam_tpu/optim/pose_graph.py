"""Sim3 pose-graph ("essential graph") optimization.

Replaces g2o-based Optimizer::OptimizeEssentialGraph (ORB_SLAM2/src/
Optimizer.cc:781-1044: VertexSim3Expmap/EdgeSim3 over loop, spanning-tree and
covisibility (w >= 100) edges, 20 LM iterations).  TPU form: the edge set is
the *static* dense upper triangle of keyframe pairs with a validity mask
(covisibility/sequential/loop selection is data, not structure), per-edge
7x14 Jacobians come from vmapped forward-mode autodiff of the residual

    r_e = log_sim3( M_ji^-1 o (exp(xi_j) S_j) o (exp(xi_i) S_i)^-1 )

and the (7K x 7K) Gauss-Newton system is assembled by scatter-add and solved
densely (K <= few hundred keyframes -> trivially MXU-sized).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class Sim3Vertices(NamedTuple):
    s: jnp.ndarray  # (K,)
    R: jnp.ndarray  # (K, 3, 3)
    t: jnp.ndarray  # (K, 3)


def vertices_from_se3(poses, s=None):
    K = poses.shape[0]
    return Sim3Vertices(
        s=jnp.ones(K, jnp.float32) if s is None else s,
        R=poses[:, :3, :3], t=poses[:, :3, 3])


def vertices_to_se3(v: Sim3Vertices):
    """[R | t/s] like the reference's conversion after graph optimization
    (LoopClosing.cc:471-478, Optimizer.cc:1030-1040).  Rotations projected
    back to SO(3) (see geo.project_so3)."""
    return geo.se3(geo.project_so3(v.R), v.t / v.s[:, None])


def _compose(sa, Ra, ta, sb, Rb, tb):
    """(a o b): x -> a(b(x)) for batched (s, R, t)."""
    s = sa * sb
    R = _he("...ij,...jk->...ik", Ra, Rb)
    t = sa[..., None] * _he("...ij,...j->...i", Ra, tb) + ta
    return s, R, t


def _inverse(s, R, t):
    si = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -si[..., None] * _he("...ij,...j->...i", Rt, t)
    return si, Rt, ti


def _log(s, R, t):
    return geo.log_sim3({"s": s, "R": R, "t": t})


def _exp(xi):
    S = geo.exp_sim3(xi)
    return S["s"], S["R"], S["t"]


def edge_residual(xi_i, xi_j, Si, Sj, Mji):
    """(7,), given perturbations (7,) of the two endpoint vertices.

    Si, Sj, Mji are (s, R, t) tuples; Mji is the fixed measurement
    S_j S_i^-1 captured at graph-build time.
    """
    es, eR, et = _exp(xi_i)
    si, Ri, ti = _compose(es, eR, et, *Si)
    es, eR, et = _exp(xi_j)
    sj, Rj, tj = _compose(es, eR, et, *Sj)
    rel = _compose(sj, Rj, tj, *_inverse(si, Ri, ti))   # S_j S_i^-1
    err = _compose(*_inverse(*Mji), *rel)
    return _log(*err)


@functools.partial(jax.jit, static_argnums=(4,))
def optimize(v: Sim3Vertices, edges_i, edges_j, meas: Sim3Vertices,
             iters: int, edge_valid=None, fixed=None,
             lam: float = 1e-6) -> Sim3Vertices:
    """Gauss-Newton over the masked edge list.

    edges_i/edges_j: (E,) int32 endpoints; meas: (E,)-batched measurement
    Sim3 (S_j S_i^-1 target); fixed: (K,) bool gauge mask.
    """
    K = v.s.shape[0]
    E = edges_i.shape[0]
    if edge_valid is None:
        edge_valid = jnp.ones(E, bool)
    if fixed is None:
        fixed = jnp.zeros(K, bool).at[0].set(True)
    free = ~fixed

    def gn_step(vv, _):
        Si = (vv.s[edges_i], vv.R[edges_i], vv.t[edges_i])
        Sj = (vv.s[edges_j], vv.R[edges_j], vv.t[edges_j])
        Mji = (meas.s, meas.R, meas.t)
        z = jnp.zeros(7, jnp.float32)

        def res_one(si, sj, mi, xi, xj):
            return edge_residual(xi, xj, si, sj, mi)

        def per_edge(si_s, si_R, si_t, sj_s, sj_R, sj_t, m_s, m_R, m_t):
            Si1 = (si_s, si_R, si_t)
            Sj1 = (sj_s, sj_R, sj_t)
            M1 = (m_s, m_R, m_t)
            r = edge_residual(z, z, Si1, Sj1, M1)
            Ji = jax.jacfwd(lambda x: edge_residual(x, z, Si1, Sj1, M1))(z)
            Jj = jax.jacfwd(lambda x: edge_residual(z, x, Si1, Sj1, M1))(z)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(
            Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2], Mji[0], Mji[1], Mji[2])
        w = edge_valid.astype(jnp.float32)
        rw = r * w[:, None]
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]

        H = jnp.zeros((K, 7, K, 7), jnp.float32)
        H = H.at[edges_i, :, edges_i, :].add(_he("eai,eaj->eij", Jiw, Ji))
        H = H.at[edges_j, :, edges_j, :].add(_he("eai,eaj->eij", Jjw, Jj))
        H = H.at[edges_i, :, edges_j, :].add(_he("eai,eaj->eij", Jiw, Jj))
        H = H.at[edges_j, :, edges_i, :].add(_he("eai,eaj->eij", Jjw, Ji))
        b = jnp.zeros((K, 7), jnp.float32)
        b = b.at[edges_i].add(_he("eai,ea->ei", Jiw, r))
        b = b.at[edges_j].add(_he("eai,ea->ei", Jjw, r))

        # gauge: zero rows/cols of fixed vertices, identity diagonal
        fm = free.astype(jnp.float32)
        H = H * fm[:, None, None, None] * fm[None, None, :, None]
        b = b * fm[:, None]
        Hf = H.reshape(K * 7, K * 7)
        diag_boost = jnp.where(jnp.repeat(free, 7), lam, 1.0)
        Hf = Hf + jnp.diag(diag_boost) + lam * jnp.eye(K * 7)
        dx = -jnp.linalg.solve(Hf, b.reshape(-1)).reshape(K, 7)
        dx = dx * fm[:, None]

        es, eR, et = _exp(dx)
        s, R, t = _compose(es, eR, et, vv.s, vv.R, vv.t)
        R = geo.project_to_so3(R)
        return Sim3Vertices(s=s, R=R, t=t), jnp.sum(rw * r)

    v, _ = jax.lax.scan(gn_step, v, None, length=iters)
    return v


def relative_sim3(v: Sim3Vertices, i, j):
    """Measurement S_j S_i^-1 from current vertex estimates (batched)."""
    Si = (v.s[i], v.R[i], v.t[i])
    Sj = (v.s[j], v.R[j], v.t[j])
    s, R, t = _compose(*Sj, *_inverse(*Si))
    return Sim3Vertices(s=s, R=R, t=t)


@functools.partial(jax.jit, static_argnums=(4, 8))
def optimize_sparse(v: Sim3Vertices, edges_i, edges_j, meas: Sim3Vertices,
                    iters: int, edge_valid=None, fixed=None,
                    lam: float = 1e-6, pcg_iters: int = 64) -> Sim3Vertices:
    """Gauss-Newton over a SPARSE edge list with a matrix-free
    block-Jacobi-preconditioned CG solve.

    The dense `optimize` materializes the (7K, 7K) Hessian and solves it
    directly — O(K^2) memory and O(K^3) work, a wall at K ≈ 2000 (the
    reference's essential graph is sparse, Optimizer.cc:869-980: spanning
    tree + covisibility(w>=100) + loop edges, E = O(K)).  Here the normal
    equations are never materialized: the Hv product gathers the two
    endpoint blocks per edge, applies the per-edge (7, 7) Jacobian blocks,
    and scatter-adds — O(E) per CG step, the same matrix-free machinery as
    optim/ba.py's reduced-camera solve."""
    K = v.s.shape[0]
    E = edges_i.shape[0]
    if edge_valid is None:
        edge_valid = jnp.ones(E, bool)
    if fixed is None:
        fixed = jnp.zeros(K, bool).at[0].set(True)
    free = ~fixed
    fm = free.astype(jnp.float32)

    def gn_step(vv, _):
        Si = (vv.s[edges_i], vv.R[edges_i], vv.t[edges_i])
        Sj = (vv.s[edges_j], vv.R[edges_j], vv.t[edges_j])
        z = jnp.zeros(7, jnp.float32)

        def per_edge(si_s, si_R, si_t, sj_s, sj_R, sj_t, m_s, m_R, m_t):
            Si1 = (si_s, si_R, si_t)
            Sj1 = (sj_s, sj_R, sj_t)
            M1 = (m_s, m_R, m_t)
            r = edge_residual(z, z, Si1, Sj1, M1)
            Ji = jax.jacfwd(lambda x: edge_residual(x, z, Si1, Sj1, M1))(z)
            Jj = jax.jacfwd(lambda x: edge_residual(z, x, Si1, Sj1, M1))(z)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(
            Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2],
            meas.s, meas.R, meas.t)
        w = edge_valid.astype(jnp.float32)
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]

        # gradient b = J^T r  (per free vertex)
        b = jnp.zeros((K, 7), jnp.float32)
        b = b.at[edges_i].add(_he("eai,ea->ei", Jiw, r))
        b = b.at[edges_j].add(_he("eai,ea->ei", Jjw, r))
        b = b * fm[:, None]

        # block-diagonal of H (for the Jacobi preconditioner)
        D = jnp.zeros((K, 7, 7), jnp.float32)
        D = D.at[edges_i].add(_he("eai,eaj->eij", Jiw, Ji))
        D = D.at[edges_j].add(_he("eai,eaj->eij", Jjw, Jj))
        D = D + (lam + 1e-6) * jnp.eye(7)
        D = jnp.where(free[:, None, None], D,
                      jnp.broadcast_to(jnp.eye(7), (K, 7, 7)))
        D_chol = jax.vmap(jnp.linalg.cholesky)(D)

        def Hv(x):
            xm = x * fm[:, None]
            xi = xm[edges_i]
            xj = xm[edges_j]
            yi = _he("eia,ea->ei", jnp.swapaxes(Jiw, 1, 2),
                     _he("eab,eb->ea", Ji, xi) + _he("eab,eb->ea", Jj, xj))
            yj = _he("eia,ea->ei", jnp.swapaxes(Jjw, 1, 2),
                     _he("eab,eb->ea", Ji, xi) + _he("eab,eb->ea", Jj, xj))
            y = jnp.zeros((K, 7), jnp.float32)
            y = y.at[edges_i].add(yi)
            y = y.at[edges_j].add(yj)
            y = y * fm[:, None] + lam * xm
            # fixed vertices: identity rows keep them pinned at zero update
            return y + x * (1.0 - fm)[:, None]

        def precond(x):
            return jax.vmap(lambda c, bb: jax.scipy.linalg.cho_solve(
                (c, True), bb))(D_chol, x)

        # PCG on H dx = -b
        x0 = jnp.zeros((K, 7), jnp.float32)
        r0 = -b - Hv(x0)
        z0 = precond(r0)
        p0 = z0

        def cg_body(carry, _):
            x, rr, zz, p = carry
            Hp = Hv(p)
            rz = jnp.sum(rr * zz)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-20)
            x = x + alpha * p
            r_new = rr - alpha * Hp
            z_new = precond(r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
            p_new = z_new + beta * p
            return (x, r_new, z_new, p_new), None

        (dx, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, p0), None, length=pcg_iters)
        dx = dx * fm[:, None]

        es, eR, et = _exp(dx)
        s, R, t = _compose(es, eR, et, vv.s, vv.R, vv.t)
        R = geo.project_to_so3(R)
        return Sim3Vertices(s=s, R=R, t=t), None

    v, _ = jax.lax.scan(gn_step, v, None, length=iters)
    return v
