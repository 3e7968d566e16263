"""Bundle adjustment: Schur-complement Levenberg-Marquardt with matrix-free
preconditioned conjugate gradients.

Replaces every g2o structure-and-pose optimizer in the reference —
Optimizer::BundleAdjustment (ORB_SLAM2/src/Optimizer.cc:49, used by global BA
:41 and initialization), Optimizer::LocalBundleAdjustment (:453) — with one
engine over a fixed-shape observation list:

  * residuals/Jacobians are batched over observations (VPU),
  * the point (landmark) blocks are eliminated in closed form — Hpp is
    block-diagonal 3x3, inverted analytically per point,
  * the reduced camera system S = Hcc - Y Hpp^-1 Y^T is never materialized:
    PCG runs on it matrix-free, each matvec being two observation-indexed
    segment-sum passes, with a block-Jacobi (6x6) preconditioner,
  * LM damping with accept/reject by total robust cost; rejected steps are
    `where`-masked, no dynamic control flow.

This formulation is what makes the distributed version (parallel/
sharded_ba.py) natural: sharding the observation axis turns every
segment-sum into a psum over the mesh — the structural analog of
data-parallel gradient accumulation (SURVEY.md 2.5 P4).

Gauge freedom: `kf_fixed` keyframes contribute measurements but receive no
update (rows/cols masked out of the reduced system), mirroring g2o's
setFixed on the first/fixed keyframes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class BAProblem(NamedTuple):
    poses: jnp.ndarray       # (K, 4, 4) Tcw
    points: jnp.ndarray      # (P, 3) world
    obs_kf: jnp.ndarray      # (O,) int32 keyframe index
    obs_pt: jnp.ndarray      # (O,) int32 point index
    obs_uv: jnp.ndarray      # (O, 2) undistorted pixel observations
    obs_w: jnp.ndarray       # (O,) information (inv sigma^2 per octave)
    obs_valid: jnp.ndarray   # (O,) bool
    kf_fixed: jnp.ndarray    # (K,) bool — gauge/fixed cameras


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (O,) bool chi2 < threshold at the solution
    cost: jnp.ndarray        # final robust cost


def _proj_residuals(cam: CameraConfig, poses, points, p: BAProblem):
    T = poses[p.obs_kf]                       # (O, 4, 4)
    X = points[p.obs_pt]                      # (O, 3)
    R = T[:, :3, :3]
    pc = _he("oij,oj->oi", R, X) + T[:, :3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / zs
    u = x * iz * cam.fx + cam.cx
    v = y * iz * cam.fy + cam.cy
    r = jnp.stack([u, v], 1) - p.obs_uv
    iz2 = iz * iz
    J_uv = jnp.stack([
        jnp.stack([cam.fx * iz, jnp.zeros_like(z), -cam.fx * x * iz2], 1),
        jnp.stack([jnp.zeros_like(z), cam.fy * iz, -cam.fy * y * iz2], 1),
    ], 1)                                     # (O, 2, 3)
    Jc = jnp.concatenate([
        J_uv,
        -_he("oij,ojk->oik", J_uv, geo.hat(pc))], 2)   # (O, 2, 6)
    Jp = _he("oij,ojk->oik", J_uv, R)          # (O, 2, 3)
    behind = z <= 0.05
    return r, Jc, Jp, behind


def _robust_weight(chi2, delta2, robust):
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.where(robust & (chi2 > delta2), d / e, 1.0)


def _robust_cost(chi2, delta2, robust):
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.where(robust & (chi2 > delta2), d * (2 * e - d), chi2)


def _inv3(M):
    """Batched closed-form 3x3 inverse."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([jnp.stack([A, B, C], -1),
                     jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, I], -1)], -2)
    return inv / det[..., None, None]


def _block_diag_dense(blocks):
    """(K, B, B) diagonal blocks -> (K*B, K*B) dense block-diagonal."""
    K, B, _ = blocks.shape
    out = jnp.zeros((K, B, K, B), blocks.dtype)
    out = out.at[jnp.arange(K), :, jnp.arange(K), :].set(blocks)
    return out.reshape(K * B, K * B)


def _seg_sum(x, idx, n, axis_name=None):
    """Segment sum; with `axis_name` the local partial sums are all-reduced
    over the mesh axis — the one-line change that makes the whole solver
    observation-sharded (parallel/sharded_ba.py)."""
    out = jnp.zeros((n,) + x.shape[1:], x.dtype).at[idx].add(x)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def solve(cam: CameraConfig, prob: BAProblem, iters: int = 10,
          pcg_iters: int = 40, chi2_th: float = 5.991,
          robust: bool = True) -> BAResult:
    """Run `iters` LM steps.  Shapes are static; cost of one step is
    O(observations) + PCG matvecs."""
    return solve_body(cam, prob, iters, pcg_iters, chi2_th, robust, None)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def solve_dense(cam: CameraConfig, prob: BAProblem, iters: int = 10,
                chi2_th: float = 5.991, robust: bool = True) -> BAResult:
    """LM with the reduced camera system MATERIALIZED and solved directly.

    For the problem-shaped windowed local BA (K <= ~32 free cameras) the
    matrix-free PCG solver pays ~30 sequential matvec iterations per LM
    step — dispatch-chain latency, not FLOPs, dominates on TPU.  Here the
    (6K, 6K) Schur complement S = Hcc - Y Hpp^-1 Y^T is assembled as ONE
    batched scatter + ONE MXU matmul over the dense (6K, 3P) off-diagonal
    block, then solved exactly by LU — an exact Newton step per LM
    iteration (better conditioned than truncated PCG) with a ~10x shorter
    dependency chain.  Memory: K*P*18 floats for Y (24 x 8192 -> 14 MB);
    use `solve` (matrix-free) when K*P is large.

    Replaces g2o's BlockSolver_6_3 + LinearSolverEigen direct solve
    (reference Optimizer.cc:56-62) more literally than the PCG path does.
    """
    K = prob.poses.shape[0]
    P = prob.points.shape[0]
    delta2 = chi2_th
    free = ~prob.kf_fixed

    def total_cost(poses, points, rob):
        r, _, _, behind = _proj_residuals(cam, poses, points, prob)
        chi2 = jnp.sum(r * r, 1) * prob.obs_w
        ok = prob.obs_valid & ~behind
        return jnp.where(ok, _robust_cost(chi2, delta2, rob), 0.0).sum()

    def lm_step(carry, _):
        poses, points, lam = carry
        r, Jc, Jp, behind = _proj_residuals(cam, poses, points, prob)
        chi2 = jnp.sum(r * r, 1) * prob.obs_w
        ok = prob.obs_valid & ~behind
        w = jnp.where(ok, prob.obs_w * _robust_weight(chi2, delta2, robust),
                      0.0)
        Jcw = Jc * w[:, None, None]
        Jpw = Jp * w[:, None, None]

        Hcc = _seg_sum(_he("oij,oik->ojk", Jcw, Jc), prob.obs_kf, K)
        Hpp = _seg_sum(_he("oij,oik->ojk", Jpw, Jp), prob.obs_pt, P)
        bc = _seg_sum(_he("oij,oi->oj", Jcw, r), prob.obs_kf, K)
        bp = _seg_sum(_he("oij,oi->oj", Jpw, r), prob.obs_pt, P)

        lamc = lam * jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-6)
        lamp = lam * jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)
        Hpp_inv = _inv3(Hpp + jax.vmap(jnp.diag)(lamp))

        # dense camera-point block Y: (K, P, 6, 3) via one scatter-add
        Yblk = jnp.zeros((K, P, 6, 3), jnp.float32).at[
            prob.obs_kf, prob.obs_pt].add(_he("oij,oik->ojk", Jcw, Jp))
        # S = Hcc + lam - Y Hpp^-1 Y^T: flatten to a (6K, 3P) x (3P, 6K)
        # MXU matmul (the blocked einsum's tiny 6x3 contractions do not
        # tile onto the systolic array)
        YH = _he("kpij,pjl->kpil", Yblk, Hpp_inv)          # (K, P, 6, 3)
        Yr = Yblk.transpose(0, 2, 1, 3).reshape(6 * K, 3 * P)
        YHr = YH.transpose(0, 2, 1, 3).reshape(6 * K, 3 * P)
        # bf16 MXU precision (explicit opt-out of the global f32-HIGHEST
        # default): ~0.4% relative error on S entries only perturbs the LM
        # step direction (accept/reject still gates on the exact f32 cost)
        # and halves the assembly time vs 6-pass f32
        Sd = -jnp.einsum("ij,kj->ik", YHr, Yr,
                         precision=jax.lax.Precision.DEFAULT)  # (6K, 6K)
        Hcc_d = Hcc + jax.vmap(jnp.diag)(lamc)             # (K, 6, 6)
        Sd = Sd + _block_diag_dense(Hcc_d)
        # reduced gradient g = -bc + Y Hpp^-1 bp
        g = -bc + _he("kpij,pj->ki", YH, bp)
        # gauge: zero rows/cols of fixed cameras, identity on their diagonal
        free6 = jnp.repeat(free, 6)
        Sd = jnp.where(free6[:, None] & free6[None, :], Sd,
                       jnp.eye(6 * K) * 1.0)
        gd = jnp.where(free6, g.reshape(-1), 0.0)
        dc = jax.scipy.linalg.solve(
            Sd + 1e-8 * jnp.eye(6 * K), gd, assume_a="pos").reshape(K, 6)
        dc = jnp.where(free[:, None], dc, 0.0)

        # back-substitute: dp = Hpp^-1 (-bp - Y^T dc)
        Ytdc = _he("kpij,ki->pj", Yblk, dc)
        dp = _he("pij,pj->pi", Hpp_inv, -bp - Ytdc)

        poses_new = jax.vmap(lambda d, T: geo.exp_se3(d) @ T)(dc, poses)
        points_new = points + dp
        cost_old = total_cost(poses, points, robust)
        cost_new = total_cost(poses_new, points_new, robust)
        accept = cost_new < cost_old
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0), 1e-8, 1e4)
        return (poses, points, lam), cost_new

    (poses, points, _), _ = jax.lax.scan(
        lm_step, (prob.poses, prob.points, jnp.float32(1e-4)), None,
        length=iters)
    r, _, _, behind = _proj_residuals(cam, poses, points, prob)
    chi2 = jnp.sum(r * r, 1) * prob.obs_w
    inlier = prob.obs_valid & ~behind & (chi2 < chi2_th)
    return BAResult(poses=geo.project_se3(poses), points=points,
                    obs_inlier=inlier,
                    cost=total_cost(poses, points, robust))


def solve_dense_compact(cam: CameraConfig, prob: BAProblem,
                        p_local: int, iters: int = 10,
                        chi2_th: float = 5.991,
                        robust: bool = True) -> BAResult:
    """solve_dense on a point-COMPACTED subproblem.

    The windowed local BA hands the solver points at full map capacity P,
    but only the <= O landmarks its observations touch ever receive
    gradient; every per-iteration tensor shaped by P (Hpp, the dense Y
    block, their products) pays capacity, not problem size — measured ~40%
    of the per-iteration wall at P=16k.  Here the observed point ids are
    ranked into `p_local` compact slots (sort + first-occurrence cumsum,
    all static shapes), the solver runs at P=p_local, and the updated
    positions scatter back.  Observations of points beyond the p_local
    capacity are masked out (they keep their positions) — with p_local of
    a few thousand this only triggers on degenerate windows.

    Semantically identical to solve_dense whenever the unique observed
    points fit in p_local (tests/test_ba.py::test_compact_matches_dense).
    """
    P = prob.points.shape[0]
    if p_local >= P:
        return solve_dense(cam, prob, iters, chi2_th, robust)
    O = prob.obs_pt.shape[0]
    pt_key = jnp.where(prob.obs_valid, prob.obs_pt, P)       # (O,)
    order = jnp.argsort(pt_key)
    sorted_pt = pt_key[order]
    first = jnp.concatenate([jnp.ones(1, bool),
                             sorted_pt[1:] != sorted_pt[:-1]])
    first = first & (sorted_pt < P)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1           # (O,)
    # local slot -> global point id (capacity p_local, overflow dropped)
    slot_pt = jnp.full(p_local, P, jnp.int32).at[
        jnp.where(first & (rank < p_local), rank, p_local)].set(
        sorted_pt, mode="drop")
    # per-observation local id, undoing the sort
    loc_sorted = jnp.where((sorted_pt < P) & (rank < p_local), rank, p_local)
    loc = jnp.zeros(O, jnp.int32).at[order].set(loc_sorted)
    ok = prob.obs_valid & (loc < p_local)
    slot_safe = jnp.minimum(slot_pt, P - 1)
    sub = prob._replace(points=prob.points[slot_safe],
                        obs_pt=jnp.minimum(loc, p_local - 1),
                        obs_valid=ok)
    res = solve_dense(cam, sub, iters, chi2_th, robust)
    live = slot_pt < P
    points = prob.points.at[jnp.where(live, slot_pt, P)].set(
        jnp.where(live[:, None], res.points, 0.0), mode="drop")
    return res._replace(points=points)


def solve_body(cam: CameraConfig, prob: BAProblem, iters: int,
               pcg_iters: int, chi2_th: float, robust: bool,
               axis_name) -> BAResult:
    """Solver body, callable from inside shard_map with observations sharded
    along `axis_name` (poses/points replicated).  All cross-observation
    reductions go through _seg_sum/psum, so every shard computes identical
    replicated pose/point updates."""
    K = prob.poses.shape[0]
    P = prob.points.shape[0]
    delta2 = chi2_th
    free = ~prob.kf_fixed                      # (K,)

    def total_cost(poses, points, rob):
        r, _, _, behind = _proj_residuals(cam, poses, points, prob)
        chi2 = jnp.sum(r * r, 1) * prob.obs_w
        ok = prob.obs_valid & ~behind
        c = jnp.where(ok, _robust_cost(chi2, delta2, rob), 0.0).sum()
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def lm_step(carry, _):
        poses, points, lam = carry
        r, Jc, Jp, behind = _proj_residuals(cam, poses, points, prob)
        chi2 = jnp.sum(r * r, 1) * prob.obs_w
        ok = prob.obs_valid & ~behind
        w = jnp.where(ok, prob.obs_w * _robust_weight(chi2, delta2, robust), 0.0)

        Jcw = Jc * w[:, None, None]
        Jpw = Jp * w[:, None, None]
        # diagonal blocks
        Hcc = _seg_sum(_he("oij,oik->ojk", Jcw, Jc), prob.obs_kf, K, axis_name)  # (K,6,6)
        Hpp = _seg_sum(_he("oij,oik->ojk", Jpw, Jp), prob.obs_pt, P, axis_name)  # (P,3,3)
        bc = _seg_sum(_he("oij,oi->oj", Jcw, r), prob.obs_kf, K, axis_name)      # (K,6)
        bp = _seg_sum(_he("oij,oi->oj", Jpw, r), prob.obs_pt, P, axis_name)      # (P,3)

        lamc = lam * jnp.maximum(
            jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-6)                # (K,6)
        lamp = lam * jnp.maximum(
            jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)                # (P,3)
        Hpp_d = Hpp + jax.vmap(jnp.diag)(lamp)
        Hpp_inv = _inv3(Hpp_d)                                        # (P,3,3)

        def Yt_x(x):
            """Y^T x aggregated per point: (K,6) -> (P,3)."""
            u = _he("oij,oj->oi", Jc, x[prob.obs_kf])      # (O, 2)
            return _seg_sum(_he("oij,oi->oj", Jpw, u), prob.obs_pt, P, axis_name)

        def Y_y(y):
            """Y y aggregated per camera: (P,3) -> (K,6)."""
            v = _he("oij,oj->oi", Jp, y[prob.obs_pt])      # (O, 2)
            return _seg_sum(_he("oij,oi->oj", Jcw, v), prob.obs_kf, K, axis_name)

        def S_mv(x):
            x = jnp.where(free[:, None], x, 0.0)
            u = _he("oij,oj->oi", Jc, x[prob.obs_kf])
            hcc_x = _seg_sum(_he("oij,oi->oj", Jcw, u), prob.obs_kf, K,
                             axis_name) + lamc * x
            s = hcc_x - Y_y(_he("pij,pj->pi", Hpp_inv, Yt_x(x)))
            return jnp.where(free[:, None], s, 0.0)

        # reduced gradient: g = -bc + Y Hpp^-1 bp  (solving S dc = g)
        g = -bc + Y_y(_he("pij,pj->pi", Hpp_inv, bp))
        g = jnp.where(free[:, None], g, 0.0)

        # block-Jacobi preconditioner on Hcc + damping
        Mc = Hcc + jax.vmap(jnp.diag)(lamc) + 1e-8 * jnp.eye(6)
        Mc_inv = jnp.linalg.inv(Mc)
        Mc_inv = jnp.where(free[:, None, None], Mc_inv,
                           jnp.eye(6)[None])

        def precond(v):
            return _he("kij,kj->ki", Mc_inv, v)

        def pcg_body(i, st):
            x, rr, z, pdir, rz = st
            Ap = S_mv(pdir)
            denom = jnp.sum(pdir * Ap) + 1e-20
            alpha = rz / denom
            x = x + alpha * pdir
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / (rz + 1e-20)
            pdir = z + beta * pdir
            return (x, rr, z, pdir, rz_new)

        x0 = jnp.zeros_like(g)
        r0 = g
        z0 = precond(r0)
        dc, *_ = jax.lax.fori_loop(
            0, pcg_iters, pcg_body, (x0, r0, z0, z0, jnp.sum(r0 * z0)))
        dc = jnp.where(free[:, None], dc, 0.0)

        # back-substitute points: dp = Hpp^-1 (-bp - Y^T dc)
        dp = _he("pij,pj->pi", Hpp_inv, -bp - Yt_x(dc))

        poses_new = jax.vmap(lambda d, T: geo.exp_se3(d) @ T)(dc, poses)
        points_new = points + dp

        cost_old = total_cost(poses, points, robust)
        cost_new = total_cost(poses_new, points_new, robust)
        accept = cost_new < cost_old
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0), 1e-8, 1e4)
        return (poses, points, lam), cost_new

    (poses, points, _), _ = jax.lax.scan(
        lm_step, (prob.poses, prob.points, jnp.float32(1e-4)), None,
        length=iters)

    r, _, _, behind = _proj_residuals(cam, poses, points, prob)
    chi2 = jnp.sum(r * r, 1) * prob.obs_w
    inlier = prob.obs_valid & ~behind & (chi2 < chi2_th)
    # project rotations back to SO(3): exp-update composition drift would
    # otherwise compound through downstream pose algebra (geo.project_so3)
    return BAResult(poses=geo.project_se3(poses), points=points,
                    obs_inlier=inlier,
                    cost=total_cost(poses, points, robust))
