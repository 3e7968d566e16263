"""Distributed bundle adjustment: observations sharded over the mesh.

The north-star parallel component (SURVEY.md 2.5 P4 / section 5.7): the
reference runs one g2o LM solve on one CPU thread (Optimizer.cc:453, :49);
here the observation axis — where all the O(measurements) work lives —
shards across the `ba` mesh axis.  Each device computes residuals/Jacobians
and partial segment-sums for its observation shard; `psum` over ICI
assembles the block-diagonal Hessians, gradients, and every PCG matvec of
the reduced camera system.  Poses and points stay replicated (they are tiny:
K*6 + P*3 floats), so the collective volume per LM iteration is
O(K*36 + P*9) — independent of the number of observations.

This is exactly optim/ba.solve_body with `axis_name="ba"`; the math is
identical, shard-count-invariant, and validated against the single-device
solver in tests/test_sharded_ba.py on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from coslam_tpu.config import CameraConfig
from coslam_tpu.optim import ba
from coslam_tpu.parallel import mesh as mesh_lib
from coslam_tpu.utils import geometry as geo


def solve_sharded(cam: CameraConfig, prob: ba.BAProblem, mesh: Mesh,
                  iters: int = 10, pcg_iters: int = 40,
                  chi2_th: float = 5.991, robust: bool = True) -> ba.BAResult:
    """Distributed ba.solve.  Observation arrays are padded to a multiple of
    the ba-axis size and sharded; poses/points replicate."""
    n_shards = mesh.shape["ba"]
    pad = lambda x, fill=0: mesh_lib.pad_to_multiple(x, n_shards, 0, fill)
    prob = prob._replace(
        obs_kf=pad(prob.obs_kf), obs_pt=pad(prob.obs_pt),
        obs_uv=pad(prob.obs_uv), obs_w=pad(prob.obs_w),
        obs_valid=pad(prob.obs_valid, False),
    )

    obs_spec = P("ba")
    rep = P()
    in_specs = ba.BAProblem(
        poses=rep, points=rep, obs_kf=obs_spec, obs_pt=obs_spec,
        obs_uv=obs_spec, obs_w=obs_spec, obs_valid=obs_spec, kf_fixed=rep)
    out_specs = ba.BAResult(poses=rep, points=rep, obs_inlier=obs_spec,
                            cost=rep)

    @functools.partial(jax.jit, static_argnums=())
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False)
    def run(p: ba.BAProblem) -> ba.BAResult:
        return ba.solve_body(cam, p, iters, pcg_iters, chi2_th, robust, "ba")

    return run(prob)


# ---------------------------------------------------------------------------
# Fully PARTITIONED distributed BA (SURVEY.md 2.5 P4's actual content):
# point blocks owned per device with LOCAL elimination, keyframe block-rows
# of the reduced camera system distributed, reduce-scatter/all-gather
# assembly.  Map size is bounded by AGGREGATE HBM, not one device's.
# ---------------------------------------------------------------------------

def partition_problem(prob: ba.BAProblem, n_shards: int):
    """Host-side partitioning: points into contiguous blocks of P/D; every
    observation is routed to the device owning its point (so the 3x3 point
    elimination never communicates); per-device observation lists are padded
    to a common length.  Returns (stacked per-device problem arrays with a
    leading `ba` axis, point block size)."""
    P = prob.points.shape[0]
    blk = -(-P // n_shards)                    # ceil
    obs_pt = np.asarray(prob.obs_pt)
    obs_valid = np.asarray(prob.obs_valid)
    owner = np.clip(obs_pt // blk, 0, n_shards - 1)
    owner = np.where(obs_valid, owner, 0)      # park invalid obs on shard 0
    counts = np.bincount(owner, minlength=n_shards)
    O_shard = int(max(counts.max(), 1))
    idx = np.full((n_shards, O_shard), 0, np.int64)
    val = np.zeros((n_shards, O_shard), bool)
    loc = np.zeros((n_shards, O_shard), np.int32)
    for d in range(n_shards):
        sel = np.nonzero(owner == d)[0]
        idx[d, : len(sel)] = sel
        val[d, : len(sel)] = obs_valid[sel]
        # local point index within the owner's block (invalid parked obs
        # keep index 0 and are masked by obs_valid)
        loc[d, : len(sel)] = np.where(obs_valid[sel],
                                      obs_pt[sel] - d * blk, 0)

    def take(a, fill=0):
        return jnp.asarray(np.asarray(a)[idx])

    pts_pad = -(-P // n_shards) * n_shards - P
    points = np.asarray(prob.points)
    if pts_pad:
        points = np.concatenate(
            [points, np.zeros((pts_pad, 3), points.dtype)])
    per_dev = dict(
        points=jnp.asarray(points.reshape(n_shards, blk, 3)),
        obs_kf=take(prob.obs_kf),
        obs_pt_local=jnp.asarray(loc),
        obs_uv=take(prob.obs_uv),
        obs_w=take(prob.obs_w),
        obs_valid=jnp.asarray(val),
        obs_global_idx=jnp.asarray(idx),
    )
    return per_dev, blk


def collective_bytes_per_iter(K: int, n_shards: int, pcg_iters: int) -> int:
    """Analytic per-device ICI traffic of one LM iteration of the
    partitioned solver: each PCG matvec all-gathers the (K, 6) search
    direction and reduce-scatters the (K, 6) result; assembly reduce-
    scatters Hcc (K, 6, 6) and bc (K, 6) once."""
    f = 4  # float32
    ring = (n_shards - 1) / max(n_shards, 1)
    per_matvec = 2 * K * 6 * f * ring
    assembly = (K * 36 + K * 6) * f * ring
    return int(pcg_iters * per_matvec + assembly)


def solve_partitioned(cam: CameraConfig, prob: ba.BAProblem, mesh: Mesh,
                      iters: int = 10, pcg_iters: int = 40,
                      chi2_th: float = 5.991, robust: bool = True
                      ) -> ba.BAResult:
    """Distributed Schur-LM with point blocks AND reduced-camera block-rows
    partitioned over the `ba` mesh axis.

    Per device: its point block's 3x3 Hessians are inverted locally (zero
    communication — the elimination is embarrassingly parallel, SURVEY.md
    2.5 P4); the reduced camera system's rows are owned in K/D blocks.
    Each PCG matvec all-gathers the (K, 6) iterate over ICI, accumulates
    local observation contributions, and reduce-scatters (psum_scatter) the
    product back to row owners.  Poses are replicated (K*16 floats — tiny);
    points and observations, where the memory lives, are sharded.  Replaces
    the reference's single-thread g2o solve (Optimizer.cc:49,453)."""
    D = mesh.shape["ba"]
    per_dev, blk = partition_problem(prob, D)
    K = prob.poses.shape[0]
    Kb = -(-K // D)
    K_pad = Kb * D

    in_specs = (dict(points=P("ba"), obs_kf=P("ba"),
                     obs_pt_local=P("ba"), obs_uv=P("ba"), obs_w=P("ba"),
                     obs_valid=P("ba"), obs_global_idx=P("ba")),
                P(), P())
    out_specs = (P(), P("ba"), P("ba"), P())

    def pad_rows(x):
        return jnp.concatenate(
            [x, jnp.zeros((K_pad - K,) + x.shape[1:], x.dtype)]) \
            if K_pad > K else x

    @functools.partial(jax.jit, static_argnums=())
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=in_specs, out_specs=out_specs,
                       check_vma=False)
    def run(pd, poses0, kf_fixed):
        pts = pd["points"][0]                  # (blk, 3) local block
        obs_kf = pd["obs_kf"][0]
        obs_pt = pd["obs_pt_local"][0]
        obs_uv = pd["obs_uv"][0]
        obs_w = pd["obs_w"][0]
        obs_valid = pd["obs_valid"][0]
        free = ~kf_fixed
        delta2 = chi2_th

        def local_prob(points):
            return ba.BAProblem(
                poses=None, points=points, obs_kf=obs_kf, obs_pt=obs_pt,
                obs_uv=obs_uv, obs_w=obs_w, obs_valid=obs_valid,
                kf_fixed=kf_fixed)

        def residuals(poses, points):
            return ba._proj_residuals(cam, poses, points,
                                      local_prob(points))

        def rs_rows(x_full):
            """(K, 6...) local partial -> owned (Kb, ...) block rows via
            reduce-scatter."""
            return jax.lax.psum_scatter(pad_rows(x_full), "ba",
                                        scatter_dimension=0, tiled=True)

        def ag_rows(x_own):
            """owned (Kb, ...) -> replicated (K, ...)."""
            return jax.lax.all_gather(x_own, "ba", axis=0, tiled=True)[:K]

        def total_cost(poses, points, rob):
            r, _, _, behind = residuals(poses, points)
            chi2 = jnp.sum(r * r, 1) * obs_w
            ok = obs_valid & ~behind
            return jax.lax.psum(
                jnp.where(ok, ba._robust_cost(chi2, delta2, rob), 0.0).sum(),
                "ba")

        def lm_step(carry, _):
            poses, points, lam = carry
            r, Jc, Jp, behind = residuals(poses, points)
            chi2 = jnp.sum(r * r, 1) * obs_w
            ok = obs_valid & ~behind
            w = jnp.where(ok, obs_w * ba._robust_weight(chi2, delta2,
                                                        robust), 0.0)
            Jcw = Jc * w[:, None, None]
            Jpw = Jp * w[:, None, None]
            Pb = points.shape[0]

            def seg_pt(x):
                return jnp.zeros((Pb,) + x.shape[1:], x.dtype
                                 ).at[obs_pt].add(x)

            def seg_kf(x):
                return jnp.zeros((K,) + x.shape[1:], x.dtype
                                 ).at[obs_kf].add(x)

            # point blocks: FULLY LOCAL elimination
            Hpp = seg_pt(ba._he("oij,oik->ojk", Jpw, Jp))
            bp = seg_pt(ba._he("oij,oi->oj", Jpw, r))
            lamp = lam * jnp.maximum(
                jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6)
            Hpp_inv = ba._inv3(Hpp + jax.vmap(jnp.diag)(lamp))

            # camera blocks: reduce-scatter to row owners
            Hcc_own = rs_rows(seg_kf(ba._he("oij,oik->ojk", Jcw, Jc)))
            bc_own = rs_rows(seg_kf(ba._he("oij,oi->oj", Jcw, r)))
            lamc_own = lam * jnp.maximum(
                jnp.diagonal(Hcc_own, axis1=1, axis2=2), 1e-6)

            lo = jax.lax.axis_index("ba") * Kb
            free_own = jax.lax.dynamic_slice_in_dim(
                pad_rows(free), lo, Kb)[:, None]

            def Yt_x_full(x_full):
                u = ba._he("oij,oj->oi", Jc, x_full[obs_kf])
                return seg_pt(ba._he("oij,oi->oj", Jpw, u))

            def S_mv(x_own):
                x_own = jnp.where(free_own, x_own, 0.0)
                x_full = ag_rows(x_own)
                u = ba._he("oij,oj->oi", Jc, x_full[obs_kf])
                hcc_x = rs_rows(seg_kf(ba._he("oij,oi->oj", Jcw, u))) \
                    + lamc_own * x_own
                y = ba._he("pij,pj->pi", Hpp_inv, Yt_x_full(x_full))
                v = ba._he("oij,oj->oi", Jp, y[obs_pt])
                yx = rs_rows(seg_kf(ba._he("oij,oi->oj", Jcw, v)))
                return jnp.where(free_own, hcc_x - yx, 0.0)

            # reduced gradient on owned rows
            y0 = ba._he("pij,pj->pi", Hpp_inv, bp)
            v0 = ba._he("oij,oj->oi", Jp, y0[obs_pt])
            g_own = -bc_own + rs_rows(seg_kf(
                ba._he("oij,oi->oj", Jcw, v0)))
            g_own = jnp.where(free_own, g_own, 0.0)

            Mc = Hcc_own + jax.vmap(jnp.diag)(lamc_own) + 1e-8 * jnp.eye(6)
            Mc_inv = jnp.where(free_own[:, :, None], jnp.linalg.inv(Mc),
                               jnp.eye(6)[None])

            def precond(v):
                return ba._he("kij,kj->ki", Mc_inv, v)

            def dot(a, b):
                return jax.lax.psum(jnp.sum(a * b), "ba")

            def pcg_body(i, st):
                x, rr, z, pdir, rz = st
                Ap = S_mv(pdir)
                alpha = rz / (dot(pdir, Ap) + 1e-20)
                x = x + alpha * pdir
                rr = rr - alpha * Ap
                z = precond(rr)
                rz_new = dot(rr, z)
                beta = rz_new / (rz + 1e-20)
                return (x, rr, z, z + beta * pdir, rz_new)

            z0 = precond(g_own)
            dc_own, *_ = jax.lax.fori_loop(
                0, pcg_iters, pcg_body,
                (jnp.zeros_like(g_own), g_own, z0, z0, dot(g_own, z0)))
            dc_own = jnp.where(free_own, dc_own, 0.0)
            dc_full = ag_rows(dc_own)

            dp = ba._he("pij,pj->pi", Hpp_inv,
                        -bp - Yt_x_full(dc_full))

            poses_new = jax.vmap(lambda d, T: geo.exp_se3(d) @ T)(
                dc_full, poses)
            points_new = points + dp
            cost_old = total_cost(poses, points, robust)
            cost_new = total_cost(poses_new, points_new, robust)
            accept = cost_new < cost_old
            poses = jnp.where(accept, poses_new, poses)
            points = jnp.where(accept, points_new, points)
            lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0),
                           1e-8, 1e4)
            return (poses, points, lam), cost_new

        (poses, points, _), _ = jax.lax.scan(
            lm_step, (poses0, pts, jnp.float32(1e-4)), None, length=iters)

        r, _, _, behind = residuals(poses, points)
        chi2 = jnp.sum(r * r, 1) * obs_w
        inlier = obs_valid & ~behind & (chi2 < chi2_th)
        cost = total_cost(poses, points, robust)
        return (geo.project_se3(poses), points[None], inlier[None], cost)

    from coslam_tpu.utils import geometry as geo_check  # noqa: F401
    poses, points_sh, inlier_sh, cost = run(per_dev, prob.poses,
                                            prob.kf_fixed)
    # reassemble replicated outputs in the ORIGINAL observation order
    P_orig = prob.points.shape[0]
    points = points_sh.reshape(-1, 3)[:P_orig]
    O = prob.obs_pt.shape[0]
    gidx = np.asarray(per_dev["obs_global_idx"]).reshape(-1)
    inl_flat = np.asarray(inlier_sh).reshape(-1)
    inlier = np.zeros(O, bool)
    # pad slots all carry obs_global_idx 0 and inlier=False — mask them out
    # so they cannot overwrite observation 0's true flag
    real = np.asarray(per_dev["obs_valid"]).reshape(-1).astype(bool)
    inlier[gidx[real]] = inl_flat[real]
    return ba.BAResult(poses=poses, points=points,
                       obs_inlier=jnp.asarray(inlier), cost=cost)
