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
from jax.sharding import Mesh, PartitionSpec as P

from coslam_tpu.config import CameraConfig
from coslam_tpu.optim import ba
from coslam_tpu.parallel import mesh as mesh_lib


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
