"""Scaling benchmark: distributed Schur-LM bundle adjustment over a mesh.

The north-star scaling claim (BASELINE.md: 1 chip / 1 host / N hosts) —
measures wall time of `parallel.sharded_ba.solve_sharded` as the `ba` mesh
axis grows.  On real multi-chip hardware the observation shards ride ICI;
in this environment only one real chip (or a virtual CPU mesh) is
available, so the harness

  * runs the single-device solver and the sharded solver at every device
    count the platform exposes, and
  * verifies the sharded result matches the single-device result (the
    collectives are exercised for real either way).

Per-config it prints one JSON line
    {"devices": D, "t_solve_s": T, "speedup_vs_1": S, "max_pose_diff": E}
Virtual CPU devices share one physical socket, so speedups there validate
the scaling *path*, not the scaling *numbers*; run on a pod for the latter.

Usage:  python bench_scaling.py [--virtual 8] [--obs-per-dev 65536]
"""

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=0,
                   help="force an N-device virtual CPU platform")
    p.add_argument("--n-kf", type=int, default=96)
    p.add_argument("--n-pt", type=int, default=12000)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--pcg-iters", type=int, default=30)
    p.add_argument("--obs-per-kf", type=int, default=0,
                   help="subsample visible observations per keyframe "
                        "(0 = keep all)")
    args = p.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()

    import jax
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from coslam_tpu.optim import ba
    from coslam_tpu.parallel import mesh as mesh_lib
    from coslam_tpu.parallel import sharded_ba
    from coslam_tpu.config import CameraConfig
    from coslam_tpu.utils import geometry as geo

    cam = CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                       width=640, height=480)

    # synthetic BA problem: forward-moving trajectory observing a point
    # cloud; ~n_kf*n_pt/3 observations
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-6, 6, args.n_pt),
                    rng.uniform(-4, 4, args.n_pt),
                    rng.uniform(5, 30, args.n_pt)], 1).astype(np.float32)
    poses = np.stack([
        np.asarray(geo.exp_se3(np.array(
            [0.15 * k, 0.02 * k, 0.0, 0.0, 0.01 * k, 0.0], np.float32)))
        for k in range(args.n_kf)])
    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(args.n_kf):
        pc = pts @ poses[k][:3, :3].T + poses[k][:3, 3]
        uv = np.stack([pc[:, 0] / pc[:, 2] * cam.fx + cam.cx,
                       pc[:, 1] / pc[:, 2] * cam.fy + cam.cy], 1)
        vis = (pc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < cam.width) \
            & (uv[:, 1] > 0) & (uv[:, 1] < cam.height)
        idx = np.nonzero(vis)[0]
        if args.obs_per_kf and idx.size > args.obs_per_kf:
            idx = rng.choice(idx, args.obs_per_kf, replace=False)
        obs_kf.append(np.full(idx.size, k, np.int32))
        obs_pt.append(idx.astype(np.int32))
        obs_uv.append(uv[idx] + rng.normal(0, 0.4, (idx.size, 2)))
    obs_kf = np.concatenate(obs_kf)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)

    poses_init = poses.copy()
    for k in range(2, args.n_kf):
        poses_init[k] = np.asarray(geo.exp_se3(
            rng.normal(0, 0.005, 6).astype(np.float32))) @ poses[k]
    prob = ba.BAProblem(
        poses=poses_init, points=pts + rng.normal(0, 0.03, pts.shape)
        .astype(np.float32),
        obs_kf=obs_kf, obs_pt=obs_pt, obs_uv=obs_uv,
        obs_w=np.ones(obs_kf.size, np.float32),
        obs_valid=np.ones(obs_kf.size, bool),
        kf_fixed=np.arange(args.n_kf) < 2)
    prob = jax.tree.map(jax.numpy.asarray, prob)
    print(f"# problem: {args.n_kf} keyframes, {args.n_pt} points, "
          f"{obs_kf.size} observations, platform={jax.default_backend()}, "
          f"{jax.device_count()} device(s)")

    def timed(fn, *a, reps=3):
        out = fn(*a)
        # fetch-forced sync: block_until_ready does NOT synchronize on
        # remote ("axon") backends — a scalar device_get does
        jax.device_get(out.cost)        # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.device_get(out.cost)
        return (time.perf_counter() - t0) / reps, out

    def hlo_collective_census(lowered):
        """Count collective call sites + operand bytes in compiled HLO —
        the 'measured' cross-check of the analytic collective model (each
        site executes once per enclosing loop iteration)."""
        import re
        try:
            txt = lowered.compile().as_text()
        except Exception:
            return None
        census = {}
        for m in re.finditer(
                r"(f32|bf16|s32|u32|pred)\[([\d,]*)\][^\n=]*= "
                r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
                r"collective-permute)\(", txt):
            dt, shape, op = m.group(1), m.group(2), m.group(3)
            n = 1
            for d_ in shape.split(","):
                if d_:
                    n *= int(d_)
            width = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "pred": 1}[dt]
            census.setdefault(op, [0, 0])
            census[op][0] += 1
            census[op][1] += n * width
        return {k: {"sites": v[0], "bytes_per_pass": v[1]}
                for k, v in census.items()}

    t1, ref = timed(lambda: ba.solve(cam, prob, iters=args.iters,
                                     pcg_iters=args.pcg_iters))
    print(json.dumps({"devices": 1, "t_solve_s": round(t1, 4),
                      "speedup_vs_1": 1.0, "max_pose_diff": 0.0}))

    d = 2
    while d <= jax.device_count():
        mesh = mesh_lib.make_mesh(n_agents=1, ba_shards=d)
        td, res = timed(lambda m=mesh: sharded_ba.solve_sharded(
            cam, prob, m, iters=args.iters, pcg_iters=args.pcg_iters))
        diff = float(np.abs(np.asarray(res.poses)
                            - np.asarray(ref.poses)).max())
        print(json.dumps({"devices": d, "mode": "obs-sharded",
                          "t_solve_s": round(td, 4),
                          "speedup_vs_1": round(t1 / td, 3),
                          "max_pose_diff": round(diff, 6)}))
        # fully partitioned solver: point blocks + reduced-camera block-rows
        # distributed; report the analytic per-device ICI traffic
        from jax.sharding import Mesh
        flat = Mesh(np.asarray(jax.devices()[:d]), ("ba",))
        tp, resp = timed(lambda m=flat: sharded_ba.solve_partitioned(
            cam, prob, m, iters=args.iters, pcg_iters=args.pcg_iters))
        diffp = float(np.abs(np.asarray(resp.poses)
                             - np.asarray(ref.poses)).max())
        census = None
        try:
            census = hlo_collective_census(
                jax.jit(lambda p: sharded_ba.solve_partitioned(
                    cam, p, flat, iters=args.iters,
                    pcg_iters=args.pcg_iters)).lower(prob))
        except Exception:
            pass
        print(json.dumps({
            "devices": d, "mode": "partitioned",
            "t_solve_s": round(tp, 4),
            "t_per_LM_iter_ms": round(tp / args.iters * 1e3, 2),
            "speedup_vs_1": round(t1 / tp, 3),
            "max_pose_diff": round(diffp, 6),
            "modeled_collective_bytes_per_LM_iter_per_dev":
                sharded_ba.collective_bytes_per_iter(
                    args.n_kf, d, args.pcg_iters),
            "hlo_collective_census": census,
            "hbm_points_frac_per_dev": round(1.0 / d, 3)}))
        d *= 2


if __name__ == "__main__":
    main()
