"""Benchmark: tracked frames/sec/chip — full System AND hot-path kernel.

Two measurements (BASELINE.md: the reference ORB-SLAM2-class tracker is
real-time at ~30 fps at 640x480/1000 features *with* its backend running):

  * full_system — `System.track_mono` over a rendered synthetic sequence,
    including initialization, keyframe insertion, triangulation, windowed
    local BA, culling and place recognition — i.e. everything the backend
    costs, amortized over tracked frames.  This is the honest comparison
    against the reference's 30 fps and is the headline `value`.  The
    workload matches the reference's: 640x480 frames, 1000 features
    (ORB_SLAM2/my.yaml:29), full backend per keyframe.
  * hot_path — the per-frame tracking step (ORB extraction + previous-frame
    matching + motion-only BA) driven through `lax.scan` so a whole batch of
    frames runs in ONE device dispatch: a device-bound throughput number
    insensitive to host scheduling noise (the round-1 43k-vs-20k fps
    discrepancy was dispatch/host-contention sensitivity of a 100-dispatch
    Python loop on a 2-core host).

MFU: XLA's own cost model (`compiled.cost_analysis()['flops']`) gives
FLOPs/frame for the hot path; mfu = flops * fps / chip peak.  Reported
against the f32 peak of the attached chip (this pipeline is f32-dominant;
Hamming/popcount integer work counts as zero FLOPs, so this is a lower
bound).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np

PEAK_F32 = {  # FLOP/s per chip, XLA-visible f32 (MXU) peak
    "TPU v5 lite": 98e12,   # v5e: 197 bf16 TFLOPs -> ~98 f32
    "TPU v5": 229e12,       # v5p: 459 bf16 -> ~229 f32
    "TPU v4": 137.5e12,
    "TPU v6 lite": 229e12,  # v6e (Trillium): 918 bf16 -> ~229 f32 (4x int8)
}


def bench_hot_path():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import entry
    from coslam_tpu.config import CameraConfig, SystemConfig
    from coslam_tpu.models.frame import build_frame
    from coslam_tpu.ops import matching
    from coslam_tpu.utils import synthetic

    fn, example_args = entry()

    cam = CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    scene = synthetic.make_scene(800, seed=0)
    traj = synthetic.make_trajectory(8, seed=0)
    frames = synthetic.render_sequence(cam, traj, scene)
    B = 64  # frames per dispatch
    imgs = jnp.asarray(np.stack([frames[i % len(frames)] for i in range(B)]))
    args = [jnp.asarray(a) for a in example_args[1:]]

    def scan_step(carry, img):
        T, n, desc = fn(img, *args)
        return carry, n

    batched = jax.jit(lambda ims: jax.lax.scan(scan_step, 0, ims)[1])
    out = jax.block_until_ready(batched(imgs))  # compile + warm

    # FLOPs per frame from XLA's cost model (single-frame program)
    flops_per_frame = None
    try:
        ca = jax.jit(fn).lower(example_args[0], *args).compile() \
            .cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_frame = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    def timeit(g, *a):
        jax.block_until_ready(g(*a))
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(g(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    best = timeit(batched, imgs)
    fps = B / best

    # per-stage attribution (nested prefixes of the same pipeline, each a
    # scan over the B-frame batch): extraction alone, then + windowed
    # matching, then the full step (+ motion-only BA).  The differences
    # give the marginal cost of each stage.  MFU context: the extractor and
    # Hamming matcher are integer/VPU work that XLA's flop counter scores
    # as ~zero, so hot-path "MFU" against the f32 MXU peak is a lower bound
    # dominated by the pose optimizer's small dense algebra — the honest
    # roofline for this pipeline is HBM/VPU-bound, not MXU-bound.
    cfg_e = SystemConfig(camera=cam)
    prev_desc, prev_uv, prev_valid = args[1], args[0], args[2]

    def ex_step(c, img):
        f = build_frame(img, cfg_e)
        return c, f.valid.sum()

    def em_step(c, img):
        f = build_frame(img, cfg_e)
        mm = matching.match_windowed(
            prev_desc, prev_uv, 20.0, prev_valid, f.desc, f.uv, f.valid,
            cfg_e.matcher, max_dist=cfg_e.matcher.th_high, mutual=True)
        return c, mm.valid.sum()

    t_ex = timeit(jax.jit(
        lambda ims: jax.lax.scan(ex_step, 0, ims)[1]), imgs)
    t_em = timeit(jax.jit(
        lambda ims: jax.lax.scan(em_step, 0, ims)[1]), imgs)
    stages = {
        "extract_ms": round(t_ex / B * 1e3, 3),
        "match_ms": round(max(t_em - t_ex, 0.0) / B * 1e3, 3),
        "pose_opt_ms": round(max(best - t_em, 0.0) / B * 1e3, 3),
    }
    return fps, flops_per_frame, stages


def bench_full_system(n_frames: int = 120):
    """Full System over a rendered sequence via the chunked steady-state
    driver (System.run_sequence): extraction + tracking + keyframe gate on
    device in C-frame dispatches, the keyframe backend dispatched async and
    overlapped with the next chunk's tracking (the reference's
    tracker/mapper thread decoupling).  The workload matches the
    reference's: 640x480, 1000 features (my.yaml:29), 30 fps-class
    inter-frame motion (n_frames spread over the same arc the
    reference-class camera would cover in n_frames/30 s)."""
    import jax
    from coslam_tpu import config as cfg_mod
    from coslam_tpu.models.system import System
    from coslam_tpu.utils import synthetic, warmup

    cfg = cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(fx=400, fy=400, cx=320, cy=240,
                                    width=640, height=480),
        extractor=cfg_mod.ExtractorConfig(n_features=1000,
                                          max_keypoints=1024),
        # real-camera keyframe cadence: the reference's mono tracker only
        # inserts when its mapper is idle (Tracking.cc:1041-1059); -1 =
        # AUTO derives the busy window from the MEASURED backend_insert
        # cost at 30 fps (System._mapper_latency)
        tracker=cfg_mod.TrackerConfig(mapper_latency_frames=-1),
        mapper=cfg_mod.MapperConfig(max_keyframes=64, max_points=16384))
    scene = synthetic.make_scene(600, seed=3)
    # 30 fps-class inter-frame motion: make_trajectory spreads a fixed
    # ~1.2 rad sweep over its frame count, so rendering n_frames of a
    # 3*n_frames-step trajectory gives the angular rate of a real handheld
    # 30 fps camera (~6 deg/s) — benchmarking a 3-5x-speed camera would
    # overstate the keyframe (backend) rate the reference's 30 fps baseline
    # carries
    traj = synthetic.make_trajectory(3 * n_frames, seed=3)
    seq = synthetic.render_sequence(
        cfg.camera, synthetic.Trajectory(traj.poses_cw[:n_frames]), scene)
    seq = [jax.device_put(f) for f in seq]
    warmup.warmup(cfg)

    def run():
        slam = System(cfg)
        t0 = time.perf_counter()
        slam.run_sequence(seq)
        jax.block_until_ready(slam.map.kf_pose)
        return n_frames / (time.perf_counter() - t0), slam

    run()            # pass 1: compile anything left (persistent-cache warm)
    fps, slam = run()  # pass 2: steady-state, fresh System
    n_kf = int(np.asarray(slam.map.kf_valid).sum())
    lost = sum(1 for s in slam.stats if s.get("lost"))
    discard = round(slam.n_frames_discarded
                    / max(slam.n_frames_chunked, 1), 4)
    return fps, n_kf, lost, discard


def main():
    hot_fps, flops_per_frame, stages = bench_hot_path()
    sys_fps, n_kf, lost, discard = bench_full_system()

    import jax
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_F32.items() if kind.startswith(k)), None)
    mfu = (flops_per_frame * hot_fps / peak * 100.0
           if (flops_per_frame and peak) else None)

    print(json.dumps({
        "metric": "full_system_tracked_frames_per_sec_per_chip",
        "value": round(sys_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(sys_fps / 30.0, 3),
        "hot_path_fps": round(hot_fps, 1),
        "hot_path_vs_baseline": round(hot_fps / 30.0, 1),
        "hot_path_mfu_pct": round(mfu, 3) if mfu is not None else None,
        "hot_path_gflops_per_frame": (round(flops_per_frame / 1e9, 3)
                                      if flops_per_frame else None),
        "hot_path_stage_ms": stages,
        "keyframes_in_run": n_kf,
        "lost_frames": lost,
        "chunk_discard_rate": discard,
        "device": kind,
    }))


if __name__ == "__main__":
    main()
