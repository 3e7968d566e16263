"""Command-line driver — the analogue of the reference's ROS nodes
(Examples/ROS/ORB_SLAM2/src/ros_{mono,stereo,rgbd}.cc main()).

    python -m coslam_tpu.cli mono  --dataset tum  --root <dir> --out traj.txt
    python -m coslam_tpu.cli rgbd  --dataset tum  --root <dir>
    python -m coslam_tpu.cli stereo --dataset kitti --root <dir> --seq 00
    python -m coslam_tpu.cli synthetic --frames 60
    python -m coslam_tpu.cli coop --frames 90 --transport memory

Runs the pipeline over the dataset, reports per-stage timing and (when
ground truth exists) ATE RMSE, and exports the trajectory in TUM or KITTI
format (reference System::SaveTrajectoryTUM/KITTI, System.cc:325/422).

`coop` is the analogue of the reference's sender/receiver node pair
(ORB_SLAM2.1 "Mono2" publishing keyframe batches over LCM UDP multicast,
ORB_SLAM2 "Mono" reconstructing them into its own map — SURVEY.md sections
0, 2.2, 3.4-3.5): two agents track overlapping arcs of a shared scene, the
sender periodically publishes keyframe packets over a pluggable bus
(in-memory, or the native C++ UDP-multicast bus replacing LCM), and the
receiver wire-reconstructs them, place-recognizes the overlap, aligns via
Sim3, and fuses the foreign sub-map.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from coslam_tpu import config as cfg_mod
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, io as cio, profiling, synthetic


class _LazyImages:
    """List-like lazy loader so the chunked driver can consume dataset
    frames without materializing the whole sequence in RAM."""

    def __init__(self, paths, loader):
        self.paths = paths
        self.loader = loader
        self._cache = (None, None)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        if self._cache[0] != i:
            self._cache = (i, self.loader(self.paths[i]))
        return self._cache[1]


def _run(slam: System, frames, mode: str, depth_factor: float,
         timer: profiling.StageTimer, limit: int, viewer=None,
         per_frame: bool = False):
    frames = frames[:limit] if limit else frames
    timestamps = [fr.timestamp for fr in frames]

    if viewer is not None or per_frame:
        # per-frame path (viewer needs every frame's state)
        for i, fr in enumerate(frames):
            img = cio.load_image(fr.rgb_path)
            with timer("track"):
                if mode == "mono":
                    slam.track_mono(img, i, timestamp=fr.timestamp)
                elif mode == "rgbd":
                    depth = cio.load_depth(fr.depth_path, depth_factor)
                    slam.track_rgbd(img, depth, i, timestamp=fr.timestamp)
                else:
                    right = cio.load_image(fr.right_path)
                    slam.track_stereo(img, right, i, timestamp=fr.timestamp)
            if viewer is not None and slam.state != "NOT_INITIALIZED":
                viewer.update(slam, img, slam.last_frame, i)
        return timestamps

    imgs = _LazyImages([fr.rgb_path for fr in frames], cio.load_image)
    depths = None
    rights = None
    if mode == "rgbd":
        depths = _LazyImages([fr.depth_path for fr in frames],
                             lambda p: cio.load_depth(p, depth_factor))
    elif mode == "stereo":
        rights = _LazyImages([fr.right_path for fr in frames],
                             cio.load_image)
    with timer("track"):
        slam.run_sequence(imgs, timestamps=timestamps, depths=depths,
                          right_images=rights)
    return timestamps


def _coop_setup(frames: int, seed: int):
    """Shared scene/trajectory/config for the cooperating agents — both
    processes of a two-process run derive identical inputs from the seed
    (the synthetic stand-in for the reference's two live camera topics)."""
    cfg = cfg_mod.SystemConfig(
        camera=cfg_mod.CameraConfig(fx=300, fy=300, cx=160, cy=120,
                                    width=320, height=240),
        extractor=cfg_mod.ExtractorConfig(n_features=400, max_keypoints=512),
        mapper=cfg_mod.MapperConfig(max_keyframes=128, max_points=32768),
        # merge verification at genuine-overlap strength: true cross-agent
        # pairs carry 80+ matched landmarks, while descriptor aliasing on
        # repetitive texture can scrape past ~12-15 — loose gates let a
        # spurious Sim3 commit BEFORE the arcs actually overlap, and no
        # near-identity realign can repair a wrong base alignment
        loop=cfg_mod.LoopConfig(min_kfs_between_loops=15,
                                sim3_min_bow_matches=25, sim3_min_inliers=20),
        tracker=cfg_mod.TrackerConfig(init_min_matches=60, init_min_good=35))
    scene = synthetic.make_cylinder_scene(700, seed=seed)
    traj = synthetic.make_loop_trajectory(frames, seed=seed, frac=0.72)
    seq = synthetic.render_sequence(cfg.camera, traj, scene)
    # overlapping arcs: receiver covers the first half, sender the last
    # ~2/3 — a solid overlap band for place recognition, like the
    # strongly-overlapping camera pairs of the reference's demos
    split0 = max(int(frames * 0.50), 12)
    start1 = max(int(frames * 0.33), 8)
    return cfg, traj, seq, split0, start1


def _coop_report(a0, traj, timer):
    from coslam_tpu.models import map_state as ms

    m = a0.map
    K = int(m.n_kf)
    valid = np.asarray(m.kf_valid[:K])
    fid = np.asarray(m.kf_frame_id[:K])
    agent = np.asarray(a0.kf_agent[:K])
    centers = np.asarray(ms.kf_centers(m))[:K]
    gt = evaluation.trajectory_xyz(traj.poses_cw[fid])
    res = {
        "merges": a0.n_merges,
        "kf_own": int((valid & (agent == a0.agent_id)).sum()),
        "kf_foreign": int((valid & (agent != a0.agent_id)
                           & (agent >= 0)).sum()),
        "map_points": int(np.asarray(m.pt_valid).sum()),
    }
    if valid.sum() > 3:
        res["ate_joint_m"] = float(
            evaluation.ate_rmse(centers[valid], gt[valid]))
    print(timer.report())
    print(f"agent{a0.agent_id}: merges={res['merges']}  "
          f"own KFs={res['kf_own']}  foreign KFs={res['kf_foreign']}  "
          f"map points={res['map_points']}")
    if "ate_joint_m" in res:
        print(f"joint map ATE RMSE: {res['ate_joint_m'] * 100:.2f} cm")
    return res


def run_coop_role(role: str, frames: int = 90, publish_every: int = 8,
                  max_batch: int = 10, seed: int = 5, linger: float = 60.0,
                  timer: profiling.StageTimer = None) -> dict:
    """One HALF of the cooperative pair, communicating over the native UDP
    multicast bus — run `coop --role sender` and `coop --role receiver` as
    two separate processes, exactly like the reference's Mono2/Mono node
    pair (ORB_SLAM2.1 publishing, ORB_SLAM2 integrating).

    The receiver keeps polling the bus for up to `linger` seconds after its
    own arc ends, to integrate keyframes the (slower-starting) sender
    publishes late — the analogue of the receiver's blocking lcm.handle()
    loop (reference ros_mono.cc:607-609).
    """
    import time

    from coslam_tpu.models.cooperative import CoopAgent, UdpBus

    timer = timer or profiling.StageTimer()
    cfg, traj, seq, split0, start1 = _coop_setup(frames, seed)
    bus = UdpBus()
    try:
        if role == "sender":
            a1 = CoopAgent(cfg, 1, enable_loop_closing=False)
            for i, f in enumerate(range(start1, frames)):
                with timer("track"):
                    a1.track_mono(seq[f], f)
                if i and i % publish_every == 0:
                    with timer("publish"):
                        bus.publish(1, a1.drain_packets(max_batch=max_batch))
            bus.publish(1, a1.drain_packets(max_batch=1000))
            print(timer.report())
            res = {"kf_published": a1._published_kfs,
                   "state": a1.state}
            print(f"sender: published {res['kf_published']} keyframes "
                  f"(state {res['state']})")
            return res

        assert role == "receiver", role
        a0 = CoopAgent(cfg, 0, enable_loop_closing=False)
        # packets that arrive before the local map is initialized are
        # buffered, not dropped (the reference's Map_KFV staging map,
        # ros_mono.cc:178,540)
        pending = []

        def drain_into(timeout_ms=50):
            pending.extend(bus.drain(0, timeout_ms=timeout_ms))
            n = 0
            if a0.state == "OK":
                while pending:
                    with timer("integrate"):
                        a0.receive_packet(pending.pop(0))
                    n += 1
            return n

        for f in range(split0):
            with timer("track"):
                a0.track_mono(seq[f], f)
            drain_into()
        # linger: the sender may still be tracking/publishing
        deadline = time.monotonic() + linger
        idle_since = None
        while time.monotonic() < deadline:
            got = drain_into(timeout_ms=300)
            now = time.monotonic()
            if got:
                idle_since = None
            else:
                idle_since = idle_since or now
                if a0.n_merges and now - idle_since > 5.0:
                    break  # merged and the bus has gone quiet
        return _coop_report(a0, traj, timer)
    finally:
        bus.close()


def run_coop(frames: int = 90, transport: str = "memory",
             publish_every: int = 8, max_batch: int = 10,
             bidirectional: bool = False, seed: int = 5,
             timer: profiling.StageTimer = None) -> dict:
    """Two cooperating agents on overlapping arcs of one scene, in-process.

    Agent 1 plays the reference's sender (ORB_SLAM2.1: batches of <= 10
    keyframes published periodically, ros_mono.cc:1915-2399); agent 0 the
    receiver (ORB_SLAM2: wire reconstruction + backend integration,
    ros_mono.cc:2108-2192).  Returns a result dict (also printed).
    """
    from coslam_tpu.models.cooperative import CoopAgent, InMemoryBus, UdpBus

    timer = timer or profiling.StageTimer()
    cfg, traj, seq, split0, start1 = _coop_setup(frames, seed)
    a0 = CoopAgent(cfg, 0, enable_loop_closing=False)   # receiver
    a1 = CoopAgent(cfg, 1, enable_loop_closing=False)   # sender
    bus = UdpBus() if transport == "udp" else InMemoryBus()
    drain_kw = {"timeout_ms": 50} if transport == "udp" else {}

    # packets arriving before a receiver's map initializes are buffered,
    # not dropped (the reference's Map_KFV staging map, ros_mono.cc:178,540)
    pending = {0: [], 1: []}

    def pump():
        with timer("exchange"):
            bus.publish(1, a1.drain_packets(max_batch=max_batch),
                        subscribers=[0, 1])
            if bidirectional:
                bus.publish(0, a0.drain_packets(max_batch=max_batch),
                            subscribers=[0, 1])
                pending[1].extend(bus.drain(1, **drain_kw))
                if a1.state == "OK":
                    while pending[1]:
                        a1.receive_packet(pending[1].pop(0))
            pending[0].extend(bus.drain(0, **drain_kw))
            if a0.state == "OK":
                while pending[0]:
                    a0.receive_packet(pending[0].pop(0))

    for i in range(max(split0, frames - start1)):
        f0, f1 = i, start1 + i
        if f0 < split0:
            with timer("track.agent0"):
                a0.track_mono(seq[f0], f0)
        if f1 < frames:
            with timer("track.agent1"):
                a1.track_mono(seq[f1], f1)
        if i and i % publish_every == 0:
            pump()
    pump()
    pump()  # second round: packets published before the receiver was ready

    res = _coop_report(a0, traj, timer)
    if transport == "udp":
        bus.close()
    return res


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode",
                   choices=["mono", "rgbd", "stereo", "synthetic", "coop"])
    p.add_argument("--dataset", choices=["tum", "kitti", "euroc"],
                   default="tum")
    p.add_argument("--root", help="dataset root directory")
    p.add_argument("--seq", default="00", help="KITTI sequence")
    p.add_argument("--out", default=None, help="trajectory output path")
    p.add_argument("--format", choices=["tum", "kitti"], default="tum")
    p.add_argument("--limit", type=int, default=0, help="max frames")
    p.add_argument("--frames", type=int, default=60,
                   help="synthetic sequence length")
    p.add_argument("--viz", default=None, metavar="DIR",
                   help="write frame/map renderings to DIR (the headless "
                        "analogue of the reference's Pangolin viewer)")
    p.add_argument("--viz-every", type=int, default=10)
    p.add_argument("--transport", choices=["memory", "udp"], default="memory",
                   help="coop mode: in-memory bus or native UDP multicast "
                        "(the LCM replacement)")
    p.add_argument("--publish-every", type=int, default=8,
                   help="coop mode: frames between keyframe-batch publishes "
                        "(reference cadence: every 500 viewer ticks)")
    p.add_argument("--bidirectional", action="store_true",
                   help="coop mode: both agents publish AND receive")
    p.add_argument("--role", choices=["both", "sender", "receiver"],
                   default="both",
                   help="coop mode: run both agents in-process, or one half "
                        "of a two-PROCESS pair over UDP multicast (start a "
                        "sender and a receiver process, like the reference's "
                        "Mono2/Mono nodes)")
    p.add_argument("--linger", type=float, default=60.0,
                   help="coop receiver: seconds to keep polling the bus "
                        "after its own arc ends")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture an XLA profiler trace of the run to DIR "
                        "(TensorBoard format; utils/profiling.trace)")
    p.add_argument("--per-frame", action="store_true",
                   help="drive tracking one frame per dispatch instead of "
                        "the chunked steady-state driver (System."
                        "run_sequence)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the parallel ahead-of-time compilation of the "
                        "pipeline stages (utils/warmup.py)")
    args = p.parse_args(argv)

    import contextlib
    with contextlib.ExitStack() as stack:
        if args.profile:
            stack.enter_context(profiling.trace(args.profile))
        return _dispatch(args, p)


def _warmup(cfg, args, timer):
    """Parallel AOT compile of the pipeline stages (sum-of-compiles ->
    max-of-compiles on cold caches; a no-op when the persistent compilation
    cache is warm)."""
    if getattr(args, "no_warmup", False):
        return
    from coslam_tpu.utils import warmup as warmup_mod

    with timer("warmup"):
        h = warmup_mod.warmup(cfg, blocking=True, verbose=True)
    for e in h.errors:
        print(f"warmup error (stage will compile lazily): {e}")


def _dispatch(args, p):
    timer = profiling.StageTimer()
    if args.mode == "coop":
        if args.role != "both":
            run_coop_role(args.role, frames=args.frames,
                          publish_every=args.publish_every,
                          linger=args.linger, timer=timer)
        else:
            run_coop(frames=args.frames, transport=args.transport,
                     publish_every=args.publish_every,
                     bidirectional=args.bidirectional, timer=timer)
        return 0

    viewer = None
    if args.viz:
        from coslam_tpu.viz import Viewer
        viewer = Viewer(args.viz, every=args.viz_every)

    if args.mode == "synthetic":
        cfg = cfg_mod.SystemConfig(
            camera=cfg_mod.CameraConfig(fx=400, fy=400, cx=320, cy=240,
                                        width=640, height=480),
            extractor=cfg_mod.ExtractorConfig(n_features=500,
                                              max_keypoints=512),
            mapper=cfg_mod.MapperConfig(max_keyframes=64, max_points=8192))
        scene = synthetic.make_scene(600, seed=3)
        traj = synthetic.make_trajectory(args.frames, seed=3)
        seq_imgs = synthetic.render_sequence(cfg.camera, traj, scene)
        _warmup(cfg, args, timer)
        slam = System(cfg)
        if viewer is not None or args.per_frame:
            for i, img in enumerate(seq_imgs):
                with timer("track"):
                    slam.track_mono(img, i)
                if viewer is not None and slam.state != "NOT_INITIALIZED":
                    viewer.update(slam, img, slam.last_frame, i)
        else:
            with timer("track"):
                slam.run_sequence(list(seq_imgs))
        ids, poses = slam.trajectory_poses()
        ate = evaluation.ate_rmse(
            evaluation.trajectory_xyz(poses),
            evaluation.trajectory_xyz(traj.poses_cw[ids]))
        print(timer.report())
        print(f"frames tracked: {len(ids)}  keyframes: {int(slam.map.n_kf)}"
              f"  map points: {int(slam.map.pt_valid.sum())}")
        print(f"ATE RMSE: {ate * 100:.2f} cm")
        if args.out:
            cio.save_trajectory_tum(args.out, list(range(len(ids))), poses)
        return 0

    if not args.root:
        p.error("--root required for dataset modes")
    if args.dataset == "tum":
        seq = cio.load_tum_rgbd(args.root)
        cfg = cfg_mod.tum_fr1_config()
    elif args.dataset == "kitti":
        seq = cio.load_kitti(args.root, args.seq)
        cfg = cfg_mod.kitti_config()
    else:
        seq = cio.load_euroc(args.root)
        cfg = cfg_mod.euroc_config()
    if getattr(seq, "camera", None) is not None:
        cfg = cfg.replace(camera=seq.camera)  # dataset-provided calibration
    cfg = cfg.replace(sensor=args.mode)

    _warmup(cfg, args, timer)
    slam = System(cfg)
    timestamps = _run(slam, seq.frames, args.mode, seq.depth_factor, timer,
                      args.limit, viewer, per_frame=args.per_frame)
    ids, poses = slam.trajectory_poses()
    print(timer.report())
    print(f"frames tracked: {len(ids)} / {len(timestamps)}"
          f"  keyframes: {int(slam.map.n_kf)}"
          f"  map points: {int(slam.map.pt_valid.sum())}")

    if seq.gt_poses_wc is not None and len(ids) > 10:
        ts = np.asarray([timestamps[i] for i in ids])
        gt_idx = np.argmin(np.abs(seq.gt_timestamps[None, :]
                                  - ts[:, None]), axis=1)
        gt_wc = seq.gt_poses_wc[gt_idx]
        est = evaluation.trajectory_xyz(poses)
        ate = evaluation.ate_rmse(est, gt_wc[:, :3, 3],
                                  with_scale=(args.mode == "mono"))
        print(f"ATE RMSE: {ate * 100:.2f} cm")

    if args.out:
        ts = [timestamps[i] for i in ids]
        if args.format == "tum":
            cio.save_trajectory_tum(args.out, ts, poses)
        else:
            cio.save_trajectory_kitti(args.out, poses)
        print(f"trajectory written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
