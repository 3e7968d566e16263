"""Command-line driver — the analogue of the reference's ROS nodes
(Examples/ROS/ORB_SLAM2/src/ros_{mono,stereo,rgbd}.cc main()).

    python -m coslam_tpu.cli mono  --dataset tum  --root <dir> --out traj.txt
    python -m coslam_tpu.cli rgbd  --dataset tum  --root <dir>
    python -m coslam_tpu.cli stereo --dataset kitti --root <dir> --seq 00
    python -m coslam_tpu.cli synthetic --frames 60

Runs the pipeline over the dataset, reports per-stage timing and (when
ground truth exists) ATE RMSE, and exports the trajectory in TUM or KITTI
format (reference System::SaveTrajectoryTUM/KITTI, System.cc:325/422).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from coslam_tpu import config as cfg_mod
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, io as cio, profiling, synthetic


def _run(slam: System, frames, mode: str, depth_factor: float,
         timer: profiling.StageTimer, limit: int, viewer=None):
    timestamps = []
    for i, fr in enumerate(frames[:limit] if limit else frames):
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
        timestamps.append(fr.timestamp)
    return timestamps


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["mono", "rgbd", "stereo", "synthetic"])
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
    args = p.parse_args(argv)

    timer = profiling.StageTimer()
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
        slam = System(cfg)
        for i, img in enumerate(seq_imgs):
            with timer("track"):
                slam.track_mono(img, i)
            if viewer is not None and slam.state != "NOT_INITIALIZED":
                viewer.update(slam, img, slam.last_frame, i)
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
    cfg = cfg.replace(sensor=args.mode)

    slam = System(cfg)
    timestamps = _run(slam, seq.frames, args.mode, seq.depth_factor, timer,
                      args.limit, viewer)
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
