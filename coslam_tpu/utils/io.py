"""Dataset readers (TUM RGB-D, EuRoC, KITTI odometry) and trajectory export.

Replaces the reference's ROS-topic input (ros_mono.cc:27, /cam2/image_raw)
with offline dataset drivers, and mirrors its trajectory writers:
System::SaveTrajectoryTUM (ORB_SLAM2/src/System.cc:325),
SaveKeyFrameTrajectoryTUM (:386), SaveTrajectoryKITTI (:422).

Host-side only (file IO + PIL); no TPU dependency.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from coslam_tpu.utils import geometry as geo


@dataclass
class SequenceFrame:
    timestamp: float
    rgb_path: str
    depth_path: Optional[str] = None
    right_path: Optional[str] = None


@dataclass
class Sequence:
    frames: List[SequenceFrame]
    gt_timestamps: Optional[np.ndarray] = None
    gt_poses_wc: Optional[np.ndarray] = None  # (F, 4, 4) camera-to-world
    depth_factor: float = 1.0
    # calibration read from the dataset itself (EuRoC sensor.yaml); None
    # means "use the preset config" (the reference reads calibration from
    # its settings YAML the same way, Tracking.cc:60-104)
    camera: Optional["object"] = None


def load_image(path: str) -> np.ndarray:
    """Grayscale uint8 image."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"))


def load_depth(path: str, factor: float) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32) / factor


# ---------------------------------------------------------------------------
# TUM RGB-D
# ---------------------------------------------------------------------------

def _read_tum_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def load_tum_rgbd(root: str, max_dt: float = 0.02) -> Sequence:
    """TUM RGB-D layout: rgb.txt, depth.txt, groundtruth.txt.  RGB/depth
    associated by nearest timestamp (the standard associate.py policy)."""
    rgb = _read_tum_list(os.path.join(root, "rgb.txt"))
    depth_file = os.path.join(root, "depth.txt")
    depth = _read_tum_list(depth_file) if os.path.exists(depth_file) else []
    frames = []
    d_ts = np.array([t for t, _ in depth]) if depth else None
    for t, rel in rgb:
        dp = None
        if d_ts is not None and len(d_ts):
            j = int(np.argmin(np.abs(d_ts - t)))
            if abs(d_ts[j] - t) <= max_dt:
                dp = os.path.join(root, depth[j][1])
        frames.append(SequenceFrame(t, os.path.join(root, rel), dp))

    gt_path = os.path.join(root, "groundtruth.txt")
    gt_ts, gt_poses = None, None
    if os.path.exists(gt_path):
        rows = []
        with open(gt_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rows.append([float(x) for x in line.split()])
        arr = np.asarray(rows)
        gt_ts = arr[:, 0]
        import jax.numpy as jnp
        # TUM: tx ty tz qx qy qz qw (camera-to-world)
        q_wxyz = np.concatenate([arr[:, 7:8], arr[:, 4:7]], 1)
        R = np.asarray(geo.quat_to_rot(jnp.asarray(q_wxyz, jnp.float32)))
        gt_poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
        gt_poses[:, :3, :3] = R
        gt_poses[:, :3, 3] = arr[:, 1:4]
    return Sequence(frames=frames, gt_timestamps=gt_ts, gt_poses_wc=gt_poses,
                    depth_factor=5000.0)


# ---------------------------------------------------------------------------
# KITTI odometry
# ---------------------------------------------------------------------------

def load_kitti(root: str, sequence: str = "00") -> Sequence:
    """KITTI odometry layout: sequences/<seq>/image_0, image_1, times.txt;
    poses/<seq>.txt (3x4 camera-to-world rows)."""
    seq_dir = os.path.join(root, "sequences", sequence)
    left_dir = os.path.join(seq_dir, "image_0")
    right_dir = os.path.join(seq_dir, "image_1")
    times = [float(x) for x in open(os.path.join(seq_dir, "times.txt"))]
    names = sorted(os.listdir(left_dir))
    frames = [SequenceFrame(
        t, os.path.join(left_dir, n),
        right_path=os.path.join(right_dir, n)
        if os.path.isdir(right_dir) else None)
        for t, n in zip(times, names)]
    gt_ts, gt_poses = None, None
    pose_file = os.path.join(root, "poses", sequence + ".txt")
    if os.path.exists(pose_file):
        rows = np.loadtxt(pose_file).reshape(-1, 3, 4)
        gt_poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
        gt_poses[:, :3, :] = rows
        gt_ts = np.asarray(times[: len(rows)])
    return Sequence(frames=frames, gt_timestamps=gt_ts, gt_poses_wc=gt_poses)


# ---------------------------------------------------------------------------
# EuRoC MAV
# ---------------------------------------------------------------------------

def _parse_euroc_sensor_yaml(path: str):
    """Parse the flat fields of EuRoC's mav0/cam0/sensor.yaml (intrinsics
    [fu fv cu cv], distortion_coefficients [k1 k2 p1 p2], resolution) into
    a CameraConfig.  Hand-rolled: the file is simple flow-style YAML and
    this avoids a parser dependency."""
    import re

    from coslam_tpu.config import CameraConfig

    txt = open(path).read()

    def vec(name):
        mm = re.search(name + r":\s*\[([^\]]*)\]", txt)
        return [float(x) for x in mm.group(1).split(",")] if mm else None

    intr = vec("intrinsics")
    dist = vec("distortion_coefficients")
    resol = vec("resolution")
    rate = re.search(r"rate_hz:\s*([0-9.]+)", txt)
    if not intr or not resol:
        return None
    k1, k2, p1, p2 = (dist + [0.0] * 4)[:4] if dist else (0.0,) * 4
    return CameraConfig(
        fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3],
        k1=k1, k2=k2, p1=p1, p2=p2,
        width=int(resol[0]), height=int(resol[1]),
        fps=float(rate.group(1)) if rate else 20.0)


def load_euroc(root: str) -> Sequence:
    """EuRoC layout: mav0/cam0/data/<ns>.png + data.csv;
    mav0/state_groundtruth_estimate0/data.csv.  Calibration is read from
    mav0/cam0/sensor.yaml when present (the dataset's own convention)."""
    cam_dir = os.path.join(root, "mav0", "cam0")
    right_dir = os.path.join(root, "mav0", "cam1", "data")
    has_right = os.path.isdir(right_dir)
    frames = []
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            ns, name = line.strip().split(",")[:2]
            right = os.path.join(right_dir, name) if has_right else None
            if right is not None and not os.path.exists(right):
                right = None
            frames.append(SequenceFrame(
                float(ns) * 1e-9, os.path.join(cam_dir, "data", name),
                right_path=right))
    gt_ts, gt_poses = None, None
    gt_csv = os.path.join(root, "mav0", "state_groundtruth_estimate0",
                          "data.csv")
    if os.path.exists(gt_csv):
        rows = []
        with open(gt_csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                rows.append([float(x) for x in line.strip().split(",")[:8]])
        arr = np.asarray(rows)
        gt_ts = arr[:, 0] * 1e-9
        import jax.numpy as jnp
        q_wxyz = arr[:, 4:8]  # EuRoC: qw qx qy qz
        R = np.asarray(geo.quat_to_rot(jnp.asarray(q_wxyz, jnp.float32)))
        gt_poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
        gt_poses[:, :3, :3] = R
        gt_poses[:, :3, 3] = arr[:, 1:4]
    yaml_path = os.path.join(cam_dir, "sensor.yaml")
    camera = _parse_euroc_sensor_yaml(yaml_path) \
        if os.path.exists(yaml_path) else None
    return Sequence(frames=frames, gt_timestamps=gt_ts, gt_poses_wc=gt_poses,
                    camera=camera)


# ---------------------------------------------------------------------------
# Trajectory export (reference System.cc:325-470)
# ---------------------------------------------------------------------------

def save_trajectory_tum(path: str, timestamps, poses_cw) -> None:
    """TUM format: `t tx ty tz qx qy qz qw` of camera-to-world."""
    import jax.numpy as jnp

    poses_cw = np.asarray(poses_cw)
    R_wc = np.swapaxes(poses_cw[:, :3, :3], 1, 2)
    t_wc = -np.einsum("nij,nj->ni", R_wc, poses_cw[:, :3, 3])
    q = np.asarray(geo.rot_to_quat(jnp.asarray(R_wc, jnp.float32)))  # wxyz
    with open(path, "w") as f:
        for ts, t, qq in zip(timestamps, t_wc, q):
            f.write(f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{qq[1]:.7f} {qq[2]:.7f} {qq[3]:.7f} {qq[0]:.7f}\n")


def save_trajectory_kitti(path: str, poses_cw) -> None:
    """KITTI format: 12 values per row of the 3x4 camera-to-world matrix."""
    poses_cw = np.asarray(poses_cw)
    with open(path, "w") as f:
        for T in poses_cw:
            R_wc = T[:3, :3].T
            t_wc = -R_wc @ T[:3, 3]
            M = np.concatenate([R_wc, t_wc[:, None]], 1)
            f.write(" ".join(f"{v:.7e}" for v in M.reshape(-1)) + "\n")


def load_trajectory_tum(path: str):
    """Inverse of save_trajectory_tum -> (timestamps, poses_cw)."""
    import jax.numpy as jnp

    rows = np.loadtxt(path).reshape(-1, 8)
    ts = rows[:, 0]
    q_wxyz = np.concatenate([rows[:, 7:8], rows[:, 4:7]], 1)
    R_wc = np.asarray(geo.quat_to_rot(jnp.asarray(q_wxyz, jnp.float32)))
    poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
    R_cw = np.swapaxes(R_wc, 1, 2)
    poses[:, :3, :3] = R_cw
    poses[:, :3, 3] = -np.einsum("nij,nj->ni", R_cw, rows[:, 1:4])
    return ts, poses
