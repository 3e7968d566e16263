"""Dataset readers + trajectory export round trips (on generated fixtures —
no real datasets exist in this environment)."""

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from coslam_tpu.utils import geometry as geo
from coslam_tpu.utils import io as cio


def _write_img(path, arr):
    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_tum_reader(tmp_path, rng):
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(5):
        t = 100.0 + i * 0.033
        _write_img(root / "rgb" / f"{t:.4f}.png",
                   rng.integers(0, 255, (48, 64)))
        d = (rng.uniform(0.5, 4.0, (48, 64)) * 5000).astype(np.uint16)
        Image.fromarray(d).save(root / "depth" / f"{t + 0.005:.4f}.png")
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t + 0.005:.4f} depth/{t + 0.005:.4f}.png")
        gt_lines.append(f"{t:.4f} {0.1 * i} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(depth_lines))
    (root / "groundtruth.txt").write_text("\n".join(gt_lines))

    seq = cio.load_tum_rgbd(str(root))
    assert len(seq.frames) == 5
    assert all(f.depth_path is not None for f in seq.frames)
    img = cio.load_image(seq.frames[0].rgb_path)
    assert img.shape == (48, 64)
    d = cio.load_depth(seq.frames[0].depth_path, seq.depth_factor)
    assert 0.4 < d.mean() < 4.2
    assert seq.gt_poses_wc.shape == (5, 4, 4)
    np.testing.assert_allclose(seq.gt_poses_wc[3, 0, 3], 0.3, atol=1e-6)


def test_kitti_reader(tmp_path, rng):
    root = tmp_path / "kitti"
    seq_dir = root / "sequences" / "00"
    (seq_dir / "image_0").mkdir(parents=True)
    (seq_dir / "image_1").mkdir()
    (root / "poses").mkdir()
    for i in range(4):
        for sub in ("image_0", "image_1"):
            _write_img(seq_dir / sub / f"{i:06d}.png",
                       rng.integers(0, 255, (37, 124)))
    (seq_dir / "times.txt").write_text("\n".join(f"{0.1 * i:.6f}"
                                                 for i in range(4)))
    rows = []
    for i in range(4):
        M = np.eye(4)[:3]
        M[0, 3] = 0.5 * i
        rows.append(" ".join(str(v) for v in M.reshape(-1)))
    (root / "poses" / "00.txt").write_text("\n".join(rows))

    seq = cio.load_kitti(str(root), "00")
    assert len(seq.frames) == 4
    assert seq.frames[0].right_path is not None
    assert seq.gt_poses_wc[2, 0, 3] == 1.0


def test_trajectory_tum_roundtrip(tmp_path, rng):
    n = 10
    poses = []
    for i in range(n):
        xi = rng.normal(0, 0.3, 6).astype(np.float32)
        poses.append(np.asarray(geo.exp_se3(jnp.asarray(xi))))
    poses = np.stack(poses)
    ts = 100 + np.arange(n) * 0.1
    path = str(tmp_path / "traj.txt")
    cio.save_trajectory_tum(path, ts, poses)
    ts2, poses2 = cio.load_trajectory_tum(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-5)
    np.testing.assert_allclose(poses2, poses, atol=1e-4)


def test_trajectory_kitti_format(tmp_path):
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[1, :3, 3] = [0, 0, -2.0]  # Tcw with camera at z=+2 in world
    path = str(tmp_path / "kitti.txt")
    cio.save_trajectory_kitti(path, poses)
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    assert rows.shape == (3, 3, 4)
    np.testing.assert_allclose(rows[1, :, 3], [0, 0, 2.0], atol=1e-6)
