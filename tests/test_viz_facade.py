"""Visualization layer (viz/) and System facade parity methods.

The reference renders via Pangolin/HighGUI windows (Viewer.cc:54); here the
drawers rasterize to arrays/PNGs, so the tests check content: overlays are
actually painted, map geometry lands on the canvas, files get written, and
the System facade (localization mode / reset / shutdown / trajectory export,
System.h:79-124) behaves."""

import os

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, MapperConfig,
                               SystemConfig)
from coslam_tpu.models import map_state as ms
from coslam_tpu.models.system import System
from coslam_tpu.utils import synthetic
from coslam_tpu.viz import MapViewpoint, Viewer, draw_frame, draw_map, \
    spanning_tree

CFG = SystemConfig(
    camera=CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480),
    extractor=ExtractorConfig(n_features=500, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=24, max_points=8192),
)


def _tiny_map():
    import jax.numpy as jnp
    m = ms.empty_map(CFG)
    # two keyframes 0.2 m apart, sharing 20 points in front of them
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[0, 3] = -0.2
    pts = np.random.default_rng(0).uniform([-1, -1, 3], [1, 1, 6],
                                           (20, 3)).astype(np.float32)
    m = m._replace(
        kf_pose=m.kf_pose.at[0].set(T0).at[1].set(T1),
        kf_valid=m.kf_valid.at[:2].set(True),
        kf_kp_valid=m.kf_kp_valid.at[:2, :20].set(True),
        kf_obs_pt=m.kf_obs_pt.at[:2, :20].set(jnp.arange(20, dtype=jnp.int32)),
        pt_pos=m.pt_pos.at[:20].set(pts),
        pt_valid=m.pt_valid.at[:20].set(True),
        n_kf=jnp.asarray(2, jnp.int32),
        n_pt=jnp.asarray(20, jnp.int32),
    )
    return m


def test_draw_frame_overlay():
    img = np.full((240, 320), 90, np.uint8)
    uv = np.array([[50, 50], [100, 120], [300, 200], [500, 500]], np.float32)
    valid = np.array([True, True, True, True])
    tracked = np.array([True, True, False, True])  # last is off-canvas
    out = draw_frame(img, uv, valid, tracked, state="OK", n_kfs=3,
                     n_points=42, n_matches=2)
    assert out.shape[0] > 240 and out.shape[1] == 320 and out.shape[2] == 3
    # green overlay pixels present near tracked keypoints
    patch = out[44:57, 44:57]
    assert (patch[:, :, 1].astype(int) - patch[:, :, 0].astype(int) > 60).any()
    # status bar present (light strip at the bottom)
    assert out[-10:].mean() > 150


def test_draw_map_content():
    m = _tiny_map()
    img = draw_map(m, current_T_cw=np.eye(4), follow=True,
                   viewpoint=MapViewpoint(width=400, height=300),
                   loop_edges=[(0, 1)], graph_min_weight=10)
    assert img.shape == (300, 400, 3)
    assert (img < 250).any(), "nothing drawn"
    # some blue-ish (keyframe frusta) and dark (points) pixels exist
    b, g, r = img[:, :, 2].astype(int), img[:, :, 1].astype(int), \
        img[:, :, 0].astype(int)
    assert ((b - r > 60) & (b - g > 60)).any(), "no keyframe frusta"


def test_spanning_tree():
    covis = np.array([[0, 50, 2], [50, 0, 30], [2, 30, 0]])
    valid = np.array([True, True, True])
    parent = spanning_tree(covis, valid)
    assert parent[0] == -1 and parent[1] == 0 and parent[2] == 1


@pytest.mark.slow
def test_viewer_and_facade_end_to_end(tmp_path):
    scene = synthetic.make_scene(600, seed=3)
    traj = synthetic.make_trajectory(14, seed=3)
    seq = synthetic.render_sequence(CFG.camera, traj, scene)
    slam = System(CFG, enable_loop_closing=False)
    viewer = Viewer(str(tmp_path / "viz"), every=4)

    from coslam_tpu.models.frame import build_frame
    import jax.numpy as jnp
    for i, img in enumerate(seq):
        slam.track_mono(img, i, timestamp=0.1 * i)
        if slam.state == "OK":
            frame = build_frame(jnp.asarray(img), CFG)
            viewer.update(slam, img, frame, i)
    assert slam.state == "OK"
    pngs = os.listdir(tmp_path / "viz")
    assert any(p.startswith("frame_") for p in pngs)
    assert any(p.startswith("map_") for p in pngs)

    # --- facade ---
    n_kf_before = int(np.asarray(slam.map.kf_valid).sum())
    slam.activate_localization_mode()
    for i, img in enumerate(seq[:4]):
        slam.track_mono(img, 100 + i)
    assert int(np.asarray(slam.map.kf_valid).sum()) == n_kf_before, \
        "localization mode inserted keyframes"
    slam.deactivate_localization_mode()

    tum = tmp_path / "traj.txt"
    kf_tum = tmp_path / "kf.txt"
    kitti = tmp_path / "kitti.txt"
    slam.save_trajectory_tum(str(tum))
    slam.save_keyframe_trajectory_tum(str(kf_tum))
    slam.save_trajectory_kitti(str(kitti))
    assert len(tum.read_text().strip().splitlines()) >= 10
    assert len(kf_tum.read_text().strip().splitlines()) == n_kf_before
    assert len(kitti.read_text().strip().splitlines()) >= 10
    # TUM line: 8 floats, timestamps we fed in
    first = tum.read_text().strip().splitlines()[0].split()
    assert len(first) == 8

    kp = slam.get_tracked_map_points()
    assert kp.ndim == 1 and len(kp) == CFG.extractor.max_keypoints
    assert slam.get_tracked_keypoints_un().shape == \
        (CFG.extractor.max_keypoints, 2)

    stats = slam.shutdown()
    assert stats["keyframes"] == n_kf_before and stats["frames"] >= 14

    slam.reset()
    assert slam.state == "NOT_INITIALIZED"
    assert int(np.asarray(slam.map.kf_valid).sum()) == 0
    assert not slam.trajectory
