"""Hostile-sequence robustness: abrupt tracking collapse -> LOST -> genuine
relocalization recovery (VERDICT r4 task #7).

The reference's failure path is Tracking's LOST state feeding
Relocalization (ORB_SLAM2/src/Tracking.cc:267-366 fall-through to :1343):
place-recognition candidates -> EPnP RANSAC -> pose optimization with a
50-inlier acceptance gate.  Earlier tests only exercised smooth synthetic
decay; this one drives a full mid-sequence occlusion (textureless frames —
a hand over the lens) so tracking collapses outright, and asserts the
machinery recovers on the SAME map (no reset): LOST is entered, the
relocalizer fires once the scene reappears, and the recovered tail stays
within an ATE bound.  Also checks the chunked driver's discard accounting
(frames computed but re-tracked around the failure)."""

import numpy as np
import pytest

from coslam_tpu.config import (CameraConfig, ExtractorConfig, LoopConfig,
                               MapperConfig, SystemConfig, TrackerConfig)
from coslam_tpu.models.system import System
from coslam_tpu.utils import evaluation, synthetic

CFG = SystemConfig(
    camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
    extractor=ExtractorConfig(n_features=400, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=96, max_points=16384),
    loop=LoopConfig(min_kfs_between_loops=15),
    tracker=TrackerConfig(init_min_matches=60, init_min_good=35,
                          min_inliers_reloc=25),
)

OCC_START, OCC_END = 46, 58      # 12 fully-occluded frames


def _occluded_sequence():
    """An orbit segment with a 12-frame full occlusion in the middle.

    During the blackout the camera JUMPS BACK to re-observe previously
    mapped territory (the classic kidnapped-robot recovery scenario): the
    constant-velocity prior is wrong by a large discontinuous motion, so
    tracking cannot resume by motion model alone and must relocalize
    against the keyframe database over views it has mapped before."""
    scene = synthetic.make_cylinder_scene(700, seed=7)
    traj = synthetic.make_loop_trajectory(90, seed=7, frac=0.55)
    poses = traj.poses_cw.copy()
    # post-occlusion poses re-traverse the frame 18.. arc (mapped region)
    back = 18
    poses[OCC_END:] = traj.poses_cw[back:back + (poses.shape[0] - OCC_END)]
    traj2 = synthetic.Trajectory(poses)
    seq = list(synthetic.render_sequence(CFG.camera, traj2, scene))
    rng = np.random.default_rng(0)
    for i in range(OCC_START, OCC_END):
        # near-black with sensor noise: FAST finds nothing usable
        seq[i] = rng.integers(0, 6, size=seq[i].shape).astype(np.uint8)
    return seq, traj2


@pytest.mark.slow
def test_occlusion_lost_reloc_recovery():
    seq, traj = _occluded_sequence()
    slam = System(CFG)
    states = []
    slam.run_sequence(seq)
    summary = slam.shutdown()

    lost_frames = [s["frame"] for s in slam.stats if s.get("lost")]
    assert lost_frames, "full occlusion never produced a LOST frame"
    assert min(lost_frames) >= OCC_START - 1, (
        f"lost before the occlusion started: {lost_frames[:5]}")

    # recovery: a genuine relocalization fired and tracking resumed OK
    assert summary["relocalizations"] >= 1, "relocalizer never fired"
    assert slam.state == "OK", f"never recovered (state {slam.state})"
    recovered = [s["frame"] for s in slam.stats
                 if not s.get("lost") and s["frame"] >= OCC_END]
    assert recovered, "no frames tracked after the occlusion"
    assert min(recovered) <= OCC_END + 12, (
        f"recovery took too long (first OK frame {min(recovered)})")

    # the recovered tail must be metrically consistent with the SAME map:
    # ATE over post-occlusion frames only (Umeyama-aligned, scale free)
    ids, poses = slam.trajectory_poses()
    ids = np.asarray(ids)
    tail = ids >= OCC_END
    assert tail.sum() >= 15
    est = evaluation.trajectory_xyz(poses[tail])
    gt = evaluation.trajectory_xyz(traj.poses_cw[ids[tail]])
    ate = evaluation.ate_rmse(est, gt)
    assert ate < 0.35, f"recovered-tail ATE {ate:.3f} m"

    # discard accounting: the collapse forces chunk cuts and the
    # post-recovery keyframe storm forces splices; the driver must count
    # every re-dispatched frame.  ~2/3 of chunk-computed frames get
    # re-tracked in this deliberately hostile run (vs ~7% on the smooth
    # bench sequence) — the honest price of free-running past failures
    assert summary["frames_discarded"] > 0
    assert summary["chunk_discard_rate"] < 0.8, summary
