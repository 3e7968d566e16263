"""System facade + per-frame orchestration.

The analogue of reference System (ORB_SLAM2/src/System.cc) and the
control-flow parts of Tracking::Track (Tracking.cc:267-563).  Where the
reference runs 4 threads over a mutexed map (System.cc:92-102), this driver
is single host thread calling jitted stages in sequence per frame:

    build_frame -> [initialize | track_motion_model -> track_local_map]
                -> (keyframe?) insert -> triangulate -> refresh -> local BA
                -> cull

Host logic only branches on small scalars pulled from device (state machine,
keyframe decision), matching the reference's semantics:
NOT_INITIALIZED/OK/LOST states (Tracking.h:85-91), constant-velocity motion
model, NeedNewKeyFrame-style gating (Tracking.cc:979).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models import keyframe_db as kdb
from coslam_tpu.models import local_mapping as lm
from coslam_tpu.models import loop_closing as lc
from coslam_tpu.models import map_state as ms
from coslam_tpu.models import tracking
from coslam_tpu.models.frame import Frame, build_frame
from coslam_tpu.ops import matching, twoview
from coslam_tpu.optim import ba
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnums=(0,))
def _match_for_init(cfg: SystemConfig, f0: Frame, f1: Frame):
    """SearchForInitialization (reference ORBmatcher.cc:405): window 100,
    ratio 0.9, mutual, rotation consistency, level-0 only is relaxed to all
    levels here."""
    mask = matching.window_mask(f0.uv, f1.uv, 100.0)
    mm = matching.match(f0.desc, f0.valid, f1.desc, f1.valid, cfg.matcher,
                        mask=mask, max_dist=cfg.matcher.th_low,
                        ratio=0.9, mutual=True,
                        angle_q=f0.angle, angle_t=f1.angle)
    return mm


@functools.partial(jax.jit, static_argnums=(0,))
def _initial_map(cfg: SystemConfig, m: ms.MapState, f0: Frame, f1: Frame,
                 fid0, fid1, T21, pts3d, match_idx, inlier):
    """CreateInitialMapMonocular (reference Tracking.cc:639-757): two
    keyframes, triangulated points, median-depth scale normalization."""
    N = f0.uv.shape[0]
    # median-depth normalization (Tracking.cc:691-714)
    z = pts3d[:, 2]
    med = jnp.nanmedian(jnp.where(inlier, z, jnp.nan))
    scale = 1.0 / jnp.maximum(med, 1e-6)
    T21 = T21.at[:3, 3].set(T21[:3, 3] * scale)
    pts3d = pts3d * scale

    m, k0 = lm.insert_keyframe(cfg, m, f0, jnp.eye(4), fid0,
                               jnp.full(N, -1, jnp.int32))
    m, k1 = lm.insert_keyframe(cfg, m, f1, T21, fid1,
                               jnp.full(N, -1, jnp.int32))

    pos = jnp.cumsum(inlier.astype(jnp.int32)) - 1
    P = m.pt_pos.shape[0]
    slot = jnp.where(inlier, pos, P)
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)

    C1 = -_he("ji,j->i", T21[:3, :3], T21[:3, 3])
    r0 = pts3d
    r1 = pts3d - C1
    d0 = jnp.linalg.norm(r0, axis=1) + 1e-9
    normal = r0 / d0[:, None]
    max_dist = d0 * scales[f0.level]

    def sc(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        big = jnp.concatenate([arr, pad])
        return big.at[slot].set(
            jnp.where(inlier.reshape((-1,) + (1,) * (vals.ndim - 1)),
                      vals, big[slot]))[:-1]

    n_new = inlier.sum()
    m = m._replace(
        pt_pos=sc(m.pt_pos, pts3d),
        pt_valid=sc(m.pt_valid, inlier),
        pt_desc=sc(m.pt_desc, f0.desc),
        pt_normal=sc(m.pt_normal, normal),
        pt_max_dist=sc(m.pt_max_dist, max_dist),
        pt_ref_kf=sc(m.pt_ref_kf, jnp.zeros(N, jnp.int32)),
        pt_first_kf=sc(m.pt_first_kf, jnp.zeros(N, jnp.int32)),
        pt_visible=sc(m.pt_visible, jnp.ones(N, jnp.int32)),
        pt_found=sc(m.pt_found, jnp.ones(N, jnp.int32)),
        n_pt=n_new,
    )
    # associations: kp i of f0 -> slot; kp match_idx[i] of f1 -> slot
    new_id = jnp.where(inlier, slot, -1).astype(jnp.int32)
    m = m._replace(kf_obs_pt=m.kf_obs_pt.at[k0].set(new_id))
    row1 = jnp.full(N + 1, -1, jnp.int32)
    tgt = jnp.where(inlier, jnp.maximum(match_idx, 0), N)
    row1 = row1.at[tgt].set(jnp.where(inlier, new_id, -1))[:-1]
    m = m._replace(kf_obs_pt=m.kf_obs_pt.at[k1].set(row1))
    # global BA on the initial structure (Tracking.cc:688: 20 iters) +
    # geometry refresh, fused into this one-time program
    m = lm.local_ba_body(cfg, m, k1, iters=8)
    m = lm.refresh_point_geometry(cfg, m)
    return m, row1, n_new


class System:
    """Monocular SLAM engine instance (reference System ctor System.cc:32 +
    TrackMonocular :219)."""

    def __init__(self, cfg: SystemConfig, enable_loop_closing: bool = True):
        self.cfg = cfg
        self.map = ms.empty_map(cfg)
        self.db = kdb.KeyFrameDatabase(cfg)
        self.loop_closer = lc.LoopCloser(cfg, self.db) if enable_loop_closing \
            else None
        self.n_loops_closed = 0
        self.state = "NOT_INITIALIZED"
        self.ref_frame: Optional[Frame] = None
        self.ref_frame_id = -1
        self.last_T = np.eye(4, dtype=np.float32)
        self.velocity: Optional[np.ndarray] = None
        self.last_kp_pt = None
        self.last_level = None
        self.frames_since_kf = 0
        self.ref_kf_matches = 0
        self.last_ref_kf = -1
        # per-frame log: (frame_id, ref_kf, T_frame_wrt_refkf) — final
        # trajectory reconstructs against the *current* keyframe poses so
        # loop corrections and BA shifts propagate (reference
        # System::SaveTrajectoryTUM, System.cc:325-384)
        self.trajectory: List[Tuple[int, int, np.ndarray]] = []
        self.stats: List[dict] = []
        self.timestamps: dict = {}  # frame_id -> timestamp (for TUM export)
        # localization-only mode: track against the frozen map, insert no
        # keyframes (reference System::ActivateLocalizationMode,
        # System.h:79-84 / System.cc:237-258 -> LocalMapping stopped +
        # Tracking::InformOnlyTracking)
        self.localization_only = False
        self.n_frames_tracked = 0
        self._init_key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    def track_mono(self, img: np.ndarray, frame_id: int,
                   timestamp: Optional[float] = None) -> Optional[np.ndarray]:
        self._note_frame(frame_id, timestamp)
        self._cur_depth = None
        frame = build_frame(jnp.asarray(img), self.cfg)
        self.last_frame = frame  # for viewers (FrameDrawer::Update)
        if self.state == "NOT_INITIALIZED":
            self._try_initialize(frame, frame_id)
            T = self.last_T if self.state == "OK" else None
        else:
            T = self._track(frame_id, frame=frame)
        return self._log_pose(frame_id, T)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   frame_id: int,
                   timestamp: Optional[float] = None) -> Optional[np.ndarray]:
        """RGB-D tracking (reference System::TrackRGBD, System.cc + Tracking
        ::GrabImageRGBD): sensor depth gives metric scale; initialization is
        a single keyframe with backprojected landmarks."""
        from coslam_tpu.ops import stereo as stereo_ops

        frame = build_frame(jnp.asarray(img), self.cfg)
        self.last_frame = frame
        self._note_frame(frame_id, timestamp)
        sd = stereo_ops.rgbd_depth(self.cfg.camera, frame.uv, frame.valid,
                                   jnp.asarray(depth))
        return self._track_with_depth(frame, sd, frame_id)

    def track_stereo(self, img_left: np.ndarray, img_right: np.ndarray,
                     frame_id: int,
                     timestamp: Optional[float] = None) -> Optional[np.ndarray]:
        """Rectified stereo tracking (reference System::TrackStereo):
        left/right ORB extraction + row-banded descriptor matching yields
        per-keypoint depth; the rest of the pipeline is shared."""
        from coslam_tpu.ops import orb, stereo as stereo_ops

        frame = build_frame(jnp.asarray(img_left), self.cfg)
        self.last_frame = frame
        self._note_frame(frame_id, timestamp)
        kpsR = orb.extract(jnp.asarray(img_right), self.cfg.extractor)
        kpsL = {"uv": frame.uv, "level": frame.level, "desc": frame.desc,
                "valid": frame.valid}
        sd = stereo_ops.match_stereo(self.cfg.camera, self.cfg.extractor,
                                     self.cfg.matcher, kpsL, kpsR,
                                     jnp.asarray(img_left),
                                     jnp.asarray(img_right))
        return self._track_with_depth(frame, sd, frame_id)

    def _track_with_depth(self, frame: Frame, sd, frame_id: int):
        self._cur_depth = sd.depth
        if self.state == "NOT_INITIALIZED":
            self._initialize_with_depth(frame, sd, frame_id)
            T = self.last_T if self.state == "OK" else None
        else:
            T = self._track(frame_id, frame=frame)
        return self._log_pose(frame_id, T)

    def _note_frame(self, frame_id: int, timestamp: Optional[float]):
        self.n_frames_tracked += 1
        self.timestamps[frame_id] = (float(timestamp) if timestamp is not None
                                     else float(frame_id))

    def _log_pose(self, frame_id: int, T) -> Optional[np.ndarray]:
        if T is not None:
            # anchor to the keyframe this frame was actually tracked against
            # (reference keeps mpReferenceKF per frame and reconstructs the
            # trajectory relative to it, System.cc:340-380) — NOT the newest
            # keyframe, which may be unrelated after a loop correction
            ref_kf = self.last_ref_kf if self.last_ref_kf >= 0 \
                else max(int(self.map.n_kf) - 1, 0)
            T_rel = np.asarray(T) @ np.linalg.inv(
                np.asarray(self.map.kf_pose[ref_kf]))
            self.trajectory.append((frame_id, ref_kf, T_rel))
        return T

    # ------------------------------------------------------------------
    def _initialize_with_depth(self, frame: Frame, sd, frame_id: int):
        """Stereo/RGB-D bootstrap (reference Tracking::StereoInitialization):
        one keyframe at the origin with depth-backprojected landmarks."""
        n_depth = int((sd.valid & frame.valid).sum())
        if n_depth < 50:
            return
        N = frame.uv.shape[0]
        m, k = lm.insert_keyframe(self.cfg, self.map, frame, jnp.eye(4),
                                  frame_id, jnp.full(N, -1, jnp.int32))
        m = lm.add_depth_points(self.cfg, m, k, sd.depth, close_only=False)
        m = lm.refresh_point_geometry(self.cfg, m)
        self.map = m
        self.state = "OK"
        self.last_T = np.eye(4, dtype=np.float32)
        self.last_kp_pt = m.kf_obs_pt[int(k)]
        self.last_level = frame.level
        self.velocity = None
        self.frames_since_kf = 0
        self.ref_kf_matches = int((m.kf_obs_pt[int(k)] >= 0).sum())
        self.last_ref_kf = int(k)
        self.db.add(int(k), frame.desc, frame.valid)

    # ------------------------------------------------------------------
    def _try_initialize(self, frame: Frame, frame_id: int):
        tr = self.cfg.tracker
        n_kp = int(frame.valid.sum())
        if self.ref_frame is None:
            if n_kp > tr.init_min_keypoints:
                self.ref_frame = frame
                self.ref_frame_id = frame_id
            return
        mm = _match_for_init(self.cfg, self.ref_frame, frame)
        n_matches = int(mm.valid.sum())
        if n_matches < tr.init_min_matches:
            # too weak — restart from this frame (Tracking.cc:590-600)
            self.ref_frame = frame if n_kp > tr.init_min_keypoints else None
            self.ref_frame_id = frame_id
            return
        uv2 = frame.uv[jnp.maximum(mm.idx, 0)]
        self._init_key, sub = jax.random.split(self._init_key)
        res = twoview.initialize(
            self.cfg.camera, self.ref_frame.uv, uv2, mm.valid, sub,
            tr.ransac_iters, tr.ransac_sigma, tr.init_min_good)
        if not bool(res.success):
            return
        m, kp_pt1, n_pts = _initial_map(
            self.cfg, self.map, self.ref_frame, frame,
            jnp.asarray(self.ref_frame_id, jnp.int32),
            jnp.asarray(frame_id, jnp.int32), res.T21, res.points3d,
            mm.idx, res.is_inlier & mm.valid)
        self.map = m
        self.state = "OK"
        self.last_T = np.asarray(m.kf_pose[1])
        self.last_kp_pt = m.kf_obs_pt[1]
        self.last_level = frame.level
        self.velocity = None
        self.frames_since_kf = 0
        self.ref_kf_matches = int(n_pts)
        self.last_ref_kf = 1
        # also log the first keyframe
        self.trajectory.append((self.ref_frame_id, 0, np.eye(4, dtype=np.float32)))

    # ------------------------------------------------------------------
    def _track(self, frame_id: int,
               frame: Optional[Frame] = None) -> Optional[np.ndarray]:
        tr = self.cfg.tracker
        T_pred = jnp.asarray(
            self.velocity @ self.last_T if self.velocity is not None
            else self.last_T)

        res2 = None
        if self.state == "LOST":
            res = self._attempt_relocalization(frame)
            if res is not None:
                res2, self.map = tracking.track_local_map(
                    self.cfg, self.map, frame, res.T, res.kp_pt)
        else:
            radius = 15.0 if self.velocity is not None else 30.0
            # one fused dispatch: motion model (incl. wide-window retry) +
            # local-map tracking (models/tracking.py track_frame_built)
            _n1, res2, self.map = tracking.track_frame_built(
                self.cfg, self.map, frame, self.last_kp_pt,
                self.last_level, T_pred, jnp.float32(radius))
            if int(res2.n_inliers) < 10:
                # motion tracking failed outright — try relocalization this
                # frame (reference falls through to Relocalization,
                # Tracking.cc:366-380)
                res = self._attempt_relocalization(frame)
                if res is not None:
                    res2, self.map = tracking.track_local_map(
                        self.cfg, self.map, frame, res.T, res.kp_pt)

        n_inl = int(res2.n_inliers) if res2 is not None else 0
        if n_inl < 10:
            # lost: constant-velocity dead reckoning until relocalization
            # succeeds (reference keeps the LOST state the same way)
            self.state = "LOST"
            T_np = np.asarray(T_pred)
            self.velocity = None
            self.last_T = T_np
            self.last_kp_pt = jnp.full_like(self.last_kp_pt, -1)
            self.stats.append({"frame": frame_id, "inliers": 0, "lost": True})
            return T_np

        self.state = "OK"
        T_np = np.asarray(res2.T)
        self.velocity = T_np @ np.linalg.inv(self.last_T)
        self.last_T = T_np
        self.last_kp_pt = res2.kp_pt
        self.last_level = frame.level
        self.last_ref_kf = int(res2.ref_kf)
        self.frames_since_kf += 1
        self.stats.append({"frame": frame_id, "inliers": n_inl, "lost": False})

        if not self.localization_only and self._need_keyframe(n_inl):
            self._insert_keyframe(frame, frame_id, res2)
            # the frame *is* the new keyframe: report its (BA-adjusted) pose
            # and anchor the log to itself
            T_np = np.asarray(self.last_T)
        return T_np

    # ------------------------------------------------------------------
    def _attempt_relocalization(self, frame: Frame):
        """Place recognition + EPnP RANSAC + pose refinement (reference
        Tracking::Relocalization, Tracking.cc:1343).  Returns a TrackResult
        or None."""
        cands = self.db.detect_reloc_candidates(frame.desc, frame.valid,
                                                top_k=5)
        best = None
        # acceptance gate: >= 50 inliers after the recovery rounds
        # (reference Tracking.cc:1459 `if(nGood>=50)`)
        gate = self.cfg.tracker.min_inliers_reloc
        for c in cands:
            self._init_key, sub = jax.random.split(self._init_key)
            res = tracking.relocalize_against_kf(
                self.cfg, self.map, frame, jnp.asarray(c), sub)
            if int(res.n_inliers) >= gate and (
                    best is None or int(res.n_inliers) > int(best.n_inliers)):
                best = res
        if best is not None:
            self.n_relocalizations = getattr(self, "n_relocalizations", 0) + 1
        return best

    # ------------------------------------------------------------------
    def _need_keyframe(self, n_inliers: int) -> bool:
        """NeedNewKeyFrame (Tracking.cc:979-1063) distilled: enough frames
        passed, or tracking decayed below ref_ratio of the reference KF."""
        tr = self.cfg.tracker
        # no capacity gate: _insert_keyframe recycles/grows slots on demand
        # (models/compaction.py), matching the reference's unbounded map
        c1a = self.frames_since_kf >= tr.max_frames
        c1c = n_inliers < self.ref_kf_matches * 0.25
        c2 = (n_inliers < self.ref_kf_matches * tr.ref_ratio_mono
              and n_inliers > 15)
        return bool((c1a or c1c) and n_inliers > 15) or bool(c2 and self.frames_since_kf >= 1)

    # ------------------------------------------------------------------
    def _ensure_capacity(self):
        """Slot recycling + geometric growth (the analogue of the
        reference's erase lifecycle, Map.cc:55 / KeyFrame.cc:453, which lets
        it run indefinitely).  At capacity watermarks, compact culled slots
        away (models/compaction.py); if compaction cannot free enough —
        pure exploration, nothing cullable — double the capacity, which
        re-specializes the jitted stages once per doubling."""
        from coslam_tpu.models import compaction

        K = self.cfg.mapper.max_keyframes
        P = self.cfg.mapper.max_points
        if int(self.map.n_kf) < K - 1 and int(self.map.n_pt) < 0.95 * P:
            return
        old = self.map
        new_m, kf_map, pt_map = compaction.compact(self.cfg, old)
        self._remap_after_compact(old, new_m, kf_map, pt_map)
        self.map = new_m
        n_kf, n_pt = int(new_m.n_kf), int(new_m.n_pt)
        grow_K = 2 * K if n_kf >= K - max(4, K // 16) else 0
        grow_P = 2 * P if n_pt >= 0.90 * P else 0
        if grow_K or grow_P:
            cfg2, m2 = compaction.grow(self.cfg, self.map,
                                       grow_K or K, grow_P or P)
            self.map = m2
            self._set_cfg(cfg2)

    def _remap_after_compact(self, old, new_m, kf_map, pt_map):
        """Point every host-side slot reference at the compacted layout."""
        K = kf_map.shape[0]
        kf_valid_old = np.asarray(old.kf_valid)
        # last surviving keyframe at-or-before each old slot (fallback for
        # anchors whose keyframe was culled)
        alive_before = np.maximum(np.cumsum(kf_valid_old) - 1, 0)
        old_poses = np.asarray(old.kf_pose)

        def remap_kf(i: int) -> int:
            i = int(np.clip(i, 0, K - 1))
            return int(kf_map[i]) if kf_map[i] >= 0 else int(alive_before[i])

        # trajectory anchors: culled refs are re-expressed against the
        # nearest surviving keyframe using the *old* poses
        new_traj = []
        for fid, ref, T_rel in self.trajectory:
            ref = int(np.clip(ref, 0, K - 1))
            if kf_map[ref] >= 0:
                new_traj.append((fid, int(kf_map[ref]), T_rel))
            else:
                fb_old = int(np.nonzero(kf_valid_old)[0][alive_before[ref]]) \
                    if kf_valid_old.any() else 0
                T_w = T_rel @ old_poses[ref]
                T_rel2 = T_w @ np.linalg.inv(old_poses[fb_old])
                new_traj.append((fid, int(alive_before[ref]), T_rel2))
        self.trajectory = new_traj

        if self.last_kp_pt is not None:
            kp = np.asarray(self.last_kp_pt)
            kp = np.where(kp >= 0, pt_map[np.maximum(kp, 0)], -1)
            self.last_kp_pt = jnp.asarray(kp)
        self.last_ref_kf = remap_kf(self.last_ref_kf) \
            if self.last_ref_kf >= 0 else -1
        self.db.remap(kf_map, new_K=kf_map.shape[0])
        if self.loop_closer is not None:
            self.loop_closer.remap(kf_map, remap_kf)

    def _set_cfg(self, cfg2: SystemConfig):
        self.cfg = cfg2
        self.db.cfg = cfg2
        self.db.grow(cfg2.mapper.max_keyframes)
        if self.loop_closer is not None:
            self.loop_closer.cfg = cfg2

    def _insert_keyframe(self, frame: Frame, frame_id: int,
                         res: tracking.TrackResult):
        self._ensure_capacity()
        cfg = self.cfg
        # the whole LocalMapping iteration (insertion + depth points +
        # triangulation + fusion + refresh + windowed local BA + culling) is
        # one fused jitted program — one dispatch, one compile
        has_depth = getattr(self, "_cur_depth", None) is not None
        m, k = lm.backend_insert(
            cfg, self.map, frame, jnp.asarray(self.last_T),
            jnp.asarray(frame_id, jnp.int32),
            res.kp_pt, has_depth, self._cur_depth if has_depth else None)
        # place recognition + loop closing (reference LoopClosing thread;
        # here a synchronous stage after local mapping)
        kf_i = int(k)
        self.db.add(kf_i, m.kf_desc[kf_i], m.kf_kp_valid[kf_i])
        self.db.maybe_retrain(m)
        if self.loop_closer is not None:
            # a global BA deferred from the previous closure runs now unless
            # a newer loop supersedes it (the reference's abort-on-new-loop
            # GBA thread semantics, LoopClosing.cc:579)
            m = self.loop_closer.maybe_run_gba(m)
            m, closed = self.loop_closer.on_keyframe(m, kf_i)
            if closed:
                self.n_loops_closed += 1
                m = lm.refresh_point_geometry(cfg, m)
                self.stats[-1]["loop_closed"] = True
        self.map = m
        # tracking references the (possibly BA-shifted) new KF pose
        self.last_T = np.asarray(m.kf_pose[k])
        self.last_kp_pt = m.kf_obs_pt[k]
        self.last_ref_kf = kf_i
        self.frames_since_kf = 0
        self.ref_kf_matches = int((m.kf_obs_pt[k] >= 0).sum())
        self.stats[-1]["keyframe"] = True

    # ------------------------------------------------------------------
    def trajectory_poses(self):
        """(frame ids, (F, 4, 4) Tcw array) reconstructed against current
        keyframe poses (loop/BA corrections propagate)."""
        if not self.trajectory:
            return [], np.zeros((0, 4, 4), np.float32)
        kf_poses = np.asarray(self.map.kf_pose)
        ids = [fid for fid, _, _ in self.trajectory]
        poses = np.stack([T_rel @ kf_poses[ref]
                          for _, ref, T_rel in self.trajectory])
        return ids, poses

    # ------------------------------------------------------------------
    # Facade parity with reference System (include/System.h:79-124)
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Stop mapping; keep tracking against the frozen map (reference
        System::ActivateLocalizationMode, System.h:80 / System.cc:237)."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        """Resume full SLAM (System::DeactivateLocalizationMode,
        System.h:84)."""
        self.localization_only = False

    def reset(self):
        """Clear map, place-recognition DB and tracking state (reference
        System::Reset, System.h:92 -> Tracking::Reset, Tracking.cc:1506:
        LocalMapping/LoopClosing reset + map clear + reinit)."""
        self.map = ms.empty_map(self.cfg)
        self.db = kdb.KeyFrameDatabase(self.cfg)
        if self.loop_closer is not None:
            self.loop_closer = lc.LoopCloser(self.cfg, self.db)
        self.state = "NOT_INITIALIZED"
        self.ref_frame = None
        self.ref_frame_id = -1
        self.last_T = np.eye(4, dtype=np.float32)
        self.velocity = None
        self.last_kp_pt = None
        self.last_level = None
        self.frames_since_kf = 0
        self.ref_kf_matches = 0
        self.last_ref_kf = -1
        self.trajectory.clear()
        self.stats.clear()
        self.timestamps.clear()
        self.n_loops_closed = 0

    def shutdown(self) -> dict:
        """Finish all work and report run statistics (reference
        System::Shutdown, System.h:97, joins the three threads; there are no
        threads here, so this just finalizes device work and summarizes)."""
        if self.loop_closer is not None:
            # flush a deferred global BA so the exported map is consistent
            self.map = self.loop_closer.maybe_run_gba(self.map)
        jax.block_until_ready(self.map.kf_pose)
        n_kf = int(np.asarray(self.map.kf_valid).sum())
        n_pt = int(np.asarray(self.map.pt_valid).sum())
        return {"frames": self.n_frames_tracked, "keyframes": n_kf,
                "map_points": n_pt, "loops_closed": self.n_loops_closed,
                "relocalizations": getattr(self, "n_relocalizations", 0)}

    def save_trajectory_tum(self, path: str):
        """Per-frame camera trajectory in TUM format (System.h:103 /
        System.cc:325)."""
        from coslam_tpu.utils import io
        ids, poses = self.trajectory_poses()
        ts = [self.timestamps.get(i, float(i)) for i in ids]
        io.save_trajectory_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        """Keyframe-only trajectory in TUM format (System.h:110 /
        System.cc:386)."""
        from coslam_tpu.utils import io
        kf_valid = np.asarray(self.map.kf_valid)
        poses = np.asarray(self.map.kf_pose)[kf_valid]
        fids = np.asarray(self.map.kf_frame_id)[kf_valid]
        ts = [self.timestamps.get(int(i), float(i)) for i in fids]
        io.save_trajectory_tum(path, ts, poses)

    def save_trajectory_kitti(self, path: str):
        """Per-frame trajectory in KITTI format (System.h:117 /
        System.cc:422)."""
        from coslam_tpu.utils import io
        _, poses = self.trajectory_poses()
        io.save_trajectory_kitti(path, poses)

    def get_tracked_map_points(self) -> np.ndarray:
        """Map-point ids associated to the last frame's keypoints, -1 where
        none (reference System::GetTrackedMapPoints, System.h:122)."""
        if self.last_kp_pt is None:
            return np.empty(0, np.int32)
        return np.asarray(self.last_kp_pt)

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Undistorted keypoints of the last tracked keyframe reference
        (System::GetTrackedKeyPointsUn, System.h:123)."""
        k = max(int(self.map.n_kf) - 1, 0)
        return np.asarray(self.map.kf_uv[k])
