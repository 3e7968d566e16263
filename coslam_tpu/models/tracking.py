"""Per-frame tracking stages (jitted).

TPU reformulation of the reference Tracking thread's hot path
(ORB_SLAM2/src/Tracking.cc): TrackWithMotionModel (:869), SearchLocalPoints/
TrackLocalMap (:932-1205) and their pose optimizations.  Each stage is one
jitted function over fixed-capacity arrays; the Python System driver
(models/system.py) owns the NOT_INITIALIZED/OK/LOST state machine, which is
pure host control flow on scalars.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models.frame import Frame
from coslam_tpu.models.map_state import MapState
from coslam_tpu.ops import matching, pnp
from coslam_tpu.optim import pose_opt
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class TrackResult(NamedTuple):
    T: jnp.ndarray           # (4, 4) optimized Tcw
    kp_pt: jnp.ndarray       # (N,) i32 map-point id per frame keypoint (-1)
    n_matches: jnp.ndarray   # () i32 associations before optimization
    n_inliers: jnp.ndarray   # () i32 pose-opt inliers
    # keyframe sharing the most tracked landmarks with this frame — the
    # reference's mpReferenceKF (Tracking::UpdateLocalKeyFrames pKFmax,
    # Tracking.cc:1169-1215); trajectory logging anchors to it
    ref_kf: jnp.ndarray = np.int32(-1)  # weak-typed: folds to an HLO literal
                                        # (a device constant here would force
                                        # a host fetch at lowering time)
    # reference-KF tracked landmarks with >= 3 observations — the
    # reference's nRefMatches = mpReferenceKF->TrackedMapPoints(nMinObs)
    # (Tracking.cc:988-990), the denominator of the keyframe decision.
    # Counting every observation (including fresh 1-obs triangulations)
    # makes the c2 ratio fire on every frame.
    n_ref_matches: jnp.ndarray = np.int32(0)


def _project_points(cam, T, X):
    pc = geo.transform_points(T, X)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = pc[:, 0] / zs * cam.fx + cam.cx
    v = pc[:, 1] / zs * cam.fy + cam.cy
    return jnp.stack([u, v], 1), z


def _scatter_assoc(n_slots, m: matching.Matches, pt_ids):
    """Invert query->target matches into target-slot -> point-id."""
    kp_pt = jnp.full(n_slots, -1, jnp.int32)
    tgt = jnp.where(m.valid, m.idx, n_slots)  # overflow row = dustbin
    kp_pt = jnp.concatenate([kp_pt, jnp.full(1, -1, jnp.int32)])
    kp_pt = kp_pt.at[tgt].set(jnp.where(m.valid, pt_ids, -1))
    return kp_pt[:n_slots]


@functools.partial(jax.jit, static_argnums=(0,))
def track_motion_model(cfg: SystemConfig, m: MapState, frame: Frame,
                       last_kp_pt, last_level, T_pred,
                       radius=15.0) -> TrackResult:
    """Reference TrackWithMotionModel (Tracking.cc:869): project the
    previous frame's associated map points with the constant-velocity pose
    prediction and match into the current frame within a scale-dependent
    window; then motion-only BA.  `radius` is traced, so the wide-window
    retry (Tracking.cc:905) reuses the same executable."""
    return _motion_body(cfg, m, frame, last_kp_pt, last_level, T_pred,
                        jnp.asarray(radius, jnp.float32))


def _motion_body(cfg: SystemConfig, m: MapState, frame: Frame,
                 last_kp_pt, last_level, T_pred, radius) -> TrackResult:
    cam = cfg.camera
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)

    q_pt = last_kp_pt                                     # (N,) point per last-frame kp
    q_ok = (q_pt >= 0)
    q_pt_safe = jnp.maximum(q_pt, 0)
    q_ok = q_ok & m.pt_valid[q_pt_safe]
    X = m.pt_pos[q_pt_safe]                               # (N, 3)
    uv_pred, z = _project_points(cam, T_pred, X)
    q_ok = q_ok & (z > 0.1)

    r = radius * scales[jnp.clip(last_level, 0, scales.shape[0] - 1)]
    q_desc = m.pt_desc[q_pt_safe]
    mm = matching.match_windowed(
        q_desc, uv_pred, r, q_ok, frame.desc, frame.uv, frame.valid,
        cfg.matcher, level_q=last_level, level_t=frame.level,
        level_lo=-1, level_hi=1, max_dist=cfg.matcher.th_high, mutual=True)
    kp_pt = _scatter_assoc(frame.uv.shape[0], mm, q_pt)
    n_matches = (kp_pt >= 0).sum()

    ok = kp_pt >= 0
    Xf = m.pt_pos[jnp.maximum(kp_pt, 0)]
    res = pose_opt.optimize_pose(cam, T_pred, Xf, frame.uv, ok,
                                 frame.inv_sigma2, cfg.tracker)
    kp_pt = jnp.where(res.inliers, kp_pt, -1)
    return TrackResult(T=res.T, kp_pt=kp_pt, n_matches=n_matches,
                       n_inliers=res.n_inliers)


@functools.partial(jax.jit, static_argnums=(0,))
def relocalize_against_kf(cfg: SystemConfig, m: MapState, frame: Frame,
                          cand_kf, key) -> TrackResult:
    """One relocalization attempt against a place-recognition candidate
    (reference Tracking::Relocalization, Tracking.cc:1343-1468):
    SearchByBoW to the candidate's landmarks -> EPnP RANSAC -> pose
    optimization, then the reference's two match-recovery rounds — a
    window-10 projection search against the candidate's covisible local
    map with re-optimization, and (when 30 < inliers < 50) a shrunken
    window-3 round — before the 50-inlier acceptance gate applied by the
    caller."""
    cam = cfg.camera
    pt = m.kf_obs_pt[cand_kf]
    pt_safe = jnp.maximum(pt, 0)
    ok_t = (pt >= 0) & m.kf_kp_valid[cand_kf] & m.pt_valid[pt_safe]
    # seed stage: mutual TH_HIGH matching WITHOUT a ratio test (on
    # low-feature frames the ratio test starves the solver below its
    # minimal-set needs) but WITH rotation consistency against the
    # candidate keyframe's keypoint orientations (the reference reloc
    # SearchByBoW's mbCheckOrientation, ORBmatcher.cc:159-288) — wrong
    # matches carry random rotation offsets, so the histogram filter
    # raises the RANSAC inlier fraction, which enters the success
    # probability at the 6th power (ops/pnp.ransac_pnp)
    mm = matching.match(frame.desc, frame.valid, m.pt_desc[pt_safe], ok_t,
                        cfg.matcher, max_dist=cfg.matcher.th_high,
                        mutual=True,
                        angle_q=frame.angle, angle_t=m.kf_angle[cand_kf])
    kp_pt = jnp.where(mm.valid, pt_safe[jnp.maximum(mm.idx, 0)], -1)
    ok = kp_pt >= 0
    X = m.pt_pos[jnp.maximum(kp_pt, 0)]
    res_pnp = pnp.ransac_pnp(cam, X, frame.uv, ok, key)
    res = pose_opt.optimize_pose(cam, res_pnp.T, X, frame.uv,
                                 ok & res_pnp.inliers, frame.inv_sigma2,
                                 cfg.tracker)
    kp_pt = jnp.where(res.inliers, kp_pt, -1)

    # candidate's local map: points seen by the candidate's covisible window
    # (the reference's SearchByProjection over sFound complement,
    # Tracking.cc:1427-1465)
    P = m.pt_pos.shape[0]
    covis = None
    from coslam_tpu.models import map_state as ms_mod
    covis = ms_mod.covisibility_row(m, cand_kf)
    local_kf = (covis >= cfg.mapper.covis_edge_threshold)
    local_kf = local_kf.at[cand_kf].set(True)
    local_kf = local_kf & m.kf_valid
    obs_ok = (m.kf_obs_pt >= 0) & m.kf_kp_valid & local_kf[:, None]
    local_pt = jnp.zeros(P, bool).at[
        jnp.maximum(m.kf_obs_pt, 0).reshape(-1)].max(obs_ok.reshape(-1))
    local_pt = local_pt & m.pt_valid

    def recovery_round(T_in, kp_pt_in, radius):
        uv_pred, z = _project_points(cam, T_in, m.pt_pos)
        vis = (local_pt & (z > 0.1)
               & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cam.width)
               & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cam.height))
        free_kp = frame.valid & (kp_pt_in < 0)
        mm2 = matching.match_windowed(
            m.pt_desc, uv_pred, radius, vis, frame.desc, frame.uv, free_kp,
            cfg.matcher, max_dist=cfg.matcher.th_high, mutual=True)
        add = _scatter_assoc(frame.uv.shape[0], mm2,
                             jnp.arange(P, dtype=jnp.int32))
        kp2 = jnp.where(kp_pt_in >= 0, kp_pt_in, add)
        okr = kp2 >= 0
        Xr = m.pt_pos[jnp.maximum(kp2, 0)]
        r = pose_opt.optimize_pose(cam, T_in, Xr, frame.uv, okr,
                                   frame.inv_sigma2, cfg.tracker)
        return r.T, jnp.where(r.inliers, kp2, -1), r.n_inliers

    # round 1 (window 10) only helps when the PnP pose is sane but starved
    T1, kp1, n1 = recovery_round(res.T, kp_pt, jnp.float32(10.0))
    use1 = (res.n_inliers >= 6) & (n1 > res.n_inliers)
    T1 = jnp.where(use1, T1, res.T)
    kp1 = jnp.where(use1, kp1, kp_pt)
    n1 = jnp.where(use1, n1, res.n_inliers)
    # round 2 (window 3) when still short of the acceptance gate
    T2, kp2, n2 = recovery_round(T1, kp1, jnp.float32(3.0))
    use2 = (n1 > 30) & (n1 < cfg.tracker.min_inliers_reloc) & (n2 > n1)
    T_f = jnp.where(use2, T2, T1)
    kp_f = jnp.where(use2, kp2, kp1)
    n_f = jnp.where(use2, n2, n1)

    return TrackResult(T=T_f, kp_pt=kp_f, n_matches=ok.sum(),
                       n_inliers=n_f,
                       ref_kf=jnp.asarray(cand_kf, jnp.int32))


@functools.partial(jax.jit, static_argnums=(0,))
def track_local_map(cfg: SystemConfig, m: MapState, frame: Frame,
                    T_init, kp_pt_init):
    return _local_map_body(cfg, m, frame, T_init, kp_pt_init)


def _local_map_body(cfg: SystemConfig, m: MapState, frame: Frame,
                    T_init, kp_pt_init):
    """Reference TrackLocalMap (Tracking.cc:932): project *all* valid map
    points, gate by frustum / distance range / viewing angle, match
    unassociated keypoints, then a final motion-only BA over the union of
    associations.

    The reference restricts to points of covisible keyframes; with masked
    whole-map projection the restriction is unnecessary — the frustum and
    scale gates do the same pruning in one shot.
    """
    cam = cfg.camera
    scale_f = cfg.extractor.scale_factor
    n_levels = cfg.extractor.n_levels
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)

    uv_pred, z = _project_points(cam, T_init, m.pt_pos)
    C = -_he("ji,j->i", T_init[:3, :3], T_init[:3, 3])
    rays = m.pt_pos - C
    dist = jnp.linalg.norm(rays, axis=1) + 1e-9
    # frustum + scale-range + viewing-direction gates (Frame::isInFrustum,
    # Frame.cc:270-327: 0.8/1.2 distance band, cos > 0.5)
    min_dist = m.pt_max_dist / (scale_f ** (n_levels - 1))
    view_cos = jnp.sum(rays * m.pt_normal, 1) / dist
    visible = (m.pt_valid & (z > 0.1)
               & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cam.width)
               & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cam.height)
               & (dist >= 0.8 * min_dist) & (dist <= 1.2 * m.pt_max_dist * 1.25)
               & (view_cos > 0.5))

    # predicted octave from distance (MapPoint::PredictScale, MapPoint.cc:385)
    ratio = jnp.maximum(m.pt_max_dist / dist, 1e-6)
    pred_level = jnp.clip(jnp.ceil(jnp.log(ratio) / jnp.log(scale_f)),
                          0, n_levels - 1).astype(jnp.int32)
    r = 4.0 * scales[pred_level]
    # don't re-match keypoints already associated by motion tracking
    free_kp = frame.valid & (kp_pt_init < 0)
    # fused whole-map projection search: at 32k landmarks the (P, N) mask
    # matrices of the naive formulation dominate HBM traffic; the Pallas
    # kernel streams target blocks through VMEM instead
    mm = matching.match_windowed(
        m.pt_desc, uv_pred, r, visible, frame.desc, frame.uv, free_kp,
        cfg.matcher, level_q=pred_level, level_t=frame.level,
        level_lo=-1, level_hi=1, max_dist=cfg.matcher.th_high,
        ratio=0.8, mutual=True)
    P = m.pt_pos.shape[0]
    new_assoc = _scatter_assoc(frame.uv.shape[0], mm,
                               jnp.arange(P, dtype=jnp.int32))
    kp_pt = jnp.where(kp_pt_init >= 0, kp_pt_init, new_assoc)

    ok = kp_pt >= 0
    Xf = m.pt_pos[jnp.maximum(kp_pt, 0)]
    res = pose_opt.optimize_pose(cam, T_init, Xf, frame.uv, ok,
                                 frame.inv_sigma2, cfg.tracker)
    kp_pt = jnp.where(res.inliers, kp_pt, -1)

    # visibility / found statistics for culling (MapPoint mnVisible/mnFound)
    # — committed only when the pose actually tracked: a frame the System
    # declares LOST must not poison found/visible ratios with counts from a
    # garbage pose (repeated lost frames would cull healthy landmarks)
    tracked_ok = res.n_inliers >= 10
    pt_visible = m.pt_visible + jnp.where(tracked_ok,
                                          visible.astype(jnp.int32), 0)
    found = jnp.zeros(P, jnp.int32).at[jnp.maximum(kp_pt, 0)].add(
        (kp_pt >= 0).astype(jnp.int32))
    pt_found = m.pt_found + jnp.where(tracked_ok, found, 0)
    m = m._replace(pt_visible=pt_visible, pt_found=pt_found)

    # reference keyframe: the KF observing the most of this frame's tracked
    # landmarks (Tracking::UpdateLocalKeyFrames pKFmax, Tracking.cc:1169);
    # one (P,)-indicator gather over the (K, N) association table
    tracked = jnp.zeros(P, jnp.float32).at[jnp.maximum(kp_pt, 0)].add(
        (kp_pt >= 0).astype(jnp.float32))
    shared = jnp.where(m.kf_kp_valid & (m.kf_obs_pt >= 0),
                       tracked[jnp.maximum(m.kf_obs_pt, 0)], 0.0).sum(1)
    shared = jnp.where(m.kf_valid, shared, -1.0)
    ref_kf = jnp.argmax(shared).astype(jnp.int32)

    # nRefMatches = reference KF's landmarks with >= nMinObs observations
    # (Tracking.cc:985-990, nMinObs = 3, or 2 while the map has <= 2 KFs)
    from coslam_tpu.models import map_state as ms_mod
    pobs = ms_mod.point_obs_count(m)
    min_obs = jnp.where(m.n_kf <= 2, 2, 3)
    row = m.kf_obs_pt[ref_kf]
    row_ok = (row >= 0) & m.kf_kp_valid[ref_kf] \
        & m.pt_valid[jnp.maximum(row, 0)]
    n_ref = (row_ok & (pobs[jnp.maximum(row, 0)] >= min_obs)).sum()

    return TrackResult(T=res.T, kp_pt=kp_pt,
                       n_matches=(kp_pt >= 0).sum(),
                       n_inliers=res.n_inliers, ref_kf=ref_kf,
                       n_ref_matches=n_ref.astype(jnp.int32)), m


def _ref_kf_body(cfg: SystemConfig, m: MapState, frame: Frame, ref_kf,
                 T_init) -> TrackResult:
    """TrackReferenceKeyFrame (reference Tracking.cc:759): descriptor-match
    the frame against the reference keyframe's LANDMARK-carrying keypoints
    (the reference's SearchByBoW with 0.7 ratio), then pose-optimize from
    the last pose — the fallback between a failed motion model and full
    relocalization."""
    cam = cfg.camera
    pt = m.kf_obs_pt[ref_kf]
    pt_safe = jnp.maximum(pt, 0)
    ok_t = (pt >= 0) & m.kf_kp_valid[ref_kf] & m.pt_valid[pt_safe]
    mm = matching.match(frame.desc, frame.valid, m.pt_desc[pt_safe], ok_t,
                        cfg.matcher, max_dist=cfg.matcher.th_low,
                        ratio=0.7, mutual=True,
                        angle_q=frame.angle, angle_t=m.kf_angle[ref_kf])
    kp_pt = jnp.where(mm.valid, pt_safe[jnp.maximum(mm.idx, 0)], -1)
    ok = kp_pt >= 0
    X = m.pt_pos[jnp.maximum(kp_pt, 0)]
    res = pose_opt.optimize_pose(cam, T_init, X, frame.uv, ok,
                                 frame.inv_sigma2, cfg.tracker)
    kp_pt = jnp.where(res.inliers, kp_pt, -1)
    return TrackResult(T=res.T, kp_pt=kp_pt, n_matches=ok.sum(),
                       n_inliers=res.n_inliers,
                       ref_kf=jnp.asarray(ref_kf, jnp.int32))


def _track_body(cfg: SystemConfig, m: MapState, frame: Frame,
                last_kp_pt, last_level, T_pred, radius, ref_kf=None):
    # motion model + wide-window retry (Tracking.cc:905) as a scan over the
    # two radii: the motion-body HLO is instantiated ONCE (a lax.cond would
    # inline it twice and double its compile cost); the second pass's result
    # is kept only when the first fell below the match gate
    N = frame.uv.shape[0]
    dummy = TrackResult(T=T_pred, kp_pt=jnp.full(N, -1, jnp.int32),
                        n_matches=jnp.asarray(0, jnp.int32),
                        n_inliers=jnp.asarray(-1, jnp.int32))

    def body(carry, r):
        res = _motion_body(cfg, m, frame, last_kp_pt, last_level, T_pred, r)
        take = carry.n_inliers < cfg.tracker.min_matches_motion
        new = jax.tree.map(lambda a, b: jnp.where(take, b, a), carry, res)
        return new, None

    res1, _ = jax.lax.scan(body, dummy,
                           jnp.stack([radius, 2.0 * radius]))

    if ref_kf is not None:
        # TrackReferenceKeyFrame fallback (Tracking.cc:354-363: motion-model
        # FAILURE falls back to the reference keyframe BEFORE
        # relocalization).  The reference's motion-model success criterion
        # is nmatchesMap >= 10 AFTER the pose optimization (Tracking.cc:926)
        # — not the pre-opt 20-match retry gate — so the fallback fires only
        # below 10 inliers, and keeps whichever result tracks better (a
        # marginal motion result must not be replaced by a worse ref-KF
        # match).  lax.cond keeps the matcher+pose-opt off the steady path.
        def fb(_):
            r = _ref_kf_body(cfg, m, frame, jnp.maximum(ref_kf, 0), T_pred)
            better = r.n_inliers > res1.n_inliers
            out = jax.tree.map(
                lambda a, b: jnp.where(better, b, a),
                TrackResult(T=res1.T, kp_pt=res1.kp_pt,
                            n_matches=res1.n_matches,
                            n_inliers=res1.n_inliers, ref_kf=res1.ref_kf,
                            n_ref_matches=res1.n_ref_matches),
                TrackResult(T=r.T, kp_pt=r.kp_pt, n_matches=r.n_matches,
                            n_inliers=r.n_inliers, ref_kf=r.ref_kf,
                            n_ref_matches=res1.n_ref_matches))
            return out
        need_fb = (res1.n_inliers < 10) & (ref_kf >= 0)
        res1 = jax.lax.cond(need_fb, fb, lambda _: res1, None)

    res2, m = _local_map_body(cfg, m, frame, res1.T, res1.kp_pt)
    return res1.n_inliers, res2, m


class ChunkCarry(NamedTuple):
    """Device-resident tracking state carried across frames of a chunk —
    the state the reference Tracking object keeps between GrabImage calls
    (mVelocity, mLastFrame's pose and map-point bindings, counters)."""
    T: jnp.ndarray            # (4, 4) f32 last tracked pose
    vel: jnp.ndarray          # (4, 4) f32 constant-velocity model
    has_vel: jnp.ndarray      # () bool
    kp_pt: jnp.ndarray        # (N,) i32 last frame's landmark bindings
    level: jnp.ndarray        # (N,) i32 last frame's keypoint octaves
    frames_since_kf: jnp.ndarray  # () i32
    ref_kf: jnp.ndarray       # () i32 reference keyframe (fallback target)
    pt_visible: jnp.ndarray   # (P,) i32 running visibility stats
    pt_found: jnp.ndarray     # (P,) i32


class ChunkStep(NamedTuple):
    """Per-frame outputs of a chunk (small; ONE bundled host transfer per
    chunk replaces per-frame scalar readbacks)."""
    T: jnp.ndarray            # (C, 4, 4)
    # trajectory anchor T @ kf_pose[ref_kf]^-1, computed ON DEVICE against
    # the poses this chunk actually tracked — spares the host a per-chunk
    # sync of the whole keyframe pose table (46 ms RTT on a remote chip)
    T_rel: jnp.ndarray        # (C, 4, 4)
    n_inliers: jnp.ndarray    # (C,) i32
    ref_kf: jnp.ndarray       # (C,) i32
    n_ref_matches: jnp.ndarray  # (C,) i32
    need_kf: jnp.ndarray      # (C,) bool
    ok: jnp.ndarray           # (C,) bool (False = this frame is LOST)


@functools.partial(jax.jit, static_argnums=(0, 3))
def track_chunk(cfg: SystemConfig, m: MapState, imgs, allow_kf: bool,
                carry: ChunkCarry, aux_imgs=None, mapper_latency=None):
    """Steady-state tracking of a CHUNK of frames in ONE device dispatch.

    The reference decouples its tracker from its mapper with threads
    (System.cc:92-102): tracking never blocks on the backend, and the map a
    frame tracks against may lag by the mapper's latency.  The TPU analogue
    is this program: `lax.scan` over C frames — ORB extraction
    (Frame.cc:174), motion-model + local-map tracking (Tracking.cc:869,932)
    and the NeedNewKeyFrame gate (Tracking.cc:979) all on device, with the
    constant-velocity state carried between frames — followed by at most one
    keyframe insertion on the host.  Frames after the keyframe-flagged one
    track against the pre-insertion map, exactly the reference's bounded
    tracker/mapper asynchrony (new landmarks are picked up on the next chunk
    by TrackLocalMap's whole-map projection).

    `aux_imgs` carries the depth sensor's per-frame data — (C, H, W) depth
    images for RGB-D, (C, H, W) right images for stereo — so the close-
    point keyframe policy (bNeedToInsertClose, reference
    Tracking.cc:1005-1037) evaluates per frame exactly as the reference's,
    and the flagged keyframe's per-keypoint depth is already on device for
    insertion (no recompute).

    Returns (new_carry, per-step outputs, stacked Frames, per-step kp_pt,
    vis/found snapshots, per-step kp_depth).  The System reads back ONE
    small pytree per chunk; the keyframe frame's data stays on device.
    """
    from coslam_tpu.models.frame import build_frame
    from coslam_tpu.ops import stereo as stereo_ops

    tr = cfg.tracker
    cam = cfg.camera
    mono = cfg.sensor == "mono"
    ratio_n = tr.ref_ratio_mono if mono else 0.75
    eye = jnp.eye(4, dtype=jnp.float32)
    N = cfg.extractor.max_keypoints
    depth_th = (cam.bf / cam.fx) * cam.depth_th_factor if cam.bf > 0 else 8.0

    def step(c: ChunkCarry, xs):
        img, aux = xs if aux_imgs is not None else (xs, None)
        frame = build_frame(img, cfg)
        if cfg.sensor == "rgbd":
            sd = stereo_ops.rgbd_depth(cam, frame.uv, frame.valid, aux)
            kp_depth = sd.depth
        elif cfg.sensor == "stereo":
            from coslam_tpu.ops import orb as orb_ops
            kpsR = orb_ops.extract(aux, cfg.extractor)
            kpsL = {"uv": frame.uv, "level": frame.level,
                    "desc": frame.desc, "valid": frame.valid}
            sd = stereo_ops.match_stereo(cam, cfg.extractor, cfg.matcher,
                                         kpsL, kpsR, img, aux)
            kp_depth = sd.depth
        else:
            kp_depth = jnp.zeros(N, jnp.float32)
        T_pred = jnp.where(c.has_vel, c.vel @ c.T, c.T)
        radius = jnp.where(c.has_vel, jnp.float32(15.0), jnp.float32(30.0))
        m_c = m._replace(pt_visible=c.pt_visible, pt_found=c.pt_found)
        _n1, res, m2 = _track_body(cfg, m_c, frame, c.kp_pt, c.level,
                                   T_pred, radius, ref_kf=c.ref_kf)
        ok = res.n_inliers >= 10
        T_new = jnp.where(ok, res.T, T_pred)
        vel_new = T_new @ geo.se3_inverse(c.T)
        fs = c.frames_since_kf + 1

        # NeedNewKeyFrame (Tracking.cc:979-1063); the synchronous mapper is
        # always "idle", so c1b reduces to the min_frames floor
        n_ref = res.n_ref_matches
        # mono is unconditionally 0.9; the 0.4 single-keyframe override is
        # depth-sensor-only (reference Tracking.cc:1022-1028)
        if mono:
            ratio = jnp.float32(ratio_n)
            need_close = False
        else:
            ratio = jnp.where(m.n_kf < 2, jnp.float32(0.4),
                              jnp.float32(ratio_n))
            # bNeedToInsertClose (Tracking.cc:1005-1020): tracked close
            # points scarce while insertable close points abound
            close = (kp_depth > 0.05) & (kp_depth < depth_th) & frame.valid
            tracked_close = (close & (res.kp_pt >= 0)).sum()
            nontracked_close = (close & (res.kp_pt < 0)).sum()
            need_close = (tracked_close < 100) & (nontracked_close > 70)
        c1a = fs >= tr.max_frames
        c1b = fs >= tr.min_frames
        c1c = (not mono) & ((res.n_inliers < 0.25 * n_ref) | need_close)
        c2 = ((res.n_inliers < n_ref * ratio) | need_close) \
            & (res.n_inliers > 15)
        need = allow_kf & ok & (c1a | c1b | c1c) & c2
        if mono:
            # bLocalMappingIdle throttle (Tracking.cc:1041-1059): mono
            # inserts only when the mapper is idle; model the mapper's
            # cycle time as a minimum inter-keyframe gap.  `mapper_latency`
            # (traced) carries the MEASURED backend cycle converted to
            # frames (System._mapper_latency); None falls back to the
            # static config constant (tests / explicit overrides)
            lat = (jnp.asarray(tr.mapper_latency_frames, jnp.int32)
                   if mapper_latency is None else mapper_latency)
            need = need & (fs >= lat)
        # the in-chunk gate models the insertion it just flagged: reset the
        # inter-keyframe counter so subsequent in-chunk flags respect the
        # throttle (the host inserts at the FIRST flag and splices up to
        # the next one)
        fs = jnp.where(need, 0, fs)

        c_new = ChunkCarry(
            T=T_new, vel=jnp.where(ok, vel_new, eye),
            has_vel=ok,
            kp_pt=jnp.where(ok, res.kp_pt, -1),
            level=frame.level, frames_since_kf=fs,
            ref_kf=jnp.where(ok, res.ref_kf, c.ref_kf).astype(jnp.int32),
            pt_visible=m2.pt_visible, pt_found=m2.pt_found)
        T_rel = T_new @ geo.se3_inverse(
            m.kf_pose[jnp.clip(res.ref_kf, 0, m.kf_pose.shape[0] - 1)])
        out = ChunkStep(T=T_new, T_rel=T_rel, n_inliers=res.n_inliers,
                        ref_kf=res.ref_kf,
                        n_ref_matches=n_ref, need_kf=need, ok=ok)
        # per-step visibility-stat snapshots let the host restore the map's
        # counters at ANY cut index (cut-at-keyframe semantics), keeping
        # MapPointCulling's found/visible ratios per-frame-exact
        return c_new, (out, frame, jnp.where(ok, res.kp_pt, -1),
                       m2.pt_visible, m2.pt_found, kp_depth)

    xs = imgs if aux_imgs is None else (imgs, aux_imgs)
    carry2, (steps, frames, kp_pts, vis_snap, found_snap, kp_depths) = \
        jax.lax.scan(step, carry, xs)
    return carry2, steps, frames, kp_pts, vis_snap, found_snap, kp_depths


@jax.jit
def chain_carry_after_insert(carry_in: ChunkCarry, m2: MapState, T_chunk,
                             kp_pts, levels, j1, last, kf_i,
                             fs) -> ChunkCarry:
    """Build the next chunk's carry after an ASYNC keyframe insert with
    ZERO host readbacks from the insert.

    The keyframe's windowed local BA shifts the map (its own pose moves
    from the raw tracked pose T_chunk[j1] to m2.kf_pose[kf_i]); every pose
    expressed in the pre-insert frame must be right-multiplied by
    corr = T_raw^-1 @ T_post.  The constant-velocity model is invariant
    under this global shift ((T_n corr)(T_{n-1} corr)^-1 = T_n T_{n-1}^-1).
    `last` is the final accepted frame of the chunk; when it IS the
    keyframe, tracking continues from the keyframe's post-backend
    observation row (the per-frame handoff, with fresh triangulations);
    otherwise from the accepted suffix frame's bindings (fused-away
    landmarks are dropped by the next chunk's pt_valid gate).  This is the
    device-side analogue of the reference's tracker continuing against the
    mapper-adjusted map without synchronization (LocalMapping.cc:47 runs
    while Tracking tracks)."""
    corr = geo.se3_inverse(T_chunk[j1]) @ m2.kf_pose[kf_i]
    T = T_chunk[last] @ corr       # == m2.kf_pose[kf_i] when last == j1
    prev = jnp.where(last > 0, T_chunk[jnp.maximum(last - 1, 0)],
                     carry_in.T)
    vel = T_chunk[last] @ geo.se3_inverse(prev)   # pre-shift pair: invariant
    at_kf = last == j1
    kp_pt = jnp.where(at_kf, m2.kf_obs_pt[kf_i], kp_pts[last])
    return ChunkCarry(
        T=T, vel=vel, has_vel=jnp.asarray(True),
        kp_pt=kp_pt, level=levels[last],
        frames_since_kf=jnp.asarray(fs, jnp.int32),
        ref_kf=jnp.asarray(kf_i, jnp.int32),
        pt_visible=m2.pt_visible, pt_found=m2.pt_found)


@functools.partial(jax.jit, static_argnums=(0,))
def track_frame_built(cfg: SystemConfig, m: MapState, frame: Frame,
                      last_kp_pt, last_level, T_pred, radius,
                      ref_kf=None):
    """The per-frame tracking pipeline after Frame construction as ONE
    jitted program: TrackWithMotionModel with its wide-window retry
    (Tracking.cc:869-905, the retry as lax.cond on the inlier count), then
    TrackLocalMap (Tracking.cc:932).  The System's host loop only reads two
    scalars back (motion inliers, final inliers) for its state machine.

    Frame construction (ORB extraction) deliberately stays a SEPARATE jitted
    program shared by every caller (initialization, relocalization, stereo/
    RGB-D depth preparation): fusing it here would compile the extractor HLO
    a second time, and on backends with slow (remote) compilation the
    extractor is the single most expensive graph to build.  Two dispatches
    per frame instead of one costs microseconds; a duplicated extractor
    compile costs minutes.
    """
    return _track_body(cfg, m, frame, last_kp_pt, last_level, T_pred,
                       radius, ref_kf=ref_kf)
