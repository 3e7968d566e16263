"""Local mapping stages: keyframe insertion, new-point triangulation,
point-geometry refresh, culling, local BA.

TPU reformulation of the reference LocalMapping thread (ORB_SLAM2/src/
LocalMapping.cc): ProcessNewKeyFrame (:128), CreateNewMapPoints (:207),
MapPointCulling (:170), and the local-BA call (:~Optimizer.cc:453).  All
stages are pure MapState -> MapState functions; the queue/mutex machinery of
the reference dissolves (SURVEY.md 2.5 P1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import SystemConfig
from coslam_tpu.models.frame import Frame
from coslam_tpu.models import map_state as ms
from coslam_tpu.ops import matching
from coslam_tpu.optim import ba
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

def _n_neighbors(cfg: SystemConfig) -> int:
    """Covisible neighbor pairs per insertion — the reference's nn=20 mono
    (LocalMapping.cc:210-212), clamped to the keyframe capacity.  The
    neighbor loop is a lax.scan, so widening it costs device time only (the
    pair body is instantiated once in the HLO)."""
    return max(1, min(cfg.mapper.triangulation_neighbors,
                      cfg.mapper.max_keyframes - 1))


@functools.partial(jax.jit, static_argnums=(0,))
def insert_keyframe(cfg: SystemConfig, m: ms.MapState, frame: Frame,
                    T, frame_id, kp_pt) -> Tuple[ms.MapState, jnp.ndarray]:
    """Write the frame into the next keyframe slot with its tracked
    associations (reference Tracking::CreateNewKeyFrame, Tracking.cc:1065 +
    LocalMapping::ProcessNewKeyFrame, LocalMapping.cc:128)."""
    k = m.n_kf
    safe_pt = jnp.maximum(kp_pt, 0)
    assoc = (kp_pt >= 0) & frame.valid & m.pt_valid[safe_pt]
    m = m._replace(
        kf_pose=m.kf_pose.at[k].set(T),
        kf_valid=m.kf_valid.at[k].set(True),
        kf_frame_id=m.kf_frame_id.at[k].set(frame_id),
        kf_uv=m.kf_uv.at[k].set(frame.uv),
        kf_level=m.kf_level.at[k].set(frame.level),
        kf_angle=m.kf_angle.at[k].set(frame.angle),
        kf_desc=m.kf_desc.at[k].set(frame.desc),
        kf_kp_valid=m.kf_kp_valid.at[k].set(frame.valid),
        kf_obs_pt=m.kf_obs_pt.at[k].set(jnp.where(assoc, kp_pt, -1)),
        n_kf=m.n_kf + 1,
    )
    return m, k


def _fundamental_12(cam, T1, T2):
    """F12 with x2^T F12 x1 = 0 for pixel coords (reference
    LocalMapping::ComputeF12, LocalMapping.cc:536)."""
    K = jnp.array(cam.K, jnp.float32)
    T21 = T2 @ geo.se3_inverse(T1)
    R, t = T21[:3, :3], T21[:3, 3]
    E = geo.hat(t) @ R
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


def _triangulate_pair(cam, T1, T2, uv1, uv2):
    """Two-view DLT (reference LocalMapping.cc:339-345 / Initializer::
    Triangulate) solved INHOMOGENEOUSLY: with x = (X, 1) the 4x2x4 system
    A x = 0 becomes A[:, :3] X = -A[:, 3], whose 3x3 normal equations have
    a closed-form inverse — no batched eigendecomposition (eigh's QR
    iterations are the slow path on TPU; points at infinity, where the
    homogeneous form would matter, are rejected by the depth/parallax
    checks downstream anyway)."""
    K = jnp.array(cam.K, jnp.float32)
    P1 = _he("ij,jk->ik", K, T1[:3, :])
    P2 = _he("ij,jk->ik", K, T2[:3, :])

    def rows(P, uv):
        return jnp.stack([uv[:, 0, None] * P[2] - P[0],
                          uv[:, 1, None] * P[2] - P[1]], 1)

    A = jnp.concatenate([rows(P1, uv1), rows(P2, uv2)], 1)   # (N, 4, 4)
    A3 = A[:, :, :3]
    a4 = A[:, :, 3]
    AtA = _he("nmi,nmj->nij", A3, A3)
    Atb = -_he("nmi,nm->ni", A3, a4)
    from coslam_tpu.optim.ba import _inv3
    return _he("nij,nj->ni", _inv3(AtA + 1e-10 * jnp.eye(3)), Atb)


@functools.partial(jax.jit, static_argnums=(0,))
def create_map_points(cfg: SystemConfig, m: ms.MapState, kf_id) -> ms.MapState:
    """Triangulate new landmarks between the new keyframe and its best
    covisible neighbors (reference LocalMapping::CreateNewMapPoints,
    LocalMapping.cc:207-453: epipolar-gated descriptor matching, DLT
    triangulation, parallax/cheirality/reprojection/scale checks).

    All nn neighbor pairs are matched/triangulated/checked in ONE vmapped
    batch (the reference's sequential per-neighbor loop serializes nn
    (N, N) matcher passes; batching feeds the MXU one (nn, N, N) pass).
    A keypoint matched by several neighbors keeps its FIRST (most
    covisible) neighbor's triangulation — the same winner the sequential
    loop would keep, since earlier iterations consumed the keypoint."""
    cam = cfg.camera
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)
    sigma2 = jnp.asarray(cfg.extractor.level_sigma2, jnp.float32)
    covis = ms.covisibility_row(m, kf_id)             # (K,)
    _, neighbors = jax.lax.top_k(covis, _n_neighbors(cfg))
    nb_ok = jnp.take(covis, neighbors) >= cfg.mapper.covis_edge_threshold

    T1 = m.kf_pose[kf_id]
    uv1 = m.kf_uv[kf_id]
    lvl1 = m.kf_level[kf_id]
    C1 = -_he("ji,j->i", T1[:3, :3], T1[:3, 3])
    free1 = m.kf_kp_valid[kf_id] & (m.kf_obs_pt[kf_id] < 0)

    # median scene depth is neighbor-pose-dependent but point-set-shared;
    # compute all camera-frame depths once (Nn, P) then median per neighbor
    zs_valid = m.pt_valid

    def per_neighbor(k2, pair_ok_in):
        pair_ok = pair_ok_in & m.kf_valid[k2]
        T2 = m.kf_pose[k2]
        uv2 = m.kf_uv[k2]
        lvl2 = m.kf_level[k2]
        free2 = m.kf_kp_valid[k2] & (m.kf_obs_pt[k2] < 0)
        C2 = -_he("ji,j->i", T2[:3, :3], T2[:3, 3])
        baseline = jnp.linalg.norm(C2 - C1)

        # median scene depth of neighbor (baseline check, LocalMapping.cc:237)
        pc2_all = geo.transform_points(T2, m.pt_pos)
        z2v = jnp.where(zs_valid, pc2_all[:, 2], jnp.nan)
        med_depth = jnp.nanmedian(z2v)
        pair_ok = pair_ok & (baseline / jnp.maximum(med_depth, 1e-6) > 0.01)

        # epipolar gate: distance of kp2 from line F12 x1
        F12 = _fundamental_12(cam, T1, T2)
        ones = jnp.ones((uv1.shape[0], 1), jnp.float32)
        l2 = jnp.concatenate([uv1, ones], 1) @ F12.T        # (N, 3)
        p2h = jnp.concatenate([uv2, ones], 1)               # (N, 3)
        num = (l2 @ p2h.T) ** 2                             # (N, N)
        den = (l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None] + 1e-12
        epi_ok = num / den < 3.84 * sigma2[lvl2][None, :]

        mm = matching.match(
            m.kf_desc[kf_id], free1, m.kf_desc[k2], free2, cfg.matcher,
            mask=epi_ok, max_dist=cfg.matcher.th_low, mutual=True,
            angle_q=m.kf_angle[kf_id], angle_t=m.kf_angle[k2])

        idx2 = jnp.maximum(mm.idx, 0)
        X = _triangulate_pair(cam, T1, T2, uv1, uv2[idx2])
        # checks (LocalMapping.cc:285-445)
        pc1 = geo.transform_points(T1, X)
        pc2 = geo.transform_points(T2, X)
        z1, z2 = pc1[:, 2], pc2[:, 2]

        def reproj_err(pc, uv_obs):
            zz = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
            u = pc[:, 0] / zz * cam.fx + cam.cx
            v = pc[:, 1] / zz * cam.fy + cam.cy
            return (u - uv_obs[:, 0]) ** 2 + (v - uv_obs[:, 1]) ** 2

        e1 = reproj_err(pc1, uv1)
        e2 = reproj_err(pc2, uv2[idx2])
        r1 = X - C1
        r2 = X - C2
        d1 = jnp.linalg.norm(r1, axis=1) + 1e-9
        d2 = jnp.linalg.norm(r2, axis=1) + 1e-9
        cos_par = jnp.sum(r1 * r2, 1) / (d1 * d2)
        ratio_dist = d2 / d1
        ratio_octave = scales[lvl1] / scales[lvl2[idx2]]
        scale_ok = (ratio_dist < ratio_octave * 1.5 * cfg.extractor.scale_factor) \
            & (ratio_dist * 1.5 * cfg.extractor.scale_factor > ratio_octave)

        good = (pair_ok & mm.valid & jnp.all(jnp.isfinite(X), 1)
                & (z1 > 0) & (z2 > 0)
                & (cos_par < cfg.mapper.min_parallax_cos)
                & (e1 < 5.991 * sigma2[lvl1]) & (e2 < 5.991 * sigma2[lvl2[idx2]])
                & scale_ok)
        normal = (r1 / d1[:, None] + r2 / d2[:, None])
        normal = normal / (jnp.linalg.norm(normal, axis=1, keepdims=True)
                           + 1e-9)
        return idx2, X, good, normal, d1 * scales[lvl1]

    idx2_b, X_b, good_b, normal_b, maxd_b = jax.vmap(per_neighbor)(
        neighbors, nb_ok)                              # (Nn, N, ...)

    # first (most covisible) neighbor with a good triangulation wins
    Nn, N = good_b.shape
    nb_rank = jnp.where(good_b, jnp.arange(Nn)[:, None], Nn)
    win = jnp.argmin(nb_rank, axis=0)                  # (N,)
    chosen = jnp.take_along_axis(good_b, win[None], 0)[0]        # (N,)

    def pick(arr):
        return jnp.take_along_axis(
            arr, win[None].reshape((1, N) + (1,) * (arr.ndim - 2)), 0)[0]

    X = pick(X_b)
    normal = pick(normal_b)
    max_dist = jnp.take_along_axis(maxd_b, win[None], 0)[0]
    idx2 = jnp.take_along_axis(idx2_b, win[None], 0)[0]
    k2_win = neighbors[win]                            # (N,)

    # single slot allocation for every chosen keypoint
    P = m.pt_pos.shape[0]
    pos = jnp.cumsum(chosen.astype(jnp.int32)) - 1
    slot = m.n_pt + pos
    can = chosen & (slot < P)
    slot_safe = jnp.where(can, slot, P)

    def sc(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        big = jnp.concatenate([arr, pad])
        big = big.at[slot_safe].set(
            jnp.where(can.reshape((-1,) + (1,) * (vals.ndim - 1)),
                      vals, big[slot_safe]))
        return big[:-1]

    n = N
    m = m._replace(
        pt_pos=sc(m.pt_pos, X),
        pt_valid=sc(m.pt_valid, can),
        pt_desc=sc(m.pt_desc, m.kf_desc[kf_id]),
        pt_normal=sc(m.pt_normal, normal),
        pt_max_dist=sc(m.pt_max_dist, max_dist),
        pt_ref_kf=sc(m.pt_ref_kf, jnp.full(n, 0, jnp.int32) + kf_id),
        pt_first_kf=sc(m.pt_first_kf, jnp.full(n, 0, jnp.int32) + m.n_kf),
        pt_visible=sc(m.pt_visible, jnp.ones(n, jnp.int32)),
        pt_found=sc(m.pt_found, jnp.ones(n, jnp.int32)),
        n_pt=jnp.minimum(m.n_pt + can.sum(), P),
    )
    new_id = jnp.where(can, slot, -1).astype(jnp.int32)
    row1 = jnp.where(can, new_id, m.kf_obs_pt[kf_id])
    m = m._replace(kf_obs_pt=m.kf_obs_pt.at[kf_id].set(row1))
    # neighbor associations: scatter (winning neighbor row, matched kp2)
    K2, N2 = m.kf_obs_pt.shape
    flat = m.kf_obs_pt.reshape(-1)
    tgt = jnp.where(can, k2_win * N2 + idx2, K2 * N2)
    flat = jnp.concatenate([flat, jnp.full(1, -1, jnp.int32)])
    # only bind the neighbor keypoint if it is still free
    cur = flat[jnp.minimum(tgt, K2 * N2)]
    write = can & (cur < 0)
    flat = flat.at[jnp.where(write, tgt, K2 * N2)].set(
        jnp.where(write, new_id, -1))[:-1]
    return m._replace(kf_obs_pt=flat.reshape(K2, N2))


@functools.partial(jax.jit, static_argnums=(0,))
def cull_points(cfg: SystemConfig, m: ms.MapState) -> ms.MapState:
    """Recent-point culling (reference LocalMapping::MapPointCulling,
    LocalMapping.cc:170-206): drop RECENT points with found/visible ratio
    < 0.25, or too few observations within 2 keyframes of creation.

    The age gate is essential, not cosmetic: the reference only ever
    ratio-culls points still on its recent list (points older than 3
    keyframes leave mlpRecentAddedMapPoints and become immune,
    LocalMapping.cc:198-204).  Applying the ratio to ALL points mass-culls
    the far side of a loop right before closure — approaching a drifted
    revisit, old landmarks enter the predicted frustum (visible++) but
    cannot match until the loop is corrected (found stays), so their ratio
    decays exactly when loop closing needs them."""
    ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(
        m.pt_visible.astype(jnp.float32), 1.0)
    obs = ms.point_obs_count(m)
    age = m.n_kf - m.pt_first_kf
    recent = age <= 3
    bad = recent & ((ratio < cfg.mapper.culling_found_ratio)
                    | ((age >= 2) & (obs <= 2)))
    # observation-lifecycle hygiene at ANY age: when keyframe culling (or
    # fusion) erased a mature point's observations down to <= 1 keyframe,
    # the reference SetBads it (MapPoint::EraseObservation -> SetBadFlag
    # at nObs <= 2, MapPoint.cc:118-143).  Without this, repeat-lap runs
    # accumulate orphaned landmarks that keep every keyframe looking
    # non-redundant and defeat the bounded-memory equilibrium.
    bad = bad | (~recent & (obs <= 1))
    return m._replace(pt_valid=m.pt_valid & ~bad)


MEDOID_OBS = 8  # observations per landmark entering the medoid computation


def _medoid_descriptors(m: ms.MapState, obs_pt, obs_valid):
    """Per-landmark representative descriptor = the observation descriptor
    with the smallest MEDIAN Hamming distance to the landmark's other
    observations (reference MapPoint::ComputeDistinctiveDescriptors,
    MapPoint.cc:242-296), batched over all landmarks.

    The (K,N) observation table is sorted by landmark id so each landmark's
    observations are contiguous; up to MEDOID_OBS of them are gathered into
    a dense (P, M) window and an (P, M, M) packed-XOR-popcount distance cube
    selects the medoid.  Returns (desc (P, 8) u32, has (P,) bool).
    """
    K, N = m.kf_obs_pt.shape
    P = m.pt_pos.shape[0]
    M = MEDOID_OBS
    # sort observation slots by landmark (invalid -> sentinel P, sorts last)
    pt_key = jnp.where(obs_valid, obs_pt, P)
    order = jnp.argsort(pt_key)
    sorted_pt = pt_key[order]
    # each landmark's first M observations
    start = jnp.searchsorted(sorted_pt, jnp.arange(P))
    end = jnp.searchsorted(sorted_pt, jnp.arange(P), side="right")
    idx = start[:, None] + jnp.arange(M)[None, :]           # (P, M)
    within = idx < end[:, None]
    flat = order[jnp.clip(idx, 0, K * N - 1)]               # obs slot ids
    d_all = m.kf_desc.reshape(K * N, -1)
    descs = d_all[flat]                                     # (P, M, 8) u32
    # (P, M, M) Hamming via XOR + popcount on packed words
    from coslam_tpu.ops import hamming

    x = descs[:, :, None, :] ^ descs[:, None, :, :]
    pop = hamming.popcount_u32(x).sum(-1).astype(jnp.int32)  # (P, M, M)
    pair_ok = within[:, :, None] & within[:, None, :]
    BIG = jnp.int32(1 << 15)
    pop = jnp.where(pair_ok, pop, BIG)
    # median over each row's valid entries: sort ascending, pick (cnt-1)//2
    cnt = within.sum(1)                                     # (P,)
    srt = jnp.sort(pop, axis=2)
    med_idx = jnp.clip((cnt - 1) // 2, 0, M - 1)
    med = jnp.take_along_axis(
        srt, med_idx[:, None, None].repeat(M, 1), axis=2)[..., 0]  # (P, M)
    med = jnp.where(within, med, BIG)
    best_row = jnp.argmin(med, axis=1)                      # (P,)
    desc = jnp.take_along_axis(
        descs, best_row[:, None, None].repeat(descs.shape[-1], 2),
        axis=1)[:, 0, :]
    return desc, cnt > 0


@functools.partial(jax.jit, static_argnums=(0,))
def refresh_point_geometry(cfg: SystemConfig, m: ms.MapState) -> ms.MapState:
    """Recompute representative descriptor / normal / scale range from the
    current observation table (reference MapPoint::ComputeDistinctive-
    Descriptors :242 + UpdateNormalAndDepth :330, run in batch).

    Descriptor policy: median-Hamming medoid over up to MEDOID_OBS
    observations (the reference's policy; keeps the landmark's appearance
    model stable under viewpoint revisits, which loop-closure matching
    depends on).
    """
    K, N = m.kf_obs_pt.shape
    P = m.pt_pos.shape[0]
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)
    obs_kf, obs_pt, _, obs_level, obs_valid = ms.observation_coo(m)

    centers = ms.kf_centers(m)                    # (K, 3)
    rays = m.pt_pos[obs_pt] - centers[obs_kf]
    d = jnp.linalg.norm(rays, axis=1) + 1e-9
    rays_n = rays / d[:, None]
    w = obs_valid.astype(jnp.float32)
    nsum = jnp.zeros((P, 3)).at[obs_pt].add(rays_n * w[:, None])
    cnt = jnp.zeros(P).at[obs_pt].add(w)
    normal = nsum / jnp.maximum(cnt[:, None], 1.0)
    normal = normal / (jnp.linalg.norm(normal, axis=1, keepdims=True) + 1e-9)

    # latest observation -> reference keyframe + scale range; medoid over
    # the observation window -> representative descriptor
    code = jnp.where(obs_valid, obs_kf * N + (jnp.arange(K * N) % N), -1)
    best_code = jnp.full(P, -1, jnp.int32).at[obs_pt].max(code)
    has = best_code >= 0
    bk = jnp.maximum(best_code, 0) // N
    bn = jnp.maximum(best_code, 0) % N
    desc, _ = _medoid_descriptors(m, obs_pt, obs_valid)
    dist_ref = jnp.linalg.norm(m.pt_pos - centers[bk], axis=1)
    max_dist = dist_ref * scales[m.kf_level[bk, bn]]

    return m._replace(
        pt_normal=jnp.where(has[:, None], normal, m.pt_normal),
        pt_desc=jnp.where(has[:, None], desc, m.pt_desc),
        pt_max_dist=jnp.where(has, max_dist, m.pt_max_dist),
        # keep the reference keyframe fresh — loop correction moves each
        # landmark with its reference keyframe's pose change
        pt_ref_kf=jnp.where(has, bk, m.pt_ref_kf),
    )


@functools.partial(jax.jit, static_argnums=(0, 4))
def add_depth_points(cfg: SystemConfig, m: ms.MapState, kf_id,
                     kp_depth, close_only: bool = True) -> ms.MapState:
    """Create landmarks directly from sensor depth for a keyframe's
    unassociated keypoints (reference stereo/RGB-D CreateNewKeyFrame path,
    Tracking.cc:1065-1140, and StereoInitialization): backproject close
    keypoints and bind them to the keyframe."""
    from coslam_tpu.utils import camera as cam_mod

    cam = cfg.camera
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)
    # reference semantics: initialization backprojects every positive
    # depth (StereoInitialization); later keyframes only create "close"
    # points below mThDepth = bf * ThDepth / fx (Tracking.cc:105-117)
    if close_only:
        depth_th = (cam.bf / cam.fx) * cam.depth_th_factor if cam.bf > 0 \
            else 8.0
    else:
        depth_th = 1e9

    row = m.kf_obs_pt[kf_id]
    need = m.kf_kp_valid[kf_id] & (row < 0) \
        & (kp_depth > 0.05) & (kp_depth < depth_th)
    T = m.kf_pose[kf_id]
    Xc = cam_mod.backproject(cam, m.kf_uv[kf_id], kp_depth)
    Xw = geo.transform_points(geo.se3_inverse(T), Xc)

    P = m.pt_pos.shape[0]
    cum = jnp.cumsum(need.astype(jnp.int32)) - 1
    slot = m.n_pt + cum
    can = need & (slot < P)
    slot_safe = jnp.where(can, slot, P)

    def sc(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        big = jnp.concatenate([arr, pad])
        return big.at[slot_safe].set(
            jnp.where(can.reshape((-1,) + (1,) * (vals.ndim - 1)),
                      vals, big[slot_safe]))[:-1]

    C = -_he("ji,j->i", T[:3, :3], T[:3, 3])
    rays = Xw - C
    d = jnp.linalg.norm(rays, axis=1) + 1e-9
    n = Xw.shape[0]
    m = m._replace(
        pt_pos=sc(m.pt_pos, Xw),
        pt_valid=sc(m.pt_valid, can),
        pt_desc=sc(m.pt_desc, m.kf_desc[kf_id]),
        pt_normal=sc(m.pt_normal, rays / d[:, None]),
        pt_max_dist=sc(m.pt_max_dist, d * scales[m.kf_level[kf_id]]),
        pt_ref_kf=sc(m.pt_ref_kf, jnp.full(n, kf_id, jnp.int32)),
        pt_first_kf=sc(m.pt_first_kf,
                       jnp.full(n, 0, jnp.int32) + m.n_kf - 1),
        pt_visible=sc(m.pt_visible, jnp.ones(n, jnp.int32)),
        pt_found=sc(m.pt_found, jnp.ones(n, jnp.int32)),
        n_pt=jnp.minimum(m.n_pt + can.sum(), P),
    )
    new_id = jnp.where(can, slot, row)
    return m._replace(kf_obs_pt=m.kf_obs_pt.at[kf_id].set(new_id))


@functools.partial(jax.jit, static_argnums=(0,))
def fuse_into_neighbors(cfg: SystemConfig, m: ms.MapState, kf_id) -> ms.MapState:
    """Project the new keyframe's landmarks into its covisible neighbors and
    reconcile duplicates (reference LocalMapping::SearchInNeighbors,
    LocalMapping.cc:454 + ORBmatcher::Fuse :825): a matching neighbor
    keypoint that is free gains the observation; one already bound to a
    different landmark triggers a fuse keeping the better-observed one."""
    from coslam_tpu.ops import hamming

    cam = cfg.camera
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)
    covis = ms.covisibility_row(m, kf_id)
    _, neighbors = jax.lax.top_k(covis, _n_neighbors(cfg))
    nb_ok = jnp.take(covis, neighbors) >= cfg.mapper.covis_edge_threshold
    obs_count = ms.point_obs_count(m)

    # scan over neighbors: one HLO instantiation of the fuse body
    def fuse_body(m, inputs):
        k2, pair_ok_in = inputs
        src_pt = m.kf_obs_pt[kf_id]                   # (N,)
        src_ok = src_pt >= 0
        src_pt_safe = jnp.maximum(src_pt, 0)
        X = m.pt_pos[src_pt_safe]
        desc = m.pt_desc[src_pt_safe]
        pair_ok = pair_ok_in & m.kf_valid[k2]
        T2 = m.kf_pose[k2]
        pc = geo.transform_points(T2, X)
        z = pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        uv_pred = jnp.stack([pc[:, 0] / zs * cam.fx + cam.cx,
                             pc[:, 1] / zs * cam.fy + cam.cy], 1)
        ok_q = src_ok & pair_ok & (z > 0.1) & m.pt_valid[src_pt_safe]

        lvl2 = m.kf_level[k2]
        r = 3.0 * scales[lvl2]                         # per-target radius
        d2 = jnp.sum((uv_pred[:, None, :] - m.kf_uv[k2][None, :, :]) ** 2, -1)
        window = d2 <= (r * r)[None, :]
        dmat = hamming.pairwise_hamming_mxu(desc, m.kf_desc[k2])
        valid_t = m.kf_kp_valid[k2]
        dmat = jnp.where(window & ok_q[:, None] & valid_t[None, :],
                         dmat, 1 << 20)
        best = jnp.min(dmat, axis=1)
        bidx = jnp.argmin(dmat, axis=1)
        good = ok_q & (best < cfg.matcher.th_low)

        tgt_pt = m.kf_obs_pt[k2][bidx]                 # existing binding
        # free keypoint -> gain observation of src point
        N2 = m.kf_obs_pt.shape[1]
        row = m.kf_obs_pt[k2]
        add = good & (tgt_pt < 0)
        tgt_idx = jnp.where(add, bidx, N2)
        row_ext = jnp.concatenate([row, jnp.full(1, -1, jnp.int32)])
        row_ext = row_ext.at[tgt_idx].set(
            jnp.where(add, src_pt, -1), mode="drop")
        m = m._replace(kf_obs_pt=m.kf_obs_pt.at[k2].set(row_ext[:N2]))
        # bound to a different landmark -> fuse, keeping better-observed
        dup = good & (tgt_pt >= 0) & (tgt_pt != src_pt)
        keep_tgt = obs_count[jnp.maximum(tgt_pt, 0)] >= obs_count[src_pt_safe]
        pt_from = jnp.where(keep_tgt, src_pt_safe, jnp.maximum(tgt_pt, 0))
        pt_to = jnp.where(keep_tgt, jnp.maximum(tgt_pt, 0), src_pt_safe)
        from coslam_tpu.models import loop_closing as _lc
        m = _lc.fuse_landmarks(cfg, m, pt_from, pt_to, dup)
        return m, None

    m, _ = jax.lax.scan(fuse_body, m, (neighbors, nb_ok))
    return m


def fuse_map_into_keyframe(cfg: SystemConfig, m: ms.MapState,
                           kf_id) -> ms.MapState:
    """REVERSE fuse: project the map's landmarks into the new keyframe and
    bind its free keypoints to them (the second half of the reference's
    LocalMapping::SearchInNeighbors, LocalMapping.cc:488-502 — neighbor
    points gathered into vpFuseCandidates and fused INTO the current
    keyframe).  Without this direction, landmarks triangulated by recent
    keyframes only gain observations when per-frame tracking happens to
    rebind them, and the 2-3-keyframe culling window (MapPointCulling)
    starves the map whenever insertion outpaces tracking rebinds.

    Uses the whole-map frustum/scale-gated projection of TrackLocalMap
    (models/tracking.py _local_map_body) rather than gathering neighbor
    point lists — the gates prune to the same candidate set."""
    cam = cfg.camera
    scale_f = cfg.extractor.scale_factor
    n_levels = cfg.extractor.n_levels
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)
    T = m.kf_pose[kf_id]

    pc = geo.transform_points(T, m.pt_pos)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uv_pred = jnp.stack([pc[:, 0] / zs * cam.fx + cam.cx,
                         pc[:, 1] / zs * cam.fy + cam.cy], 1)
    C = -_he("ji,j->i", T[:3, :3], T[:3, 3])
    rays = m.pt_pos - C
    dist = jnp.linalg.norm(rays, axis=1) + 1e-9
    min_dist = m.pt_max_dist / (scale_f ** (n_levels - 1))
    view_cos = jnp.sum(rays * m.pt_normal, 1) / dist
    visible = (m.pt_valid & (z > 0.1)
               & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cam.width)
               & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cam.height)
               & (dist >= 0.8 * min_dist)
               & (dist <= 1.2 * m.pt_max_dist * 1.25)
               & (view_cos > 0.5))
    ratio = jnp.maximum(m.pt_max_dist / dist, 1e-6)
    pred_level = jnp.clip(jnp.ceil(jnp.log(ratio) / jnp.log(scale_f)),
                          0, n_levels - 1).astype(jnp.int32)
    r = 3.0 * scales[pred_level]            # Fuse radius (ORBmatcher.cc:838)

    row = m.kf_obs_pt[kf_id]
    free_kp = m.kf_kp_valid[kf_id] & (row < 0)
    # landmarks already observed by this keyframe must not match a second
    # (free) keypoint — one landmark, one observation per keyframe (the
    # reference's Fuse skips pMP->IsInKeyFrame(pKF), ORBmatcher.cc:859)
    P_ = m.pt_pos.shape[0]
    in_row = jnp.zeros(P_ + 1, bool).at[jnp.where(row >= 0, row, P_)].set(
        True)[:P_]
    visible = visible & ~in_row
    mm = matching.match_windowed(
        m.pt_desc, uv_pred, r, visible, m.kf_desc[kf_id], m.kf_uv[kf_id],
        free_kp, cfg.matcher, level_q=pred_level, level_t=m.kf_level[kf_id],
        level_lo=-1, level_hi=1, max_dist=cfg.matcher.th_low, mutual=True)
    P = m.pt_pos.shape[0]
    N = row.shape[0]
    add = jnp.full(N + 1, -1, jnp.int32)
    tgt = jnp.where(mm.valid, mm.idx, N)
    add = add.at[tgt].set(jnp.where(mm.valid,
                                    jnp.arange(P, dtype=jnp.int32), -1))[:N]
    new_row = jnp.where(row >= 0, row, add)
    return m._replace(kf_obs_pt=m.kf_obs_pt.at[kf_id].set(new_row))


@functools.partial(jax.jit, static_argnums=(0,))
def cull_keyframes(cfg: SystemConfig, m: ms.MapState, center) -> ms.MapState:
    """Redundant-keyframe culling (reference LocalMapping::KeyFrameCulling,
    LocalMapping.cc:632-700): a covisible keyframe whose landmarks are >= 90%
    observed by >= 3 other keyframes at the same or finer octave is retired.
    The first two keyframes (map origin) are immune."""
    K, N = m.kf_obs_pt.shape
    P = m.pt_pos.shape[0]
    L = cfg.extractor.n_levels
    ok = m.kf_kp_valid & (m.kf_obs_pt >= 0) & m.kf_valid[:, None]
    pt = jnp.maximum(m.kf_obs_pt, 0)
    ok = ok & m.pt_valid[pt]
    # per-point per-level observation histogram
    hist = jnp.zeros((P, L), jnp.int32).at[
        pt.reshape(-1), jnp.clip(m.kf_level.reshape(-1), 0, L - 1)
    ].add(ok.reshape(-1).astype(jnp.int32))
    cum = jnp.cumsum(hist, axis=1)                    # obs at level <= l
    lv = jnp.clip(m.kf_level, 0, L - 1)
    lv1 = jnp.clip(lv + 1, 0, L - 1)
    n_at_finer = cum[pt, lv1]                         # includes own obs
    redundant = ok & ((n_at_finer - 1) >= 3)
    n_obs = ok.sum(1)
    frac = redundant.sum(1) / jnp.maximum(n_obs, 1)

    covis = ms.covisibility_row(m, center)
    candidate = (covis >= cfg.mapper.covis_edge_threshold) & m.kf_valid
    candidate = candidate & (jnp.arange(K) >= 2) & (jnp.arange(K) != center)
    cull = candidate & (frac > cfg.mapper.kf_culling_redundancy) & (n_obs > 20)
    return m._replace(
        kf_valid=m.kf_valid & ~cull,
        kf_obs_pt=jnp.where(cull[:, None], -1, m.kf_obs_pt),
    )


@functools.partial(jax.jit, static_argnums=(0, 2))
def local_ba(cfg: SystemConfig, m: ms.MapState, iters: int = 6) -> ms.MapState:
    """Local bundle adjustment around the newest keyframe."""
    return local_ba_body(cfg, m, m.n_kf - 1, iters)


def local_ba_body(cfg: SystemConfig, m: ms.MapState, center,
                  iters: int = 6) -> ms.MapState:
    """Windowed local bundle adjustment (reference
    Optimizer::LocalBundleAdjustment, Optimizer.cc:453).

    Problem-shaped, not capacity-shaped: the W most covisible keyframes of
    `center` are *gathered* into a dense (W, N)-observation subproblem —
    those above the covisibility threshold are free (the reference's
    lLocalKeyFrames), the rest of the window act as fixed anchors (the
    reference's lFixedCameras: observers of local points that are not
    themselves local).  Per-insertion BA cost is therefore O(W*N)
    independent of the keyframe capacity K.  Points stay at full capacity P
    (a segment-sum axis, cheap); points unobserved by the window receive
    zero gradient and do not move.  Outlier observations are detached
    afterwards (Optimizer.cc local-BA epilogue).
    """
    K, N = m.kf_obs_pt.shape
    W = min(cfg.mapper.ba_window, K)
    covis = ms.covisibility_row(m, center)
    row = jnp.where(m.kf_valid, covis, -1)
    row = row.at[center].set(1 << 20)                  # center always rank 0
    w_vals, kf_sel = jax.lax.top_k(row, W)
    is_center = jnp.arange(W) == 0
    free = ((w_vals >= cfg.mapper.covis_edge_threshold) | is_center) \
        & m.kf_valid[kf_sel] & (kf_sel != 0)
    # gauge: if the window has no anchor (all selected KFs free), fix the
    # oldest one (the reference's g2o problems always carry fixed vertices)
    no_anchor = jnp.all(free | ~m.kf_valid[kf_sel])
    oldest = jnp.argmin(jnp.where(m.kf_valid[kf_sel] & ~is_center, kf_sel,
                                  jnp.int32(1 << 20)))
    free = jnp.where(no_anchor & (jnp.arange(W) == oldest) & (W > 1),
                     False, free)

    obs_pt_w = m.kf_obs_pt[kf_sel]                     # (W, N)
    obs_valid = (m.kf_valid[kf_sel][:, None] & m.kf_kp_valid[kf_sel]
                 & (obs_pt_w >= 0)).reshape(-1)
    obs_pt = jnp.maximum(obs_pt_w.reshape(-1), 0)
    obs_valid = obs_valid & m.pt_valid[obs_pt]
    obs_level = m.kf_level[kf_sel].reshape(-1)
    inv_sigma2 = 1.0 / jnp.asarray(cfg.extractor.level_sigma2,
                                   jnp.float32)[obs_level]
    prob = ba.BAProblem(
        poses=m.kf_pose[kf_sel], points=m.pt_pos,
        obs_kf=jnp.repeat(jnp.arange(W, dtype=jnp.int32), N),
        obs_pt=obs_pt, obs_uv=m.kf_uv[kf_sel].reshape(-1, 2),
        obs_w=inv_sigma2, obs_valid=obs_valid, kf_fixed=~free,
    )
    # dense Schur + direct solve: at window size W the (6W, 6W) reduced
    # system solves exactly in one step — ~10x shorter dispatch chain than
    # 30-iteration matrix-free PCG (ba.solve_dense docstring).  The point
    # axis is compacted to the window's observed landmarks first: per-iter
    # tensors scale with ba_local_points, not the map's point capacity
    res = ba.solve_dense_compact(cfg.camera, prob,
                                 min(cfg.mapper.ba_local_points,
                                     m.pt_pos.shape[0]), iters=iters)
    new_pose = jnp.where(free[:, None, None], res.poses, m.kf_pose[kf_sel])
    outlier = (obs_valid & ~res.obs_inlier).reshape(W, N)
    new_rows = jnp.where(outlier, -1, obs_pt_w)
    return m._replace(
        kf_pose=m.kf_pose.at[kf_sel].set(new_pose),
        pt_pos=res.points,
        kf_obs_pt=m.kf_obs_pt.at[kf_sel].set(new_rows),
    )


def _post_insert_body(cfg: SystemConfig, m: ms.MapState, k,
                      ba_iters: int = 4) -> ms.MapState:
    """The LocalMapping::Run iteration after a keyframe lands in slot k
    (reference LocalMapping.cc:37-94: CreateNewMapPoints, SearchInNeighbors,
    MapPointCulling, local BA, KeyFrameCulling).

    Foreign keyframes of a not-yet-aligned sub-map never reach this pass —
    cooperative.receive_packet defers their backend treatment until after
    the Sim3 merge (full_backend=False pre-merge), so the whole-map
    projection fuse below always operates in one consistent world frame."""
    # bind the keyframe's free keypoints to EXISTING landmarks before
    # triangulating new ones: when insertion lags tracking (chunked driver),
    # the tracked bindings miss landmarks created since the chunk started,
    # and triangulating first would duplicate them at tiny baselines
    m = fuse_map_into_keyframe(cfg, m, k)
    m = create_map_points(cfg, m, k)
    m = fuse_into_neighbors(cfg, m, k)
    m = local_ba_body(cfg, m, k, iters=ba_iters)
    m = cull_points(cfg, m)
    m = cull_keyframes(cfg, m, k)
    # ONE geometry refresh at the end, over the final observation table —
    # medoid descriptors / normals / scale ranges are consumed by FUTURE
    # tracking and insertions, so refreshing mid-pipeline paid the medoid
    # sort twice per keyframe for no consumer
    m = refresh_point_geometry(cfg, m)
    return m


@functools.partial(jax.jit, static_argnums=(0, 6, 9))
def backend_insert(cfg: SystemConfig, m: ms.MapState, frame: Frame,
                   T, frame_id, kp_pt, has_depth: bool = False,
                   kp_depth=None, vocab=None, ba_iters: int = 4):
    """The full post-insertion backend as ONE jitted program — the entire
    LocalMapping::Run iteration (reference LocalMapping.cc:37-94:
    ProcessNewKeyFrame, MapPointCulling, CreateNewMapPoints,
    SearchInNeighbors, local BA, KeyFrameCulling) fused into a single XLA
    executable so that keyframe insertion costs one dispatch and one compile
    instead of eight.

    Returns (map, k, aux) where aux carries everything the host-side
    keyframe bookkeeping consumes — BoW row for the place-recognition DB
    (Frame::ComputeBoW, Frame.cc:396, fused here instead of a separate
    dispatch), the new KF's covisibility row (feeding LoopClosing::
    DetectLoop's minScore gate) and its BA-adjusted pose — so the System
    reads ONE bundled transfer per keyframe instead of five round trips."""
    m, k = insert_keyframe(cfg, m, frame, T, frame_id, kp_pt)
    if has_depth:
        m = add_depth_points(cfg, m, k, kp_depth)
    # `ba_iters` < 4 is the InterruptBA analogue (reference
    # LocalMapping.cc:615-631: local BA aborts when the next keyframe is
    # already waiting): under keyframe pressure the System dispatches the
    # light variant and the truncated optimization is recovered by the
    # next unpressured insert's full windowed BA over the same window
    m = _post_insert_body(cfg, m, k, ba_iters)
    aux = {"pose": m.kf_pose[k],
           "covis_row": ms.covisibility_row(m, k),
           "obs_row": m.kf_obs_pt[k],
           "k": k, "n_pt": m.n_pt}
    if vocab is not None:
        from coslam_tpu.ops import bow
        words = bow.assign_words(frame.desc, frame.valid, vocab)
        aux["bow_row"] = bow.bow_vector(words, frame.valid,
                                        int(vocab.shape[0]))
    return m, k, aux


@functools.partial(jax.jit, static_argnums=(0,))
def backend_post_insert(cfg: SystemConfig, m: ms.MapState, k) -> ms.MapState:
    """Standalone fused backend pass for a keyframe already in the map —
    used for wire-reconstructed FOREIGN keyframes, which must receive the
    same treatment as local ones (reference hands received keyframes to
    LocalMapping at ros_mono.cc:2163: triangulation among received KFs,
    fusion, local BA, culling).  Only Sim3-aligned keyframes reach this
    pass (see _post_insert_body)."""
    return _post_insert_body(cfg, m, k)
