"""Loop detection, Sim3 computation, and loop correction.

TPU reformulation of the reference LoopClosing thread (ORB_SLAM2/src/
LoopClosing.cc): DetectLoop (:103) lives in models/keyframe_db.py;
ComputeSim3 (:231) becomes one batched keyframe-pair descriptor match plus
the vmapped Horn RANSAC of ops/sim3.py; CorrectLoop (:402) becomes a jitted
MapState transform — duplicate-landmark fusion by index remapping, Sim3
propagation to the covisible window, essential-graph optimization
(optim/pose_graph.py) and batched point correction via each landmark's
reference keyframe, replacing the reference's per-object pointer surgery
under the global map mutex.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models import keyframe_db as kdb
from coslam_tpu.models import map_state as ms
from coslam_tpu.ops import matching, sim3 as sim3_ops
from coslam_tpu.optim import ba, pose_graph
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnums=(0,))
def match_pair_points(cfg: SystemConfig, m: ms.MapState, k1, k2):
    """Descriptor-match landmarks seen in keyframes k1 and k2 (the analogue
    of SearchByBoW(KF, KF), reference ORBmatcher.cc:522, feeding ComputeSim3).

    Returns per-k1-keypoint arrays: matched k2 keypoint index, point ids on
    both sides, validity."""
    has1 = m.kf_kp_valid[k1] & (m.kf_obs_pt[k1] >= 0)
    has2 = m.kf_kp_valid[k2] & (m.kf_obs_pt[k2] >= 0)
    # loose pre-filter: geometric verification is the Sim3 RANSAC's job, so
    # the descriptor gate runs at TH_HIGH without a ratio test (the reference
    # uses its BoW-bucketed 0.75-ratio search here, ORBmatcher.cc:522, but
    # its strictness costs recall with no precision benefit before RANSAC).
    # The candidate side matches through its landmarks' MEDOID descriptors
    # (MapPoint::ComputeDistinctiveDescriptors) — the viewpoint-stable
    # appearance model, which recalls revisit pairs the per-frame
    # descriptors miss (the reference's SearchByBoW(KF,KF) also returns
    # MapPoint matches, ORBmatcher.cc:522-655)
    desc2 = m.pt_desc[jnp.maximum(m.kf_obs_pt[k2], 0)]
    mm = matching.match(m.kf_desc[k1], has1, desc2, has2,
                        cfg.matcher, max_dist=cfg.matcher.th_high,
                        mutual=True,
                        angle_q=m.kf_angle[k1], angle_t=m.kf_angle[k2])
    idx2 = jnp.maximum(mm.idx, 0)
    pt1 = m.kf_obs_pt[k1]
    pt2 = m.kf_obs_pt[k2][idx2]
    ok = mm.valid & (pt1 >= 0) & (pt2 >= 0)
    ok = ok & m.pt_valid[jnp.maximum(pt1, 0)] & m.pt_valid[jnp.maximum(pt2, 0)]
    return idx2, jnp.maximum(pt1, 0), jnp.maximum(pt2, 0), ok


@functools.partial(jax.jit, static_argnums=(0,))
def match_counts_all(cfg: SystemConfig, m: ms.MapState, kf_id):
    """Landmark-level match counts of `kf_id` against every keyframe in one
    batched pass: (K,) counts of mutual sub-TH_HIGH descriptor matches where
    both keypoints carry map points.  Used to shortlist loop candidates when
    BoW scores are weakly selective (the geometric verifier still decides)."""
    from coslam_tpu.ops import hamming

    has_q = m.kf_kp_valid[kf_id] & (m.kf_obs_pt[kf_id] >= 0)
    desc_q = m.kf_desc[kf_id]

    def one(desc_t, has_t):
        d = hamming.pairwise_hamming_mxu(desc_q, desc_t)
        d = jnp.where(has_q[:, None] & has_t[None, :], d, matching.INF)
        best = jnp.min(d, axis=1)
        bidx = jnp.argmin(d, axis=1)
        col_best = jnp.argmin(d, axis=0)
        mutual = col_best[bidx] == jnp.arange(d.shape[0])
        return ((best < cfg.matcher.th_high) & mutual).sum()

    has_all = m.kf_kp_valid & (m.kf_obs_pt >= 0) & m.kf_valid[:, None]
    return jax.vmap(one)(m.kf_desc, has_all)


@functools.partial(jax.jit, static_argnums=(0,))
def match_counts_subset(cfg: SystemConfig, m: ms.MapState, kf_id, cands):
    """Landmark-level match counts of `kf_id` against a SHORTLIST of
    candidate keyframes (C,) — the geometric pre-verification applied to
    BoW candidates only, so the per-insertion cost is O(C N^2), not
    O(K N^2)."""
    from coslam_tpu.ops import hamming

    has_q = m.kf_kp_valid[kf_id] & (m.kf_obs_pt[kf_id] >= 0)
    desc_q = m.kf_desc[kf_id]

    def one(c):
        has_t = m.kf_kp_valid[c] & (m.kf_obs_pt[c] >= 0) & m.kf_valid[c]
        d = hamming.pairwise_hamming_mxu(desc_q, m.kf_desc[c])
        d = jnp.where(has_q[:, None] & has_t[None, :], d, matching.INF)
        best = jnp.min(d, axis=1)
        bidx = jnp.argmin(d, axis=1)
        col_best = jnp.argmin(d, axis=0)
        mutual = col_best[bidx] == jnp.arange(d.shape[0])
        return ((best < cfg.matcher.th_high) & mutual).sum()

    return jax.vmap(one)(cands)


@functools.partial(jax.jit, static_argnums=(0,))
def sim3_between(cfg: SystemConfig, m: ms.MapState, k1, k2,
                 idx2, pt1, pt2, ok, key):
    """RANSAC Sim3 S21 with x_k2cam ~ S21(x_k1cam) from matched landmarks
    (reference LoopClosing::ComputeSim3, LoopClosing.cc:231-300)."""
    T1 = m.kf_pose[k1]
    T2 = m.kf_pose[k2]
    x1c = geo.transform_points(T1, m.pt_pos[pt1])
    x2c = geo.transform_points(T2, m.pt_pos[pt2])
    uv1 = m.kf_uv[k1]
    uv2 = m.kf_uv[k2][idx2]
    return sim3_ops.ransac_sim3(
        cfg.camera, x1c, x2c, uv1, uv2, cfg.loop.sim3_ransac_iters,
        False, valid=ok, key=key, chi2_th=9.21)


@functools.partial(jax.jit, static_argnums=(0,))
def expand_sim3_matches(cfg: SystemConfig, m: ms.MapState, k1, k2,
                        s, R, t):
    """Grow the landmark pairing under an ESTIMATED Sim3 (the reference's
    SearchBySim3, ORBmatcher.cc:1102-1216, run between ComputeSim3's RANSAC
    and OptimizeSim3): project k1's bound landmarks into k2's image through
    S21 and window-match descriptors against k2's landmark-bound keypoints.
    A marginal RANSAC consensus (10-20 pairs) typically grows to 2-4x here,
    which is what pushes true loops over the acceptance gate."""
    cam = cfg.camera
    pt1 = m.kf_obs_pt[k1]
    has1 = m.kf_kp_valid[k1] & (pt1 >= 0)
    pt1s = jnp.maximum(pt1, 0)
    has1 = has1 & m.pt_valid[pt1s]
    X1c = geo.transform_points(m.kf_pose[k1], m.pt_pos[pt1s])
    x2 = s * _he("ij,nj->ni", R, X1c) + t
    z = x2[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uv_pred = jnp.stack([x2[:, 0] / zs * cam.fx + cam.cx,
                         x2[:, 1] / zs * cam.fy + cam.cy], 1)
    has1 = has1 & (z > 0.05)

    pt2_row = m.kf_obs_pt[k2]
    has2 = m.kf_kp_valid[k2] & (pt2_row >= 0) \
        & m.pt_valid[jnp.maximum(pt2_row, 0)]
    # radius 7.5 px at the keypoint's octave (SearchBySim3's th=7.5);
    # candidate side matches through landmark medoid descriptors (see
    # match_pair_points)
    desc2 = m.pt_desc[jnp.maximum(pt2_row, 0)]
    scales = jnp.asarray(cfg.extractor.scale_factors, jnp.float32)
    r = 7.5 * scales[jnp.clip(m.kf_level[k1], 0, scales.shape[0] - 1)]
    mm = matching.match_windowed(
        m.kf_desc[k1], uv_pred, r, has1, desc2, m.kf_uv[k2], has2,
        cfg.matcher, max_dist=cfg.matcher.th_high, mutual=True)
    idx2 = jnp.maximum(mm.idx, 0)
    pt2 = pt2_row[idx2]
    ok = mm.valid & (pt1 >= 0) & (pt2 >= 0)
    return idx2, pt1s, jnp.maximum(pt2, 0), ok


@functools.partial(jax.jit, static_argnums=(0,))
def sim3_refine_pairs(cfg: SystemConfig, m: ms.MapState, k1, k2,
                      idx2, pt1, pt2, ok, s, R, t):
    """LM-polish an initial Sim3 over an (expanded) pair set — the
    reference's OptimizeSim3 (Optimizer.cc:1046) applied after
    SearchBySim3.  Returns a Sim3Result over the given pairs."""
    x1c = geo.transform_points(m.kf_pose[k1], m.pt_pos[pt1])
    x2c = geo.transform_points(m.kf_pose[k2], m.pt_pos[pt2])
    uv1 = m.kf_uv[k1]
    uv2 = m.kf_uv[k2][idx2]
    s2, R2, t2, ok2 = sim3_ops.refine_sim3(
        cfg.camera, x1c, x2c, uv1, uv2, s, R, t, ok, chi2_th=9.21)
    return sim3_ops.Sim3Result(s=s2, R=R2, t=t2, inliers=ok2,
                               n_inliers=ok2.sum())


@functools.partial(jax.jit, static_argnums=(0,))
def fuse_landmarks(cfg: SystemConfig, m: ms.MapState, pt_from, pt_to,
                   pair_ok) -> ms.MapState:
    """Merge duplicate landmarks: every observation of pt_from[i] is
    re-pointed at pt_to[i] and pt_from[i] is invalidated (the analogue of
    MapPoint::Replace, reference MapPoint.cc:177, done as one index remap
    over the whole observation table)."""
    P = m.pt_pos.shape[0]
    remap = jnp.arange(P, dtype=jnp.int32)
    remap = remap.at[jnp.where(pair_ok, pt_from, P - 1)].set(
        jnp.where(pair_ok, pt_to, remap[P - 1]))
    remap = remap.at[P - 1].set(P - 1)
    obs = m.kf_obs_pt
    obs = jnp.where(obs >= 0, remap[jnp.maximum(obs, 0)], obs)
    fused_away = jnp.zeros(P, bool).at[
        jnp.where(pair_ok, pt_from, P - 1)].set(pair_ok, mode="drop")
    fused_away = fused_away & (jnp.arange(P) != remap)
    return m._replace(kf_obs_pt=obs, pt_valid=m.pt_valid & ~fused_away)


_covis_row_jit = jax.jit(ms.covisibility_row)
_covis_jit = jax.jit(ms.covisibility)


def _all_pair_edges(K: int):
    """Static upper-triangle pair enumeration (E = K(K-1)/2)."""
    ii, jj = np.triu_indices(K, 1)
    return jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32)


@functools.partial(jax.jit, static_argnums=(0,))
def correct_loop(cfg: SystemConfig, m: ms.MapState, kf_cur, kf_loop,
                 s21, R21, t21, pt1, pt2, pair_ok,
                 prev_loops=None, prev_loops_valid=None):
    """Apply a verified loop closure (reference LoopClosing::CorrectLoop,
    LoopClosing.cc:402-601).

    S21 maps current-KF camera coords -> loop-KF camera coords; so the
    corrected current pose is  S_cw = S21^-1 o S_loop_w  (the reference's
    mg2oScw = gScm * gSmw with m the loop keyframe).
    """
    K = m.kf_pose.shape[0]
    P = m.pt_pos.shape[0]

    # ---- 1. fuse duplicate landmarks: current-side point -> loop-side point
    m = fuse_landmarks(cfg, m, pt1, pt2, pair_ok)

    # ---- 2. corrected Sim3 for the current KF and its covisible window
    S21 = {"s": s21, "R": R21, "t": t21}
    S_loop_w = geo.sim3_from_se3(m.kf_pose[kf_loop])
    S_cw_new = geo.sim3_compose(geo.sim3_inverse(S21), S_loop_w)

    covis_m = ms.covisibility(m)
    covis = covis_m[kf_cur]
    window = (covis >= cfg.mapper.covis_edge_threshold)
    window = window.at[kf_cur].set(True)
    window = window & m.kf_valid

    T_c_old = m.kf_pose[kf_cur]
    # S_iw_corrected = S_ic o S_cw_new, with S_ic from old (drifted) poses
    T_ic = jnp.einsum("kij,jl->kil", m.kf_pose, geo.se3_inverse(T_c_old))
    S_ic = {"s": jnp.ones(K, jnp.float32),
            "R": T_ic[:, :3, :3], "t": T_ic[:, :3, 3]}
    S_iw_new = geo.sim3_compose(S_ic, S_cw_new)   # batched over K

    # old vertices (scale 1); windowed KFs get the corrected Sim3
    v_old = pose_graph.vertices_from_se3(m.kf_pose)
    v_init = pose_graph.Sim3Vertices(
        s=jnp.where(window, S_iw_new["s"], v_old.s),
        R=jnp.where(window[:, None, None], S_iw_new["R"], v_old.R),
        t=jnp.where(window[:, None], S_iw_new["t"], v_old.t))

    # ---- 3. essential graph (reference Optimizer::OptimizeEssentialGraph,
    # Optimizer.cc:869-980): spanning-tree edges + sequential neighbors +
    # strong-covisibility edges + ALL past loop edges + the new loop edge.
    # Measurements come from pre-correction relative poses (the drift-
    # consistent odometry); the new loop edge from the verified Sim3.
    idx = jnp.arange(K)
    # derived spanning tree: each keyframe's parent is its most covisible
    # PREDECESSOR (the reference maintains mpParent incrementally,
    # KeyFrame.cc:342; here it is derived from the same covisibility)
    pred_mask = (idx[None, :] < idx[:, None]) & m.kf_valid[None, :]
    parent = jnp.argmax(jnp.where(pred_mask, covis_m, -1), axis=1)
    S_loop_meas_ji = geo.sim3_compose(S_cw_new, geo.sim3_inverse(S_loop_w))
    fixed = jnp.zeros(K, bool).at[kf_loop].set(True)
    fixed = fixed | ~m.kf_valid
    if cfg.loop.sparse_essential_graph:
        # SPARSE edge list, O(K) edges (the reference's structure): the
        # dense all-pairs enumeration (K(K-1)/2) plus a (7K)^2 direct solve
        # wall at K ~ 2000
        topk = min(cfg.loop.essential_graph_top_k, K - 1)
        ei_seq, ej_seq = idx[:-1], idx[1:]
        v_seq = m.kf_valid[ei_seq] & m.kf_valid[ej_seq]
        ei_st, ej_st = parent, idx
        v_st = (idx >= 1) & m.kf_valid[parent] & m.kf_valid[idx] \
            & (parent < idx)
        w_row = jnp.where(m.kf_valid[:, None] & m.kf_valid[None, :]
                          & (idx[None, :] != idx[:, None]), covis_m, -1)
        wk, jk = jax.lax.top_k(w_row, topk)            # (K, topk)
        ei_cov = jnp.repeat(idx, topk)
        ej_cov = jk.reshape(-1)
        v_cov = (wk.reshape(-1) >= cfg.loop.essential_graph_covis_w) \
            & m.kf_valid[ei_cov] & m.kf_valid[ej_cov]
        if prev_loops is not None:
            ei_prev = jnp.clip(prev_loops[:, 0], 0, K - 1)
            ej_prev = jnp.clip(prev_loops[:, 1], 0, K - 1)
            v_prev = prev_loops_valid & m.kf_valid[ei_prev] \
                & m.kf_valid[ej_prev]
        else:
            ei_prev = jnp.zeros(0, jnp.int32)
            ej_prev = jnp.zeros(0, jnp.int32)
            v_prev = jnp.zeros(0, bool)
        # the NEW loop edge lives in the statically-known LAST slot
        ei = jnp.concatenate([ei_seq, ei_st, ei_cov, ei_prev,
                              kf_loop[None]]).astype(jnp.int32)
        ej = jnp.concatenate([ej_seq, ej_st, ej_cov, ej_prev,
                              kf_cur[None]]).astype(jnp.int32)
        evalid = jnp.concatenate(
            [v_seq, v_st, v_cov, v_prev, jnp.ones(1, bool)])
        # DEDUPLICATE: a pair that is simultaneously sequential, a
        # spanning-tree edge, a (possibly bidirectional) strong-covis
        # neighbor and/or a loop edge would otherwise be counted up to 4x,
        # skewing that constraint's weight vs the reference's unique edge
        # set (Optimizer.cc:869-980).  Canonical key = (min, max) pair;
        # loop edges (prio 0) win over structural duplicates (prio 1) so
        # their corrected measurement survives.  2*K*K must fit int32 —
        # holds to K = 32k, far past any supported capacity.
        assert 2 * K * K < 2 ** 31
        ekey = (jnp.minimum(ei, ej) * K + jnp.maximum(ei, ej)).astype(
            jnp.int32)
        E = ekey.shape[0]
        n_loop = ei_prev.shape[0] + 1
        prio = jnp.concatenate([jnp.ones(E - n_loop, jnp.int32),
                                jnp.zeros(n_loop, jnp.int32)])
        BIGK = jnp.int32(2 ** 31 - 1)
        sort_key = jnp.where(evalid, ekey * 2 + prio, BIGK)
        order = jnp.argsort(sort_key)
        k_sorted = jnp.where(evalid[order], ekey[order], BIGK)
        dup_sorted = jnp.concatenate(
            [jnp.zeros(1, bool), k_sorted[1:] == k_sorted[:-1]])
        dup = jnp.zeros(E, bool).at[order].set(dup_sorted)
        evalid = evalid & ~dup
        meas = pose_graph.relative_sim3(v_old, ei, ej)
        # loop-edge measurement S_j S_i^-1 = S_cur_w_new o S_loop_w^-1
        # (edge oriented i=loop, j=cur — no min/max gymnastics needed)
        meas = pose_graph.Sim3Vertices(
            s=meas.s.at[-1].set(S_loop_meas_ji["s"]),
            R=meas.R.at[-1].set(S_loop_meas_ji["R"]),
            t=meas.t.at[-1].set(S_loop_meas_ji["t"]))
        v_out = pose_graph.optimize_sparse(
            v_init, ei, ej, meas, cfg.loop.essential_graph_iters,
            edge_valid=evalid, fixed=fixed,
            pcg_iters=cfg.loop.essential_graph_pcg_iters)
    else:
        ei, ej = _all_pair_edges(K)
        w_pair = covis_m[ei, ej]
        seq = (ej - ei) == 1
        strong = w_pair >= cfg.loop.essential_graph_covis_w
        is_st = (ej >= 1) & (ei == parent[ej])
        is_loop = ((ei == jnp.minimum(kf_cur, kf_loop))
                   & (ej == jnp.maximum(kf_cur, kf_loop)))
        evalid = (seq | strong | is_st | is_loop) \
            & m.kf_valid[ei] & m.kf_valid[ej]
        if prev_loops is not None:
            # accumulated loop edges from every past closure (the
            # reference's KeyFrame::GetLoopEdges feeding sLoopEdges,
            # Optimizer.cc:898-913)
            pa = jnp.minimum(prev_loops[:, 0], prev_loops[:, 1])
            pb = jnp.maximum(prev_loops[:, 0], prev_loops[:, 1])
            # compare pairs componentwise: a K-radix int encoding silently
            # truncates to int32 when x64 is off and would alias pairs once
            # growth pushes K*K past 2^31
            is_prev = jnp.any((ei[:, None] == pa[None, :])
                              & (ej[:, None] == pb[None, :])
                              & prev_loops_valid[None, :], axis=1)
            evalid = evalid | (is_prev & m.kf_valid[ei] & m.kf_valid[ej])

        meas = pose_graph.relative_sim3(v_old, ei, ej)
        # loop edge measurement: S_j S_i^-1 with corrected relation.  For
        # (i=min, j=max): if i is the loop KF, S_cur_w_new S_loop_w^-1 (or
        # its inverse) — both orders handled via where.
        cur_is_j = kf_cur > kf_loop
        lm_s = jnp.where(cur_is_j, S_loop_meas_ji["s"],
                         1.0 / S_loop_meas_ji["s"])
        lm_R = jnp.where(cur_is_j, S_loop_meas_ji["R"],
                         jnp.swapaxes(S_loop_meas_ji["R"], -1, -2))
        lm_t = jnp.where(
            cur_is_j, S_loop_meas_ji["t"],
            -_he("ji,j->i", S_loop_meas_ji["R"], S_loop_meas_ji["t"])
            / S_loop_meas_ji["s"])
        meas = pose_graph.Sim3Vertices(
            s=jnp.where(is_loop, lm_s, meas.s),
            R=jnp.where(is_loop[:, None, None], lm_R, meas.R),
            t=jnp.where(is_loop[:, None], lm_t, meas.t))
        v_out = pose_graph.optimize(v_init, ei, ej, meas,
                                    cfg.loop.essential_graph_iters,
                                    edge_valid=evalid, fixed=fixed)

    # ---- 4. correct landmarks through their reference keyframe's old->new
    # similarity (reference Optimizer.cc:1010-1030 point correction)
    ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
    S_old_ref = {"s": v_old.s[ref], "R": v_old.R[ref], "t": v_old.t[ref]}
    S_new_ref = {"s": v_out.s[ref], "R": v_out.R[ref], "t": v_out.t[ref]}
    x_cam = geo.sim3_apply(
        {"s": S_old_ref["s"], "R": S_old_ref["R"], "t": S_old_ref["t"]},
        m.pt_pos[:, None, :])[:, 0, :]
    pt_new = geo.sim3_apply(geo.sim3_inverse(S_new_ref),
                            x_cam[:, None, :])[:, 0, :]
    m = m._replace(
        kf_pose=pose_graph.vertices_to_se3(v_out),
        pt_pos=jnp.where(m.pt_valid[:, None], pt_new, m.pt_pos),
    )
    return m


@functools.partial(jax.jit, static_argnums=(0, 2))
def global_ba(cfg: SystemConfig, m: ms.MapState, iters: int = 8) -> ms.MapState:
    """Full-map BA after loop correction (reference
    LoopClosing::RunGlobalBundleAdjustment, LoopClosing.cc:645, 10 iters)."""
    obs_kf, obs_pt, obs_uv, obs_level, obs_valid = ms.observation_coo(m)
    inv_sigma2 = 1.0 / jnp.asarray(cfg.extractor.level_sigma2,
                                   jnp.float32)[obs_level]
    K = m.kf_pose.shape[0]
    prob = ba.BAProblem(
        poses=m.kf_pose, points=m.pt_pos, obs_kf=obs_kf, obs_pt=obs_pt,
        obs_uv=obs_uv, obs_w=inv_sigma2, obs_valid=obs_valid,
        kf_fixed=(jnp.arange(K) < 1) | ~m.kf_valid)
    res = ba.solve(cfg.camera, prob, iters=iters, pcg_iters=30)
    poses, points = res.poses, res.points
    if cfg.sensor == "mono":
        # monocular gauge: fixing ONE camera leaves the global SCALE free
        # and LM can drift it by large factors (invisible to Umeyama ATE
        # but fatal to anything holding map-frame transforms, e.g. the
        # cooperative per-agent Sim3).  Rather than pinning a second pose
        # (which over-constrains its 6 DOF relative to slot 0 — advisor
        # r4 #3), restore the scale POST-HOC: one similarity about slot
        # 0's center so the summed keyframe-center spread matches the
        # pre-BA map.  This fixes exactly the 1 gauge DOF and nothing
        # else.  Depth sensors observe scale directly; no-op there.
        c_old = ms.kf_centers(m)
        c0 = c_old[0]
        w = m.kf_valid.astype(jnp.float32)
        spread_old = (w * jnp.linalg.norm(c_old - c0, axis=1)).sum()
        R_new = poses[:, :3, :3]
        c_new = -_he("kji,kj->ki", R_new, poses[:, :3, 3])
        spread_new = (w * jnp.linalg.norm(c_new - c_new[0], axis=1)).sum()
        s = spread_old / jnp.maximum(spread_new, 1e-9)
        c_scaled = c_new[0] + s * (c_new - c_new[0])
        poses = poses.at[:, :3, 3].set(-_he("kij,kj->ki", R_new, c_scaled))
        points = c_new[0] + s * (points - c_new[0])
    outlier = (obs_valid & ~res.obs_inlier).reshape(m.kf_obs_pt.shape)
    return m._replace(kf_pose=poses, pt_pos=points,
                      kf_obs_pt=jnp.where(outlier, -1, m.kf_obs_pt))


class LoopCloser:
    """Host-side orchestration (the reference's LoopClosing::Run loop,
    LoopClosing.cc:57-101, minus the thread)."""

    def __init__(self, cfg: SystemConfig, db: kdb.KeyFrameDatabase,
                 verbose: bool = False):
        import os
        self.cfg = cfg
        self.db = db
        self.verbose = verbose or bool(os.environ.get("COSLAM_LOOP_VERBOSE"))
        self.last_loop_kf = -10 ** 9
        # accepted loop pairs (cur_kf, loop_kf) — the analogue of the
        # reference's KeyFrame::AddLoopEdge records (LoopClosing.cc:561-562),
        # consumed by the map drawer and the essential-graph edge set
        self.loop_edges: List[Tuple[int, int]] = []
        self._key = jax.random.PRNGKey(42)

    def remap(self, kf_map: np.ndarray, remap_kf):
        """Renumber recorded loop edges / cooldown after map compaction."""
        self.loop_edges = [(remap_kf(a), remap_kf(b))
                           for a, b in self.loop_edges
                           if kf_map[a] >= 0 and kf_map[b] >= 0]
        if self.last_loop_kf >= 0:
            self.last_loop_kf = remap_kf(self.last_loop_kf)

    def _prev_loop_arrays(self):
        """Accumulated loop edges as fixed-shape arrays for correct_loop."""
        L = self.cfg.loop.max_loop_edges
        arr = np.zeros((L, 2), np.int32)
        val = np.zeros(L, bool)
        for i, (a, b) in enumerate(self.loop_edges[-L:]):
            arr[i] = (a, b)
            val[i] = True
        return jnp.asarray(arr), jnp.asarray(val)

    def on_keyframe(self, m: ms.MapState, kf_id: int,
                    covis_row: Optional[np.ndarray] = None
                    ) -> Tuple[ms.MapState, bool]:
        lcfg = self.cfg.loop
        if kf_id - self.last_loop_kf < lcfg.min_kfs_between_loops:
            return m, False
        if covis_row is None:
            covis_row = np.asarray(_covis_row_jit(m, jnp.asarray(kf_id)))
        K = covis_row.shape[0]
        eligible = (np.arange(K) != kf_id) \
            & (covis_row < self.cfg.mapper.covis_edge_threshold) \
            & (np.abs(np.arange(K) - kf_id) > lcfg.min_kfs_between_loops) \
            & np.asarray(m.kf_valid)

        # candidate shortlist: BoW inverted-file-style scoring + consistency
        # chains (reference LoopClosing::DetectLoop, KeyFrameDatabase.cc:120)
        # is the primary path; the O(K N^2) all-pairs landmark match count is
        # an opt-in fallback for untrained-vocabulary domains
        if lcfg.brute_force_shortlist:
            counts = np.asarray(match_counts_all(self.cfg, m, kf_id))
            counts = np.where(eligible, counts, -1)
            shortlist = [int(c) for c in np.argsort(-counts)[:3]
                         if counts[c] >= lcfg.sim3_min_bow_matches]
        else:
            bow_cands = [c for c in
                         self.db.detect_loop_candidates(m, kf_id, covis_row)
                         if eligible[c]][:8]
            if not bow_cands:
                return m, False
            # geometric pre-verification on the shortlist only
            counts = np.asarray(match_counts_subset(
                self.cfg, m, jnp.asarray(kf_id),
                jnp.asarray(bow_cands, dtype=jnp.int32)))
            order = np.argsort(-counts)
            shortlist = [int(bow_cands[i]) for i in order[:3]
                         if counts[i] >= lcfg.sim3_min_bow_matches]
        if self.verbose and shortlist:
            print(f"[loop] kf {kf_id}: shortlist {shortlist}", flush=True)

        for cand in shortlist:
            idx2, pt1, pt2, ok = match_pair_points(self.cfg, m, kf_id, cand)
            n_pair = int(ok.sum())
            if self.verbose:
                print(f"[loop]   cand {cand}: {n_pair} point pairs", flush=True)
            # half-gate at entry: the Sim3 RANSAC needs only a minimal
            # consensus to seed the SearchBySim3 expansion below, where the
            # FULL sim3_min_inliers gate applies (reference ComputeSim3's
            # >= 20 BoW matches precede a solver whose inliers then grow
            # through SearchBySim3, LoopClosing.cc:267-300)
            if n_pair < max(6, lcfg.sim3_min_bow_matches // 2):
                continue
            # (kf, candidate)-keyed PRNG: the Sim3 RANSAC draw is
            # independent of how many attempts preceded it (weak #5)
            sub = jax.random.fold_in(jax.random.fold_in(self._key, kf_id),
                                     cand)
            res = sim3_between(self.cfg, m, kf_id, cand, idx2, pt1, pt2, ok, sub)
            if self.verbose:
                print(f"[loop]   cand {cand}: sim3 inliers {int(res.n_inliers)}"
                      f" scale {float(res.s):.3f}", flush=True)
            # a marginal RANSAC consensus is enough to ATTEMPT expansion
            # (reference ComputeSim3 proceeds to SearchBySim3 once the
            # solver converges, LoopClosing.cc:275-300)
            if int(res.n_inliers) < max(6, lcfg.sim3_min_inliers // 2):
                continue
            s_hat = float(res.s)
            if not (1.0 / lcfg.sim3_max_scale < s_hat
                    < lcfg.sim3_max_scale):
                # degenerate fit: a near-coincident/collinear inlier set can
                # satisfy the reprojection gate at an absurd scale; a real
                # same-map loop's scale drift is a few percent
                if self.verbose:
                    print(f"[loop]   cand {cand}: rejected, scale {s_hat:.3g}",
                          flush=True)
                continue
            # SearchBySim3-style match expansion + OptimizeSim3 polish —
            # the acceptance gate applies to the EXPANDED inlier set
            idx2, pt1, pt2, ok = expand_sim3_matches(
                self.cfg, m, jnp.asarray(kf_id), jnp.asarray(cand),
                res.s, res.R, res.t)
            res = sim3_refine_pairs(self.cfg, m, jnp.asarray(kf_id),
                                    jnp.asarray(cand), idx2, pt1, pt2, ok,
                                    res.s, res.R, res.t)
            if self.verbose:
                print(f"[loop]   cand {cand}: expanded inliers "
                      f"{int(res.n_inliers)} scale {float(res.s):.3f}",
                      flush=True)
            if int(res.n_inliers) < lcfg.sim3_min_inliers:
                continue
            s_hat = float(res.s)
            if not (1.0 / lcfg.sim3_max_scale < s_hat
                    < lcfg.sim3_max_scale):
                continue
            prev, prev_valid = self._prev_loop_arrays()
            m = correct_loop(self.cfg, m, jnp.asarray(kf_id),
                             jnp.asarray(cand), res.s, res.R, res.t,
                             pt1, pt2, ok & res.inliers,
                             prev_loops=prev, prev_loops_valid=prev_valid)
            self.last_loop_kf = kf_id
            self.loop_edges.append((kf_id, cand))
            # deferred global BA (the reference runs GBA on a separate
            # thread with abort-on-new-loop, LoopClosing.cc:579 mbStopGBA;
            # here the essential graph lands immediately and the full BA is
            # deferred to the next quiet keyframe — a newer loop supersedes
            # a pending one, which is the abort semantics)
            self.pending_gba = kf_id
            return m, True
        return m, False

    def maybe_run_gba(self, m: ms.MapState) -> ms.MapState:
        """Run a deferred global BA if one is pending (called by the System
        at the next keyframe, i.e. once the closure has 'settled')."""
        if getattr(self, "pending_gba", None) is None:
            return m
        self.pending_gba = None
        return global_ba(self.cfg, m)
