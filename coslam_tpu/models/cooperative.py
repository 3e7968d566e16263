"""Cooperative multi-agent layer: keyframe exchange + cross-agent map merge.

This is the feature that defines the reference (SURVEY.md section 0): two
ORB-SLAM2 processes linked by LCM UDP multicast, the sender serializing
batches of <= 10 keyframes every 500 viewer ticks
(ORB_SLAM2.1/.../ros_mono.cc:1915-2399, lcmKeyFrameInfo schema SURVEY 2.3)
and the receiver reconstructing KeyFrame+MapPoint objects directly from wire
data — no image transfer, no re-extraction — and feeding them to its normal
LocalMapping/LoopClosing backend (ORB_SLAM2/.../ros_mono.cc:2108-2192).

TPU-native redesign:
  * the wire format is a fixed-width packed array pytree (`KeyFramePacket`)
    — float32 keypoints (fixing the reference's int16 quantization,
    SURVEY 2.3), packed uint32 descriptors, per-keypoint landmark flags +
    world positions + stable sender landmark ids for dedup (the reference
    relies on global MapPoint ids the same way);
  * transport is pluggable: in-memory queues (in-process agents, tests),
    the native UDP-multicast bus (coslam_tpu/native, the LCM analog), or
    device collectives over the mesh agent axis (parallel/exchange.py);
  * foreign keyframes enter the receiver's map through the same insertion
    stage as local ones (wire-reconstruction: no extraction, no BoW
    recompute), after which the standard backend — triangulation, fusion,
    BA — integrates them;
  * cross-agent place recognition (landmark match shortlist vs own
    keyframes) + Sim3 RANSAC aligns the foreign sub-map, which is then
    rigidly (similarity) transformed into the local frame and fused —
    the explicit version of what the reference gets implicitly from its
    loop-closing machinery (SURVEY section 0).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models import local_mapping as lm
from coslam_tpu.models import loop_closing as lc
from coslam_tpu.models import map_state as ms
from coslam_tpu.models.frame import Frame
from coslam_tpu.models.system import System
from coslam_tpu.utils import geometry as geo

_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class KeyFramePacket(NamedTuple):
    """Wire keyframe — the analog of lcmKeyFrameInfo (reference
    include/lcmKeyFrame/lcmKeyFrameInfo.hpp:25-150)."""
    agent_id: int
    frame_id: int
    pose: np.ndarray       # (4, 4) Tcw in the SENDER's world frame
    uv: np.ndarray         # (N, 2) float32 undistorted keypoints
    level: np.ndarray      # (N,)
    angle: np.ndarray      # (N,)
    desc: np.ndarray       # (N, 8) uint32
    kp_valid: np.ndarray   # (N,)
    pt_flag: np.ndarray    # (N,) bool — keypoint has a landmark
    pt_world: np.ndarray   # (N, 3) landmark position (sender world frame)
    pt_id: np.ndarray      # (N,) int64 stable sender landmark id (-1)


def pack_keyframe(m: ms.MapState, kf_id: int, agent_id: int) -> KeyFramePacket:
    """Serialize one keyframe + its landmarks (sender side; the analogue of
    the TX loop at reference ORB_SLAM2.1/.../ros_mono.cc:1943-2393)."""
    pt = np.asarray(m.kf_obs_pt[kf_id])
    flag = pt >= 0
    pos = np.asarray(m.pt_pos)[np.maximum(pt, 0)]
    return KeyFramePacket(
        agent_id=agent_id,
        frame_id=int(m.kf_frame_id[kf_id]),
        pose=np.asarray(m.kf_pose[kf_id]),
        uv=np.asarray(m.kf_uv[kf_id]),
        level=np.asarray(m.kf_level[kf_id]),
        angle=np.asarray(m.kf_angle[kf_id]),
        desc=np.asarray(m.kf_desc[kf_id]),
        kp_valid=np.asarray(m.kf_kp_valid[kf_id]),
        pt_flag=flag,
        pt_world=np.where(flag[:, None], pos, 0.0).astype(np.float32),
        pt_id=np.where(flag, pt.astype(np.int64), -1),
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _add_foreign_points(cfg: SystemConfig, m: ms.MapState, pos, desc,
                        need, kf_slot_hint):
    """Allocate landmarks for a foreign keyframe's flagged keypoints that
    have not been seen before (prefix-sum slot allocation)."""
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

    n = pos.shape[0]
    m = m._replace(
        pt_pos=sc(m.pt_pos, pos),
        pt_valid=sc(m.pt_valid, can),
        pt_desc=sc(m.pt_desc, desc),
        pt_normal=sc(m.pt_normal, jnp.zeros((n, 3), jnp.float32)
                     .at[:, 2].set(1.0)),
        pt_max_dist=sc(m.pt_max_dist, jnp.full(n, 10.0, jnp.float32)),
        pt_ref_kf=sc(m.pt_ref_kf, jnp.full(n, kf_slot_hint, jnp.int32)),
        pt_first_kf=sc(m.pt_first_kf, jnp.full(n, kf_slot_hint, jnp.int32)),
        pt_visible=sc(m.pt_visible, jnp.ones(n, jnp.int32)),
        pt_found=sc(m.pt_found, jnp.ones(n, jnp.int32)),
        n_pt=jnp.minimum(m.n_pt + can.sum(), P),
    )
    return m, jnp.where(can, slot, -1)


@functools.partial(jax.jit, static_argnums=(0,))
def _apply_sim3_to_component(cfg: SystemConfig, m: ms.MapState,
                             s, R, t, kf_mask, pt_mask):
    """Similarity-transform a sub-map component: X -> s R X + t for its
    landmarks; poses updated so camera-frame coords are preserved
    (T_new = [R_old R^T | (t_old - R_old R^T t / s) ... via Sim3 algebra])."""
    S = {"s": s, "R": R, "t": t}
    Sinv = geo.sim3_inverse(S)
    pt_new = geo.sim3_apply(S, m.pt_pos[:, None, :])[:, 0, :]
    # pose: S_kw_new = S_kw_old o S^-1, then [R | t/s]
    K = m.kf_pose.shape[0]
    S_old = {"s": jnp.ones(K, jnp.float32),
             "R": m.kf_pose[:, :3, :3], "t": m.kf_pose[:, :3, 3]}
    s_n = S_old["s"] * Sinv["s"]
    R_n = _he("kij,jl->kil", S_old["R"], Sinv["R"])
    t_n = S_old["s"][:, None] * _he("kij,j->ki", S_old["R"], Sinv["t"]) \
        + S_old["t"]
    T_new = geo.se3(R_n, t_n / s_n[:, None])
    return m._replace(
        pt_pos=jnp.where(pt_mask[:, None], pt_new, m.pt_pos),
        kf_pose=jnp.where(kf_mask[:, None, None], T_new, m.kf_pose),
    )


class CoopAgent(System):
    """A SLAM agent that can publish its keyframes and integrate foreign
    ones — the union of the reference's sender (ORB_SLAM2.1) and receiver
    (ORB_SLAM2) roles."""

    def __init__(self, cfg: SystemConfig, agent_id: int = 0, **kw):
        super().__init__(cfg, **kw)
        self.agent_id = agent_id
        K = cfg.mapper.max_keyframes
        P = cfg.mapper.max_points
        self.kf_agent = np.full(K, -1, np.int32)
        self.pt_agent = np.full(P, -1, np.int32)
        self._kf_sent = np.zeros(K, bool)
        # sender (agent, pt_id) -> local pt slot (dedup across packets,
        # mirroring the reference's global-MapPoint-id reconstruction)
        self._foreign_pt: Dict[Tuple[int, int], int] = {}
        self._published_kfs = 0
        self._foreign_agents: set = set()
        self.merged_agents: Dict[int, bool] = {}
        # per-agent world alignment (s, R, t): x_local = s R x_sender + t
        self._agent_sim3: Dict[int, Tuple[float, np.ndarray, np.ndarray]] = {}
        self.n_merges = 0

    # -- bookkeeping hooks -------------------------------------------------
    def _insert_keyframe(self, frame, frame_id, update_track_state=True):
        k_before = self._host_n_kf
        kf_i = super()._insert_keyframe(frame, frame_id, update_track_state)
        for k in range(k_before, self._host_n_kf):
            self.kf_agent[k] = self.agent_id
        self.pt_agent[np.asarray(self.map.pt_valid) & (self.pt_agent < 0)] = \
            self.agent_id
        self._merge_retry()
        return kf_i

    def _note_inserted_keyframes(self, first_kf: int, count: int):
        # chunked-driver insertions bypass _insert_keyframe — tag here
        self.kf_agent[first_kf: first_kf + count] = self.agent_id
        self.pt_agent[np.asarray(self.map.pt_valid) & (self.pt_agent < 0)] \
            = self.agent_id
        self._merge_retry()

    def _try_initialize(self, frame, frame_id):
        super()._try_initialize(frame, frame_id)
        if self.state == "OK":
            self.kf_agent[: int(self.map.n_kf)] = self.agent_id
            self.pt_agent[np.asarray(self.map.pt_valid)
                          & (self.pt_agent < 0)] = self.agent_id

    def _remap_after_compact(self, old, new_m, kf_map, pt_map):
        super()._remap_after_compact(old, new_m, kf_map, pt_map)
        kf_agent = np.full_like(self.kf_agent, -1)
        keep = kf_map >= 0
        kf_agent[kf_map[keep]] = self.kf_agent[: len(kf_map)][keep]
        self.kf_agent = kf_agent
        pt_agent = np.full_like(self.pt_agent, -1)
        keepp = pt_map >= 0
        pt_agent[pt_map[keepp]] = self.pt_agent[: len(pt_map)][keepp]
        self.pt_agent = pt_agent
        self._foreign_pt = {key: int(pt_map[v])
                            for key, v in self._foreign_pt.items()
                            if v < len(pt_map) and pt_map[v] >= 0}
        sent = np.zeros_like(self._kf_sent)
        sent[kf_map[keep]] = self._kf_sent[: len(kf_map)][keep]
        self._kf_sent = sent

    def _set_cfg(self, cfg2):
        super()._set_cfg(cfg2)
        K2 = cfg2.mapper.max_keyframes
        P2 = cfg2.mapper.max_points
        if K2 > len(self.kf_agent):
            self.kf_agent = np.concatenate(
                [self.kf_agent, np.full(K2 - len(self.kf_agent), -1,
                                        np.int32)])
        if P2 > len(self.pt_agent):
            self.pt_agent = np.concatenate(
                [self.pt_agent, np.full(P2 - len(self.pt_agent), -1,
                                        np.int32)])
        if K2 > len(self._kf_sent):
            self._kf_sent = np.concatenate(
                [self._kf_sent, np.zeros(K2 - len(self._kf_sent), bool)])

    # -- sender ------------------------------------------------------------
    def drain_packets(self, max_batch: int = 10) -> List[KeyFramePacket]:
        """Publish keyframes not yet sent (reference cadence: <= 10 KFs per
        batch, ros_mono.cc:1948)."""
        n_kf = int(self.map.n_kf)
        kf_valid = np.asarray(self.map.kf_valid)
        out = []
        for k in range(n_kf):
            if len(out) >= max_batch:
                break
            if self._kf_sent[k] or self.kf_agent[k] != self.agent_id \
                    or not kf_valid[k]:
                continue
            out.append(pack_keyframe(self.map, k, self.agent_id))
            self._kf_sent[k] = True
            self._published_kfs += 1
        return out

    # -- receiver ----------------------------------------------------------
    def receive_packet(self, pkt: KeyFramePacket) -> bool:
        """Handle a wire keyframe (reference CreateNewKeyFrame(id) path,
        ros_mono.cc:2108-2192).  Keyframes from a NOT-YET-ALIGNED sender
        integrate WITHOUT the cross-map backend pass — their sub-map lives
        in the sender's unrelated world frame, and running fusing/local BA
        across the components there would cross-bind them and corrupt the
        local map (the reference's staging map Map_KFV keeps received data
        apart the same way, ros_mono.cc:178,540).  Alignment is attempted
        on every received packet and re-attempted whenever the OWN map
        grows (_merge_retry).  Returns True on an alignment/closure
        event."""
        if self.state != "OK":
            return False
        self._foreign_agents.add(pkt.agent_id)
        merged = self.merged_agents.get(pkt.agent_id, False)
        k = self._integrate_packet(pkt, full_backend=merged)
        if not merged:
            return self._try_merge(k, pkt.agent_id)
        # keep cross-agent place recognition ALIVE — later drift between
        # the sub-maps is re-corrected continuously (the reference gets
        # this from its LoopClosing thread, which keeps detecting loops
        # between the local and received sub-maps, SURVEY section 3.5):
        #   1. the standard loop-closing path (essential graph + GBA) when
        #      the receiver runs with loop closing enabled;
        #   2. cross-agent RE-ALIGNMENT: a verified residual Sim3 snaps the
        #      whole foreign component back and folds into the stored
        #      alignment so FUTURE packets arrive pre-corrected.
        if self.loop_closer is not None:
            m, closed = self.loop_closer.on_keyframe(self.map, k)
            self.map = m
            if closed:
                self.n_merges += 1
                return True
        return self._try_realign(k, pkt.agent_id)

    def _integrate_packet(self, pkt: KeyFramePacket,
                          full_backend: bool = True) -> int:
        """Wire-reconstruct a foreign keyframe into the local map; returns
        its keyframe slot."""
        self._ensure_capacity()   # recycle/grow slots like local insertion
        m = self.map
        # if this agent's frame is already aligned, transform the packet
        # into the local world frame on arrival
        if pkt.agent_id in self._agent_sim3:
            s, R, t = self._agent_sim3[pkt.agent_id]
            pt_world = (s * pkt.pt_world @ R.T + t).astype(np.float32)
            # T_new = [R_old R^T | (t_old - R_old R^T t) / s] via
            # S_kw_new = S_kw_old o S^-1 then [Rn | tn/sn]
            R_old, t_old = pkt.pose[:3, :3], pkt.pose[:3, 3]
            Rn = R_old @ R.T
            tn = t_old - Rn @ t / s  # (S_old o S^-1): t = 1*R_old(-R^T t/s)+t_old
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = Rn
            pose[:3, 3] = tn * s  # divide by s_n = 1/s  ->  multiply by s
            pkt = pkt._replace(pose=pose, pt_world=pt_world)
        # dedup landmarks by sender id
        N = pkt.uv.shape[0]
        kp_pt = np.full(N, -1, np.int32)
        need_new = np.zeros(N, bool)
        for i in np.nonzero(pkt.pt_flag)[0]:
            key = (pkt.agent_id, int(pkt.pt_id[i]))
            if key in self._foreign_pt:
                kp_pt[i] = self._foreign_pt[key]
            else:
                need_new[i] = True
        m, new_ids = _add_foreign_points(
            self.cfg, m, jnp.asarray(pkt.pt_world), jnp.asarray(pkt.desc),
            jnp.asarray(need_new), m.n_kf)
        new_ids = np.asarray(new_ids)
        for i in np.nonzero(need_new)[0]:
            if new_ids[i] >= 0:
                self._foreign_pt[(pkt.agent_id, int(pkt.pt_id[i]))] = \
                    int(new_ids[i])
                kp_pt[i] = new_ids[i]
                self.pt_agent[new_ids[i]] = pkt.agent_id

        frame = Frame(
            uv=jnp.asarray(pkt.uv), uv_raw=jnp.asarray(pkt.uv),
            level=jnp.asarray(pkt.level), angle=jnp.asarray(pkt.angle),
            response=jnp.zeros(N, jnp.float32), desc=jnp.asarray(pkt.desc),
            valid=jnp.asarray(pkt.kp_valid),
            inv_sigma2=1.0 / jnp.asarray(
                self.cfg.extractor.level_sigma2, jnp.float32)[
                    jnp.asarray(pkt.level)])
        m, k = lm.insert_keyframe(
            self.cfg, m, frame, jnp.asarray(pkt.pose),
            jnp.asarray(pkt.frame_id), jnp.asarray(kp_pt))
        k = int(k)
        self._host_n_kf = k + 1
        self.kf_agent[k] = pkt.agent_id
        self.db.add(k, frame.desc, frame.valid)
        self.db.maybe_retrain(m)

        # an ALIGNED foreign keyframe gets the full backend treatment,
        # exactly like a local one (reference hands wire-reconstructed KFs
        # to LocalMapping at ros_mono.cc:2163 -> CreateNewMapPoints among
        # received keyframes LocalMapping.cc:207, SearchInNeighbors :454,
        # local BA, culling).  Pre-merge keyframes stay RAW wire
        # reconstructions: their sub-map is in the sender's unrelated world
        # frame, where both whole-map fusing (cross-binds the components)
        # and even intra-component local BA (shifts the sub-map off its
        # wire poses before the Sim3 is estimated) degrade the eventual
        # merge; the backend pass runs for them after alignment
        # (_try_merge's sweep).
        if full_backend:
            m = lm.backend_post_insert(self.cfg, m, jnp.asarray(k))
        self.map = m
        self._kf_pose_dirty = True
        self._host_n_pt = int(np.asarray(m.n_pt))
        # new triangulated points belong to the sub-map of their keyframe
        self.pt_agent[np.asarray(self.map.pt_valid)
                      & (self.pt_agent < 0)] = pkt.agent_id
        return k

    # -- cross-agent alignment --------------------------------------------
    def _merge_retry(self):
        """Re-attempt the first alignment of a still-unmerged foreign
        sub-map whenever the OWN map grows (reference: LoopClosing keeps
        checking every inserted keyframe against the database, so a foreign
        keyframe that arrived before the local map covered the overlap
        merges as soon as coverage appears, LoopClosing.cc:57-101).  The
        retried keyframes are the foreign ones scoring highest against the
        own map in the BoW database."""
        for aid in list(self._foreign_agents):
            if self.merged_agents.get(aid):
                continue
            K = self.db.bows.shape[0]
            valid = np.asarray(self.map.kf_valid)[:K]
            fore = np.nonzero((self.kf_agent[:K] == aid) & valid
                              & self.db.has)[0]
            own = (self.kf_agent[:K] == self.agent_id) & valid & self.db.has
            if len(fore) == 0 or own.sum() < 2:
                continue
            best = []
            for k in fore:
                scores = self.db.scores_against_all(int(k))
                s = float(np.where(own, scores, -1.0).max())
                best.append((s, int(k)))
            best.sort(reverse=True)
            for s, k in best[:2]:
                if s <= 0.02:
                    break
                if self._try_merge(k, aid):
                    break

    def _try_merge(self, foreign_kf: int, agent_id: int) -> bool:
        """First cross-agent alignment: on a verified Sim3, the foreign
        component is similarity-transformed into the local frame, duplicate
        landmarks fuse, and the alignment is stored so later packets arrive
        pre-transformed."""
        found = self._find_cross_sim3(foreign_kf)
        if found is None:
            return False
        S_w, pt1, pt2, pairs = found
        self._apply_cross_sim3(agent_id, S_w, pt1, pt2, pairs, ba_iters=5)
        self.merged_agents[agent_id] = True
        self._agent_sim3[agent_id] = (
            float(S_w["s"]), np.asarray(S_w["R"]), np.asarray(S_w["t"]))
        self.n_merges += 1
        # the pre-merge foreign keyframes skipped the backend pass; now
        # that the component sits in the local frame, give the merge
        # keyframe the full treatment (triangulation/fusion across agents)
        self.map = lm.backend_post_insert(self.cfg, self.map,
                                          jnp.asarray(foreign_kf))
        self._host_n_pt = int(np.asarray(self.map.n_pt))
        self.pt_agent[np.asarray(self.map.pt_valid)
                      & (self.pt_agent < 0)] = agent_id
        # residual-drift sweep: when many foreign keyframes were already
        # integrated before alignment succeeded (late merge), re-verify the
        # strongest other cross-agent pairs and fold their residual Sim3s
        # in — each verified residual fuses more duplicates and re-optimizes
        # jointly (the reference's LoopClosing would keep closing these as
        # separate loop events over the following keyframes)
        K = self.db.bows.shape[0]
        valid = np.asarray(self.map.kf_valid)[:K]
        own = (self.kf_agent[:K] == self.agent_id) & valid & self.db.has
        fore = np.nonzero((self.kf_agent[:K] == agent_id) & valid
                          & self.db.has)[0]
        scored = []
        for k in fore:
            if int(k) == int(foreign_kf):
                continue
            s = float(np.where(own, self.db.scores_against_all(int(k)),
                               -1.0).max())
            scored.append((s, int(k)))
        scored.sort(reverse=True)
        for s, k in scored[:3]:
            if s <= 0.02:
                break
            # give the aligned foreign keyframe the backend pass it skipped
            # pre-merge (cross-agent fuse + triangulation + local BA), THEN
            # re-verify its residual Sim3 — the added cross-agent
            # observations both strengthen the verification and let the
            # joint optimization actually pull the components together
            self.map = lm.backend_post_insert(self.cfg, self.map,
                                              jnp.asarray(int(k)))
            self._host_n_pt = int(np.asarray(self.map.n_pt))
            self.pt_agent[np.asarray(self.map.pt_valid)
                          & (self.pt_agent < 0)] = agent_id
            self._kf_pose_dirty = True
            self._try_realign(k, agent_id)
        # one joint optimization over the merged map with the sweep's
        # cross-agent observations in place (the reference's post-loop GBA,
        # LoopClosing.cc:645) — realign events run their own BA only when
        # their residual verifies, but the added observations help even
        # when no residual does
        if scored:
            self.map = lc.global_ba(self.cfg, self.map, iters=8)
            self._kf_pose_dirty = True
        return True

    def _find_cross_sim3(self, foreign_kf: int):
        """Place-recognize `foreign_kf` against OWN keyframes via the BoW
        database (the reference's KeyFrameDatabase feeding
        LoopClosing::DetectLoop detects cross-sub-map loops the same way,
        KeyFrameDatabase.cc:76); a short BoW candidate list is geometrically
        pre-verified with landmark match counts, then Sim3 RANSAC verifies.

        Returns (S_w, pt1, pt2, inlier_pairs) with S_w the world-to-world
        similarity mapping the foreign keyframe's CURRENT frame into the own
        map's frame, or None if no candidate verifies."""
        cfg = self.cfg
        m = self.map
        own = (self.kf_agent[: self.db.bows.shape[0]] == self.agent_id) \
            & np.asarray(m.kf_valid)[: self.db.bows.shape[0]]
        if cfg.loop.brute_force_shortlist:
            counts = np.asarray(lc.match_counts_all(cfg, m, foreign_kf))
            counts = np.where(own[: counts.shape[0]], counts, -1)
            order = [int(c) for c in np.argsort(-counts)[:3]]
        else:
            scores = self.db.scores_against_all(foreign_kf)
            scores = np.where(own & self.db.has, scores, -1.0)
            bow_cands = [int(c) for c in np.argsort(-scores)[:8]
                         if scores[c] > 0.02]
            if not bow_cands:
                return None
            counts_sub = np.asarray(lc.match_counts_subset(
                cfg, m, jnp.asarray(foreign_kf),
                jnp.asarray(bow_cands, dtype=jnp.int32)))
            counts = np.full(self.db.bows.shape[0], -1, np.int64)
            counts[np.asarray(bow_cands)] = counts_sub
            order = [int(bow_cands[i]) for i in np.argsort(-counts_sub)[:3]]
        for cand in order:
            cand = int(cand)
            if counts[cand] < cfg.loop.sim3_min_bow_matches:
                continue
            idx2, pt1, pt2, ok = lc.match_pair_points(cfg, m, foreign_kf, cand)
            if int(ok.sum()) < cfg.loop.sim3_min_bow_matches:
                continue
            key = jax.random.PRNGKey(1234 + foreign_kf)
            res = lc.sim3_between(cfg, m, foreign_kf, cand, idx2, pt1,
                                  pt2, ok, key)
            if int(res.n_inliers) < max(8, cfg.loop.sim3_min_inliers // 2):
                continue
            # scale sanity: two mono agents' maps are independently
            # median-depth-normalized at init, so their relative scale is
            # bounded by a modest factor; a degenerate RANSAC fit can pass
            # the reprojection gate at an absurd scale (see LoopCloser).
            # The cross-agent bound is the square of the intra-map one.
            s_max = cfg.loop.sim3_max_scale ** 2
            if not (1.0 / s_max < float(res.s) < s_max):
                continue
            # SearchBySim3-style expansion + polish (same flow as
            # LoopCloser.on_keyframe; the acceptance gate applies to the
            # EXPANDED inlier set)
            idx2, pt1, pt2, ok = lc.expand_sim3_matches(
                cfg, m, jnp.asarray(foreign_kf), jnp.asarray(cand),
                res.s, res.R, res.t)
            res = lc.sim3_refine_pairs(cfg, m, jnp.asarray(foreign_kf),
                                       jnp.asarray(cand), idx2, pt1, pt2,
                                       ok, res.s, res.R, res.t)
            if int(res.n_inliers) < cfg.loop.sim3_min_inliers:
                continue
            if not (1.0 / s_max < float(res.s) < s_max):
                continue
            # S21: foreign-KF cam -> own-KF cam.  World-to-world:
            # S_wOwn_wFor = T_own^-1 o S21 o T_for  (as Sim3)
            T_own = geo.sim3_from_se3(
                geo.se3_inverse(m.kf_pose[cand]))
            S21 = {"s": res.s, "R": res.R, "t": res.t}
            T_for = geo.sim3_from_se3(m.kf_pose[foreign_kf])
            S_w = geo.sim3_compose(T_own, geo.sim3_compose(S21, T_for))
            return S_w, pt1, pt2, ok & res.inliers
        return None

    def _apply_cross_sim3(self, agent_id: int, S_w, pt1, pt2, pairs,
                          ba_iters: int):
        """Similarity-correct the whole foreign component, fuse duplicate
        landmarks, refresh geometry and jointly optimize."""
        cfg = self.cfg
        m = self.map
        kf_mask = jnp.asarray(self.kf_agent == agent_id) & m.kf_valid
        pt_mask = jnp.asarray(self.pt_agent == agent_id) & m.pt_valid
        m = _apply_sim3_to_component(cfg, m, S_w["s"], S_w["R"],
                                     S_w["t"], kf_mask, pt_mask)
        m = lc.fuse_landmarks(cfg, m, pt1, pt2, pairs)
        m = lm.refresh_point_geometry(cfg, m)
        m = lc.global_ba(cfg, m, iters=ba_iters)
        self.map = m
        self._kf_pose_dirty = True

    def _try_realign(self, foreign_kf: int, agent_id: int) -> bool:
        """Continued cross-agent correction (the reference's LoopClosing
        keeps firing between local and received sub-maps as long as both
        grow, ros_mono.cc:2163 -> LoopClosing.cc:57): re-verify the freshly
        received keyframe against the own map; a verified RESIDUAL Sim3
        (the component already sits in the local frame) re-corrects the
        whole foreign component and composes into the stored alignment, so
        the sender's internal drift cannot accumulate through a frozen
        first-merge transform."""
        found = self._find_cross_sim3(foreign_kf)
        if found is None:
            return False
        S_res, pt1, pt2, pairs = found
        # Residual sanity: the component is ALREADY aligned, so a valid
        # correction must be near-identity.  A wildly-scaled Sim3 can carry
        # many RANSAC "inliers" — projecting s*R*x+t into the candidate
        # image is invariant under (s,t) -> (a*s,a*t), so scale is only
        # weakly pinned by the reverse check — and applying one destroys
        # the merged map.  (The first merge has no such prior; this gate is
        # realign-only.)
        s = float(np.asarray(S_res["s"]))
        R = np.asarray(S_res["R"])
        t = np.asarray(S_res["t"])
        ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
        if not (0.8 < s < 1.25) or ang > 15.0:
            return False
        # and it must actually move fused-pair duplicates closer together
        pairs_np = np.asarray(pairs)
        p1 = np.asarray(pt1)
        p2 = np.asarray(pt2)
        sel = pairs_np & (p1 != p2)
        if sel.sum() >= 6:
            pos = np.asarray(self.map.pt_pos)
            a, b = pos[p1[sel]], pos[p2[sel]]
            pre = np.median(np.linalg.norm(a - b, axis=1))
            post = np.median(np.linalg.norm((s * a @ R.T + t) - b, axis=1))
            if post >= pre:
                return False
        self._apply_cross_sim3(agent_id, S_res, pt1, pt2, pairs, ba_iters=4)
        # compose: x_local_new = S_res(x_local_old), x_local_old = S_old(x_sender)
        s0, R0, t0 = self._agent_sim3[agent_id]
        S_old = {"s": jnp.float32(s0), "R": jnp.asarray(R0),
                 "t": jnp.asarray(t0)}
        S_new = geo.sim3_compose(S_res, S_old)
        self._agent_sim3[agent_id] = (
            float(S_new["s"]), np.asarray(S_new["R"]), np.asarray(S_new["t"]))
        self.n_merges += 1
        return True


def serialize_packet(pkt: KeyFramePacket) -> bytes:
    """Wire encoding (the lcm-gen analog): npz of the packet fields."""
    import io

    bio = io.BytesIO()
    np.savez_compressed(
        bio, agent_id=pkt.agent_id, frame_id=pkt.frame_id, pose=pkt.pose,
        uv=pkt.uv, level=pkt.level, angle=pkt.angle, desc=pkt.desc,
        kp_valid=pkt.kp_valid, pt_flag=pkt.pt_flag, pt_world=pkt.pt_world,
        pt_id=pkt.pt_id)
    return bio.getvalue()


def deserialize_packet(data: bytes) -> KeyFramePacket:
    import io

    z = np.load(io.BytesIO(data))
    return KeyFramePacket(
        agent_id=int(z["agent_id"]), frame_id=int(z["frame_id"]),
        pose=z["pose"], uv=z["uv"], level=z["level"], angle=z["angle"],
        desc=z["desc"], kp_valid=z["kp_valid"], pt_flag=z["pt_flag"],
        pt_world=z["pt_world"], pt_id=z["pt_id"])


class UdpBus:
    """Cross-process transport over the native UDP-multicast bus
    (coslam_tpu/native) — the direct LCM replacement: channel
    "KeyFrameexample" semantics, best-effort delivery, receiver-side
    filtering by sender id (reference ros_mono.cc:602/2399)."""

    CHANNEL = "KeyFrameexample"

    def __init__(self, group_ip: str = "239.255.76.67", port: int = 7667):
        from coslam_tpu import native

        self._tp = native.Transport(group_ip, port)

    def publish(self, sender: int, pkts: List[KeyFramePacket],
                subscribers=None):
        for p in pkts:
            self._tp.publish(self.CHANNEL, serialize_packet(p))

    def drain(self, agent_id: int, timeout_ms: int = 200
              ) -> List[KeyFramePacket]:
        out = []
        while True:
            msg = self._tp.receive(timeout_ms=timeout_ms if not out else 20)
            if msg is None:
                break
            _, data = msg
            pkt = deserialize_packet(data)
            if pkt.agent_id != agent_id:
                out.append(pkt)
        return out

    def close(self):
        self._tp.close()


class InMemoryBus:
    """Loss-less in-process transport (tests / single-host multi-agent).
    The native UDP multicast bus (coslam_tpu/native) is the drop-in
    cross-process replacement, mirroring LCM channel semantics."""

    def __init__(self):
        self.queues: Dict[int, List[KeyFramePacket]] = {}

    def publish(self, sender: int, pkts: List[KeyFramePacket],
                subscribers: List[int]):
        for sub in subscribers:
            if sub != sender:
                self.queues.setdefault(sub, []).extend(pkts)

    def drain(self, agent_id: int) -> List[KeyFramePacket]:
        out = self.queues.get(agent_id, [])
        self.queues[agent_id] = []
        return out
