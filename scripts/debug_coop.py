"""Instrumented repro of tests/test_cooperative.py::test_two_agent_continued_correction.

Prints, for every foreign keyframe received after the first merge, why the
loop-closing path did or did not fire: cooldown, eligibility breakdown,
BoW candidate shortlist, geometric match counts, Sim3 inliers.
"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from coslam_tpu.config import (CameraConfig, ExtractorConfig, LoopConfig,
                               MapperConfig, SystemConfig, TrackerConfig)
from coslam_tpu.models import loop_closing as lc
from coslam_tpu.models import map_state as ms
from coslam_tpu.models.cooperative import CoopAgent, InMemoryBus
from coslam_tpu.utils import evaluation, synthetic

CFG = SystemConfig(
    camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
    extractor=ExtractorConfig(n_features=400, max_keypoints=512),
    mapper=MapperConfig(max_keyframes=128, max_points=32768),
    loop=LoopConfig(min_kfs_between_loops=8, sim3_min_bow_matches=15,
                    sim3_min_inliers=12),
    tracker=TrackerConfig(init_min_matches=60, init_min_good=35),
)


def probe(agent, k):
    """Replicate LoopCloser.on_keyframe gating for keyframe k, verbosely."""
    self = agent.loop_closer
    m = agent.map
    lcfg = self.cfg.loop
    import jax.numpy as jnp
    cd = k - self.last_loop_kf
    covis_row = np.asarray(lc._covis_row_jit(m, jnp.asarray(k)))
    K = covis_row.shape[0]
    eligible = (np.arange(K) != k) \
        & (covis_row < self.cfg.mapper.covis_edge_threshold) \
        & (np.abs(np.arange(K) - k) > lcfg.min_kfs_between_loops) \
        & np.asarray(m.kf_valid)
    own = agent.kf_agent[:K] == agent.agent_id
    n_own_elig = int((eligible & own).sum())
    blocked_covis = int((own & np.asarray(m.kf_valid)[:K]
                         & (covis_row >= self.cfg.mapper.covis_edge_threshold)
                         ).sum())
    blocked_dist = int((own & np.asarray(m.kf_valid)[:K]
                        & (np.abs(np.arange(K) - k)
                           <= lcfg.min_kfs_between_loops)).sum())
    cands = self.db.detect_loop_candidates(m, k, covis_row)
    cands_elig = [c for c in cands if eligible[c]]
    cands_own = [c for c in cands if eligible[c] and own[c]]
    counts_str = ""
    if cands_elig:
        counts = np.asarray(lc.match_counts_subset(
            self.cfg, m, jnp.asarray(k),
            jnp.asarray(cands_elig[:8], dtype=jnp.int32)))
        counts_str = str(list(zip(cands_elig[:8], counts.tolist())))
    print(f"  [probe kf {k}] cooldown={cd} own_elig={n_own_elig} "
          f"blocked(covis)={blocked_covis} blocked(dist)={blocked_dist} "
          f"bow_cands={list(cands)[:8]} elig={cands_elig[:8]} own={cands_own} "
          f"counts={counts_str}", flush=True)


def joint_ate(a0, traj):
    m = a0.map
    K = int(m.n_kf)
    valid = np.asarray(m.kf_valid[:K])
    fid = np.asarray(m.kf_frame_id[:K])
    centers = np.asarray(ms.kf_centers(m))[:K]
    gt_centers = evaluation.trajectory_xyz(traj.poses_cw[fid])
    return evaluation.ate_rmse(centers[valid], gt_centers[valid])


def main():
    cfg = CFG
    scene = synthetic.make_cylinder_scene(700, seed=5)
    traj = synthetic.make_loop_trajectory(90, seed=5, frac=0.72)
    seq = synthetic.render_sequence(cfg.camera, traj, scene)

    a0 = CoopAgent(cfg, 0, enable_loop_closing=True)
    a1 = CoopAgent(cfg, 1, enable_loop_closing=False)
    a0.loop_closer.verbose = True
    for i in range(0, 38):
        a0.track_mono(seq[i], i)
    print(f"a0 init: state={a0.state} n_kf={int(a0.map.n_kf)} "
          f"ate={joint_ate(a0, traj):.4f}")

    bus = InMemoryBus()
    events = []
    for i in range(30, 80):
        a1.track_mono(seq[i], i)
        if i % 8 == 0 or i == 79:
            bus.publish(1, a1.drain_packets(max_batch=10), subscribers=[0, 1])
            for p in bus.drain(0):
                before = a0.n_merges
                merged_agent = a0.merged_agents.get(p.agent_id, False)
                got = a0.receive_packet(p)
                k = a0._host_n_kf - 1
                if merged_agent:
                    probe(a0, k)
                if got:
                    events.append((i, k))
                    print(f"  EVENT at frame {i}, kf {k} "
                          f"(n_merges {before}->{a0.n_merges}) "
                          f"ate={joint_ate(a0, traj):.4f}", flush=True)
            print(f"[i={i}] a0 n_kf={int(a0.map.n_kf)} "
                  f"merges={a0.n_merges} ate={joint_ate(a0, traj):.4f}",
                  flush=True)
    print(f"final: merges={a0.n_merges} events={events} "
          f"ate={joint_ate(a0, traj):.4f}")


if __name__ == "__main__":
    main()
