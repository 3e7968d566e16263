#!/usr/bin/env python
"""Characterize place-recognition quality: BoW shortlist recall vs the
brute-force landmark matcher as ground truth (VERDICT r3 weak #6 / task #8).

The loop/merge machinery depends entirely on the online-trained vocabulary's
shortlist selectivity (models/keyframe_db.py; reference ships a pretrained
1M-word DBoW2 tree instead, ORB_SLAM2/src/KeyFrameDatabase.cc:76-196).  This
harness runs a full-circle trajectory so every late keyframe revisits early
ones, then for each late-lap query keyframe compares:

  * ground truth: the eligible keyframe with the most mutual sub-TH_HIGH
    landmark descriptor matches (loop_closing.match_counts_all) — the
    geometric matcher the Sim3 verification ultimately depends on;
  * the BoW database's top-k score shortlist (tf-idf L1, consistency gates
    skipped to isolate retrieval quality).

Reported: recall@1/@3/@8 of the GT-best candidate, and the fraction of
queries where ANY accepted candidate (>= 15 landmark matches) appears in the
BoW top-3 — measured at the final vocabulary (post-retraining).

Writes results/PLACE_RECOGNITION.md.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import (CameraConfig, ExtractorConfig, LoopConfig,
                               MapperConfig, SystemConfig, TrackerConfig)
from coslam_tpu.models import loop_closing as lc
from coslam_tpu.models.system import System
from coslam_tpu.utils import synthetic

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    cfg = SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120,
                            width=320, height=240),
        extractor=ExtractorConfig(n_features=400, max_keypoints=512),
        mapper=MapperConfig(max_keyframes=128, max_points=32768),
        loop=LoopConfig(min_kfs_between_loops=10),
        tracker=TrackerConfig(init_min_matches=60, init_min_good=35),
    )
    scene = synthetic.make_cylinder_scene(700, seed=11)
    n = 140
    traj = synthetic.make_loop_trajectory(n, seed=11, frac=1.25)  # 1.25 laps
    seq = synthetic.render_sequence(cfg.camera, traj, scene)
    slam = System(cfg, enable_loop_closing=False)
    for i in range(n):
        slam.track_mono(seq[i], i)

    m = slam.map
    K = int(m.n_kf)
    kf_valid = np.asarray(m.kf_valid[:K])
    fids = np.asarray(m.kf_frame_id[:K])
    print(f"run: {K} keyframes, state {slam.state}")

    # queries: keyframes from the revisit stretch (frame id past one lap)
    lap_end = int(n / 1.25)
    queries = [k for k in range(K)
               if kf_valid[k] and fids[k] >= lap_end + 5]
    rows = []
    rec = {1: 0, 3: 0, 8: 0}
    any3 = 0
    n_q = 0
    th = cfg.loop.sim3_min_bow_matches
    for q in queries:
        covis = np.asarray(lc._covis_row_jit(m, jnp.asarray(q)))
        eligible = (np.arange(K) != q) & kf_valid[:K] \
            & (covis[:K] < cfg.mapper.covis_edge_threshold) \
            & (np.abs(fids - fids[q]) > 20)
        if eligible.sum() < 3:
            continue
        counts = np.asarray(lc.match_counts_all(cfg, m, q))[:K]
        counts = np.where(eligible, counts, -1)
        gt_best = int(np.argmax(counts))
        if counts[gt_best] < th:
            continue          # no geometrically-acceptable loop exists
        accepted = set(np.nonzero(counts >= th)[0].tolist())
        scores = slam.db.scores_against_all(q)[:K]
        scores = np.where(eligible & slam.db.has[:K], scores, -1.0)
        order = np.argsort(-scores)
        n_q += 1
        for k_at in (1, 3, 8):
            if gt_best in order[:k_at]:
                rec[k_at] += 1
        if accepted & set(order[:3].tolist()):
            any3 += 1
        rows.append((q, int(fids[q]), gt_best, int(counts[gt_best]),
                     order[:3].tolist(),
                     round(float(scores[gt_best]), 3)))

    out = os.path.join(ROOT, "PLACE_RECOGNITION.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("# Place-recognition quality (BoW shortlist vs brute-force "
                "landmark matcher)\n\n")
        f.write(f"Scene: cylinder, 1.25-lap loop trajectory, {n} frames, "
                f"{K} keyframes; vocabulary: online-trained "
                f"{cfg.loop.vocab_words} words "
                f"(retrain at {cfg.loop.vocab_retrain_at}).\n\n")
        if n_q == 0:
            f.write("NO revisit queries with a geometrically-acceptable "
                    "loop candidate were produced — rerun with a longer "
                    "lap.\n")
        else:
            f.write(f"Queries (revisit keyframes with a >= {th}-match "
                    f"ground-truth candidate): **{n_q}**\n\n")
            f.write("| metric | value |\n|---|---|\n")
            for k_at in (1, 3, 8):
                f.write(f"| recall@{k_at} of GT-best candidate | "
                        f"{rec[k_at] / n_q:.2f} |\n")
            f.write(f"| any accepted candidate in BoW top-3 | "
                    f"{any3 / n_q:.2f} |\n\n")
            f.write("| query kf | frame | GT best | matches | BoW top-3 | "
                    "BoW score of GT |\n|---|---|---|---|---|---|\n")
            for r in rows:
                f.write("| " + " | ".join(str(x) for x in r) + " |\n")
    print(f"wrote {out}: n_q={n_q} "
          + (f"recall@3={rec[3] / n_q:.2f} any3={any3 / n_q:.2f}"
             if n_q else ""))


if __name__ == "__main__":
    main()
