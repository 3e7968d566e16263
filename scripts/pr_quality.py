#!/usr/bin/env python
"""Characterize place-recognition quality: BoW shortlist recall/precision vs
the brute-force landmark matcher as ground truth (VERDICT r4 task #3).

The loop/merge machinery depends entirely on the vocabulary's shortlist
selectivity (models/keyframe_db.py; the reference ships a pretrained 1M-word
DBoW2 tree, ORB_SLAM2/src/KeyFrameDatabase.cc:76-196; this build ships the
offline-trained assets/vocab.npz from scripts/train_vocab.py).  The harness
runs full-circle trajectories over MULTIPLE scenes so every late keyframe
revisits early ones, then for each late-lap query keyframe compares:

  * ground truth: the eligible keyframe with the most mutual sub-TH_HIGH
    landmark descriptor matches (loop_closing.match_counts_all) — the
    geometric matcher the Sim3 verification ultimately depends on;
  * the BoW database's top-k score shortlist (tf-idf L1, consistency gates
    skipped to isolate retrieval quality).

Reported per scene and pooled: recall@1/@3/@8 of the GT-best candidate,
precision@1/@3 (fraction of shortlisted candidates that are geometrically
acceptable, >= 15 matches), and the fraction of queries where ANY accepted
candidate appears in the BoW top-3.

Writes PLACE_RECOGNITION.md at the repo root.
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"  # local CPU compiles (see
#                                                 tests/conftest.py)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import (CameraConfig, ExtractorConfig, LoopConfig,
                               MapperConfig, SystemConfig, TrackerConfig)
from coslam_tpu.models import loop_closing as lc
from coslam_tpu.models.system import System
from coslam_tpu.utils import synthetic

ACCEPT_TH = 15   # landmark matches for a geometrically acceptable candidate


def run_scene(name, scene, traj, n, cfg):
    seq = synthetic.render_sequence(cfg.camera, traj, scene)
    slam = System(cfg, enable_loop_closing=False)
    for i in range(n):
        slam.track_mono(seq[i], i)

    m = slam.map
    K = int(m.n_kf)
    kf_valid = np.asarray(m.kf_valid[:K])
    fids = np.asarray(m.kf_frame_id[:K])

    lap_end = int(n / 1.25)
    queries = [k for k in range(K)
               if kf_valid[k] and fids[k] >= lap_end + 5]
    th = cfg.loop.sim3_min_bow_matches
    rows = []
    stats = dict(n_q=0, rec1=0, rec3=0, rec8=0, any3=0,
                 prec1_hit=0, prec1_n=0, prec3_hit=0, prec3_n=0)
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
        accepted = set(np.nonzero(counts >= ACCEPT_TH)[0].tolist())
        scores = slam.db.scores_against_all(q)[:K]
        scores = np.where(eligible & slam.db.has[:K], scores, -1.0)
        order = np.argsort(-scores)
        stats["n_q"] += 1
        for k_at, key in ((1, "rec1"), (3, "rec3"), (8, "rec8")):
            if gt_best in order[:k_at]:
                stats[key] += 1
        if accepted & set(order[:3].tolist()):
            stats["any3"] += 1
        stats["prec1_hit"] += int(int(order[0]) in accepted)
        stats["prec1_n"] += 1
        top3 = [int(c) for c in order[:3] if scores[c] > 0]
        stats["prec3_hit"] += sum(1 for c in top3 if c in accepted)
        stats["prec3_n"] += len(top3)
        rows.append((q, int(fids[q]), gt_best, int(counts[gt_best]),
                     order[:3].tolist(),
                     round(float(scores[gt_best]), 3)))
    return K, stats, rows


def main():
    def cfg_for(w, h):
        return SystemConfig(
            camera=CameraConfig(fx=300, fy=300, cx=w / 2, cy=h / 2,
                                width=w, height=h),
            extractor=ExtractorConfig(n_features=400, max_keypoints=512),
            mapper=MapperConfig(max_keyframes=192, max_points=32768),
            loop=LoopConfig(min_kfs_between_loops=10),
            tracker=TrackerConfig(init_min_matches=60, init_min_good=35),
        )

    scenes = []
    for name, seed, n_pts, radius, frames in (
            ("cylinder-A", 11, 700, 10.0, 140),
            ("cylinder-B", 29, 900, 8.0, 150),
            ("cylinder-C", 47, 800, 12.0, 160)):
        cfg = cfg_for(320, 240)
        scene = synthetic.make_cylinder_scene(n_pts, radius=radius, seed=seed)
        traj = synthetic.make_loop_trajectory(frames, seed=seed, frac=1.25)
        scenes.append((name, scene, traj, frames, cfg))

    from coslam_tpu.ops import bow
    pre = bow.load_pretrained_vocabulary()
    vocab_note = (f"pretrained assets/vocab.npz, {pre.shape[0]} words "
                  "(scripts/train_vocab.py)" if pre is not None
                  else "online-trained fallback")

    per_scene = []
    pooled = dict(n_q=0, rec1=0, rec3=0, rec8=0, any3=0,
                  prec1_hit=0, prec1_n=0, prec3_hit=0, prec3_n=0)
    all_rows = []
    for name, scene, traj, n, cfg in scenes:
        K, stats, rows = run_scene(name, scene, traj, n, cfg)
        per_scene.append((name, n, K, stats))
        for k in pooled:
            pooled[k] += stats[k]
        all_rows += [(name,) + r for r in rows]
        print(f"{name}: {K} keyframes, {stats['n_q']} queries, "
              f"recall@3={stats['rec3'] / max(stats['n_q'], 1):.2f}")

    out = os.path.join(ROOT, "PLACE_RECOGNITION.md")
    n_q = max(pooled["n_q"], 1)
    with open(out, "w") as f:
        f.write("# Place-recognition quality (BoW shortlist vs brute-force "
                "landmark matcher)\n\n")
        f.write(f"Vocabulary: {vocab_note}.  3 scenes, 1.25-lap loop "
                "trajectories; queries are revisit keyframes with a "
                f">= {scenes[0][4].loop.sim3_min_bow_matches}-match "
                "ground-truth candidate.  Precision counts shortlisted "
                f"candidates with >= {ACCEPT_TH} landmark matches as "
                "acceptable.\n\n")
        f.write("| scene | frames | KFs | queries | recall@1 | recall@3 | "
                "recall@8 | precision@1 | precision@3 | any-accepted@3 |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|\n")
        for name, n, K, s in per_scene:
            nq = max(s["n_q"], 1)
            f.write(f"| {name} | {n} | {K} | {s['n_q']} "
                    f"| {s['rec1'] / nq:.2f} | {s['rec3'] / nq:.2f} "
                    f"| {s['rec8'] / nq:.2f} "
                    f"| {s['prec1_hit'] / max(s['prec1_n'], 1):.2f} "
                    f"| {s['prec3_hit'] / max(s['prec3_n'], 1):.2f} "
                    f"| {s['any3'] / nq:.2f} |\n")
        f.write(f"| **pooled** | | | {pooled['n_q']} "
                f"| {pooled['rec1'] / n_q:.2f} "
                f"| {pooled['rec3'] / n_q:.2f} "
                f"| {pooled['rec8'] / n_q:.2f} "
                f"| {pooled['prec1_hit'] / max(pooled['prec1_n'], 1):.2f} "
                f"| {pooled['prec3_hit'] / max(pooled['prec3_n'], 1):.2f} "
                f"| {pooled['any3'] / n_q:.2f} |\n\n")
        f.write("Per-query detail (first 30):\n\n")
        f.write("| scene | query kf | frame | GT best | matches | BoW top-3 "
                "| BoW score of GT |\n|---|---|---|---|---|---|---|\n")
        for r in all_rows[:30]:
            f.write("| " + " | ".join(str(x) for x in r) + " |\n")
    print(f"wrote {out}: pooled n_q={pooled['n_q']} "
          f"recall@3={pooled['rec3'] / n_q:.2f} "
          f"precision@1={pooled['prec1_hit'] / max(pooled['prec1_n'], 1):.2f}")


if __name__ == "__main__":
    main()
