#!/usr/bin/env python
"""Offline vocabulary training — the analogue of building the reference's
pre-trained DBoW2 ORBvoc.txt (loaded at System.cc:61-72).

Harvests rBRIEF descriptors from several DIVERSE synthetic proxy scenes
(box clouds + cylinder interiors, multiple seeds, orbit + loop
trajectories), subsamples a balanced pool, and k-means-trains a large flat
word set on device (ops/bow.train_vocabulary_device).  The result is
committed as `coslam_tpu/assets/vocab.npz` and loaded at startup by every
KeyFrameDatabase (ops/bow.load_pretrained_vocabulary) — vocabulary
training never runs inside the insertion path (VERDICT r4 task #3).

Usage:  python scripts/train_vocab.py [--words 8192] [--iters 12]
"""
import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def harvest():
    import jax
    import jax.numpy as jnp
    from coslam_tpu.config import CameraConfig, ExtractorConfig, SystemConfig
    from coslam_tpu.models.frame import build_frame
    from coslam_tpu.utils import synthetic

    cam = CameraConfig(fx=400, fy=400, cx=320, cy=240, width=640, height=480)
    cfg = SystemConfig(camera=cam,
                       extractor=ExtractorConfig(n_features=1000,
                                                 max_keypoints=1024))
    pools = []
    jobs = []
    # box clouds seen on arcs (the tracking benches' geometry)
    for seed in (3, 5, 9):
        scene = synthetic.make_scene(700, seed=seed)
        traj = synthetic.make_trajectory(48, seed=seed)
        jobs.append((scene, traj))
    # cylinder interiors on loop trajectories (the loop-closure geometry)
    for seed in (11, 21):
        scene = synthetic.make_cylinder_scene(900, seed=seed)
        traj = synthetic.make_loop_trajectory(64, seed=seed, frac=1.0)
        jobs.append((scene, traj))

    for scene, traj in jobs:
        seq = synthetic.render_sequence(cfg.camera, traj, scene)
        for img in seq[::2]:
            f = build_frame(jnp.asarray(img), cfg)
            d, v = jax.device_get((f.desc, f.valid))
            pools.append(d[v])
    return np.concatenate(pools)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--max-desc", type=int, default=65536)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from coslam_tpu.ops import bow

    t0 = time.time()
    pool = harvest()
    print(f"harvested {pool.shape[0]} descriptors "
          f"({time.time() - t0:.0f}s)")
    rng = np.random.default_rng(args.seed)
    if pool.shape[0] > args.max_desc:
        pool = pool[rng.choice(pool.shape[0], args.max_desc, replace=False)]
    words = np.asarray(bow.train_vocabulary_device(
        jnp.asarray(pool), jnp.ones(pool.shape[0], bool),
        args.words, args.iters, key=jax.random.PRNGKey(args.seed)))
    out = os.path.join(ROOT, "coslam_tpu", "assets", "vocab.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, words=words,
                        meta=np.array([args.words, args.iters, args.seed]))
    # occupancy diagnostics: how many words actually attract descriptors
    from coslam_tpu.ops import hamming
    sub = pool[rng.choice(pool.shape[0], min(16384, pool.shape[0]),
                          replace=False)]
    d = jax.device_get(hamming.pairwise_hamming_mxu(
        jnp.asarray(sub), jnp.asarray(words)))
    occ = np.bincount(d.argmin(1), minlength=args.words)
    print(f"trained {args.words} words in {time.time() - t0:.0f}s; "
          f"occupied {int((occ > 0).sum())}/{args.words}, "
          f"max bucket {int(occ.max())}, wrote {out} "
          f"({os.path.getsize(out) // 1024} KiB)")


if __name__ == "__main__":
    main()
