"""Benchmark: tracked frames/sec/chip on the per-frame tracking hot path.

Runs the flagship jitted step (ORB extraction at 1000 features / 8 levels /
640x480 + previous-frame Hamming matching + motion-only BA — the reference
hot loops 1-2, SURVEY.md 3.1) on the available accelerator and reports
throughput.  Baseline: the reference ORB-SLAM2-class CPU tracker is
real-time at ~30 fps on this workload (BASELINE.md), so
vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    from __graft_entry__ import entry
    from coslam_tpu.config import CameraConfig
    from coslam_tpu.utils import synthetic

    fn, example_args = entry()
    fn = jax.jit(fn)

    # realistic textured frames (keypoint-dense), cycled to avoid any
    # value-caching artifacts
    cam = CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    scene = synthetic.make_scene(800, seed=0)
    traj = synthetic.make_trajectory(8, seed=0)
    imgs = [jax.device_put(f) for f in synthetic.render_sequence(cam, traj, scene)]
    args = [jax.device_put(a) for a in example_args[1:]]

    # warmup / compile
    out = fn(imgs[0], *args)
    jax.block_until_ready(out)

    n_iters = 100
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(imgs[i % len(imgs)], *args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "tracked_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
