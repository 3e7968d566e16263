"""Ahead-of-time parallel compilation of the System's jitted super-stages.

Cold-start on the TPU backend is dominated by XLA compilation of a handful
of large fused programs (tracking step, backend insertion, init finalize) —
serially triggered one per pipeline event, each taking minutes when the
backend compiles remotely.  Compilation releases the GIL (and with remote
compile is mostly network/server time), so lowering + compiling every
stage CONCURRENTLY at startup turns sum-of-compiles into max-of-compiles;
the persistent compilation cache (coslam_tpu/__init__.py) then makes every
later process skip the work entirely.

The reference pays its analogous one-time startup cost loading the 145 MB
DBoW2 vocabulary (System.cc:68: "This could take a while...").

Usage:
    warmup(cfg)                      # block until all stages are compiled
    h = warmup(cfg, blocking=False)  # compile in background threads
    h.wait()
"""

from __future__ import annotations

import functools
import threading
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig


class _Handle:
    def __init__(self, threads: List[threading.Thread]):
        self._threads = threads
        self.errors: List[str] = []

    def wait(self):
        for t in self._threads:
            t.join()


def _abstract(x):
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def warmup(cfg: SystemConfig, blocking: bool = True,
           include_loop: bool = True, include_init: bool = True,
           verbose: bool = False) -> _Handle:
    from coslam_tpu.models import local_mapping as lm
    from coslam_tpu.models import map_state as ms
    from coslam_tpu.models import system as system_mod
    from coslam_tpu.models import tracking
    from coslam_tpu.models.frame import build_frame

    H, W = cfg.camera.height, cfg.camera.width
    N = cfg.extractor.max_keypoints
    f32, i32 = jnp.float32, jnp.int32

    img = jax.ShapeDtypeStruct((H, W), jnp.uint8)
    m = jax.eval_shape(functools.partial(ms.empty_map, cfg))
    frame = jax.eval_shape(lambda im: build_frame(im, cfg), img)
    kp_pt = jax.ShapeDtypeStruct((N,), i32)
    level = jax.ShapeDtypeStruct((N,), i32)
    T = jax.ShapeDtypeStruct((4, 4), f32)
    scalar_f = jax.ShapeDtypeStruct((), f32)
    scalar_i = jax.ShapeDtypeStruct((), i32)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    jobs: List[Callable[[], None]] = []

    def job(name: str, fn: Callable[[], None]):
        jobs.append((name, fn))

    # resolve the vocabulary size exactly as KeyFrameDatabase will, so the
    # backend_insert program compiled here matches the one the System runs
    from coslam_tpu.ops import bow as bow_mod
    _pre = (bow_mod.load_pretrained_vocabulary()
            if cfg.loop.vocab_pretrained else None)
    W_voc = _pre.shape[0] if _pre is not None else (
        cfg.loop.vocab_words or
        cfg.loop.vocab_branching ** cfg.loop.vocab_depth)
    vocab = jax.ShapeDtypeStruct((W_voc, 8), jnp.uint32)
    scalar_b = jax.ShapeDtypeStruct((), jnp.bool_)
    P = cfg.mapper.max_points
    carry = tracking.ChunkCarry(
        T=T, vel=T, has_vel=scalar_b, kp_pt=kp_pt, level=level,
        frames_since_kf=scalar_i, ref_kf=scalar_i,
        pt_visible=jax.ShapeDtypeStruct((P,), i32),
        pt_found=jax.ShapeDtypeStruct((P,), i32))

    job("build_frame", lambda: build_frame.lower(img, cfg).compile())
    job("track_frame_built", lambda: tracking.track_frame_built.lower(
        cfg, m, frame, kp_pt, level, T, scalar_f,
        ref_kf=scalar_i).compile())
    # the single steady-state chunk shape of System.run_sequence (the
    # overlapped driver chains the carry across keyframes, so only one
    # program shape exists) + the device-side carry chaining helper
    C = cfg.tracker.chunk_frames
    imgs_c = jax.ShapeDtypeStruct((C, H, W), jnp.uint8)
    if cfg.sensor == "rgbd":
        aux_c = jax.ShapeDtypeStruct((C, H, W), jnp.float32)
    elif cfg.sensor == "stereo":
        aux_c = jax.ShapeDtypeStruct((C, H, W), jnp.uint8)
    else:
        aux_c = None
    job(f"track_chunk{C}",
        lambda: tracking.track_chunk.lower(
            cfg, m, imgs_c, True, carry, aux_c).compile())
    T_chunk = jax.ShapeDtypeStruct((C, 4, 4), f32)
    kp_pts_c = jax.ShapeDtypeStruct((C, N), i32)
    levels_c = jax.ShapeDtypeStruct((C, N), i32)
    job("chain_carry", lambda: tracking.chain_carry_after_insert.lower(
        carry, m, T_chunk, kp_pts_c, levels_c, scalar_i, scalar_i,
        scalar_i, scalar_i).compile())
    if cfg.sensor == "mono":
        job("backend_insert", lambda: lm.backend_insert.lower(
            cfg, m, frame, T, scalar_i, kp_pt, False, None, vocab).compile())
        job("backend_insert_light", lambda: lm.backend_insert.lower(
            cfg, m, frame, T, scalar_i, kp_pt, False, None, vocab,
            ba_iters=2).compile())
    else:
        depth = jax.ShapeDtypeStruct((N,), f32)
        job("backend_insert_depth", lambda: lm.backend_insert.lower(
            cfg, m, frame, T, scalar_i, kp_pt, True, depth, vocab).compile())
        job("backend_insert_depth_light", lambda: lm.backend_insert.lower(
            cfg, m, frame, T, scalar_i, kp_pt, True, depth, vocab,
            ba_iters=2).compile())
    if include_init:
        # the whole NOT_INITIALIZED frame (matching + RANSAC + conditional
        # map bootstrap) is ONE fused program now
        job("init_attempt", lambda: system_mod._init_attempt.lower(
            cfg, m, frame, frame, scalar_i, scalar_i, key).compile())
    # relocalization path (reference Tracking::Relocalization) — reachable
    # from any tracking dropout; a cold compile mid-run stalls for minutes
    def _reloc_graphs():
        tracking.relocalize_against_kf.lower(
            cfg, m, frame, scalar_i, key).compile()
        tracking.track_local_map.lower(cfg, m, frame, T, kp_pt).compile()

    job("reloc", _reloc_graphs)

    if include_loop:
        def _loop_graphs():
            from coslam_tpu.models import loop_closing as lc
            scalar = scalar_i
            lc.match_pair_points.lower(cfg, m, scalar, scalar).compile()
            cands = jax.ShapeDtypeStruct((8,), i32)
            lc.match_counts_subset.lower(cfg, m, scalar, cands).compile()

        job("loop_detect", _loop_graphs)

        # Sim3 verification + loop correction + deferred global BA — the
        # first loop closure of a run must not stall on compilation
        def _loop_correct_graphs():
            from coslam_tpu.models import loop_closing as lc
            from coslam_tpu.models import map_state as ms_mod
            idx2 = jax.ShapeDtypeStruct((N,), i32)
            okN = jax.ShapeDtypeStruct((N,), jnp.bool_)
            lc.sim3_between.lower(cfg, m, scalar_i, scalar_i, idx2,
                                  idx2, idx2, okN, key).compile()
            lc.expand_sim3_matches.lower(cfg, m, scalar_i, scalar_i,
                                         scalar_f, T3x3(), vec3()).compile()
            lc.sim3_refine_pairs.lower(cfg, m, scalar_i, scalar_i, idx2,
                                       idx2, idx2, okN, scalar_f, T3x3(),
                                       vec3()).compile()
            L = cfg.loop.max_loop_edges
            prev = jax.ShapeDtypeStruct((L, 2), i32)
            prev_v = jax.ShapeDtypeStruct((L,), jnp.bool_)
            lc.correct_loop.lower(
                cfg, m, scalar_i, scalar_i, scalar_f, T3x3(), vec3(),
                idx2, idx2, okN, prev_loops=prev,
                prev_loops_valid=prev_v).compile()
            lc.global_ba.lower(cfg, m).compile()
            lm.refresh_point_geometry.lower(cfg, m).compile()
            jax.jit(ms_mod.covisibility).lower(m).compile()
            jax.jit(ms_mod.covisibility_row).lower(m, scalar_i).compile()

        def T3x3():
            return jax.ShapeDtypeStruct((3, 3), f32)

        def vec3():
            return jax.ShapeDtypeStruct((3,), f32)

        job("loop_correct", _loop_correct_graphs)

        # online vocabulary retraining (keyframe_db.maybe_retrain) — only
        # reachable when no pretrained vocabulary is shipped
        def _vocab_graphs():
            if _pre is not None:
                return
            from coslam_tpu.ops import bow
            K = cfg.mapper.max_keyframes
            W_v = W_voc
            desc_pool = jax.ShapeDtypeStruct((K * N, 8), jnp.uint32)
            ok_pool = jax.ShapeDtypeStruct((K * N,), jnp.bool_)
            bow.train_vocabulary_device.lower(
                desc_pool, ok_pool, W_v, 6).compile()
            kf_desc = jax.ShapeDtypeStruct((K, N, 8), jnp.uint32)
            kf_ok = jax.ShapeDtypeStruct((K, N), jnp.bool_)
            voc = jax.ShapeDtypeStruct((W_v, 8), jnp.uint32)
            jax.jit(bow.bow_rows, static_argnums=(3,)).lower(
                kf_desc, kf_ok, voc, W_v).compile()

        job("vocab_retrain", _vocab_graphs)

    # (compaction.compact is host-side numpy — nothing to compile; growth
    # re-specializes shapes and is covered by the persistent compile cache
    # on subsequent runs)

    handle = _Handle([])

    def run(name, fn):
        import time
        t0 = time.perf_counter()
        try:
            fn()
            if verbose:
                print(f"[warmup] {name} compiled "
                      f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:  # warmup must never take the System down
            handle.errors.append(f"{name}: {e}")
            if verbose:
                print(f"[warmup] {name} FAILED: {e}", flush=True)

    threads = [threading.Thread(target=run, args=(nm, fn), daemon=True)
               for nm, fn in jobs]
    handle._threads = threads
    for t in threads:
        t.start()
    if blocking:
        handle.wait()
    return handle
