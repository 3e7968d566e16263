"""Descriptor matching with spatial windows, ratio tests and rotation
consistency — the TPU reformulation of ORBmatcher (ORB_SLAM2/src/
ORBmatcher.cc).

Every reference search (SearchByProjection :45/:290/:1328, SearchByBoW :159,
SearchForInitialization :405, SearchForTriangulation :657, Fuse :825) is a
per-keypoint candidate loop over a 64x48 bucket grid.  Here each becomes one
masked (N, M) Hamming matrix (ops/hamming.py) plus row reductions: the
spatial window / scale gate / epipolar gate is a boolean mask added as +inf
distance, best and second-best come from a two-level min, and the rotation
histogram is a 30-bin scatter-add.  No grid structure is needed — the mask
*is* the grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import MatcherConfig
from coslam_tpu.ops import hamming

# numpy scalar on purpose: a module-level `jnp.int32` is a CONCRETE device
# array on the default backend; every jitted program closing over it must
# fetch it back to host at lowering time to embed it as an MLIR constant —
# a device->host roundtrip that costs minutes per program on a remote-TPU
# ("axon") backend.  np.int32 weakly types identically and folds for free.
INF = np.int32(1 << 20)
TWO_PI = 6.283185307179586


class Matches(NamedTuple):
    """Row-wise matching result: for each query keypoint a target index."""
    idx: jnp.ndarray    # (N,) int32 index into target set, -1 if unmatched
    dist: jnp.ndarray   # (N,) int32 Hamming distance (INF if unmatched)
    valid: jnp.ndarray  # (N,) bool


def masked_distance_matrix(desc_q, valid_q, desc_t, valid_t, mask=None,
                           use_mxu: bool = True):
    """(N, M) Hamming distances with invalid/masked entries set to INF."""
    d = (hamming.pairwise_hamming_mxu(desc_q, desc_t) if use_mxu
         else hamming.pairwise_hamming(desc_q, desc_t))
    ok = valid_q[:, None] & valid_t[None, :]
    if mask is not None:
        ok = ok & mask
    return jnp.where(ok, d, INF)


def best_two(dmat):
    """Row-wise best and second-best distances + best index."""
    best_idx = jnp.argmin(dmat, axis=1)
    best = jnp.take_along_axis(dmat, best_idx[:, None], axis=1)[:, 0]
    d2 = dmat.at[jnp.arange(dmat.shape[0]), best_idx].set(INF)
    second = jnp.min(d2, axis=1)
    return best, second, best_idx


def rotation_consistency(angle_q, angle_t, match_idx, match_valid,
                         histo_length: int = 30):
    """Keep only matches whose angle difference falls in the 3 dominant
    orientation-histogram bins (reference ORBmatcher::ComputeThreeMaxima,
    ORBmatcher.cc:1601-1644, incl. the 0.1x maximum cutoffs)."""
    rot = angle_q - angle_t[match_idx]
    rot = jnp.where(rot < 0, rot + TWO_PI, rot)
    bins = jnp.clip((rot * (histo_length / TWO_PI)).astype(jnp.int32),
                    0, histo_length - 1)
    hist = jnp.zeros(histo_length, jnp.int32).at[bins].add(
        match_valid.astype(jnp.int32))
    top3_val, top3_idx = jax.lax.top_k(hist, 3)
    keep1 = bins == top3_idx[0]
    keep2 = (bins == top3_idx[1]) & (top3_val[1] > 0.1 * top3_val[0])
    keep3 = (bins == top3_idx[2]) & (top3_val[2] > 0.1 * top3_val[0])
    return match_valid & (keep1 | keep2 | keep3)


def mutual_filter(dmat, best_idx, valid):
    """Keep (q -> t) only if q is also t's best among queries."""
    col_best = jnp.argmin(dmat, axis=0)  # (M,)
    return valid & (col_best[best_idx] == jnp.arange(best_idx.shape[0]))


def match(desc_q, valid_q, desc_t, valid_t, cfg: MatcherConfig,
          mask=None, max_dist: Optional[int] = None,
          ratio: Optional[float] = None, mutual: bool = False,
          angle_q=None, angle_t=None) -> Matches:
    """Generic one-shot matcher used by every pipeline search.

    mask: optional (N, M) bool of admissible pairs (spatial window, scale
    gate, epipolar gate ... depending on the call site).
    """
    dmat = masked_distance_matrix(desc_q, valid_q, desc_t, valid_t, mask)
    best, second, best_idx = best_two(dmat)
    ok = best < (max_dist if max_dist is not None else cfg.th_low)
    if ratio is not None:
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        ok = mutual_filter(dmat, best_idx, ok)
    if cfg.check_orientation and angle_q is not None and angle_t is not None:
        ok = rotation_consistency(angle_q, angle_t, best_idx, ok,
                                  cfg.histo_length)
    return Matches(idx=jnp.where(ok, best_idx, -1),
                   dist=jnp.where(ok, best, INF),
                   valid=ok)


def _pad_to(x, n, fill=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    pad_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad_block])


def match_windowed(desc_q, uv_pred, radius, valid_q, desc_t, uv_t, valid_t,
                   cfg: MatcherConfig,
                   level_q=None, level_t=None,
                   level_lo: float = -1e9, level_hi: float = 1e9,
                   max_dist: Optional[int] = None,
                   ratio: Optional[float] = None, mutual: bool = False,
                   angle_q=None, angle_t=None) -> Matches:
    """Windowed projection search (the SearchByProjection family) as a
    single fused streaming kernel on TPU.

    Equivalent to `match` with window_mask(uv_pred, uv_t, radius) [+ level
    gate], but never materializes the (N, M) distance/mask matrices: on TPU
    it calls the Pallas masked matcher (ops/pallas_kernels.masked_match) —
    for the 32k-landmark local-map search that replaces ~400 MB of HBM
    intermediates with streamed VMEM blocks.  The mutual check is a second
    (reversed) kernel pass.  Off-TPU falls back to the XLA formulation.
    """
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32),
                         valid_q.shape).astype(jnp.float32)
    if jax.default_backend() != "tpu":
        mask = window_mask(uv_pred, uv_t, r)
        if level_q is not None and level_lo > -100:
            mask = mask & level_mask(level_q, level_t,
                                     int(level_lo), int(level_hi))
        return match(desc_q, valid_q, desc_t, valid_t, cfg, mask=mask,
                     max_dist=max_dist, ratio=ratio, mutual=mutual,
                     angle_q=angle_q, angle_t=angle_t)

    from coslam_tpu.ops import pallas_kernels as pk

    N, M = desc_q.shape[0], desc_t.shape[0]
    Np = -(-N // 256) * 256
    Mp = -(-M // 256) * 256
    lq = (level_q.astype(jnp.float32) if level_q is not None
          else jnp.zeros(N, jnp.float32))
    lt = (level_t.astype(jnp.float32) if level_t is not None
          else jnp.zeros(M, jnp.float32))
    r2 = r * r
    args = (_pad_to(desc_q, Np), _pad_to(uv_pred.astype(jnp.float32), Np),
            _pad_to(r2, Np), _pad_to(valid_q, Np), _pad_to(lq, Np),
            _pad_to(desc_t, Mp), _pad_to(uv_t.astype(jnp.float32), Mp),
            _pad_to(valid_t, Mp), _pad_to(lt, Mp))
    best, second, idx = pk.masked_match(
        args[0], args[1], args[2], args[3], args[5], args[6], args[7],
        level_q=args[4], level_t=args[8],
        level_lo=level_lo, level_hi=level_hi)
    best, second, idx = best[:N], second[:N], jnp.clip(idx[:N], -1, M - 1)

    ok = best < (max_dist if max_dist is not None else cfg.th_low)
    if ratio is not None:
        ok = ok & (best.astype(jnp.float32)
                   < ratio * second.astype(jnp.float32))
    if mutual:
        # reverse pass: the window/level gates belong to the original query
        # side, so they ride the target-side inputs here
        rbest, _, ridx = pk.masked_match(
            args[5], args[6], _pad_to(jnp.full(M, 1e18, jnp.float32), Mp),
            args[7], args[0], args[1], args[3],
            level_q=args[8], level_t=args[4],
            level_lo=-level_hi, level_hi=-level_lo,
            r2_t=args[2])
        ridx = ridx[:M]
        safe = jnp.maximum(idx, 0)
        ok = ok & (ridx[safe] == jnp.arange(N))
    if cfg.check_orientation and angle_q is not None and angle_t is not None:
        ok = rotation_consistency(angle_q, angle_t, jnp.maximum(idx, 0), ok,
                                  cfg.histo_length)
    return Matches(idx=jnp.where(ok, idx, -1),
                   dist=jnp.where(ok, best, INF),
                   valid=ok)


def window_mask(uv_pred, uv_t, radius):
    """(N, M) bool: target kp within `radius` px of the predicted location.

    radius may be scalar or per-query (N,) (scale-dependent windows, as in
    reference SearchByProjection's per-octave radius, ORBmatcher.cc:45-157).
    """
    d2 = jnp.sum((uv_pred[:, None, :] - uv_t[None, :, :]) ** 2, axis=-1)
    r = jnp.asarray(radius)
    r2 = (r * r) if r.ndim == 0 else (r * r)[:, None]
    return d2 <= r2


def level_mask(level_q, level_t, lo: int = 0, hi: int = 0):
    """(N, M) bool: target octave within [level_q + lo, level_q + hi]."""
    lt = level_t[None, :]
    lq = level_q[:, None]
    return (lt >= lq + lo) & (lt <= lq + hi)
