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

from coslam_tpu.config import MatcherConfig
from coslam_tpu.ops import hamming

INF = jnp.int32(1 << 20)
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
