"""FAST-9/16 corner scoring as whole-image vector ops.

TPU-first reformulation of the reference's per-cell scalar FAST loops
(ORB_SLAM2/src/ORBextractor.cc:765-829: 30-px cells, cv::FAST at threshold 20
with per-cell fallback to 7): instead of looping over cells and pixels, the
whole image is scored at once on the VPU —

  1. the 16 Bresenham-circle samples become 16 shifted copies of the image,
  2. the "arc of >= 9 contiguous brighter/darker pixels" test becomes a
     log-step running minimum over a circular window of 9,
  3. the returned value is the exact FAST *score* (the largest threshold t
     at which the pixel is still a corner), so a single pass serves both the
     ini_th=20 detection and the min_th=7 fallback — the fallback is just a
     different cut on the same score map.

Non-maximum suppression is a 3x3 max-pool equality test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 — (dy, dx) clockwise from 12 o'clock.
# Same circle as OpenCV's FAST-16 (public algorithm constant).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9


def fast_score(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) float32 -> (H, W) float32 FAST-9 corner score.

    score(p) = max over the 16 arc positions of the min signed difference
    along a 9-long contiguous arc; > t  <=>  p is a FAST corner at
    threshold t.  Border pixels (3 px) wrap via roll; callers mask borders.
    """
    center = img
    # (16, H, W) circle samples via whole-image shifts
    circ = jnp.stack([jnp.roll(img, (-dy, -dx), (0, 1)) for dy, dx in CIRCLE])
    d_bright = circ - center  # arc pixels brighter than center by d
    d_dark = center - circ

    def arc_min9(d):
        # circular running min over windows of 9 along axis 0, log-step:
        # m8 = min over 8 consecutive; m9 = min(m8, element 8 further on)
        m = d
        m = jnp.minimum(m, jnp.roll(m, -1, 0))   # win 2
        m = jnp.minimum(m, jnp.roll(m, -2, 0))   # win 4
        m = jnp.minimum(m, jnp.roll(m, -4, 0))   # win 8
        m = jnp.minimum(m, jnp.roll(d, -8, 0))   # win 9
        return jnp.max(m, axis=0)                # best arc start

    return jnp.maximum(arc_min9(d_bright), arc_min9(d_dark))


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep score only at local maxima."""
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= pooled, score, 0.0)


@functools.lru_cache(maxsize=None)
def border_mask(h: int, w: int, margin: int) -> "np.ndarray":
    """1 inside the detection region, 0 in the margin.

    Numpy on purpose: the inputs are static, so an iota formulation would
    execute EAGERLY at trace time — a device roundtrip per level on remote
    backends.  As numpy it traces to one HLO literal."""
    m = np.zeros((h, w), np.float32)
    m[margin:h - margin, margin:w - margin] = 1.0
    return m
