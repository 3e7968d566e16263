"""Oriented-FAST + rotated-BRIEF extraction, end to end, as one jitted stage.

TPU-first redesign of reference ORBextractor (ORB_SLAM2/src/ORBextractor.cc):

  * per-cell scalar FAST loops + quadtree `DistributeOctTree` (:539-829) ->
    whole-image FAST score (ops/fast.py) + per-cell top-2 winners + per-level
    top-k by score.  The quadtree's job is spatial uniformity; one NMS'd
    winner pair per 32-px cell achieves the same property with static shapes.
  * per-keypoint IC_Angle patch loops (:77-107) -> two 31x31 full-image
    convolutions producing m10/m01 moment maps (MXU work), gathered at
    keypoint locations.
  * per-keypoint rBRIEF loops (:108-143) -> batched rotated-pattern gathers
    on the sigma=2-blurred level images (:1086), packed to uint32[8] words
    for XOR-popcount matching.

The descriptor bit pattern is a deterministic seeded BRIEF layout (isotropic
Gaussian, radius-clipped) rather than OpenCV's learned bit_pattern_31: no
cross-compatibility with OpenCV descriptors is required anywhere in the
system, and the vocabulary (ops/bow.py) is trained on our own descriptors.

Outputs use a fixed capacity `cfg.max_keypoints` with a validity mask —
static shapes end to end (SURVEY.md section 7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import ExtractorConfig
from coslam_tpu.ops import fast as fast_ops
from coslam_tpu.ops import pyramid as pyr_ops

PATCH_RADIUS = 15  # reference HALF_PATCH_SIZE (ORBextractor.cc:73)
N_BITS = 256
DESC_WORDS = 8  # 256 bits packed into 8 uint32


# ---------------------------------------------------------------------------
# BRIEF sampling pattern
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 2, 2) float32: per bit, two (x, y) offsets within radius 13.

    Deterministic Gaussian BRIEF layout (Calonder et al.), sigma = patch/5,
    norm-clipped so rotated samples stay inside the 31x31 patch.
    """
    rng = np.random.default_rng(20160229)
    pts = rng.normal(0.0, PATCH_RADIUS / 2.2, size=(N_BITS, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    max_r = 13.0
    scale = np.where(norm > max_r, max_r / (norm + 1e-9), 1.0)
    return (pts * scale).astype(np.float32)


@functools.lru_cache(maxsize=1)
def _moment_kernels() -> np.ndarray:
    """(2, 1, 31, 31) conv kernels for image moments m10 (x-weighted) and
    m01 (y-weighted) over the circular patch — replaces IC_Angle's scalar
    loop (reference ORBextractor.cc:77-107)."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    circ = (xs ** 2 + ys ** 2 <= r ** 2).astype(np.float32)
    kx = (xs * circ).astype(np.float32)
    ky = (ys * circ).astype(np.float32)
    # cross-correlation style: value at offset (dy,dx) weighted by (dx,dy).
    # lax.conv flips nothing (it is cross-correlation), so use kernels as-is.
    return np.stack([kx, ky])[:, None]


def moment_maps(img: jnp.ndarray):
    """(H, W) -> (m10, m01) maps via one 2-channel 31x31 convolution."""
    k = jnp.asarray(_moment_kernels())
    x = img[None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(PATCH_RADIUS, PATCH_RADIUS)] * 2, dimension_numbers=dn,
        precision=jax.lax.Precision.DEFAULT)
    return out[0, 0], out[0, 1]


# ---------------------------------------------------------------------------
# Per-level keypoint selection
# ---------------------------------------------------------------------------

def level_budgets(cfg: ExtractorConfig) -> List[int]:
    """Geometric per-level feature budgets (reference ORBextractor.cc:410-446)."""
    f = 1.0 / cfg.scale_factor
    n0 = cfg.n_features * (1 - f) / (1 - f ** cfg.n_levels)
    budgets = [int(round(n0 * f ** l)) for l in range(cfg.n_levels - 1)]
    budgets.append(max(cfg.n_features - sum(budgets), 0))
    return budgets


def _select_level_keypoints(score, budget: int, cell: int, min_th: float):
    """Top-`budget` corners with per-cell (top-2) spatial capping.

    score: (H, W) NMS'd FAST score map, borders already zeroed.
    Returns (yx: (budget, 2) int32, resp: (budget,) f32, valid: (budget,) bool).
    """
    h, w = score.shape
    hc, wc = -(-h // cell), -(-w // cell)
    pad = jnp.zeros((hc * cell, wc * cell), score.dtype).at[:h, :w].set(score)
    cells = pad.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc * wc, cell * cell)

    i1 = jnp.argmax(cells, axis=1)
    m1 = jnp.take_along_axis(cells, i1[:, None], axis=1)[:, 0]
    cells2 = cells.at[jnp.arange(hc * wc), i1].set(-jnp.inf)
    i2 = jnp.argmax(cells2, axis=1)
    m2 = jnp.take_along_axis(cells2, i2[:, None], axis=1)[:, 0]

    cand_score = jnp.concatenate([m1, m2])                  # (2*nc,)
    cand_cell = jnp.concatenate([jnp.arange(hc * wc)] * 2)
    cand_inner = jnp.concatenate([i1, i2])
    cand_score = jnp.where(cand_score > min_th, cand_score, -jnp.inf)

    k = min(budget, cand_score.shape[0])
    top_score, top_idx = jax.lax.top_k(cand_score, k)
    cell_idx = cand_cell[top_idx]
    inner = cand_inner[top_idx]
    cy, cx = cell_idx // wc, cell_idx % wc
    iy, ix = inner // cell, inner % cell
    ys = cy * cell + iy
    xs = cx * cell + ix
    valid = jnp.isfinite(top_score)
    # pad to exactly `budget` slots if fewer candidates than budget
    if k < budget:
        padn = budget - k
        ys = jnp.concatenate([ys, jnp.zeros(padn, jnp.int32)])
        xs = jnp.concatenate([xs, jnp.zeros(padn, jnp.int32)])
        top_score = jnp.concatenate([top_score, jnp.full(padn, -jnp.inf)])
        valid = jnp.concatenate([valid, jnp.zeros(padn, bool)])
    return (jnp.stack([ys, xs], axis=1).astype(jnp.int32),
            jnp.where(valid, top_score, 0.0), valid)


# ---------------------------------------------------------------------------
# Descriptor sampling
# ---------------------------------------------------------------------------

def _descriptors_at(img_blur, yx, angle, valid):
    """Rotated-BRIEF descriptors for keypoints on one level.

    img_blur: (H, W) f32 blurred level image; yx: (K, 2) int32; angle: (K,)
    radians.  Returns uint32 (K, 8).
    """
    h, w = img_blur.shape
    pat = jnp.asarray(brief_pattern())            # (256, 2, 2) (x, y)
    ca, sa = jnp.cos(angle), jnp.sin(angle)       # (K,)
    px, py = pat[..., 0], pat[..., 1]             # (256, 2)
    # rotate pattern by keypoint angle: (K, 256, 2)
    rx = jnp.round(px[None] * ca[:, None, None] - py[None] * sa[:, None, None])
    ry = jnp.round(px[None] * sa[:, None, None] + py[None] * ca[:, None, None])
    gx = jnp.clip(yx[:, 1][:, None, None] + rx.astype(jnp.int32), 0, w - 1)
    gy = jnp.clip(yx[:, 0][:, None, None] + ry.astype(jnp.int32), 0, h - 1)
    flat = img_blur.reshape(-1)
    vals = flat[(gy * w + gx).reshape(yx.shape[0], -1)].reshape(yx.shape[0], N_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)   # (K, 256)
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    words = (bits.reshape(-1, DESC_WORDS, 32) << shifts[None, None, :]).sum(
        axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], words, 0)


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def extract(img: jnp.ndarray, cfg: ExtractorConfig) -> Dict[str, jnp.ndarray]:
    """uint8 (H, W) -> keypoint SoA, the analogue of
    ORBextractor::operator() (reference ORBextractor.cc:1043-1105).

    Returns dict with static shapes (N = cfg.max_keypoints):
      uv:       (N, 2) f32 — level-0 pixel coords (x, y), distorted/raw
      response: (N,)  f32 — FAST score
      angle:    (N,)  f32 — IC orientation, radians
      level:    (N,)  i32 — pyramid level
      valid:    (N,)  bool
      desc:     (N, 8) uint32 — packed 256-bit rBRIEF
    """
    budgets = level_budgets(cfg)
    levels = pyr_ops.build_pyramid(img, cfg)
    N = cfg.max_keypoints

    uv = jnp.zeros((N, 2), jnp.float32)
    response = jnp.zeros((N,), jnp.float32)
    angle = jnp.zeros((N,), jnp.float32)
    level = jnp.zeros((N,), jnp.int32)
    valid = jnp.zeros((N,), bool)
    desc = jnp.zeros((N, DESC_WORDS), jnp.uint32)

    offset = 0
    for lvl, (img_l, budget) in enumerate(zip(levels, budgets)):
        if budget == 0 or offset >= N:
            continue
        budget = min(budget, N - offset)
        h, w = img_l.shape
        margin = cfg.edge_threshold
        score = fast_ops.nms3(fast_ops.fast_score(img_l))
        score = score * fast_ops.border_mask(h, w, margin)
        yx, resp, ok = _select_level_keypoints(
            score, budget, cfg.cell_size, float(cfg.fast_min_threshold))

        m10, m01 = moment_maps(img_l)
        flat_idx = yx[:, 0] * w + yx[:, 1]
        ang = jnp.arctan2(m01.reshape(-1)[flat_idx], m10.reshape(-1)[flat_idx])

        img_blur = pyr_ops.gaussian_blur(img_l)
        d = _descriptors_at(img_blur, yx, ang, ok)

        scale = cfg.scale_factor ** lvl
        sl = slice(offset, offset + budget)
        uv = uv.at[sl].set(yx[:, ::-1].astype(jnp.float32) * scale)
        response = response.at[sl].set(resp)
        angle = angle.at[sl].set(ang)
        level = level.at[sl].set(lvl)
        valid = valid.at[sl].set(ok)
        desc = desc.at[sl].set(d)
        offset += budget

    return {"uv": uv, "response": response, "angle": angle,
            "level": level, "valid": valid, "desc": desc}
