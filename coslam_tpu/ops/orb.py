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
from coslam_tpu.ops import pallas_kernels as pk
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
    k = _moment_kernels()  # np constant: folds to an HLO literal
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
    # constants built with numpy (np.arange etc.): concrete-shaped jnp ops
    # would execute eagerly at trace time — a device roundtrip per op on
    # remote backends; numpy folds into HLO literals
    pad = jnp.pad(score, ((0, hc * cell - h), (0, wc * cell - w)))
    cells = pad.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc * wc, cell * cell)

    i1 = jnp.argmax(cells, axis=1)
    m1 = jnp.take_along_axis(cells, i1[:, None], axis=1)[:, 0]
    cells2 = cells.at[np.arange(hc * wc), i1].set(-jnp.inf)
    i2 = jnp.argmax(cells2, axis=1)
    m2 = jnp.take_along_axis(cells2, i2[:, None], axis=1)[:, 0]

    cand_score = jnp.concatenate([m1, m2])                  # (2*nc,)
    cand_cell = np.concatenate([np.arange(hc * wc)] * 2)
    cand_inner = jnp.concatenate([i1, i2])
    cand_score = jnp.where(cand_score > min_th, cand_score, -jnp.inf)

    k = min(budget, cand_score.shape[0])
    top_score, top_idx = jax.lax.top_k(cand_score, k)
    cell_idx = jnp.take(cand_cell, top_idx)
    inner = cand_inner[top_idx]
    cy, cx = cell_idx // wc, cell_idx % wc
    iy, ix = inner // cell, inner % cell
    ys = cy * cell + iy
    xs = cx * cell + ix
    valid = jnp.isfinite(top_score)
    # pad to exactly `budget` slots if fewer candidates than budget
    if k < budget:
        padn = budget - k
        ys = jnp.concatenate([ys, np.zeros(padn, np.int32)])
        xs = jnp.concatenate([xs, np.zeros(padn, np.int32)])
        top_score = jnp.concatenate([top_score, np.full(padn, -np.inf, np.float32)])
        valid = jnp.concatenate([valid, np.zeros(padn, bool)])
    return (jnp.stack([ys, xs], axis=1).astype(jnp.int32),
            jnp.where(valid, top_score, 0.0), valid)


# ---------------------------------------------------------------------------
# Patch-based descriptor pipeline (the fast path)
#
# Random-index gathers are the one thing TPUs do badly: the original
# formulation (one gather per BRIEF sample, ~512k scalar gathers per frame)
# measured ~60 ms/frame on a v5e chip.  The redesign turns everything after
# keypoint selection into MXU matmuls:
#
#   1. one 39x39 raw patch per keypoint via vmapped dynamic_slice
#      (contiguous block loads, not scalar gathers),
#   2. IC orientation  = patch @ W_moment            (1521 -> 2),
#   3. Gaussian blur   = patch @ W_blur              (1521 -> 33*33),
#   4. rBRIEF          = sign(blurred @ W_bits)      (1089 -> 30*256),
#      where W_bits[:, bin*256+k] = onehot(p_a) - onehot(p_b) for the bit-k
#      sample pair rotated by bin (angle quantized to 30 bins of 12 deg, the
#      same resolution as the reference's rotation histograms), and
#   5. per-keypoint bin selection is a tiny (N, 8)-element gather.
# ---------------------------------------------------------------------------

N_ROT_BINS = 30
RAW_PATCH = 39   # radius 19 = cfg.edge_threshold margin
BLUR_PATCH = 33  # central region with valid 7x7 blur support


@functools.lru_cache(maxsize=1)
def _patch_matrices():
    """Constant weight matrices of the patch pipeline (host-built once)."""
    rp, bp = RAW_PATCH, BLUR_PATCH
    rr, br = rp // 2, bp // 2

    # moments: central 31x31 circular mask of the raw patch
    ys, xs = np.mgrid[-rr:rr + 1, -rr:rr + 1]
    circ = ((xs ** 2 + ys ** 2) <= PATCH_RADIUS ** 2).astype(np.float32)
    w_moment = np.stack([(xs * circ).reshape(-1),
                         (ys * circ).reshape(-1)], 1)            # (1521, 2)

    # separable 7x7 sigma=2 blur: raw (39x39) -> central (33x33)
    g = np.exp(-0.5 * (np.arange(-3, 4) / 2.0) ** 2)
    g /= g.sum()
    k2 = np.outer(g, g)                                          # (7, 7)
    w_blur = np.zeros((rp * rp, bp * bp), np.float32)
    for oy in range(bp):
        for ox in range(bp):
            cy, cx = oy + (rr - br), ox + (rr - br)
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    w_blur[(cy + dy) * rp + (cx + dx), oy * bp + ox] += \
                        k2[dy + 3, dx + 3]

    # rotated BRIEF sample-difference matrix per rotation bin
    pat = brief_pattern()                                        # (256, 2, 2)
    w_bits = np.zeros((bp * bp, N_ROT_BINS * N_BITS), np.float32)
    for b in range(N_ROT_BINS):
        th = 2.0 * np.pi * b / N_ROT_BINS
        ca, sa = np.cos(th), np.sin(th)
        rx = np.round(pat[..., 0] * ca - pat[..., 1] * sa).astype(int) + br
        ry = np.round(pat[..., 0] * sa + pat[..., 1] * ca).astype(int) + br
        flat = ry * bp + rx                                      # (256, 2)
        for k in range(N_BITS):
            col = b * N_BITS + k
            w_bits[flat[k, 1], col] += 1.0   # +I(p_b)
            w_bits[flat[k, 0], col] -= 1.0   # -I(p_a);  bit = I(a) < I(b)
    return w_moment, w_blur, w_bits


def extract_patches(img, yx, patch: int = RAW_PATCH):
    """(H, W) image + (K, 2) int yx centers -> (K, patch*patch) float32.

    TPUs have no fast random gather: a vmapped (patch, patch)
    dynamic_slice lowers to an XLA gather costing ~1.7 ms/frame at K=1024.
    Instead: gather whole ROWS (a major-axis row gather, which XLA handles
    well) into (K, patch, W) strips, then select each strip's `patch`
    columns with a per-keypoint one-hot matrix on the MXU — 4x faster
    measured, bit-exact (one-hot bf16 products preserve 0-255 values)."""
    half = patch // 2
    h, w = img.shape
    y0 = jnp.clip(yx[:, 0] - half, 0, h - patch)
    x0 = jnp.clip(yx[:, 1] - half, 0, w - patch)
    k = yx.shape[0]

    rows = jnp.take(img.astype(jnp.bfloat16),
                    (y0[:, None] + np.arange(patch)[None, :]).reshape(-1),
                    axis=0).reshape(k, patch, w)
    colsel = jax.nn.one_hot(x0[:, None] + np.arange(patch)[None, :], w,
                            dtype=jnp.bfloat16, axis=1)        # (K, W, patch)
    out = jax.lax.dot_general(rows, colsel, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return out.reshape(k, -1)


def _descriptors_from_patches(patches, valid):
    """(K, 1521) raw patches -> (angle (K,), packed desc (K, 8) uint32).

    Precision of the two big contractions: the BRIEF bit test is
    sign(I_blur(b) - I_blur(a)) on 0-255 intensities, so the pipeline
    needs ~0.1 absolute (4e-4 relative) accuracy — MORE than bf16's 8-bit
    mantissa (+-0.5 at mid-gray): pure-bf16 descriptors measurably flip
    enough near-tie bits on low-texture regions to lose tracking on the
    proxy scenes.  Precision.HIGH (bf16_3x splitting, ~16 effective
    mantissa bits, error ~1e-2 intensity) keeps the MXU fast path while
    restoring descriptor stability; it is ~3x bf16 cost on the 20
    GFLOP/frame contraction but still far from dominating the hot path.
    """
    w_moment, w_blur, w_bits = _patch_matrices()  # np: HLO literals
    mom = jnp.dot(patches, w_moment, preferred_element_type=jnp.float32)
    angle = jnp.arctan2(mom[:, 1], mom[:, 0])

    blurred = jnp.dot(patches, w_blur,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGH)
    diffs = jnp.dot(blurred, w_bits,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGH)
    bits_all = (diffs > 0).reshape(-1, N_ROT_BINS, DESC_WORDS, 32)

    shifts = np.arange(32, dtype=np.uint32)  # np: folds to an HLO literal
    words_all = (bits_all.astype(jnp.uint32) << shifts).sum(
        axis=-1, dtype=jnp.uint32)                  # (K, BINS, 8)
    tau = 2.0 * jnp.pi
    bin_f = jnp.round(jnp.where(angle < 0, angle + tau, angle)
                      * (N_ROT_BINS / tau))
    bin_i = jnp.mod(bin_f.astype(jnp.int32), N_ROT_BINS)
    words = jnp.take_along_axis(words_all, bin_i[:, None, None], axis=1)[:, 0]
    return angle, jnp.where(valid[:, None], words, 0)


# ---------------------------------------------------------------------------
# Reference (gather-based) descriptor sampling — kept as the oracle for
# tests; not used on the hot path.
# ---------------------------------------------------------------------------

def _descriptors_at(img_blur, yx, angle, valid):
    """Rotated-BRIEF descriptors for keypoints on one level.

    img_blur: (H, W) f32 blurred level image; yx: (K, 2) int32; angle: (K,)
    radians.  Returns uint32 (K, 8).
    """
    h, w = img_blur.shape
    pat = brief_pattern()                         # np (256, 2, 2) (x, y)
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
    shifts = np.arange(32, dtype=np.uint32)  # np: folds to an HLO literal
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

    # Per-level: score + spatially-capped top-k selection + raw patch loads.
    # The descriptor matmuls are deliberately NOT per level — all levels'
    # patches concatenate into one (N, 1521) operand so the 20 GFLOP
    # blur/BRIEF contraction runs as a single large MXU matmul instead of 8
    # small padded ones (measured ~2x on the hot path).
    uv_l, resp_l, lvl_l, ok_l, patch_l = [], [], [], [], []
    offset = 0
    for lvl, (img_l, budget) in enumerate(zip(levels, budgets)):
        if budget == 0 or offset >= N:
            continue
        budget = min(budget, N - offset)
        h, w = img_l.shape
        margin = cfg.edge_threshold
        # On a real TPU the fused Pallas score+NMS kernel is ~4x the XLA
        # whole-image formulation (0.11 vs 0.43 ms/frame across the pyramid,
        # fetch-forced timing; earlier measurements claiming the opposite
        # were an artifact of block_until_ready not syncing on the remote
        # backend).  Its only divergence from nms3(fast_score(.)) is within
        # HALO=4 px of the left/right image edge (rolls wrap), which the
        # edge_threshold border mask (>= 16 px) zeroes anyway.  Off-TPU the
        # kernel would run in interpret mode — use the XLA path there.
        if jax.default_backend() == "tpu" and not pk.FORCE_INTERPRET:
            score = pk.fast_score_nms(img_l)
        else:
            score = fast_ops.nms3(fast_ops.fast_score(img_l))
        score = score * fast_ops.border_mask(h, w, margin)
        yx, resp, ok = _select_level_keypoints(
            score, budget, cfg.cell_size, float(cfg.fast_min_threshold))

        scale = cfg.scale_factor ** lvl
        uv_l.append(yx[:, ::-1].astype(jnp.float32) * scale)
        resp_l.append(resp)
        lvl_l.append(jnp.full((budget,), lvl, jnp.int32))
        ok_l.append(ok)
        patch_l.append(extract_patches(img_l, yx))
        offset += budget

    valid = jnp.concatenate(ok_l)
    angle, desc = _descriptors_from_patches(jnp.concatenate(patch_l), valid)
    uv = jnp.concatenate(uv_l)
    response = jnp.concatenate(resp_l)
    level = jnp.concatenate(lvl_l)

    if offset < N:
        pad = N - offset
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), jnp.float32)])
        response = jnp.concatenate([response, jnp.zeros((pad,), jnp.float32)])
        angle = jnp.concatenate([angle, jnp.zeros((pad,), jnp.float32)])
        level = jnp.concatenate([level, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        desc = jnp.concatenate([desc, jnp.zeros((pad, DESC_WORDS), jnp.uint32)])

    return {"uv": uv, "response": response, "angle": angle,
            "level": level, "valid": valid, "desc": desc}
