"""Hand-written Pallas TPU kernels for the hot ops.

Two kernels where fusing beats stock XLA:

  * `fast_score_nms` — FAST-9/16 corner scoring + 3x3 NMS in one VMEM-
    resident pass.  The XLA formulation (ops/fast.py) materializes 16
    shifted image copies plus ~5 reduction intermediates through HBM; here
    the image tile is loaded once and every shift/min/max happens in VMEM
    on the VPU.
  * `masked_match` — fused Hamming matching: for each query descriptor, the
    masked best/second-best distances and the best index over all targets,
    with the spatial-window mask computed on the fly from coordinates.  The
    XLA matcher (ops/matching.py) materializes the full (N, M) distance
    matrix in HBM (134 MB for the 32k-landmark local-map search); the
    kernel streams target blocks through VMEM and keeps only (N, 3)
    outputs.

Both have jnp reference implementations in their home modules; tests assert
bit-equality (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coslam_tpu.ops import fast as fast_ops

INF_I32 = np.int32(1 << 20)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# FAST score + NMS
# ---------------------------------------------------------------------------

def _roll(x, s, axis):
    # pltpu.roll needs a non-negative shift; sizes are static
    return pltpu.roll(x, s % x.shape[axis], axis)


_HALO = 4          # 3 px circle radius + 1 px NMS
_BH = 64           # row-block height


def _fast_kernel(img_hbm, out_ref, tile, sem):
    """One row block: DMA (BH + 2*HALO, W) slice to VMEM, score, NMS."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * _BH, _BH + 2 * _HALO), :], tile, sem)
    dma.start()
    dma.wait()
    img = tile[:]

    def shift(dy, dx):
        return _roll(_roll(img, -dy, 0), -dx, 1)

    circ = [shift(dy, dx) for dy, dx in fast_ops.CIRCLE]

    # low-live-value formulation: 16 arc starts x accumulating min over 9,
    # max-reduced into `score` (the log-step trick keeps ~70 block-sized
    # temporaries alive and overflows VMEM; this keeps ~20)
    score = None
    for sign in (1.0, -1.0):
        for start in range(16):
            acc = None
            for j in range(fast_ops.ARC_LEN):
                d = sign * (circ[(start + j) % 16] - img)
                acc = d if acc is None else jnp.minimum(acc, d)
            score = acc if score is None else jnp.maximum(score, acc)

    pooled = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            pooled = jnp.maximum(pooled, _roll(_roll(score, -dy, 0), -dx, 1))
    nms = jnp.where(score >= pooled, score, 0.0)
    out_ref[:] = nms[_HALO:-_HALO, :]


@functools.partial(jax.jit, static_argnums=())
def fast_score_nms(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) float32 -> NMS'd FAST score map, fused in VMEM row blocks.

    Matches nms3(fast_score(img)) except at image borders (the kernel's
    rolls wrap within a block), which ops/orb.py masks out via
    edge_threshold anyway.
    """
    h, w = img.shape
    wp = -(-w // 128) * 128
    hp = -(-h // _BH) * _BH
    padded = jnp.zeros((hp + 2 * _HALO, wp), jnp.float32)
    padded = padded.at[_HALO:h + _HALO, :w].set(img.astype(jnp.float32))
    out = pl.pallas_call(
        _fast_kernel,
        grid=(hp // _BH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_BH, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BH + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(padded)
    return out[:h, :w]


# ---------------------------------------------------------------------------
# Fused masked Hamming matcher
# ---------------------------------------------------------------------------

_M1 = np.uint32(0x55555555)
_M2 = np.uint32(0x33333333)
_M4 = np.uint32(0x0F0F0F0F)
_H01 = np.uint32(0x01010101)


def _popcount(x):
    x = x - ((x >> 1) & _M1)
    x = (x & _M2) + ((x >> 2) & _M2)
    x = (x + (x >> 4)) & _M4
    return ((x * _H01) >> 24).astype(jnp.int32)


def _match_kernel(dq_ref, uvq_ref, r2_ref, vq_ref, dt_ref, uvt_ref, vt_ref,
                  best_ref, second_ref, idx_ref, *, block_m: int):
    dq = dq_ref[:]            # (BN, 8) uint32
    uvq = uvq_ref[:]          # (BN, 2)
    r2 = r2_ref[:]            # (BN, 1) f32
    vq = vq_ref[:]            # (BN, 1) int32 0/1
    BN = dq.shape[0]
    M = dt_ref.shape[0]

    best = jnp.full((BN,), jnp.float32(INF_I32))
    second = jnp.full((BN,), jnp.float32(INF_I32))
    idx = jnp.full((BN,), -1, jnp.int32)
    for b in range(M // block_m):
        dt = dt_ref[pl.ds(b * block_m, block_m), :]      # (BM, 8)
        uvt = uvt_ref[pl.ds(b * block_m, block_m), :]    # (BM, 2)
        vt = vt_ref[pl.ds(b * block_m, block_m), :]      # (BM, 1)
        # distances as f32: exact (<= 256), and Mosaic's argmin is f32-only;
        # accumulate per descriptor word to keep VMEM pressure ~3 tiles
        d = jnp.zeros((BN, block_m), jnp.int32)
        for wd in range(8):
            qw = dq[:, wd]
            tw = dt[:, wd]
            d = d + _popcount(qw[:, None] ^ tw[None, :])
        d = d.astype(jnp.float32)
        ut0 = uvt[:, 0]
        ut1 = uvt[:, 1]
        dd0 = uvq[:, 0:1] - ut0[None, :]
        dd1 = uvq[:, 1:2] - ut1[None, :]
        d2 = dd0 * dd0 + dd1 * dd1
        ok = (d2 <= r2) & (vq > 0) & (vt[:, 0][None, :] > 0)
        d = jnp.where(ok, d, jnp.float32(INF_I32))

        bm = jnp.min(d, axis=1)
        am = jnp.argmin(d, axis=1).astype(jnp.int32) + b * block_m
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + b * block_m
        d2nd = jnp.where(cols == am[:, None], jnp.float32(INF_I32), d)
        sm = jnp.min(d2nd, axis=1)

        new_best = bm < best
        second = jnp.where(new_best, jnp.minimum(best, sm),
                           jnp.minimum(second, bm))
        idx = jnp.where(new_best, am, idx)
        best = jnp.where(new_best, bm, best)

    best_ref[:, 0] = best.astype(jnp.int32)
    second_ref[:, 0] = second.astype(jnp.int32)
    idx_ref[:, 0] = jnp.where(best < jnp.float32(INF_I32), idx, -1)


def masked_match(desc_q, uv_q, r2_q, valid_q, desc_t, uv_t, valid_t,
                 block_n: int = 128, block_m: int = 256):
    """Fused windowed matcher.

    desc_q: (N, 8) uint32; uv_q: (N, 2) f32 predicted locations; r2_q: (N,)
    squared window radii; desc_t/(M, 8), uv_t (M, 2).  Returns (best (N,),
    second (N,), idx (N,)) int32 — the inputs to ratio/threshold gates.
    N, M must be multiples of the block sizes (pad with valid=False).
    """
    N = desc_q.shape[0]
    M = desc_t.shape[0]
    assert N % block_n == 0 and M % block_m == 0, (N, M)
    grid = (N // block_n,)
    kernel = functools.partial(_match_kernel, block_m=block_m)
    best, second, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(desc_q, uv_q, r2_q[:, None], valid_q.astype(jnp.int32)[:, None],
      desc_t, uv_t, valid_t.astype(jnp.int32)[:, None])
    return best[:, 0], second[:, 0], idx[:, 0]
