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


# Set True to force interpret mode even when the default backend is a TPU —
# needed when a program is deliberately staged for virtual CPU devices on a
# TPU-attached host (e.g. dryrun_multichip's 8-device CPU mesh fallback).
FORCE_INTERPRET = False


def _interpret() -> bool:
    return FORCE_INTERPRET or jax.default_backend() != "tpu"


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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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


def _match_kernel(aq_ref, uvq_ref, r2_ref, vq_ref, lq_ref,
                  at_ref, uvt_ref, vt_ref, r2t_ref, lt_ref,
                  best_ref, second_ref, idx_ref, *, block_m: int,
                  level_lo: float, level_hi: float):
    aq = aq_ref[:]            # (256, BN) bf16 +/-1 descriptors, feature-major
    uvq0 = uvq_ref[0, :]      # (BN,)
    uvq1 = uvq_ref[1, :]
    r2 = r2_ref[0, :]         # (BN,) f32
    vq = vq_ref[0, :]         # (BN,) int32 0/1
    lq = lq_ref[0, :]         # (BN,) f32 octave
    BN = aq.shape[1]
    M = at_ref.shape[1]

    best = jnp.full((BN,), jnp.float32(INF_I32))
    second = jnp.full((BN,), jnp.float32(INF_I32))
    idx = jnp.full((BN,), -1, jnp.int32)

    # fori_loop (NOT a Python loop) over target blocks: the body is one
    # Mosaic region regardless of M — an unrolled loop at M=32k was 128
    # copies of the block body and took the compiler >20 min; rolled, the
    # whole kernel compiles in seconds and the loop costs nothing (the
    # block body is VPU-bound, not control-bound).  All target arrays are
    # laid out feature-major ((8|2|1, M)) so M rides the dense 128-lane
    # axis: an (M, 1) layout is tiled T(8,128) and pads every row to 128
    # lanes, which at M=32k is ~17 MB per array and blows the VMEM budget.
    def body(b, carry):
        best, second, idx = carry
        at = at_ref[:, pl.ds(b * block_m, block_m)]      # (256, BM)
        ut0 = uvt_ref[0, pl.ds(b * block_m, block_m)]    # (BM,)
        ut1 = uvt_ref[1, pl.ds(b * block_m, block_m)]
        vt = vt_ref[0, pl.ds(b * block_m, block_m)]      # (BM,) i32
        r2t = r2t_ref[0, pl.ds(b * block_m, block_m)]    # (BM,) f32
        lt = lt_ref[0, pl.ds(b * block_m, block_m)]      # (BM,) f32
        # Hamming distance as an MXU matmul on +/-1-expanded descriptors:
        # d = (256 - <aq, at>) / 2.  Bit-exact (+/-1 products are exact in
        # bf16, the f32 accumulation of 256 +/-1 terms is exact) and ~100x
        # cheaper than the former per-word VPU SWAR-popcount loop, whose
        # int32 multiply dominated the whole hot path (0.39 ms/frame).
        dot = jax.lax.dot_general(
            aq, at, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)         # (BN, BM)
        d = (256.0 - dot) * 0.5
        dd0 = uvq0[:, None] - ut0[None, :]
        dd1 = uvq1[:, None] - ut1[None, :]
        d2 = dd0 * dd0 + dd1 * dd1
        ok = (d2 <= r2[:, None]) & (d2 <= r2t[None, :]) \
            & (vq[:, None] > 0) & (vt[None, :] > 0)
        if level_lo > -100.0 or level_hi < 100.0:
            dl = lt[None, :] - lq[:, None]
            ok = ok & (dl >= level_lo) & (dl <= level_hi)
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
        return best, second, idx

    best, second, idx = jax.lax.fori_loop(
        0, M // block_m, body, (best, second, idx))

    best_ref[0, :] = best.astype(jnp.int32)
    second_ref[0, :] = second.astype(jnp.int32)
    idx_ref[0, :] = jnp.where(best < jnp.float32(INF_I32), idx, -1)


def masked_match(desc_q, uv_q, r2_q, valid_q, desc_t, uv_t, valid_t,
                 level_q=None, level_t=None,
                 level_lo: float = -1e9, level_hi: float = 1e9,
                 r2_t=None,
                 block_n: int = 128, block_m: int = 256):
    """Fused windowed matcher.

    desc_q: (N, 8) uint32; uv_q: (N, 2) f32 predicted locations; r2_q: (N,)
    squared window radii; desc_t/(M, 8), uv_t (M, 2).  Optional per-target
    radii r2_t (for the mutual-check reverse pass, where the window belongs
    to the other side) and octave gates level_t - level_q in
    [level_lo, level_hi].  Returns (best (N,), second (N,), idx (N,)) int32
    — the inputs to ratio/threshold gates.  N, M must be multiples of the
    block sizes (pad with valid=False).
    """
    N = desc_q.shape[0]
    M = desc_t.shape[0]
    assert N % block_n == 0 and M % block_m == 0, (N, M)
    if level_q is None:
        level_q = jnp.zeros(N, jnp.float32)
    if level_t is None:
        level_t = jnp.zeros(M, jnp.float32)
    if r2_t is None:
        r2_t = jnp.full(M, 1e18, jnp.float32)
    grid = (N // block_n,)
    kernel = functools.partial(_match_kernel, block_m=block_m,
                               level_lo=float(level_lo),
                               level_hi=float(level_hi))
    # feature-major layouts: the long point axis rides the 128-lane axis
    # (see the kernel comment re VMEM tiling).  Descriptors are expanded to
    # +/-1 bf16 (256, N)/(256, M) outside the kernel so the distance is one
    # MXU contraction per target block.
    from coslam_tpu.ops import hamming as _ham
    aq = _ham.unpack_pm1(desc_q).T      # (256, N) bf16
    at = _ham.unpack_pm1(desc_t).T      # (256, M) bf16
    qspec = lambda w: pl.BlockSpec((w, block_n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec(256), qspec(2), qspec(1), qspec(1), qspec(1),
                  full, full, full, full, full],
        out_specs=[qspec(1), qspec(1), qspec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(aq, uv_q.T, r2_q[None, :], valid_q.astype(jnp.int32)[None, :],
      level_q.astype(jnp.float32)[None, :],
      at, uv_t.T, valid_t.astype(jnp.int32)[None, :],
      r2_t.astype(jnp.float32)[None, :],
      level_t.astype(jnp.float32)[None, :])
    return best[0], second[0], idx[0]


# ---------------------------------------------------------------------------
# Fused motion-only bundle adjustment (pose-only LM)
# ---------------------------------------------------------------------------
#
# The XLA formulation (optim/pose_opt.py) is a lax.fori_loop whose body is
# ~40 small fusions (residual/Jacobian eval, two einsums, a 6x6 LU, the SE3
# exponential); at 4 rounds x 10 iterations the sequential dispatch chain
# costs ~2 ms on a TPU chip even though the arithmetic is ~10 MFLOP.  This
# kernel runs the ENTIRE optimization in one Mosaic program: point/obs
# arrays live in VMEM as (N/128, 128) tiles, the pose and the 6x6 normal
# system live in scalar registers, so each LM iteration is one vector pass
# (residual+Jacobian+27 reductions) plus ~200 scalar ops (unrolled Cholesky,
# Rodrigues), with no intermediate HBM traffic at all.
#
# Semantics match optim/pose_opt.py's reference-parity LM (g2o
# PoseOptimization, ORB_SLAM2/src/Optimizer.cc:239-451): Huber delta
# = sqrt(chi2_th) on rounds 1-2, plain quadratic after, chi2 outlier
# re-classification between rounds, accept/reject damping.


def _chol6_scalar(H, b):
    """Unrolled scalar Cholesky solve of a 6x6 SPD system.

    H: list-of-lists of rank-0 scalars (symmetric, upper filled); b: list.
    Runs on the TPU scalar core inside the kernel.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _exp_se3_scalar(dx):
    """SE3 exponential on 6 rank-0 scalars -> (R 3x3 list, t 3 list)."""
    rx, ry, rz, wx, wy, wz = dx
    t2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(t2 + 1e-12)
    small = t2 < 1e-8
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / (t2 + 1e-12))
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - A) / (t2 + 1e-12))
    W = [[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]]
    W2 = [[-(wy * wy + wz * wz), wx * wy, wx * wz],
          [wx * wy, -(wx * wx + wz * wz), wy * wz],
          [wx * wz, wy * wz, -(wx * wx + wy * wy)]]
    R = [[(1.0 if i == j else 0.0) + A * W[i][j] + B * W2[i][j]
          for j in range(3)] for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + B * W[i][j] + C * W2[i][j]
          for j in range(3)] for i in range(3)]
    rho = [rx, ry, rz]
    t = [sum(V[i][k] * rho[k] for k in range(3)) for i in range(3)]
    return R, t


def _pose_lm_kernel(x_ref, y_ref, z_ref, u_ref, v_ref, isg_ref, T_ref,
                    Tout_ref, inl_ref, *, fx, fy, cx, cy,
                    rounds, iters, chi2_th):
    delta = float(np.sqrt(chi2_th))
    X = x_ref[:]
    Y = y_ref[:]
    Z = z_ref[:]
    U = u_ref[:]
    V_ = v_ref[:]
    isg = isg_ref[:]
    valid = isg > 0.0

    # pose scalars, row-major [R | t] (3, 4)
    P0 = tuple(T_ref[0, k] for k in range(12))

    def resid(P):
        """One vector pass: camera-frame points, residuals, chi2, behind."""
        pcx = P[0] * X + P[1] * Y + P[2] * Z + P[3]
        pcy = P[4] * X + P[5] * Y + P[6] * Z + P[7]
        pcz = P[8] * X + P[9] * Y + P[10] * Z + P[11]
        zs = jnp.where(jnp.abs(pcz) < 1e-6, 1e-6, pcz)
        iz = 1.0 / zs
        ru = fx * pcx * iz + cx - U
        rv = fy * pcy * iz + cy - V_
        behind = pcz <= 0.05
        chi2 = (ru * ru + rv * rv) * isg
        return pcx, pcy, pcz, iz, ru, rv, behind, chi2

    def cost_of(chi2, behind, active, robust):
        e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        per = jnp.where(robust & (e > delta), delta * (2.0 * e - delta), chi2) \
            if robust else chi2
        per = jnp.where(active & jnp.logical_not(behind), per, 0.0)
        return jnp.sum(per)

    active = valid

    for rnd in range(rounds):
        robust = rnd < 2

        def lm_iter(i, st):
            P, lam = st[:12], st[12]
            P = tuple(P)
            pcx, pcy, pcz, iz, ru, rv, behind, chi2 = resid(P)
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            if robust:
                w_rob = jnp.where(e > delta, delta / e, 1.0)
            else:
                w_rob = 1.0
            ok = active & jnp.logical_not(behind)
            w = jnp.where(ok, isg * w_rob, 0.0)
            cost = cost_of(chi2, behind, active, robust)

            # Jacobian components w.r.t. left se3 perturbation [rho, phi]
            iz2 = iz * iz
            ju0 = fx * iz
            ju2 = -fx * pcx * iz2
            ju3 = -fx * pcx * pcy * iz2
            ju4 = fx * (1.0 + pcx * pcx * iz2)
            ju5 = -fx * pcy * iz
            jv1 = fy * iz
            jv2 = -fy * pcy * iz2
            jv3 = -fy * (1.0 + pcy * pcy * iz2)
            jv4 = fy * pcx * pcy * iz2
            jv5 = fy * pcx * iz
            zero = jnp.zeros_like(ju0)
            Ju = (ju0, zero, ju2, ju3, ju4, ju5)
            Jv = (zero, jv1, jv2, jv3, jv4, jv5)

            H = [[None] * 6 for _ in range(6)]
            bv = [None] * 6
            for a in range(6):
                for c in range(a, 6):
                    H[a][c] = jnp.sum(w * (Ju[a] * Ju[c] + Jv[a] * Jv[c]))
                    H[c][a] = H[a][c]
                bv[a] = jnp.sum(w * (Ju[a] * ru + Jv[a] * rv))

            for a in range(6):
                H[a][a] = H[a][a] * (1.0 + lam) + 1e-9

            dx = _chol6_scalar(H, bv)
            dx = [-d for d in dx]
            Rd, td = _exp_se3_scalar(dx)
            # compose T_new = exp(dx) @ T
            Pn = []
            for r_ in range(3):
                for c_ in range(4):
                    s = Rd[r_][0] * P[0 * 4 + c_] + Rd[r_][1] * P[1 * 4 + c_] \
                        + Rd[r_][2] * P[2 * 4 + c_]
                    if c_ == 3:
                        s = s + td[r_]
                    Pn.append(s)

            _, _, _, _, _, _, behind2, chi2n = resid(tuple(Pn))
            cost_new = cost_of(chi2n, behind2, active, robust)
            improved = cost_new < cost
            P_out = tuple(jnp.where(improved, pn, p) for pn, p in zip(Pn, P))
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            return P_out + (jnp.clip(lam, 1e-6, 1e3),)

        st = jax.lax.fori_loop(0, iters, lm_iter,
                               P0 + (jnp.float32(1e-3),))
        P0 = tuple(st[:12])
        # chi2 re-classification between rounds (Optimizer.cc:370-444)
        _, _, _, _, _, _, behind, chi2 = resid(P0)
        active = valid & jnp.logical_not(behind) & (chi2 < chi2_th)

    for k in range(12):
        Tout_ref[0, k] = P0[k]
    inl_ref[:] = active.astype(jnp.float32)


def pose_opt_lm(T_init, X, uv, isg_masked, *, fx, fy, cx, cy,
                rounds, iters, chi2_th):
    """Fused pose-only LM.  X: (N, 3); uv: (N, 2); isg_masked: (N,) f32 with
    zeros for invalid observations.  N must be a multiple of 128 (pad with
    isg=0).  Returns (T (4, 4) f32, inliers (N,) bool)."""
    N = X.shape[0]
    assert N % 128 == 0, N
    R = N // 128
    sh = (R, 128)
    x = X[:, 0].reshape(sh)
    y = X[:, 1].reshape(sh)
    z = X[:, 2].reshape(sh)
    u = uv[:, 0].reshape(sh)
    v = uv[:, 1].reshape(sh)
    w = isg_masked.reshape(sh)
    Tflat = T_init[:3, :].reshape(1, 12)

    kernel = functools.partial(
        _pose_lm_kernel, fx=float(fx), fy=float(fy), cx=float(cx),
        cy=float(cy), rounds=int(rounds), iters=int(iters),
        chi2_th=float(chi2_th))
    Tout, inl = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, 12), jnp.float32),
                   jax.ShapeDtypeStruct(sh, jnp.float32)],
        interpret=_interpret(),
    )(x, y, z, u, v, w, Tflat)
    T = jnp.concatenate([Tout.reshape(3, 4),
                         jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)])
    return T, inl.reshape(N) > 0.5
