"""Two-view monocular initialization: vmapped H/F RANSAC + motion recovery.

TPU redesign of reference Initializer (ORB_SLAM2/src/Initializer.cc): where
the reference launches two CPU threads computing homography and fundamental
models over 200 RANSAC iterations (:104-115) with early-exit control flow,
here *all* 200 hypotheses of *both* models are scored as two batched
computations (vmap over hypotheses, broadcast over matches) and the winners
selected by argmax — fixed iteration count, no data-dependent branching.

Model selection keeps the reference heuristic RH = SH/(SH+SF) > 0.40 (:115
region), the scoring functions mirror CheckHomography (:305) / Check-
Fundamental (:390) including the chi-square gates and the (th - chi2) inlier
rewards, and motion recovery mirrors ReconstructF's 4-candidate cheirality
vote (:470) and ReconstructH's 8-motion Faugeras decomposition (:572).

Null vectors come from eigh of A^T A (batched symmetric eigendecomposition;
cheaper than per-hypothesis SVD and equivalent for the smallest eigenpair).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig
from coslam_tpu.utils import geometry as geo

_hm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_he = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991  # both scores accumulate against 5.991 (Initializer.cc:305,390)


class TwoViewResult(NamedTuple):
    success: jnp.ndarray      # () bool
    used_homography: jnp.ndarray  # () bool
    T21: jnp.ndarray          # (4, 4) pose of view 2 w.r.t. view 1 (unit t)
    points3d: jnp.ndarray     # (N, 3) triangulated in view-1 frame
    is_inlier: jnp.ndarray    # (N,) bool triangulated + cheirality-clean
    n_good: jnp.ndarray       # () int32


def _normalize(uv, valid):
    """Hartley normalization over valid matches (Initializer.cc:707)."""
    w = valid.astype(jnp.float32)
    n = w.sum() + 1e-6
    mean = (uv * w[:, None]).sum(0) / n
    dev = jnp.abs(uv - mean) * w[:, None]
    md = dev.sum(0) / n + 1e-8
    s = 1.0 / md
    uvn = (uv - mean) * s
    T = jnp.array([[s[0], 0, -mean[0] * s[0]],
                   [0, s[1], -mean[1] * s[1]],
                   [0, 0, 1]], jnp.float32)
    return uvn, T


def _smallest_eigvec(A):
    """Unit null-ish vector of (..., m, 9): eigenvector of A^T A with the
    smallest eigenvalue."""
    AtA = _he("...mi,...mj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def _h_from_8(uv1n, uv2n):
    """(8, 2) x2 -> H (3, 3) by DLT (Initializer.cc ComputeH21)."""
    x1, y1 = uv1n[:, 0], uv1n[:, 1]
    x2, y2 = uv2n[:, 0], uv2n[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], 1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], 1)
    A = jnp.concatenate([r1, r2], 0)  # (16, 9)
    return _smallest_eigvec(A).reshape(3, 3)


def _f_from_8(uv1n, uv2n):
    """(8, 2) x2 -> rank-2 F (3, 3) (Initializer.cc ComputeF21)."""
    x1, y1 = uv1n[:, 0], uv1n[:, 1]
    x2, y2 = uv2n[:, 0], uv2n[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], 1)
    F = _smallest_eigvec(A).reshape(3, 3)
    u, s, vt = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return _hm(u * s[None, :], vt)


def _score_h(H, uv1, uv2, valid, sigma2):
    Hinv = jnp.linalg.inv(H)

    def transfer(M, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], 1)
        p = ah @ M.T
        proj = p[:, :2] / (p[:, 2:3] + 1e-12)
        return jnp.sum((proj - b) ** 2, axis=1) / sigma2

    c1 = transfer(Hinv, uv2, uv1)
    c2 = transfer(H, uv1, uv2)
    in1 = c1 < CHI2_H
    in2 = c2 < CHI2_H
    score = jnp.where(valid & in1, SCORE_TH - c1, 0.0).sum() \
        + jnp.where(valid & in2, SCORE_TH - c2, 0.0).sum()
    return score, valid & in1 & in2


def _score_f(F, uv1, uv2, valid, sigma2):
    ones = jnp.ones_like(uv1[:, :1])
    p1 = jnp.concatenate([uv1, ones], 1)
    p2 = jnp.concatenate([uv2, ones], 1)
    l2 = p1 @ F.T       # epipolar line in image 2
    l1 = p2 @ F         # in image 1
    d2 = (jnp.sum(l2 * p2, 1) ** 2) / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-12) / sigma2
    d1 = (jnp.sum(l1 * p1, 1) ** 2) / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12) / sigma2
    in1 = d1 < CHI2_F
    in2 = d2 < CHI2_F
    score = jnp.where(valid & in1, SCORE_TH - d1, 0.0).sum() \
        + jnp.where(valid & in2, SCORE_TH - d2, 0.0).sum()
    return score, valid & in1 & in2


def _triangulate_many(K, R, t, uv1, uv2):
    """Triangulate all matches for candidate (R, t) via eigh of the 4x4
    DLT normal matrix (Initializer.cc:734 Triangulate, batched)."""
    P1 = jnp.concatenate([K, jnp.zeros((3, 1))], 1)
    P2 = _hm(K, jnp.concatenate([R, t[:, None]], 1))

    def rows(P, uv):
        return jnp.stack([uv[:, 0, None] * P[2] - P[0],
                          uv[:, 1, None] * P[2] - P[1]], 1)  # (N, 2, 4)

    A = jnp.concatenate([rows(P1, uv1), rows(P2, uv2)], 1)  # (N, 4, 4)
    AtA = _he("nmi,nmj->nij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[:, :, 0]
    return X[:, :3] / (X[:, 3:4] + jnp.where(jnp.abs(X[:, 3:4]) < 1e-12, 1e-12, 0.0))


def _check_rt(K, R, t, uv1, uv2, valid, sigma2):
    """Count good points for candidate motion (Initializer.cc CheckRT:798):
    finite, in front of both cameras, parallax > ~1deg (cos < 0.99998),
    reprojection error < 4 sigma^2 in both views."""
    X = _triangulate_many(K, R, t, uv1, uv2)
    finite = jnp.all(jnp.isfinite(X), axis=1)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    # parallax between viewing rays
    C2 = -R.T @ t
    r1 = X
    r2 = X - C2
    cos_par = jnp.sum(r1 * r2, 1) / (
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1) + 1e-12)

    def reproj(P3, uv):
        p = P3 @ K.T
        pr = p[:, :2] / (p[:, 2:3] + 1e-12)
        return jnp.sum((pr - uv) ** 2, 1)

    e1 = reproj(X, uv1)
    e2 = reproj(Xc2, uv2)
    good = (valid & finite & (z1 > 0) & (z2 > 0) & (cos_par < 0.99998)
            & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2))
    # representative parallax: 50th-best cos (reference takes the 50th)
    cos_sorted = jnp.sort(jnp.where(good, cos_par, 1.0))
    idx = jnp.minimum(jnp.sum(good) - 1, 50)
    par_cos = cos_sorted[jnp.maximum(idx, 0)]
    return good.sum(), good, X, par_cos


def _motions_from_f(K, F):
    """4 candidate (R, t) from E = K^T F K (Initializer.cc DecomposeE:909)."""
    E = _hm(_hm(K.T, F), K)
    u, _, vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], jnp.float32)
    R1 = _hm(_hm(u, W), vt)
    R2 = _hm(_hm(u, W.T), vt)
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    t = t / (jnp.linalg.norm(t) + 1e-12)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _motions_from_h(K, H):
    """8 candidate (R, t) via Faugeras SVD decomposition
    (Initializer.cc ReconstructH:572)."""
    A = _hm(_hm(jnp.linalg.inv(K), H), K)
    u, d, vt = jnp.linalg.svd(A)
    V = vt.T
    s = jnp.linalg.det(u) * jnp.linalg.det(vt)
    d1, d2, d3 = d[0], d[1], d[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    # case d' > 0
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 + d3) * d2 + 1e-12)
    st = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux_st
    ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2 + 1e-12)
    Rp_pos = jnp.zeros((4, 3, 3))
    Rp_pos = Rp_pos.at[:, 0, 0].set(ct).at[:, 1, 1].set(1.0).at[:, 2, 2].set(ct)
    Rp_pos = Rp_pos.at[:, 0, 2].set(-st).at[:, 2, 0].set(st)
    tp_pos = jnp.stack([x1s, jnp.zeros(4), -x3s], 1) * (d1 - d3)

    # case d' < 0
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 - d3) * d2 + 1e-12)
    sp = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux_sp
    cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2 + 1e-12)
    Rp_neg = jnp.zeros((4, 3, 3))
    Rp_neg = Rp_neg.at[:, 0, 0].set(cp).at[:, 1, 1].set(-1.0).at[:, 2, 2].set(cp)
    Rp_neg = Rp_neg.at[:, 0, 2].set(sp).at[:, 2, 0].set(sp)
    tp_neg = jnp.stack([x1s, jnp.zeros(4), x3s], 1) * (d1 + d3)

    Rp = jnp.concatenate([Rp_pos, Rp_neg])     # (8, 3, 3)
    tp = jnp.concatenate([tp_pos, tp_neg])     # (8, 3)
    R = s * _he("ij,njk,kl->nil", u, Rp, vt)
    t = _he("ij,nj->ni", u, tp)
    t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + 1e-12)
    return R, t


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
def initialize(cam: CameraConfig, uv1, uv2, valid, key,
               iters: int = 200, sigma: float = 1.0,
               min_good: int = 50) -> TwoViewResult:
    """Full two-view bootstrap from matched (undistorted) pixel coords.

    uv1, uv2: (N, 2) float32; valid: (N,) bool.  Mirrors
    Initializer::Initialize (Initializer.cc:44-123) with batched hypotheses.
    """
    sigma2 = sigma * sigma
    K = jnp.array(cam.K, jnp.float32)
    n = uv1.shape[0]

    uv1n, T1 = _normalize(uv1, valid)
    uv2n, T2 = _normalize(uv2, valid)

    p = valid.astype(jnp.float32)
    p = p / (p.sum() + 1e-9)
    samples = jax.random.choice(key, n, shape=(iters, 8), replace=True, p=p)

    def one_hyp(idx):
        a, b = uv1n[idx], uv2n[idx]
        Hn = _h_from_8(a, b)
        Fn = _f_from_8(a, b)
        H = _hm(_hm(jnp.linalg.inv(T2), Hn), T1)
        F = _hm(_hm(T2.T, Fn), T1)
        sh, _ = _score_h(H, uv1, uv2, valid, sigma2)
        sf, _ = _score_f(F, uv1, uv2, valid, sigma2)
        return H, F, sh, sf

    Hs, Fs, sh, sf = jax.vmap(one_hyp)(samples)
    bh, bf = jnp.argmax(sh), jnp.argmax(sf)
    H, F = Hs[bh], Fs[bf]
    SH, SF = sh[bh], sf[bf]
    use_h = SH / (SH + SF + 1e-12) > 0.40
    _, inl_h = _score_h(H, uv1, uv2, valid, sigma2)
    _, inl_f = _score_f(F, uv1, uv2, valid, sigma2)
    inliers = jnp.where(use_h, inl_h, inl_f)

    Rf, tf = _motions_from_f(K, F)          # (4, ...)
    Rh, th = _motions_from_h(K, H)          # (8, ...)
    Rall = jnp.concatenate([Rf, Rh])        # (12, 3, 3)
    tall = jnp.concatenate([tf, th])
    hyp_mask = jnp.concatenate([jnp.full(4, ~use_h), jnp.full(8, use_h)])

    counts, goods, Xs, par_cos = jax.vmap(
        lambda R, t: _check_rt(K, R, t, uv1, uv2, inliers, sigma2))(Rall, tall)
    counts = jnp.where(hyp_mask, counts, -1)
    best = jnp.argmax(counts)
    n_good = counts[best]
    n_inl = inliers.sum()
    # reference acceptance: clear winner (no similar second), >= 90 % of the
    # required minimum, parallax above ~1 deg (Initializer.cc:470-570)
    second = jnp.sort(counts)[-2]
    min_good = jnp.maximum(0.9 * n_inl.astype(jnp.float32), float(min_good))
    ok = ((n_good.astype(jnp.float32) > min_good)
          & (second.astype(jnp.float32) < 0.75 * n_good.astype(jnp.float32))
          & (par_cos[best] < 0.9998))

    T21 = geo.se3(Rall[best], tall[best])
    return TwoViewResult(success=ok, used_homography=use_h, T21=T21,
                         points3d=Xs[best], is_inlier=goods[best],
                         n_good=n_good)
