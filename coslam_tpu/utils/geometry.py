"""SE3 / SO3 / Sim3 Lie-group operations, batched and jit-friendly.

Replaces the reference's scattered cv::Mat pose algebra and
Converter.cc (cv::Mat <-> Eigen <-> g2o::SE3Quat/Sim3, reference
ORB_SLAM2/src/Converter.cc:27-151) with pure jnp functions.  All functions
broadcast over leading batch dimensions; poses are 4x4 float32 row-major
world-to-camera matrices (Tcw) like the reference, rotations 3x3, and Sim3
elements are (s, R, t) triples.

Conventions: x_cam = R @ x_world + t;  Tcw = [[R, t], [0, 1]].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Small dense algebra must stay full float32 on the MXU (TPU matmuls default
# to reduced precision, which is fatal for pose math).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

_EPS = 1e-8


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def hat(w):
    """so3 hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ], axis=-2)


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp_so3(w):
    """Rodrigues: axis-angle (..., 3) -> rotation (..., 3, 3).

    Taylor-safe near theta=0 so it is differentiable everywhere.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * _mm(W, W)


def log_so3(R):
    """Rotation (..., 3, 3) -> axis-angle (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    # theta/(2 sin theta) with series fallback near 0
    sin_t = jnp.sin(theta)
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * sin_t + _EPS))
    w = vee(R - jnp.swapaxes(R, -1, -2)) * scale[..., None]
    return w


def project_to_so3(R):
    """Nearest rotation matrix via SVD (used to renormalize after updates)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(_mm(u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return _mm(u * d[..., None, :], vt)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_to_rot(q):
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def rot_to_quat(R):
    """Shepperd's method, branchless via jnp.where (batched-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def norm4(w, x, y, z):
        q = jnp.stack([w, x, y, z], axis=-1)
        return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)

    # four candidate decompositions; pick the numerically best
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 2
    q0 = norm4(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2
    q1 = norm4((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2
    q2 = norm4((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2
    q3 = norm4((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    c0 = tr > 0
    c1 = (m00 > m11) & (m00 > m22)
    c2 = m11 > m22
    q = jnp.where(c0[..., None], q0,
                  jnp.where(c1[..., None], q1,
                            jnp.where(c2[..., None], q2, q3)))
    return q


# ---------------------------------------------------------------------------
# SE3 (4x4)
# ---------------------------------------------------------------------------

def se3(R, t):
    """Assemble 4x4 from (..., 3, 3) and (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def rot(T):
    return T[..., :3, :3]


def trans(T):
    return T[..., :3, 3]


def se3_inverse(T):
    R = rot(T)
    Rt = jnp.swapaxes(R, -1, -2)
    t = -_einsum("...ij,...j->...i", Rt, trans(T))
    return se3(Rt, t)


def project_so3(R):
    """Nearest-rotation projection by Gram-Schmidt on (..., 3, 3) ROWS.

    Chained f32 pose compositions (exp-update optimizers, velocity models)
    drift off SO(3); because `se3_inverse` uses R^T, un-projected drift is
    re-injected into every motion prediction and COMPOUNDS (doubling per
    composition — a 1e-7 seed reaches 1e-2 within ~20 frames and collapses
    tracking).  Optimizer boundaries project their output through this."""
    r0 = R[..., 0, :]
    r0 = r0 / (jnp.linalg.norm(r0, axis=-1, keepdims=True) + 1e-12)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r1 * r0, -1, keepdims=True) * r0
    r1 = r1 / (jnp.linalg.norm(r1, axis=-1, keepdims=True) + 1e-12)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def project_se3(T):
    """Re-orthonormalize the rotation block of (..., 4, 4) poses."""
    return se3(project_so3(rot(T)), trans(T))


def exp_se3(xi):
    """se3 exp: (..., 6) twist [rho(3), phi(3)] -> (..., 4, 4).

    Uses the left-Jacobian V so that translation integrates along rotation.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (1.0 - a) / (theta2 + _EPS))
    R = I + a[..., None, None] * W + b[..., None, None] * _mm(W, W)
    V = I + b[..., None, None] * W + c[..., None, None] * _mm(W, W)
    t = _einsum("...ij,...j->...i", V, rho)
    return se3(R, t)


def log_se3(T):
    phi = log_so3(rot(T))
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    half_theta = 0.5 * theta
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) W^2
    cot_term = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        (1.0 - (theta * jnp.sin(theta)) / (2.0 * (1.0 - jnp.cos(theta)) + _EPS))
        / (theta2 + _EPS))
    Vinv = I - 0.5 * W + cot_term[..., None, None] * _mm(W, W)
    rho = _einsum("...ij,...j->...i", Vinv, trans(T))
    return jnp.concatenate([rho, phi], axis=-1)


def transform_points(T, pts):
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    return _einsum("...ij,...nj->...ni", rot(T), pts) + trans(T)[..., None, :]


def apply_se3(T, p):
    """Apply (..., 4, 4) to a single point (..., 3)."""
    return _einsum("...ij,...j->...i", rot(T), p) + trans(T)


# ---------------------------------------------------------------------------
# Sim3 — (s: scalar, R: 3x3, t: 3) with action x -> s R x + t
# (reference: g2o::Sim3 used by LoopClosing.cc:231-601, Optimizer.cc:781-1244)
# ---------------------------------------------------------------------------

def sim3(s, R, t):
    return {"s": jnp.asarray(s, jnp.float32), "R": R, "t": t}


def sim3_identity():
    return sim3(1.0, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))


def sim3_apply(S, pts):
    return S["s"][..., None, None] * _einsum(
        "...ij,...nj->...ni", S["R"], pts) + S["t"][..., None, :]


def sim3_compose(A, B):
    """A after B: x -> A(B(x))."""
    s = A["s"] * B["s"]
    R = _mm(A["R"], B["R"])
    t = A["s"][..., None] * _einsum("...ij,...j->...i", A["R"], B["t"]) + A["t"]
    return sim3(s, R, t)


def sim3_inverse(S):
    s_inv = 1.0 / S["s"]
    Rt = jnp.swapaxes(S["R"], -1, -2)
    t = -s_inv[..., None] * _einsum("...ij,...j->...i", Rt, S["t"])
    return sim3(s_inv, Rt, t)


def sim3_from_se3(T, s=1.0):
    return sim3(jnp.asarray(s, jnp.float32), rot(T), trans(T))


def sim3_to_se3(S):
    """Drop scale into translation-normalized SE3: [R | t/s] (reference
    LoopClosing.cc:471-478 rescales points then uses [R | t/s])."""
    return se3(S["R"], S["t"] / S["s"][..., None])


def exp_sim3(xi):
    """sim3 exp of (..., 7) = [rho(3), phi(3), sigma(1)].

    First-order-consistent closed form (W matrix per Strasdat's thesis).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = exp_so3(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # Coefficients of Wmat = a*I + b*W + c*W^2 such that t = Wmat @ rho
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-8
    A = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / (sigma + _EPS))
    # b,c terms (only rotation-coupled; use series when either small)
    es_cos = s * jnp.cos(theta)
    es_sin = s * jnp.sin(theta)
    denom = sigma * sigma + theta2 + _EPS
    B = jnp.where(
        th_small, jnp.zeros_like(theta),
        (es_sin * sigma + (1.0 - es_cos) * theta) / (denom * theta + _EPS))
    C = jnp.where(
        th_small, jnp.zeros_like(theta),
        (A - ((es_cos - 1.0) * sigma + es_sin * theta) / (denom + _EPS)) / (theta2 + _EPS))
    Wmat = A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * _mm(W, W)
    t = _einsum("...ij,...j->...i", Wmat, rho)
    return sim3(s, R, t)


def log_sim3(S):
    phi = log_so3(S["R"])
    sigma = jnp.log(S["s"])
    # invert the W matrix numerically (3x3 solve — cheap, robust)
    xi_rot = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # Rebuild Wmat from exp_sim3 coefficient path by calling with rho=e_i
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    s = S["s"]
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-8
    A = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / (sigma + _EPS))
    es_cos = s * jnp.cos(theta)
    es_sin = s * jnp.sin(theta)
    denom = sigma * sigma + theta2 + _EPS
    B = jnp.where(
        th_small, jnp.zeros_like(theta),
        (es_sin * sigma + (1.0 - es_cos) * theta) / (denom * theta + _EPS))
    C = jnp.where(
        th_small, jnp.zeros_like(theta),
        (A - ((es_cos - 1.0) * sigma + es_sin * theta) / (denom + _EPS)) / (theta2 + _EPS))
    Wmat = A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * _mm(W, W)
    rho = jnp.linalg.solve(Wmat, S["t"][..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Triangulation (reference Initializer.cc:734 Triangulate — DLT/SVD)
# ---------------------------------------------------------------------------

def triangulate_dlt(P1, P2, x1, x2):
    """Linear triangulation.

    P1, P2: (..., 3, 4) projection matrices; x1, x2: (..., 2) image points.
    Returns (..., 3) world points.  Solved via smallest right singular vector
    of the 4x4 DLT system, matching reference Initializer.cc:734-758.
    """
    rows = jnp.stack([
        x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ], axis=-2)
    _, _, vt = jnp.linalg.svd(rows)
    X = vt[..., 3, :]
    return X[..., :3] / (X[..., 3:4] + jnp.where(jnp.abs(X[..., 3:4]) < _EPS, _EPS, 0.0))


# ---------------------------------------------------------------------------
# Interpolation / trajectory helpers
# ---------------------------------------------------------------------------

def slerp(q0, q1, u):
    """Spherical linear interpolation of quaternions (w,x,y,z)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - u, jnp.sin((1.0 - u) * theta) / (sin_theta + _EPS))
    w1 = jnp.where(small, u, jnp.sin(u * theta) / (sin_theta + _EPS))
    q = w0 * q0 + w1 * q1
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
