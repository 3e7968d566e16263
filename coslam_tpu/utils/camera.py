"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's OpenCV camera handling: cv::undistortPoints in
Frame::UndistortKeyPoints (reference ORB_SLAM2/src/Frame.cc:405-440) and the
projection math inlined throughout ORBmatcher/Optimizer.  All functions are
batched jnp over leading dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig


def intrinsics_matrix(cam: CameraConfig) -> jnp.ndarray:
    return jnp.array(cam.K, dtype=jnp.float32)


def distort_normalized(cam: CameraConfig, xn):
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: CameraConfig, xd, iters: int = 8):
    """Invert distortion with fixed-point iteration (matches cv::undistortPoints
    semantics; fixed iteration count keeps it jittable)."""
    if not cam.has_distortion:
        return xd

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        xn_new = (xd - jnp.stack([dx, dy], axis=-1)) / radial[..., None]
        return xn_new

    return jax.lax.fori_loop(0, iters, body, xd)


def pixel_to_normalized(cam: CameraConfig, uv):
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def normalized_to_pixel(cam: CameraConfig, xn):
    u = xn[..., 0] * cam.fx + cam.cx
    v = xn[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistort_pixels(cam: CameraConfig, uv):
    """Distorted pixel coords -> undistorted pixel coords (Frame.cc:405)."""
    if not cam.has_distortion:
        return uv
    xn = undistort_normalized(cam, pixel_to_normalized(cam, uv))
    return normalized_to_pixel(cam, xn)


def project(cam: CameraConfig, pts_cam, distort: bool = False):
    """Camera-frame points (..., 3) -> pixels (..., 2), plus depth (...,).

    Guard against divide-by-zero for points at/behind the camera; validity is
    the caller's job via the returned depth.
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xn = pts_cam[..., :2] * inv_z[..., None]
    if distort and cam.has_distortion:
        xn = distort_normalized(cam, xn)
    return normalized_to_pixel(cam, xn), z


def in_image(cam: CameraConfig, uv, margin: float = 0.0):
    return ((uv[..., 0] >= margin) & (uv[..., 0] < cam.width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < cam.height - margin))


def backproject(cam: CameraConfig, uv, depth):
    """Pixels (..., 2) + depth (...) -> camera-frame points (..., 3).

    Reference Frame::UnprojectStereo (Frame.cc:667)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def projection_matrix(cam: CameraConfig, Tcw):
    """K @ [R|t] for triangulation: (..., 4, 4) -> (..., 3, 4)."""
    K = intrinsics_matrix(cam)
    return jnp.einsum("ij,...jk->...ik", K, Tcw[..., :3, :])
