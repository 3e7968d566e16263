import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.utils import geometry as geo


def random_rotation(rng, n=()):
    w = rng.standard_normal(n + (3,)) * 1.5
    return np.asarray(geo.exp_so3(jnp.asarray(w, jnp.float32)))


def test_exp_log_so3_roundtrip(rng):
    w = rng.standard_normal((32, 3)).astype(np.float32)
    # log is only the exp inverse inside the |theta| < pi injectivity radius
    w *= (2.8 / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 2.8 / 1.5))
    R = geo.exp_so3(jnp.asarray(w))
    w2 = geo.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=2e-3)


def test_exp_so3_small_angle(rng):
    w = rng.standard_normal((8, 3)).astype(np.float32) * 1e-6
    R = np.asarray(geo.exp_so3(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_rotation_orthonormal(rng):
    R = random_rotation(rng, (16,))
    RtR = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_rot_roundtrip(rng):
    R = random_rotation(rng, (64,))
    q = geo.rot_to_quat(jnp.asarray(R))
    R2 = np.asarray(geo.quat_to_rot(q))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.standard_normal((32, 6)).astype(np.float32)
    T = geo.exp_se3(jnp.asarray(xi))
    xi2 = np.asarray(geo.log_se3(T))
    np.testing.assert_allclose(xi2, xi, atol=5e-4)


def test_se3_inverse(rng):
    xi = rng.standard_normal((8, 6)).astype(np.float32)
    T = geo.exp_se3(jnp.asarray(xi))
    TI = np.asarray(geo.se3_inverse(T) @ T)
    np.testing.assert_allclose(TI, np.broadcast_to(np.eye(4), TI.shape), atol=1e-5)


def test_transform_points(rng):
    xi = rng.standard_normal(6).astype(np.float32)
    T = geo.exp_se3(jnp.asarray(xi))
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    out = np.asarray(geo.transform_points(T, jnp.asarray(pts)))
    expected = pts @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_sim3_compose_inverse(rng):
    for seed in range(3):
        r = np.random.default_rng(seed)
        S = geo.sim3(jnp.asarray(np.exp(r.normal() * 0.3), jnp.float32),
                     jnp.asarray(random_rotation(r)),
                     jnp.asarray(r.standard_normal(3), jnp.float32))
        SI = geo.sim3_compose(S, geo.sim3_inverse(S))
        np.testing.assert_allclose(np.asarray(SI["R"]), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(SI["t"]), 0, atol=1e-5)
        np.testing.assert_allclose(float(SI["s"]), 1.0, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = (rng.standard_normal((16, 7)) * 0.5).astype(np.float32)
    S = geo.exp_sim3(jnp.asarray(xi))
    xi2 = np.asarray(geo.log_sim3(S))
    np.testing.assert_allclose(xi2, xi, atol=2e-3)


def test_sim3_apply_matches_formula(rng):
    S = geo.sim3(jnp.asarray(1.7, jnp.float32),
                 jnp.asarray(random_rotation(rng)),
                 jnp.asarray(rng.standard_normal(3), jnp.float32))
    pts = rng.standard_normal((5, 3)).astype(np.float32)
    out = np.asarray(geo.sim3_apply(S, jnp.asarray(pts)))
    exp = 1.7 * pts @ np.asarray(S["R"]).T + np.asarray(S["t"])
    np.testing.assert_allclose(out, exp, atol=1e-4)


def test_triangulate_dlt(rng):
    from coslam_tpu.config import CameraConfig
    from coslam_tpu.utils import camera as cam_mod
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480)
    pts = np.array([[0.5, -0.2, 6.0], [-1.0, 0.8, 9.0]], np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(geo.exp_se3(jnp.asarray([0.5, 0, 0, 0, 0.05, 0], jnp.float32)))
    P1 = cam_mod.projection_matrix(cam, jnp.asarray(T1))
    P2 = cam_mod.projection_matrix(cam, jnp.asarray(T2))
    uv1, _ = cam_mod.project(cam, geo.transform_points(jnp.asarray(T1), jnp.asarray(pts)))
    uv2, _ = cam_mod.project(cam, geo.transform_points(jnp.asarray(T2), jnp.asarray(pts)))
    X = np.asarray(geo.triangulate_dlt(
        jnp.broadcast_to(P1, (2, 3, 4)), jnp.broadcast_to(P2, (2, 3, 4)), uv1, uv2))
    np.testing.assert_allclose(X, pts, atol=1e-2)
