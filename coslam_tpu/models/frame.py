"""Frame construction: extraction + undistortion + per-octave information.

The analogue of the reference Frame ctor (ORB_SLAM2/src/Frame.cc:174-229:
ORB extraction, UndistortKeyPoints, AssignFeaturesToGrid).  No grid is
built — windowed searches are masks on the full distance matrix
(ops/matching.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import SystemConfig
from coslam_tpu.ops import orb
from coslam_tpu.utils import camera as cam_mod


class Frame(NamedTuple):
    uv: jnp.ndarray         # (N, 2) f32 undistorted keypoint coords
    uv_raw: jnp.ndarray     # (N, 2) f32 raw (distorted) coords
    level: jnp.ndarray      # (N,) i32
    angle: jnp.ndarray      # (N,) f32
    response: jnp.ndarray   # (N,) f32
    desc: jnp.ndarray       # (N, 8) u32
    valid: jnp.ndarray      # (N,) bool
    inv_sigma2: jnp.ndarray  # (N,) f32 information by octave


@functools.partial(jax.jit, static_argnums=(1,))
def build_frame(img: jnp.ndarray, cfg: SystemConfig) -> Frame:
    kp = orb.extract(img, cfg.extractor)
    uv_und = cam_mod.undistort_pixels(cfg.camera, kp["uv"])
    sigma2 = jnp.asarray(cfg.extractor.level_sigma2, jnp.float32)
    inv_s2 = 1.0 / sigma2[kp["level"]]
    return Frame(uv=uv_und, uv_raw=kp["uv"], level=kp["level"],
                 angle=kp["angle"], response=kp["response"], desc=kp["desc"],
                 valid=kp["valid"], inv_sigma2=inv_s2)
