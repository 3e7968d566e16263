"""Stereo keypoint matching and RGB-D depth association.

Replaces reference Frame::ComputeStereoMatches (ORB_SLAM2/src/
Frame.cc:467-643: per-row candidate lists, descriptor match, SAD sliding
window + parabola) and Frame::ComputeStereoFromRGBD (:644).

TPU form: the row-banded candidate search is a masked (N, N) Hamming matrix
(row window + disparity range as masks); sub-pixel refinement uses the
parabola fit over the best right keypoint's neighbors in distance space.
Depth lookup for RGB-D is a batched bilinear sample with a hole mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import CameraConfig, ExtractorConfig, MatcherConfig
from coslam_tpu.ops import matching


class StereoDepth(NamedTuple):
    u_right: jnp.ndarray  # (N,) matched right-image x coord (-1 invalid)
    depth: jnp.ndarray    # (N,) metric depth (0 invalid)
    valid: jnp.ndarray    # (N,) bool


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def match_stereo(cam: CameraConfig, ecfg: ExtractorConfig, mcfg: MatcherConfig,
                 kpsL, kpsR, img_left=None, img_right=None) -> StereoDepth:
    """kpsL/kpsR: keypoint SoA dicts of the two rectified views
    (uv/level/desc/valid).  Matches along epipolar rows, gates disparity to
    (0, fx/2], returns per-left-keypoint right coordinate and depth."""
    scales = jnp.asarray(ecfg.scale_factors, jnp.float32)
    uvL, uvR = kpsL["uv"], kpsR["uv"]
    # row band: |vL - vR| <= 2 sigma at the left keypoint's octave
    r = 2.0 * scales[jnp.clip(kpsL["level"], 0, len(ecfg.scale_factors) - 1)]
    row_ok = jnp.abs(uvL[:, 1:2] - uvR[None, :, 1]) <= r[:, None]
    disp = uvL[:, 0:1] - uvR[None, :, 0]
    min_d, max_d = 0.1, cam.bf / 0.3 if cam.bf > 0 else 1e6
    disp_ok = (disp > min_d) & (disp < max_d)
    lvl_ok = matching.level_mask(kpsL["level"], kpsR["level"], -1, 1)
    mm = matching.match(kpsL["desc"], kpsL["valid"], kpsR["desc"],
                        kpsR["valid"], mcfg, mask=row_ok & disp_ok & lvl_ok,
                        max_dist=mcfg.th_high, mutual=True)
    uR = uvR[jnp.maximum(mm.idx, 0), 0]
    if img_left is not None and img_right is not None:
        uR = _sad_subpixel(img_left.astype(jnp.float32),
                           img_right.astype(jnp.float32), uvL, uR)
    d = uvL[:, 0] - uR
    valid = mm.valid & (d > min_d)
    depth = jnp.where(valid, cam.bf / jnp.maximum(d, 1e-6), 0.0)
    return StereoDepth(u_right=jnp.where(valid, uR, -1.0),
                       depth=depth, valid=valid)


_SAD_W = 5       # half window (11 x 11), reference Frame.cc:556
_SAD_SHIFT = 5   # +/- search, reference Frame.cc:557


def _sad_subpixel(imgL, imgR, uvL, uR):
    """Sub-pixel disparity via SAD sliding window + parabola fit around the
    descriptor match (reference Frame::ComputeStereoMatches, Frame.cc:540-620).

    Batched: one 11x11 left patch and one 11x21 right strip per keypoint via
    dynamic_slice, 11 shifts evaluated as stacked slices.
    """
    W, S = _SAD_W, _SAD_SHIFT
    h, w = imgL.shape
    xL = jnp.round(uvL[:, 0]).astype(jnp.int32)
    yL = jnp.round(uvL[:, 1]).astype(jnp.int32)
    xR = jnp.round(uR).astype(jnp.int32)

    y0 = jnp.clip(yL - W, 0, h - (2 * W + 1))
    xl0 = jnp.clip(xL - W, 0, w - (2 * W + 1))
    xr0 = jnp.clip(xR - W - S, 0, w - (2 * W + 2 * S + 1))

    def patches(y, xl, xr):
        pl = jax.lax.dynamic_slice(imgL, (y, xl), (2 * W + 1, 2 * W + 1))
        strip = jax.lax.dynamic_slice(imgR, (y, xr),
                                      (2 * W + 1, 2 * W + 2 * S + 1))
        return pl, strip

    pl, strip = jax.vmap(patches)(y0, xl0, xr0)        # (N,11,11), (N,11,21)
    # 11 candidate windows from the strip
    cands = jnp.stack([strip[:, :, s:s + 2 * W + 1]
                       for s in range(2 * S + 1)], 1)  # (N, 11, 11, 11)
    # zero-mean SAD (robust to brightness offset)
    plz = pl - pl.mean(axis=(1, 2), keepdims=True)
    cz = cands - cands.mean(axis=(2, 3), keepdims=True)
    sad = jnp.abs(cz - plz[:, None]).sum(axis=(2, 3))  # (N, 11)
    best = jnp.argmin(sad, axis=1)
    bi = jnp.clip(best, 1, 2 * S - 1)
    sm1 = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    s0 = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    sp1 = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = sm1 - 2 * s0 + sp1
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (sm1 - sp1) / jnp.where(
                          jnp.abs(denom) < 1e-6, 1.0, denom), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    # window bi's center column in the right image
    refined = (xr0 + W + bi).astype(jnp.float32) + delta
    # fall back to the raw estimate when the argmin hit the search border
    ok = (best >= 1) & (best <= 2 * S - 1)
    return jnp.where(ok, refined, uR)


@functools.partial(jax.jit, static_argnums=(0,))
def rgbd_depth(cam: CameraConfig, uv, kp_valid, depth_img,
               depth_factor: float = 1.0) -> StereoDepth:
    """Associate keypoints with sensor depth (reference
    Frame::ComputeStereoFromRGBD, Frame.cc:644): nearest-pixel lookup with a
    hole mask; the virtual right coordinate is u - bf/d."""
    h, w = depth_img.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_img[y, x].astype(jnp.float32) * depth_factor
    valid = kp_valid & (d > 0.05)
    u_right = jnp.where(valid & (cam.bf > 0), uv[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    return StereoDepth(u_right=u_right, depth=jnp.where(valid, d, 0.0),
                       valid=valid)
