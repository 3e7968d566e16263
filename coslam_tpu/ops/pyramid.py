"""Image pyramid + Gaussian blur.

Replaces reference ORBextractor::ComputePyramid (ORB_SLAM2/src/
ORBextractor.cc:1107-1133, 8 levels at scale 1.2 via cv::resize) and the
7x7 sigma=2 GaussianBlur applied before BRIEF sampling (:1086).

Whole-image ops stay in plain XLA: resize and separable convs fuse well and
are bandwidth-bound, not worth a hand kernel.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import ExtractorConfig


def level_shapes(h: int, w: int, cfg: ExtractorConfig) -> List[Tuple[int, int]]:
    """Static per-level image shapes (rounded like cv::resize)."""
    shapes = []
    for lvl in range(cfg.n_levels):
        inv = 1.0 / (cfg.scale_factor ** lvl)
        shapes.append((int(round(h * inv)), int(round(w * inv))))
    return shapes


@functools.lru_cache(maxsize=None)
def _resize_weights(n_in: int, n_out: int):
    """(n_out, n_in) float32 numpy bilinear resize matrix (align_corners
    False, the jax.image.resize "linear" convention).

    Built with NUMPY on purpose: jax.image.resize constructs its weight
    tensors with eager jnp ops at trace time — on a remote-TPU backend every
    one of those is a network roundtrip, and the pyramid alone contributed
    ~380 eager dispatches (~minutes of cold-start wall clock).  A numpy
    matrix becomes a single HLO literal instead, and the resize itself turns
    into two MXU matmuls, which fuse and beat gather-based resampling on
    TPU anyway.
    """
    import numpy as np

    scale = n_in / n_out          # >1 when downscaling
    centers = (np.arange(n_out) + 0.5) * scale - 0.5
    # anti-aliased triangle kernel, as jax.image.resize uses for
    # downscaling: support widened by the scale factor so high
    # frequencies are averaged out, then rows normalized
    support = max(scale, 1.0)
    dist = np.abs(centers[:, None] - np.arange(n_in)[None, :]) / support
    w = np.clip(1.0 - dist, 0.0, None).astype(np.float32)
    return w / w.sum(axis=1, keepdims=True)


def build_pyramid(img: jnp.ndarray, cfg: ExtractorConfig) -> List[jnp.ndarray]:
    """uint8/float (H, W) -> list of float32 levels (level 0 = input).

    Each level is resized from level 0 (slightly sharper than the
    reference's chained resizes; equivalent behavior for x1.2) as two
    matmuls with constant numpy weight matrices: R_h @ img @ R_w^T.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape
    out = [img]
    for (lh, lw) in level_shapes(h, w, cfg)[1:]:
        rh = _resize_weights(h, lh)            # np (lh, h): HLO literal
        rw = _resize_weights(w, lw)            # np (lw, w)
        out.append(jnp.dot(jnp.dot(rh, img), rw.T,
                           preferred_element_type=jnp.float32))
    return out


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(ksize: int, sigma: float):
    import numpy as np
    half = ksize // 2
    x = np.arange(-half, half + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur of a (H, W) float32 image (SAME padding)."""
    k = _gaussian_kernel(ksize, sigma)
    x = img[None, None]  # NCHW
    kr = k.reshape(1, 1, ksize, 1)
    kc = k.reshape(1, 1, 1, ksize)
    dn = jax.lax.conv_dimension_numbers(x.shape, kr.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kr, (1, 1), [(ksize // 2, ksize // 2), (0, 0)],
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kc, (1, 1), [(0, 0), (ksize // 2, ksize // 2)],
                                     dimension_numbers=dn)
    return x[0, 0]
