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


def build_pyramid(img: jnp.ndarray, cfg: ExtractorConfig) -> List[jnp.ndarray]:
    """uint8/float (H, W) -> list of float32 levels (level 0 = input)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    out = [img]
    for (lh, lw) in level_shapes(h, w, cfg)[1:]:
        # resize each level from level 0 (slightly sharper than chained
        # resizes; the reference chains but behavior is equivalent for x1.2)
        out.append(jax.image.resize(img, (lh, lw), method="bilinear"))
    return out


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(ksize: int, sigma: float):
    half = ksize // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


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
