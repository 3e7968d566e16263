"""coslam_tpu — TPU-native cooperative visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`530300865/Cooperative-ORB-SLAM` (two LCM-linked ORB-SLAM2 agents exchanging
keyframe maps; see /root/repo/SURVEY.md): oriented-FAST + rBRIEF feature
extraction as batched TPU kernels, Hamming matching as packed XOR-popcount,
RANSAC initialization / PnP / Sim3 as vmapped hypothesis scoring, g2o replaced
by a batched Schur-complement Levenberg-Marquardt bundle adjuster shardable
over a `jax.sharding.Mesh`, and the 4-thread mutexed runtime replaced by a
functional SoA map state driven through jitted pipeline stages.

Layout (mirrors SURVEY.md section 7):
  config.py   — typed configuration (replaces cv::FileStorage YAML parsing,
                reference Tracking.cc:60-150)
  utils/      — SE3/Sim3 geometry, camera models, ATE/RPE eval, dataset IO,
                synthetic scene generation
  ops/        — stateless vision kernels (pyramid, FAST, rBRIEF, Hamming
                matching, RANSAC, PnP, Sim3, BoW) — reference L2
  optim/      — Levenberg-Marquardt optimizers (pose-only, local/global BA
                with Schur complement, Sim3 pose graph) — replaces g2o
  models/     — map state + pipeline stages (tracking, local mapping, loop
                closing, system facade, cooperative agents) — reference L1/L3/L4
  parallel/   — mesh/sharding helpers, distributed BA, cooperative map
                exchange via collectives — replaces pthreads + LCM
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compilation cache: the System drives ~8 jitted super-stages
# whose first compile dominates cold-start wall clock on a 2-core host
# (the reference pays an analogous one-time cost loading its 145 MB
# vocabulary, System.cc:68-75).  Cache across processes so repeated CLI /
# bench / test invocations skip recompilation entirely.
def _host_cpu_identity() -> str:
    """Stable id of the host CPU's ISA feature set (x86: model + flags)."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                if len(parts) == 2:
                    return "|".join(parts)
    except OSError:
        pass
    if parts:
        return "|".join(parts)
    import platform

    return platform.processor() or platform.machine()


def _enable_compile_cache():
    if _os.environ.get("COSLAM_NO_COMPILE_CACHE"):
        return
    import hashlib

    import jax

    # pool entries by (platform selection, XLA flags, HOST CPU identity):
    # XLA:CPU AOT results are target-config-specific — loading an
    # executable compiled on a host with a different feature set not only
    # risks SIGILL, it makes results depend on WHICH process compiled
    # first (different instruction selection => different float rounding),
    # which was the source of run-to-run ATE variance across machines
    env_key = hashlib.sha1(
        (_os.environ.get("JAX_PLATFORMS", "") + "|"
         + _os.environ.get("XLA_FLAGS", "") + "|"
         + _host_cpu_identity()).encode()).hexdigest()[:8]
    cache_dir = _os.environ.get(
        "COSLAM_COMPILE_CACHE",
        _os.path.expanduser(f"~/.cache/coslam_jax/{env_key}"))
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only FS: run without the cache


_enable_compile_cache()


def _set_matmul_precision():
    """Default every matmul to f32-HIGHEST.

    SLAM geometry mixes pixel-scale (~1e3) and normalized (~1e-3) values; a
    bf16 default (TPU's) turns un-annotated `a @ b` epipolar/reprojection
    algebra into multi-pixel error — measured: the two-view initializer's
    cheirality check loses ~half its inliers on TPU vs CPU, permanently
    blocking EuRoC-geometry initialization.  Bandwidth-bound integer work
    (packed Hamming, binary k-means) is exact in bf16 and opts back in
    explicitly with precision='default' / preferred_element_type."""
    try:
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass


_set_matmul_precision()

from coslam_tpu.config import (  # noqa: F401
    CameraConfig,
    ExtractorConfig,
    MatcherConfig,
    MapperConfig,
    LoopConfig,
    SystemConfig,
    TrackerConfig,
)
