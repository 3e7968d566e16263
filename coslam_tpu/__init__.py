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

__version__ = "0.1.0"

from coslam_tpu.config import (  # noqa: F401
    CameraConfig,
    ExtractorConfig,
    MatcherConfig,
    MapperConfig,
    LoopConfig,
    SystemConfig,
    TrackerConfig,
)
