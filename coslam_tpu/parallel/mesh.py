"""Device-mesh construction and sharding helpers.

Replaces the reference's process/thread topology (2 LCM-linked processes x 4
pthreads, SURVEY.md 2.5 P1/P5) with a jax.sharding.Mesh carrying two logical
axes:

  agent — data-parallel cooperative agents (one sub-map pipeline per group
          of devices; the reference's two UDP-multicast-linked processes)
  ba    — observation-parallel bundle adjustment within an agent (the
          reference's single-threaded g2o solve, here spread over chips with
          psum reductions, SURVEY.md 2.5 P4)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_agents: int = 1, ba_shards: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if ba_shards is None:
        ba_shards = n // n_agents
    assert n_agents * ba_shards <= n, (n_agents, ba_shards, n)
    devs = np.asarray(devices[: n_agents * ba_shards]).reshape(
        n_agents, ba_shards)
    return Mesh(devs, ("agent", "ba"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def obs_sharding(mesh: Mesh) -> NamedSharding:
    """Observations sharded over the ba axis, replicated over agents."""
    return NamedSharding(mesh, P("ba"))


def pad_to_multiple(x, m: int, axis: int = 0, fill=0):
    """Pad axis to a multiple of m so it shards evenly."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jax.numpy.pad(x, widths, constant_values=fill)
