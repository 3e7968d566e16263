"""Map-slot recycling: compaction and geometric capacity growth.

The reference erases bad keyframes/points from its heap object graph
(reference Map.cc:55 EraseKeyFrame, KeyFrame.cc:453 SetBadFlag,
MapPoint.cc:141 SetBadFlag) and therefore runs indefinitely.  The TPU map
is fixed-capacity SoA (models/map_state.py): culling only clears validity
bits, and the n_kf / n_pt counters are append-only.  This module closes the
lifecycle:

  * `compact` — host-side repack of the valid keyframe / point rows into
    the low slots (stable order, so keyframe index order remains
    chronological — the essential-graph "sequential neighbor" edges and
    kf-id-distance gates stay meaningful).  Returns old->new index maps so
    the host driver can remap everything that names slots (trajectory
    anchors, place-recognition DB rows, loop edges, last-frame
    associations).
  * `grow` — geometric (2x) capacity growth when compaction cannot free
    enough slots (pure exploration: nothing cullable).  Growth changes the
    static shapes, so the jitted stages re-specialize once per doubling —
    an amortized-log number of recompiles, each served by the persistent
    compilation cache on later runs.

Compaction runs on host numpy: it is rare (at capacity watermarks), touches
every array once, and produces new device arrays in one transfer.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models import map_state as ms


def _index_map(valid: np.ndarray) -> Tuple[np.ndarray, int]:
    """old->new slot map (-1 for dropped rows) keeping stable order."""
    new_idx = np.cumsum(valid) - 1
    return np.where(valid, new_idx, -1).astype(np.int32), int(valid.sum())


def compact(cfg: SystemConfig, m: ms.MapState
            ) -> Tuple[ms.MapState, np.ndarray, np.ndarray]:
    """Repack valid keyframes/points into low slots.

    Returns (new_map, kf_map, pt_map) where *_map are (K,)/(P,) old->new
    index arrays with -1 for culled rows.
    """
    K, N = m.kf_obs_pt.shape
    P = m.pt_pos.shape[0]
    kf_valid = np.asarray(m.kf_valid)
    pt_valid = np.asarray(m.pt_valid)
    kf_map, n_kf = _index_map(kf_valid)
    pt_map, n_pt = _index_map(pt_valid)
    kf_src = np.nonzero(kf_valid)[0]
    pt_src = np.nonzero(pt_valid)[0]

    def pack_kf(arr, fill=0):
        a = np.asarray(arr)
        out = np.full_like(a, fill)
        out[:n_kf] = a[kf_src]
        return out

    def pack_pt(arr, fill=0):
        a = np.asarray(arr)
        out = np.full_like(a, fill)
        out[:n_pt] = a[pt_src]
        return out

    # associations: gather valid KF rows, remap point ids (culled -> -1)
    obs = np.asarray(m.kf_obs_pt)
    obs = np.where(obs >= 0, pt_map[np.maximum(obs, 0)], -1)
    obs_new = np.full_like(obs, -1)
    obs_new[:n_kf] = obs[kf_src]

    # per-point keyframe references; a culled reference falls back to the
    # nearest surviving earlier keyframe (poses of culled KFs are discarded)
    alive_before = np.maximum(np.cumsum(kf_valid) - 1, 0).astype(np.int32)
    ref = np.asarray(m.pt_ref_kf)
    ref_safe = np.clip(ref, 0, K - 1)
    ref_new = np.where(kf_map[ref_safe] >= 0, kf_map[ref_safe],
                       alive_before[ref_safe])
    # pt_first_kf stores a *keyframe count* at creation time (for age);
    # translate it to the surviving-keyframe count
    first = np.clip(np.asarray(m.pt_first_kf), 0, K)
    first_new = np.concatenate([[0], np.cumsum(kf_valid)])[first]

    eye = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_pose = np.asarray(m.kf_pose).copy()
    kf_pose_new = eye
    kf_pose_new[:n_kf] = kf_pose[kf_src]

    new = ms.MapState(
        kf_pose=jnp.asarray(kf_pose_new),
        kf_valid=jnp.asarray(pack_kf(m.kf_valid, False)),
        kf_frame_id=jnp.asarray(pack_kf(m.kf_frame_id, -1)),
        kf_uv=jnp.asarray(pack_kf(m.kf_uv)),
        kf_level=jnp.asarray(pack_kf(m.kf_level)),
        kf_angle=jnp.asarray(pack_kf(m.kf_angle)),
        kf_desc=jnp.asarray(pack_kf(m.kf_desc)),
        kf_kp_valid=jnp.asarray(pack_kf(m.kf_kp_valid, False)),
        kf_obs_pt=jnp.asarray(obs_new),
        pt_pos=jnp.asarray(pack_pt(m.pt_pos)),
        pt_valid=jnp.asarray(pack_pt(m.pt_valid, False)),
        pt_desc=jnp.asarray(pack_pt(m.pt_desc)),
        pt_normal=jnp.asarray(pack_pt(m.pt_normal)),
        pt_max_dist=jnp.asarray(pack_pt(m.pt_max_dist)),
        pt_ref_kf=jnp.asarray(pack_pt(ref_new, -1)),
        pt_first_kf=jnp.asarray(pack_pt(first_new.astype(np.int32), -1)),
        pt_visible=jnp.asarray(pack_pt(m.pt_visible)),
        pt_found=jnp.asarray(pack_pt(m.pt_found)),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_pt=jnp.asarray(n_pt, jnp.int32),
    )
    return new, kf_map, pt_map


def grow(cfg: SystemConfig, m: ms.MapState, new_K: int = 0, new_P: int = 0
         ) -> Tuple[SystemConfig, ms.MapState]:
    """Return (cfg', map') with enlarged static capacities (2x by default).

    All existing rows keep their slots; only the capacity tails grow, so no
    index remapping is needed.
    """
    K, N = m.kf_obs_pt.shape
    P = m.pt_pos.shape[0]
    new_K = new_K or 2 * K
    new_P = new_P or 2 * P
    cfg2 = cfg.replace(mapper=dataclasses.replace(
        cfg.mapper, max_keyframes=new_K, max_points=new_P))
    big = ms.empty_map(cfg2)

    def splice(old, new):
        return new.at[tuple(slice(0, s) for s in old.shape)].set(old)

    fields = {}
    for name in m._fields:
        o, n = getattr(m, name), getattr(big, name)
        fields[name] = o if o.ndim == 0 else splice(o, n)
    return cfg2, ms.MapState(**fields)
