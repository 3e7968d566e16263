"""Map checkpoint / resume.

The reference has NO map persistence — only trajectory export (SURVEY.md
5.4).  Because the whole map is a flat array pytree (models/map_state.py),
checkpointing is a single npz write; resume restores a System mid-sequence.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from coslam_tpu.models import map_state as ms


def save_map(path: str, m: ms.MapState, extra: Optional[dict] = None) -> None:
    arrays = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path: str):
    """Returns (MapState, extra_dict)."""
    z = np.load(path, allow_pickle=False)
    fields = {}
    extra = {}
    for k in z.files:
        if k.startswith("map_"):
            fields[k[4:]] = jnp.asarray(z[k])
        elif k.startswith("extra_"):
            extra[k[6:]] = z[k]
    return ms.MapState(**fields), extra


def save_system(path: str, system) -> None:
    """Checkpoint a System (map + tracking state) for resume."""
    extra = {
        "last_T": system.last_T,
        "velocity": system.velocity if system.velocity is not None
        else np.zeros((0,)),
        "last_kp_pt": np.asarray(system.last_kp_pt)
        if system.last_kp_pt is not None else np.zeros((0,)),
        "last_level": np.asarray(system.last_level)
        if system.last_level is not None else np.zeros((0,)),
        "frames_since_kf": system.frames_since_kf,
        "ref_kf_matches": system.ref_kf_matches,
        "state_ok": 1 if system.state == "OK" else 0,
        "db_bows": system.db.bows,
        "db_has": system.db.has,
        "db_vocab": np.asarray(system.db.vocab),
        # capacities may have grown past the construction-time cfg
        # (models/compaction.py grow); the loader must widen cfg to match
        # the restored arrays or _ensure_capacity would compute watermarks
        # against stale K/P
        "max_keyframes": system.cfg.mapper.max_keyframes,
        "max_points": system.cfg.mapper.max_points,
    }
    save_map(path, system.map, extra)


def load_system(path: str, system) -> None:
    """Restore a checkpoint into an already-constructed System (same cfg)."""
    m, extra = load_map(path)
    system.map = m
    system._kf_pose_dirty = True
    system._host_n_kf = int(np.asarray(m.n_kf))
    system._host_n_pt = int(np.asarray(m.n_pt))
    # restore (possibly grown) capacities so watermark logic and the DB
    # match the restored array shapes
    K_saved = int(extra.get("max_keyframes", m.kf_pose.shape[0]))
    P_saved = int(extra.get("max_points", m.pt_pos.shape[0]))
    if (K_saved != system.cfg.mapper.max_keyframes
            or P_saved != system.cfg.mapper.max_points):
        import dataclasses
        cfg2 = system.cfg.replace(mapper=dataclasses.replace(
            system.cfg.mapper,
            max_keyframes=K_saved, max_points=P_saved))
        system._set_cfg(cfg2)
    system.last_T = extra["last_T"].astype(np.float32)
    system.velocity = (extra["velocity"].astype(np.float32)
                       if extra["velocity"].size else None)
    if extra["last_kp_pt"].size:
        system.last_kp_pt = jnp.asarray(extra["last_kp_pt"].astype(np.int32))
        system.last_level = jnp.asarray(extra["last_level"].astype(np.int32))
    system.frames_since_kf = int(extra["frames_since_kf"])
    system.ref_kf_matches = int(extra["ref_kf_matches"])
    system.state = "OK" if int(extra["state_ok"]) else "NOT_INITIALIZED"
    system.db.bows = extra["db_bows"]
    system.db.has = extra["db_has"]
    system.db.vocab = jnp.asarray(extra["db_vocab"])
    system.db.n_words = int(system.db.vocab.shape[0])
    # restored vocabulary is authoritative: no further online retraining
    system.db._external_vocab = True
