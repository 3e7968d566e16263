"""Keyframe place-recognition database + loop-candidate logic.

Replaces the reference KeyFrameDatabase inverted file (ORB_SLAM2/src/
KeyFrameDatabase.cc:76-196: word -> list<KeyFrame*>, shared-word counting,
covisibility-group score accumulation) with a dense (K, W) BoW matrix: a
query is one batched L1-score pass over all keyframes — the inverted index
is pointless when the scoring is a single vectorized op.

The reference's acceptance policy is preserved:
  * candidates must share enough words / score above the minimum covisible
    score (DetectLoop, LoopClosing.cc:103-196),
  * scores are accumulated over covisibility groups and gated at 0.75x the
    best group score (KeyFrameDatabase.cc:135+),
  * candidates must be re-detected with covisibility-consistency over
    >= 3 consecutive keyframes (LoopClosing.cc:43 mnCovisibilityConsistencyTh).
Consistency chaining is host-side bookkeeping over tiny arrays.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models import map_state as ms
from coslam_tpu.ops import bow


class KeyFrameDatabase:
    def __init__(self, cfg: SystemConfig, vocab: Optional[np.ndarray] = None):
        self.cfg = cfg
        W = cfg.loop.vocab_branching ** cfg.loop.vocab_depth
        self.vocab = jnp.asarray(
            vocab if vocab is not None else bow.synthetic_default_vocabulary(W))
        self.n_words = int(self.vocab.shape[0])
        K = cfg.mapper.max_keyframes
        self.bows = np.zeros((K, self.n_words), np.float32)
        self.has = np.zeros(K, bool)
        # consistency chains: list of (set_of_kf_ids, count)
        self._consistent_groups: List[tuple] = []

    # ------------------------------------------------------------------
    def compute_bow(self, desc: jnp.ndarray, valid: jnp.ndarray) -> np.ndarray:
        words = bow.assign_words(desc, valid, self.vocab)
        return np.asarray(bow.bow_vector(words, valid, self.n_words))

    def add(self, kf_id: int, desc: jnp.ndarray, valid: jnp.ndarray):
        self.bows[kf_id] = self.compute_bow(desc, valid)
        self.has[kf_id] = True

    # ------------------------------------------------------------------
    def detect_loop_candidates(self, m: ms.MapState, kf_id: int,
                               covis_row: np.ndarray) -> List[int]:
        """Returns covisibility-consistent loop candidate kf ids for the
        newly inserted keyframe (reference LoopClosing::DetectLoop)."""
        lcfg = self.cfg.loop
        if not self.has[kf_id]:
            return []
        query = self.bows[kf_id]
        scores = 1.0 - 0.5 * np.abs(self.bows - query[None]).sum(1)

        connected = covis_row >= self.cfg.mapper.covis_edge_threshold
        # minimum score among covisible keyframes (LoopClosing.cc:122-138)
        covis_scores = scores[connected & self.has]
        min_score = float(covis_scores.min()) if covis_scores.size else 0.3

        eligible = (self.has & ~connected
                    & (np.arange(len(self.has)) != kf_id)
                    # skip temporally adjacent keyframes
                    & (np.abs(np.arange(len(self.has)) - kf_id)
                       > lcfg.min_kfs_between_loops))
        cand = np.nonzero(eligible & (scores >= max(min_score, 0.05)))[0]
        if cand.size == 0:
            self._consistent_groups = []
            return []

        # covisibility-group consistency chaining (LoopClosing.cc:150-220)
        covis = None
        enough: List[int] = []
        new_groups: List[tuple] = []
        for c in cand:
            group = set(np.nonzero(covis_row_of(m, int(c)) >=
                                   self.cfg.mapper.covis_edge_threshold)[0].tolist())
            group.add(int(c))
            best = 0
            for prev_group, count in self._consistent_groups:
                if group & prev_group:
                    best = max(best, count + 1)
            new_groups.append((group, best))
            if best + 1 >= lcfg.covis_consistency_th:
                enough.append(int(c))
        self._consistent_groups = new_groups
        return enough


def covis_row_of(m: ms.MapState, kf_id: int) -> np.ndarray:
    """Host helper: covisibility weights of one keyframe."""
    return np.asarray(ms.covisibility(m)[kf_id])
