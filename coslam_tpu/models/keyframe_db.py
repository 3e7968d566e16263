"""Keyframe place-recognition database + loop-candidate logic.

Replaces the reference KeyFrameDatabase inverted file (ORB_SLAM2/src/
KeyFrameDatabase.cc:76-196: word -> list<KeyFrame*>, shared-word counting,
covisibility-group score accumulation) with a dense (K, W) BoW matrix: a
query is one batched tf-idf-weighted L1-score pass over all keyframes — the
inverted index is pointless when the scoring is a single vectorized op.

Vocabulary: the reference loads a pre-trained 1M-word DBoW2 tree
(System.cc:61-72).  Here the vocabulary is trained *online* by binary
k-means over the descriptors of the first few keyframes (the deployment
domain), then frozen; stored BoW rows are recomputed once at that point.
tf-idf weighting (TemplatedVocabulary TF_IDF) sharpens scores exactly as in
DBoW2.

The reference's acceptance policy is preserved: score above the minimum
covisible score (DetectLoop, LoopClosing.cc:122-138), temporal separation,
and covisibility-consistency over >= 3 consecutive keyframes
(LoopClosing.cc:43).  Candidates come back sorted by score.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SystemConfig
from coslam_tpu.models import map_state as ms
from coslam_tpu.ops import bow

TRAIN_AFTER_KFS = 4  # freeze the vocabulary once this many KFs accumulated


class KeyFrameDatabase:
    def __init__(self, cfg: SystemConfig, vocab: Optional[np.ndarray] = None):
        self.cfg = cfg
        W = cfg.loop.vocab_branching ** cfg.loop.vocab_depth
        self._vocab_np = (vocab if vocab is not None
                          else bow.synthetic_default_vocabulary(W))
        self.vocab = jnp.asarray(self._vocab_np)
        self.n_words = int(self.vocab.shape[0])
        self._trained = vocab is not None
        self._train_descs: List[np.ndarray] = []
        K = cfg.mapper.max_keyframes
        self.bows = np.zeros((K, self.n_words), np.float32)  # raw tf, L1-normed
        self.has = np.zeros(K, bool)
        self._consistent_groups: List[tuple] = []

    # ------------------------------------------------------------------
    def compute_bow(self, desc: jnp.ndarray, valid: jnp.ndarray) -> np.ndarray:
        words = bow.assign_words(desc, valid, self.vocab)
        return np.asarray(bow.bow_vector(words, valid, self.n_words))

    def add(self, kf_id: int, desc: jnp.ndarray, valid: jnp.ndarray):
        if not self._trained:
            self._train_descs.append(
                np.asarray(desc)[np.asarray(valid)])
            if len(self._train_descs) >= TRAIN_AFTER_KFS:
                self._train_vocab()
        self.bows[kf_id] = self.compute_bow(desc, valid)
        self.has[kf_id] = True
        # keep raw descriptors until training happens (to recompute rows)
        if not self._trained:
            self._pending = getattr(self, "_pending", {})
            self._pending[kf_id] = (desc, valid)

    def _train_vocab(self):
        descs = np.concatenate(self._train_descs, 0)
        if descs.shape[0] >= self.n_words // 2:
            self._vocab_np = bow.train_vocabulary(
                descs, self.n_words, iters=6, seed=0)
            self.vocab = jnp.asarray(self._vocab_np)
        self._trained = True
        self._train_descs = []
        for kf_id, (desc, valid) in getattr(self, "_pending", {}).items():
            self.bows[kf_id] = self.compute_bow(desc, valid)
        self._pending = {}

    # ------------------------------------------------------------------
    def scores_against_all(self, kf_id: int) -> np.ndarray:
        """tf-idf-weighted L1 similarity of `kf_id` vs every stored KF."""
        n = max(int(self.has.sum()), 1)
        df = (self.bows > 0).sum(0)
        idf = np.log(n / (1.0 + df)).clip(min=0.0)
        w = self.bows * idf[None]
        norm = np.abs(w).sum(1, keepdims=True)
        w = w / np.maximum(norm, 1e-9)
        q = w[kf_id]
        return 1.0 - 0.5 * np.abs(w - q[None]).sum(1)

    # ------------------------------------------------------------------
    def detect_reloc_candidates(self, desc: jnp.ndarray, valid: jnp.ndarray,
                                top_k: int = 5) -> List[int]:
        """Best keyframes for relocalizing a lost frame (reference
        KeyFrameDatabase::DetectRelocalizationCandidates,
        KeyFrameDatabase.cc:199: same inverted-file scoring, no temporal or
        covisibility exclusion)."""
        if not self.has.any():
            return []
        q = self.compute_bow(desc, valid)
        n = max(int(self.has.sum()), 1)
        df = (self.bows > 0).sum(0)
        idf = np.log(n / (1.0 + df)).clip(min=0.0)
        w = self.bows * idf[None]
        w = w / np.maximum(np.abs(w).sum(1, keepdims=True), 1e-9)
        qw = q * idf
        qw = qw / max(np.abs(qw).sum(), 1e-9)
        scores = np.where(self.has, 1.0 - 0.5 * np.abs(w - qw[None]).sum(1),
                          -1.0)
        order = np.argsort(-scores)[:top_k]
        return [int(i) for i in order if scores[i] > 0]

    # ------------------------------------------------------------------
    def detect_loop_candidates(self, m: ms.MapState, kf_id: int,
                               covis_row: np.ndarray) -> List[int]:
        """Score-sorted, covisibility-consistent loop candidates for the
        newly inserted keyframe (reference LoopClosing::DetectLoop)."""
        lcfg = self.cfg.loop
        if not self.has[kf_id]:
            return []
        scores = self.scores_against_all(kf_id)

        connected = covis_row >= self.cfg.mapper.covis_edge_threshold
        covis_scores = scores[connected & self.has]
        min_score = float(covis_scores.min()) if covis_scores.size else 0.1

        eligible = (self.has & ~connected
                    & (np.arange(len(self.has)) != kf_id)
                    & (np.abs(np.arange(len(self.has)) - kf_id)
                       > lcfg.min_kfs_between_loops))
        cand = np.nonzero(eligible & (scores >= max(min_score, 0.02)))[0]
        if cand.size == 0:
            self._consistent_groups = []
            return []

        covis_all = np.asarray(ms.covisibility(m))
        enough: List[Tuple[float, int]] = []
        new_groups: List[tuple] = []
        for c in cand:
            group = set(np.nonzero(
                covis_all[int(c)] >= self.cfg.mapper.covis_edge_threshold
            )[0].tolist())
            group.add(int(c))
            best = 0
            for prev_group, count in self._consistent_groups:
                if group & prev_group:
                    best = max(best, count + 1)
            new_groups.append((group, best))
            if best + 1 >= lcfg.covis_consistency_th:
                enough.append((float(scores[c]), int(c)))
        self._consistent_groups = new_groups
        enough.sort(reverse=True)
        return [c for _, c in enough]
