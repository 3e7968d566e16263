"""Bag-of-binary-words place recognition, TPU-native.

Replaces DBoW2 (reference ORBVocabulary.h:25-31 TemplatedVocabulary<FORB>,
Frame::ComputeBoW Frame.cc:396, KeyFrameDatabase scoring KeyFrameDatabase.cc
:76-196) with a *flat* vocabulary: instead of a 6-level tree walked
per-descriptor with pointer chasing, W word centroids live in one packed
uint32 (W, 8) array and word assignment for all keypoints of a frame is a
single (N, W) Hamming argmin — one MXU matmul.  A flat W=1024 vocabulary
costs less on TPU than a tree descent and removes the memory-bound
traversal entirely.

The vocabulary is trained offline by binary k-means (majority-bit medoids)
over descriptors harvested from any image set — there is no dependency on
the reference's pre-trained ORBvoc.txt (our descriptors use a different bit
pattern anyway; see ops/orb.py docstring).

BoW vectors are dense (W,) tf weights, L1-normalized; similarity is the
DBoW2 L1 score  s(v, w) = 1 - 0.5 * |v - w|_1  (TemplatedVocabulary L1Scoring),
computed for a query against every stored keyframe in one batched pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.ops import hamming


# ---------------------------------------------------------------------------
# Vocabulary training (host-side numpy; offline, deterministic)
# ---------------------------------------------------------------------------

def _unpack_bits_np(desc: np.ndarray) -> np.ndarray:
    """uint32 (N, 8) -> (N, 256) float bits."""
    b = desc.view(np.uint8).reshape(desc.shape[0], -1)  # little-endian bytes
    return np.unpackbits(b, axis=1, bitorder="little").astype(np.float32)


def _pack_bits_np(bits: np.ndarray) -> np.ndarray:
    """(W, 256) {0,1} -> uint32 (W, 8)."""
    by = np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
    return by.view(np.uint32)


def train_vocabulary(descriptors: np.ndarray, n_words: int = 1024,
                     iters: int = 8, seed: int = 0) -> np.ndarray:
    """Binary k-means over packed descriptors -> (n_words, 8) uint32 words.

    Majority-vote centroid update (the binary mean), Hamming assignment.
    """
    rng = np.random.default_rng(seed)
    desc = descriptors[rng.permutation(descriptors.shape[0])]
    bits = _unpack_bits_np(desc)                       # (N, 256)
    n = bits.shape[0]
    centers = bits[rng.choice(n, n_words, replace=n < n_words)]
    for _ in range(iters):
        # Hamming distance == squared euclidean on {0,1} vectors
        d = ((bits ** 2).sum(1, keepdims=True)
             - 2.0 * bits @ centers.T + (centers ** 2).sum(1)[None])
        assign = d.argmin(1)
        sums = np.zeros((n_words, bits.shape[1]), np.float32)
        np.add.at(sums, assign, bits)
        counts = np.bincount(assign, minlength=n_words).astype(np.float32)
        upd = counts > 0
        centers[upd] = (sums[upd] / counts[upd, None]) >= 0.5
        # re-seed empty words from random descriptors
        n_empty = int((~upd).sum())
        if n_empty:
            centers[~upd] = bits[rng.choice(n, n_empty)]
    return _pack_bits_np(centers)


@functools.partial(jax.jit, static_argnums=(2, 3))
def train_vocabulary_device(desc: jnp.ndarray, valid: jnp.ndarray,
                            n_words: int, iters: int,
                            key=None) -> jnp.ndarray:
    """Binary k-means on the MXU: (n, 8) packed descriptors (+ validity
    mask) -> (n_words, 8) uint32 words.  Same algorithm as the host
    `train_vocabulary` (Hamming assignment == squared euclidean on bits,
    majority-vote centroid update), but the (n, W) assignment matmul runs
    on device — retraining mid-run costs one dispatch instead of tens of
    seconds of 2-core numpy (the round-2 p95 latency spike).

    Replaces the reference's offline DBoW2 vocabulary build (the k-means++
    of TemplatedVocabulary::create; reference loads the result at
    System.cc:61-72)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = desc.shape[0]
    # unpack to (n, 256) bits in bf16 — the assignment matmul is the cost
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((desc[:, :, None] >> shifts[None, None, :]) & 1)
    bits = bits.reshape(n, -1).astype(jnp.bfloat16)           # (n, 256)
    bitsf = jnp.where(valid[:, None], bits, 0)
    # init: spread word seeds over the VALID pool only — seeding from
    # invalid (zero) rows wastes vocabulary capacity on words that never
    # attract members (advisor r3).  Stable-sort the permutation by
    # validity so valid rows come first, then cycle through them.
    perm = jax.random.permutation(key, n)
    perm = perm[jnp.argsort(~valid[perm], stable=True)]
    n_valid = jnp.maximum(valid.sum(), 1)
    seed_idx = perm[jnp.arange(n_words) % n_valid]
    centers = bits[seed_idx].astype(jnp.float32)              # (W, 256)

    def body(_, centers):
        cb = centers.astype(jnp.bfloat16)
        d = ((bits.astype(jnp.float32) ** 2).sum(1, keepdims=True)
             - 2.0 * jnp.matmul(
                 bits, cb.T,
                 precision=jax.lax.Precision.DEFAULT).astype(jnp.float32)
             + (centers ** 2).sum(1)[None])                    # (n, W)
        d = jnp.where(valid[:, None], d, jnp.inf)
        assign = jnp.argmin(d, axis=1)
        sums = jnp.zeros((n_words, bits.shape[1]), jnp.float32).at[
            assign].add(bitsf.astype(jnp.float32))
        counts = jnp.zeros(n_words, jnp.float32).at[assign].add(
            valid.astype(jnp.float32))
        upd = counts > 0
        new_c = (sums / jnp.maximum(counts[:, None], 1.0)) >= 0.5
        # empty words keep their previous centroid (host version re-seeds
        # randomly; a stable fallback is fine — empty words score zero tf)
        return jnp.where(upd[:, None], new_c.astype(jnp.float32), centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    # pack (W, 256) bits -> (W, 8) uint32
    cb = (centers >= 0.5).astype(jnp.uint32).reshape(n_words, 8, 32)
    return (cb << shifts[None, None, :]).sum(-1).astype(jnp.uint32)


def bow_rows(kf_desc: jnp.ndarray, kf_kp_valid: jnp.ndarray,
             vocab: jnp.ndarray, n_words: int) -> jnp.ndarray:
    """Batched BoW rows for every keyframe: (K, N, 8) descriptors ->
    (K, W) L1-normalized tf matrix, one dispatch (used to rebuild the
    place-recognition database after a vocabulary retrain)."""
    return jax.vmap(lambda d, v: bow_vector(assign_words(d, v, vocab), v,
                                            n_words))(kf_desc, kf_kp_valid)


def pretrained_vocabulary_path() -> str:
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "vocab.npz")


@functools.lru_cache(maxsize=1)
def load_pretrained_vocabulary():
    """The shipped offline-trained vocabulary, or None if absent.

    The analogue of the reference's pre-trained DBoW2 ORBvoc.txt loaded at
    startup (System.cc:61-72): `scripts/train_vocab.py` harvests
    descriptors from diverse proxy scenes and k-means-trains a large flat
    word set ONCE; every System run then loads it here instead of
    retraining online inside the insertion path (VERDICT r4 task #3).
    Returns (n_words, 8) uint32 or None.
    """
    import os
    path = pretrained_vocabulary_path()
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return np.ascontiguousarray(z["words"].astype(np.uint32))


def synthetic_default_vocabulary(n_words: int = 1024) -> np.ndarray:
    """Deterministic fallback vocabulary from random bit centroids (LSH-like
    partition).  Adequate for synthetic scenes; real deployments train with
    `train_vocabulary` on their image domain."""
    rng = np.random.default_rng(7)
    return rng.integers(0, 2 ** 32, (n_words, 8), dtype=np.uint32)


# ---------------------------------------------------------------------------
# On-device word assignment + scoring
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=())
def assign_words(desc: jnp.ndarray, valid: jnp.ndarray,
                 vocab: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) descriptors -> (N,) int32 word ids (-1 for invalid)."""
    d = hamming.pairwise_hamming_mxu(desc, vocab)      # (N, W)
    w = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(valid, w, -1)


@functools.partial(jax.jit, static_argnums=(2,))
def bow_vector(word_ids: jnp.ndarray, valid: jnp.ndarray,
               n_words: int) -> jnp.ndarray:
    """(N,) word ids -> (W,) L1-normalized tf vector."""
    w = jnp.maximum(word_ids, 0)
    v = jnp.zeros(n_words, jnp.float32).at[w].add(valid.astype(jnp.float32))
    return v / jnp.maximum(v.sum(), 1e-9)


def l1_scores(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of (W,) query vs (K, W) database -> (K,)."""
    return 1.0 - 0.5 * jnp.abs(db - query[None, :]).sum(axis=1)
