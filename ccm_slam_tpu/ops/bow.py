"""Bag-of-binary-words vocabulary: training, transform, scoring.

TPU-native replacement for DBoW2 (``cslam/thirdparty/DBoW2``).  The reference
uses a k=10, depth-6 vocabulary *tree* purely to prune descriptor-to-word
search on a CPU; on TPU the exact flat quantization is ONE Hamming matmul
([N,256]x[256,W] on the MXU), so the tree is dropped entirely:

* vocabulary = flat codebook of W binary centroids + idf weights
  (trained by binary k-medians: majority-vote bit centroids);
* transform  = arg-min over the dense distance matrix; tf-idf weighting and
  L1 normalization follow DBoW2's ``TF_IDF``/``L1_NORM`` defaults
  (TemplatedVocabulary.h:1350-1367 reads those from the vocab header);
* score      = DBoW2 L1 score  s(v,w) = 1 - 0.5 * |v - w|_1  in [0,1];
* the "direct index" used for node-constrained matching in the reference is
  unnecessary — matching is exact (ops/matching.py).

The reference ships a pre-trained vocabulary; this framework trains its own
codebook from the session's descriptors (or any descriptor sample) since
descriptors are framework-internal (ops/brief.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from . import hamming


@struct.dataclass
class Vocabulary:
    words: jnp.ndarray    # [W, 32] uint8 binary centroids
    idf: jnp.ndarray      # [W] float32 inverse document frequency weights

    @property
    def n_words(self):
        return self.words.shape[0]


def _majority_centroid(bits, weights):
    """Binary centroid by weighted per-bit majority vote.

    bits [N,256] {0,1}, weights [N] -> [256] {0,1}.
    """
    w = weights / jnp.clip(jnp.sum(weights), 1e-9)
    mean = jnp.sum(bits * w[:, None], axis=0)
    return (mean >= 0.5).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("n_words", "iters"))
def train_vocabulary(key, descs, valid, n_words: int = 1024, iters: int = 8) -> Vocabulary:
    """Binary k-medians over a descriptor sample.

    descs [N,32] uint8; valid [N].  Empty clusters are re-seeded from the
    sample.  idf computed from the training sample's word frequencies.
    """
    N = descs.shape[0]
    bits = hamming.unpack_bits(descs).astype(jnp.float32)  # [N,256]
    # init: random sample of descriptors as centroids
    perm = jax.random.choice(key, N, shape=(n_words,), replace=N < n_words,
                             p=valid.astype(jnp.float32) / jnp.clip(jnp.sum(valid), 1))
    words = descs[perm]

    def em_step(words, it):
        d = hamming.masked_hamming_cross(descs, valid, words, jnp.ones(n_words, bool))
        assign = jnp.argmin(d, axis=1)  # [N]
        onehot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32) * valid[:, None]
        counts = jnp.sum(onehot, axis=0)  # [W]
        sums = onehot.T @ bits  # [W,256]
        mean = sums / jnp.clip(counts[:, None], 1e-9)
        new_bits = (mean >= 0.5).astype(jnp.uint8)
        new_words = hamming.pack_bits(new_bits)
        # dead clusters keep their previous centroid
        new_words = jnp.where(counts[:, None] > 0, new_words, words)
        return new_words, counts

    for it in range(iters):
        words, counts = em_step(words, it)

    # idf from the training sample (documents ~ descriptors here; DBoW2 uses
    # images as documents, the ranking is equivalent for matching purposes)
    df = counts / jnp.clip(jnp.sum(counts), 1.0)
    idf = jnp.log(1.0 / jnp.clip(df, 1e-6))
    idf = jnp.where(counts > 0, idf, 0.0)
    return Vocabulary(words=words, idf=idf)


def train_vocabulary_large(key, descs, n_words: int = 32768, iters: int = 6,
                           block: int = 8192) -> Vocabulary:
    """Binary k-medians at ORBvoc scale (tens of thousands of words, hundreds
    of thousands of descriptors) — the production replacement for the
    reference's ~1M-leaf DBoW2 tree (TemplatedVocabulary.h:1350-1367).

    The plain trainer's one-hot assignment matrix ([N, W] f32) would be tens
    of GB here; this version scans descriptor blocks, doing the [B, W]
    Hamming matmul + argmin + scatter-add accumulation per block.  All valid
    descriptors; call with a pre-filtered sample.
    """
    N = descs.shape[0]
    n_blocks = (N + block - 1) // block
    pad = n_blocks * block - N
    descs_p = jnp.pad(descs, ((0, pad), (0, 0)))
    dvalid = jnp.pad(jnp.ones((N,), bool), (0, pad))
    bits_p = hamming.unpack_bits(descs_p).astype(jnp.float32)   # [Np, 256]

    perm = jax.random.choice(key, N, shape=(n_words,), replace=N < n_words)
    words = descs[perm]

    @jax.jit
    def em_step(words):
        def blk(carry, inp):
            sums, counts = carry
            d_b, bits_b, v_b = inp
            dist = hamming.hamming_cross(d_b, words)            # [B, W]
            assign = jnp.where(v_b, jnp.argmin(dist, axis=1), n_words - 1)
            add = jnp.where(v_b[:, None], bits_b, 0.0)
            sums = sums.at[assign].add(add)
            counts = counts.at[assign].add(v_b.astype(jnp.float32))
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            blk,
            (jnp.zeros((n_words, 256), jnp.float32), jnp.zeros((n_words,), jnp.float32)),
            (descs_p.reshape(n_blocks, block, 32),
             bits_p.reshape(n_blocks, block, 256),
             dvalid.reshape(n_blocks, block)),
        )
        mean = sums / jnp.clip(counts[:, None], 1e-9)
        new_bits = (mean >= 0.5).astype(jnp.uint8)
        new_words = hamming.pack_bits(new_bits)
        new_words = jnp.where(counts[:, None] > 0, new_words, words)
        return new_words, counts

    for _ in range(iters):
        words, counts = em_step(words)

    df = counts / jnp.clip(jnp.sum(counts), 1.0)
    idf = jnp.log(1.0 / jnp.clip(df, 1e-6))
    idf = jnp.where(counts > 0, idf, 0.0)
    return Vocabulary(words=words, idf=idf)


def save_vocabulary(path: str, vocab: Vocabulary):
    """Persist the codebook (the ORBvoc.txt analogue — binary npz artifact)."""
    import numpy as np

    np.savez_compressed(path, words=np.asarray(vocab.words), idf=np.asarray(vocab.idf))


def load_vocabulary(path: str) -> Vocabulary:
    import numpy as np

    z = np.load(path)
    return Vocabulary(words=jnp.asarray(z["words"]), idf=jnp.asarray(z["idf"]))


@jax.jit
def transform_batch(vocab: Vocabulary, descs, valid):
    """Batched frame transform: descs [B,N,32], valid [B,N] -> vecs [B,W].

    One compiled call for a whole keyframe batch (the ingest path registers
    every new keyframe of a message at once)."""
    return jax.vmap(transform, in_axes=(None, 0, 0))(vocab, descs, valid)


def transform(vocab: Vocabulary, descs, valid):
    """Frame descriptors -> (bow [W] tf-idf L1-normalized, word_id [N]).

    One Hamming matmul + argmin + scatter; the DBoW2 ``transform`` replacement.
    """
    d = hamming.hamming_cross(descs, vocab.words)  # [N,W]
    word = jnp.argmin(d, axis=1).astype(jnp.int32)
    word_safe = jnp.where(valid, word, 0)
    tf = jnp.zeros((vocab.n_words,), jnp.float32).at[word_safe].add(
        valid.astype(jnp.float32)
    )
    v = tf * vocab.idf
    v = v / jnp.clip(jnp.sum(jnp.abs(v)), 1e-9)
    return v, jnp.where(valid, word, -1)


def l1_score(v1, v2):
    """DBoW2 L1 score in [0,1]: 1 - 0.5 |v1 - v2|_1 (vectors L1-normalized).
    Batched over leading dims of either argument."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


def score_against_database(v, db_vectors, db_valid):
    """Score one BoW vector against a bank of stored vectors: [K] scores.
    Replaces the inverted-file accumulation of ``KeyFrameDatabase`` with a
    dense mat-vec (the inverted file is a sparsity trick for CPUs)."""
    s = l1_score(v[None, :], db_vectors)
    return jnp.where(db_valid, s, -1.0)
