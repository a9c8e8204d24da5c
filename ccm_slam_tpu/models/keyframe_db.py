"""Keyframe database for place recognition.

TPU-native replacement for ``KeyFrameDatabase`` (cslam/src/Database.cpp): the
BoW inverted file (per-word keyframe lists) is a CPU sparsity trick; here the
database is a dense bank of L1-normalized BoW vectors aligned with the
keyframe arena, and a query is one mat-vec over the MXU.  Candidate gating
reproduces the reference logic:

* ``DetectLoopCandidates`` (:72-202): same map only, exclude the query's
  covisibility neighborhood, floor at the min covisible-neighbor score,
  covisibility-group score accumulation, keep >= 0.75 * best accumulated.
* ``DetectMapMatchCandidates`` (:204-327): other maps only, absolute floor,
  same accumulation.

The database is shared across all server maps (one instance for the whole
server, reference ServerSystem.cpp:49).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import bow


@struct.dataclass
class KeyFrameDB:
    vectors: jnp.ndarray   # [K, W] BoW vectors (L1-normalized, tf-idf)
    valid: jnp.ndarray     # [K]
    map_id: jnp.ndarray    # [K] int32: which server map the keyframe belongs to

    @property
    def capacity(self):
        return self.vectors.shape[0]


def empty_db(capacity: int, n_words: int) -> KeyFrameDB:
    return KeyFrameDB(
        vectors=jnp.zeros((capacity, n_words), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        map_id=jnp.full((capacity,), -1, jnp.int32),
    )


def add(db: KeyFrameDB, kf_idx, vector, map_id) -> KeyFrameDB:
    return db.replace(
        vectors=db.vectors.at[kf_idx].set(vector),
        valid=db.valid.at[kf_idx].set(True),
        map_id=db.map_id.at[kf_idx].set(map_id),
    )


@jax.jit
def batch_vectors(vocab, kfs_desc, kfs_feat_valid, arenas):
    """BoW vectors [B, W] for the keyframes at ``arenas`` (one compiled
    gather + Hamming transform — compute once, scatter into every db)."""
    safe_a = jnp.clip(arenas, 0, kfs_desc.shape[0] - 1)
    vecs, _ = bow.transform_batch(vocab, kfs_desc[safe_a], kfs_feat_valid[safe_a])
    return vecs


@jax.jit
def register_vectors(db: KeyFrameDB, rows, vecs, mask, map_id) -> KeyFrameDB:
    """Masked batch registration of precomputed BoW vectors at db rows
    ``rows`` — masked lanes are exact no-ops (delta-scatter discipline)."""
    safe_r = jnp.clip(rows, 0, db.capacity - 1)
    cur = db.vectors[safe_r]
    dv = jnp.where(mask[:, None], vecs - cur, 0.0)
    cur_m = db.map_id[safe_r]
    dm = jnp.where(mask, map_id - cur_m, 0)
    return db.replace(
        vectors=db.vectors.at[safe_r].add(dv),
        valid=db.valid.at[safe_r].max(mask),
        map_id=db.map_id.at[safe_r].add(dm),
    )


def remap(db: KeyFrameDB, kf_remap) -> KeyFrameDB:
    """Permute db rows through an arena compaction remap (old->new index,
    -1 = dropped).  Lets a bounded-memory standalone/client system compact
    its map arena without invalidating the place-recognition bank."""
    out = empty_db(db.capacity, db.vectors.shape[1])
    remap_j = jnp.asarray(kf_remap, jnp.int32)
    ok = (remap_j >= 0) & db.valid
    tgt = jnp.where(ok, jnp.clip(remap_j, 0, db.capacity - 1), db.capacity - 1)
    return KeyFrameDB(
        vectors=out.vectors.at[tgt].add(jnp.where(ok[:, None], db.vectors, 0.0)),
        valid=out.valid.at[tgt].max(ok),
        map_id=out.map_id.at[tgt].add(jnp.where(ok, db.map_id + 1, 0)),
    )


def erase(db: KeyFrameDB, kf_mask) -> KeyFrameDB:
    return db.replace(valid=db.valid & ~kf_mask)


def grow(db: KeyFrameDB, new_capacity: int) -> KeyFrameDB:
    """Append-only enlargement (rows keep their arena indices)."""
    if new_capacity <= db.capacity:
        return db
    pad = new_capacity - db.capacity
    return KeyFrameDB(
        vectors=jnp.pad(db.vectors, ((0, pad), (0, 0))),
        valid=jnp.pad(db.valid, (0, pad)),
        map_id=jnp.pad(db.map_id, (0, pad), constant_values=-1),
    )


def regrid(db: KeyFrameDB, old_stride: int, new_stride: int, n_slots: int) -> KeyFrameDB:
    """Re-place rows packed as ``slot*stride + idx`` onto a larger stride
    (the shared cross-map database's addressing when a map arena grows)."""
    if new_stride == old_stride:
        return db
    out = empty_db(n_slots * new_stride, db.vectors.shape[1])
    old_rows = jnp.arange(db.capacity)
    slot = old_rows // old_stride
    idx = old_rows % old_stride
    new_rows = slot * new_stride + idx
    return KeyFrameDB(
        vectors=out.vectors.at[new_rows].set(db.vectors),
        valid=out.valid.at[new_rows].set(db.valid),
        map_id=out.map_id.at[new_rows].set(db.map_id),
    )


def _accumulate_covis_groups_nbr(scores, cand, nbr):
    """Group accumulation from precomputed top-k neighbor LISTS [K, top_k]
    (the sparse form — a dense [K,K] graph at the shared-db's global index
    space would be hundreds of MB at stress scale)."""
    K = scores.shape[0]
    group = jnp.concatenate([jnp.arange(K)[:, None], nbr], axis=1)  # [K, top_k+1]
    member_score = jnp.where(cand[group], scores[group], 0.0)
    acc = jnp.sum(member_score, axis=1)
    best_local = jnp.argmax(member_score, axis=1)
    best_of_group = group[jnp.arange(K), best_local]
    return acc, best_of_group


def _accumulate_covis_groups(scores, cand, covis_W, top_k: int = 10):
    """For each candidate, the accumulated score of its covisibility group
    (itself + top-10 covisible KFs that are also candidates) and the best
    single member of the group (LoopFinder.cpp:152-215 semantics).

    Returns (acc_score [K], best_of_group [K] index)."""
    K = scores.shape[0]
    _, nbr = jax.lax.top_k(covis_W, top_k)  # [K, top_k]
    group = jnp.concatenate([jnp.arange(K)[:, None], nbr], axis=1)  # [K, top_k+1]
    member_score = jnp.where(cand[group], scores[group], 0.0)  # [K, top_k+1]
    acc = jnp.sum(member_score, axis=1)
    best_local = jnp.argmax(member_score, axis=1)
    best_of_group = group[jnp.arange(K), best_local]
    return acc, best_of_group


@partial(jax.jit, static_argnames=())
def detect_loop_candidates(
    db: KeyFrameDB,
    query_vec,
    query_kf,
    query_map_id,
    covis_W,
    min_covis_score,
):
    """Same-map loop candidates for one query keyframe.

    covis_W: [K,K] covisibility weights of the query's map (arena indices
    aligned with the db).  min_covis_score: min BoW score between the query
    and its covisible neighbors (computed by the caller; the floor).
    Returns (cand_mask [K], scores [K]).
    """
    scores = bow.score_against_database(query_vec, db.vectors, db.valid)
    K = scores.shape[0]
    # exclusion = the covisibility LIST (weight >= 15), not any shared
    # landmark: a drifted revisit is typically WEAKLY reconnected through a
    # few duplicate fusions and must still be a loop candidate
    # (GetConnectedKeyFrames semantics, Database.cpp:85-90)
    connected = covis_W[query_kf] >= 15
    eligible = (
        db.valid
        & (db.map_id == query_map_id)
        & ~connected
        & (jnp.arange(K) != query_kf)
    )
    cand = eligible & (scores >= jnp.maximum(min_covis_score, 1e-6))

    acc, best_of_group = _accumulate_covis_groups(scores, cand, covis_W)
    acc = jnp.where(cand, acc, -1.0)
    best_acc = jnp.max(acc)
    keep_group = cand & (acc >= 0.75 * best_acc) & (best_acc > 0)
    # reference retains the best member of each surviving group
    final = jnp.zeros((K,), bool).at[best_of_group].max(keep_group)
    return final & cand, scores


@partial(jax.jit, static_argnames=())
def detect_map_match_candidates(
    db: KeyFrameDB,
    query_vec,
    query_map_id,
    covis_nbr_global,
    min_score: float = 0.0,
):
    """Cross-map candidates: keyframes of OTHER maps only
    (DetectMapMatchCandidates; the associated-clients exclusion reduces to a
    map-id check because merged maps share one map id here).

    covis_nbr_global: [n, top_k] per-row top covisible neighbor indices in
    the shared-db global index space (sparse — never a dense [n,n])."""
    scores = bow.score_against_database(query_vec, db.vectors, db.valid)
    K = scores.shape[0]
    eligible = db.valid & (db.map_id != query_map_id) & (db.map_id >= 0)
    cand = eligible & (scores > min_score)
    acc, best_of_group = _accumulate_covis_groups_nbr(scores, cand, covis_nbr_global)
    acc = jnp.where(cand, acc, -1.0)
    best_acc = jnp.max(acc)
    keep_group = cand & (acc >= 0.75 * best_acc) & (best_acc > 0)
    final = jnp.zeros((K,), bool).at[best_of_group].max(keep_group)
    return final & cand, scores


def min_covisible_score(db: KeyFrameDB, query_vec, query_kf, covis_W, min_weight: int = 15):
    """Floor score: minimum BoW score between the query and its covisible
    neighbors (weight >= 15), reference LoopFinder::DetectLoop:124-141."""
    scores = bow.l1_score(query_vec[None, :], db.vectors)
    nbr = (covis_W[query_kf] >= min_weight) & db.valid
    return jnp.min(jnp.where(nbr, scores, jnp.inf)), jnp.any(nbr)
