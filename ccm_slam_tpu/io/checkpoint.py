"""Map checkpoint / resume.

Replaces the reference's cereal binary archives (``Map::SaveMap``/``LoadMap``,
cslam/src/Map.cpp:335-386, 414-621; triggered by the ``ccmslam_savemap``
service): a whole ``MapState`` pytree — and any other flax.struct pytree such
as the BoW vocabulary — serializes to one compressed ``.npz``.  The reference
writes one cereal file per keyframe/landmark and rebuilds pointers on load;
the arena layout needs neither.

``remap_to_client`` reproduces the reference's load-time id policy (all
loaded entities re-assigned to client 0, comm disabled for that agent,
Map.cpp:527-541)."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models import map_store as ms
from ..ops.bow import Vocabulary


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_pytree(path: str, tree) -> None:
    arrays, _ = _flatten_with_paths(tree)
    np.savez_compressed(path, **arrays)


def save_map(path: str, m: ms.MapState) -> None:
    save_pytree(path, m)


def load_map(path: str) -> ms.MapState:
    data = np.load(path)
    K = data["kfs/kf_id"].shape[0]
    M = data["mps/mp_id"].shape[0]
    N = data["kfs/xy"].shape[1]
    O = data["mps/obs_kf"].shape[1]
    m = ms.empty_map(K, M, N, O)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(m)
    new_leaves = []
    for path_k, leaf in leaves:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path_k)
        new_leaves.append(jnp.asarray(data[key]).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(m), new_leaves
    )


def save_vocabulary(path: str, vocab: Vocabulary) -> None:
    np.savez_compressed(path, words=np.asarray(vocab.words), idf=np.asarray(vocab.idf))


def load_vocabulary(path: str) -> Vocabulary:
    data = np.load(path)
    return Vocabulary(words=jnp.asarray(data["words"]), idf=jnp.asarray(data["idf"]))


def remap_to_client(m: ms.MapState, client_id: int = 0) -> ms.MapState:
    """Reference load policy: every loaded entity belongs to client 0 and ids
    are renumbered densely (Map::LoadMap remaps all ids, Map.cpp:527-541)."""
    m = ms.compact_map(m)
    kfs = m.kfs
    mps = m.mps
    n_kf = m.next_kf
    n_mp = m.next_mp
    new_kf_ids = jnp.where(kfs.valid, jnp.arange(kfs.capacity, dtype=jnp.int32), -1)
    new_mp_ids = jnp.where(mps.valid, jnp.arange(mps.capacity, dtype=jnp.int32), -1)
    return m.replace(
        kfs=kfs.replace(
            kf_id=new_kf_ids,
            client_id=jnp.where(kfs.valid, client_id, kfs.client_id),
        ),
        mps=mps.replace(
            mp_id=new_mp_ids,
            client_id=jnp.where(mps.valid, client_id, mps.client_id),
        ),
    )
