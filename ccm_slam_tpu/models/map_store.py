"""Fixed-capacity SoA map arenas: keyframes, landmarks, observations.

TPU-native replacement for the reference's pointer-graph map layer
(``KeyFrame``/``MapPoint``/``Map``, cslam/src/{KeyFrame,MapPoint,Map}.cpp):

* entities live in struct-of-arrays arenas with validity masks — the arena
  index plays the role of the server's ``mUniqueId`` while ``(kf_id,
  client_id)`` keeps the reference's ``idpair`` identity (estd.h:69);
* per-object mutexes and ``LockMapUpdate`` are replaced by pure-functional
  snapshots: every mutation returns a new MapState pytree, and versioned
  pose stamps replace the loop-closure "locked pose" flags;
* the observation structure is dual-indexed and fixed-shape: forward
  ``kf.mp_idx [K,N]`` (feature slot -> landmark) and reverse
  ``mp.obs_kf/obs_feat [M,O]`` (landmark -> observing keyframes), mirroring
  ``KeyFrame::mvpMapPoints`` and ``MapPoint::mObservations``;
* covisibility weights and the spanning tree are *derived* quantities,
  recomputed densely from the observation tables (the reference maintains
  them incrementally under locks, KeyFrame::UpdateConnections :629-852).

All functions are jit-compatible: allocation uses traced cursor scalars and
dynamic scatter, never Python-level growth.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

NO_MP = jnp.int32(-1)
NO_KF = jnp.int32(-1)
# per-keyframe loop-edge table width (mspLoopEdges is an unbounded set in the
# reference, KeyFrame.h; a KF participating in E closures needs E slots — one
# per lap of a loop world.  Overflow is surfaced, never silent.)
MAX_LOOP_EDGES = 4


@struct.dataclass
class KeyFrameStore:
    # identity
    kf_id: jnp.ndarray       # [K] int32 per-agent id (reference mnId)
    client_id: jnp.ndarray   # [K] int32
    timestamp: jnp.ndarray   # [K] f32 seconds
    valid: jnp.ndarray       # [K] bool (slot allocated)
    bad: jnp.ndarray         # [K] bool (erased; kept as graveyard for pose chains)
    insert_order: jnp.ndarray  # [K] int32 arena insertion counter
    # pose world->cam + version stamp (replaces pose mutex + loop "lock")
    R_cw: jnp.ndarray        # [K,3,3]
    t_cw: jnp.ndarray        # [K,3]
    pose_version: jnp.ndarray  # [K] int32
    # features
    xy: jnp.ndarray          # [K,N,2] undistorted level-0 pixels
    desc: jnp.ndarray        # [K,N,32] uint8
    octave: jnp.ndarray      # [K,N] int32
    angle: jnp.ndarray       # [K,N] f32
    feat_valid: jnp.ndarray  # [K,N] bool
    # associations + graph
    mp_idx: jnp.ndarray      # [K,N] int32 landmark arena index or NO_MP
    parent: jnp.ndarray      # [K] int32 spanning-tree parent arena idx or NO_KF
    loop_edges: jnp.ndarray  # [K,L] int32 loop-closure partners or NO_KF
                             # (mspLoopEdges, KeyFrame.h — a SET per KF)

    @property
    def capacity(self):
        return self.kf_id.shape[0]

    @property
    def n_feat(self):
        return self.xy.shape[1]

    def center(self):
        """Camera centers O_w = -R^T t for all slots. [K,3]"""
        return -jnp.einsum("kij,ki->kj", self.R_cw, self.t_cw)


@struct.dataclass
class MapPointStore:
    mp_id: jnp.ndarray       # [M] int32 per-agent id
    client_id: jnp.ndarray   # [M]
    valid: jnp.ndarray       # [M] bool
    bad: jnp.ndarray         # [M] bool
    pos: jnp.ndarray         # [M,3] world
    pos_version: jnp.ndarray  # [M] int32
    normal: jnp.ndarray      # [M,3] mean viewing direction
    desc: jnp.ndarray        # [M,32] uint8 distinctive descriptor
    min_dist: jnp.ndarray    # [M] scale-invariance range
    max_dist: jnp.ndarray    # [M]
    ref_kf: jnp.ndarray      # [M] int32 reference keyframe arena idx
    first_kf_id: jnp.ndarray  # [M] int32 (culling bookkeeping)
    n_visible: jnp.ndarray   # [M] int32 (frustum appearances)
    n_found: jnp.ndarray     # [M] int32 (tracking matches)
    # reverse observations
    obs_kf: jnp.ndarray      # [M,O] int32 arena idx or NO_KF
    obs_feat: jnp.ndarray    # [M,O] int32 feature slot in that KF
    obs_n: jnp.ndarray       # [M] int32 count of valid obs slots

    @property
    def capacity(self):
        return self.mp_id.shape[0]

    @property
    def max_obs(self):
        return self.obs_kf.shape[1]


@struct.dataclass
class MapState:
    kfs: KeyFrameStore
    mps: MapPointStore
    next_kf: jnp.ndarray     # scalar int32 allocation cursor
    next_mp: jnp.ndarray
    insert_counter: jnp.ndarray  # scalar int32 monotone KF insertion stamp


def empty_map(capacity_kfs: int, capacity_mps: int, n_feat: int, max_obs: int) -> MapState:
    K, M, N, O = capacity_kfs, capacity_mps, n_feat, max_obs
    kfs = KeyFrameStore(
        kf_id=jnp.full((K,), -1, jnp.int32),
        client_id=jnp.zeros((K,), jnp.int32),
        timestamp=jnp.zeros((K,), jnp.float32),
        valid=jnp.zeros((K,), bool),
        bad=jnp.zeros((K,), bool),
        insert_order=jnp.full((K,), jnp.iinfo(jnp.int32).max, jnp.int32),
        R_cw=jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1)),
        t_cw=jnp.zeros((K, 3), jnp.float32),
        pose_version=jnp.zeros((K,), jnp.int32),
        xy=jnp.zeros((K, N, 2), jnp.float32),
        desc=jnp.zeros((K, N, 32), jnp.uint8),
        octave=jnp.zeros((K, N), jnp.int32),
        angle=jnp.zeros((K, N), jnp.float32),
        feat_valid=jnp.zeros((K, N), bool),
        mp_idx=jnp.full((K, N), NO_MP, jnp.int32),
        parent=jnp.full((K,), NO_KF, jnp.int32),
        loop_edges=jnp.full((K, MAX_LOOP_EDGES), NO_KF, jnp.int32),
    )
    mps = MapPointStore(
        mp_id=jnp.full((M,), -1, jnp.int32),
        client_id=jnp.zeros((M,), jnp.int32),
        valid=jnp.zeros((M,), bool),
        bad=jnp.zeros((M,), bool),
        pos=jnp.zeros((M, 3), jnp.float32),
        pos_version=jnp.zeros((M,), jnp.int32),
        normal=jnp.zeros((M, 3), jnp.float32),
        desc=jnp.zeros((M, 32), jnp.uint8),
        min_dist=jnp.zeros((M,), jnp.float32),
        max_dist=jnp.full((M,), jnp.inf, jnp.float32),
        ref_kf=jnp.full((M,), NO_KF, jnp.int32),
        first_kf_id=jnp.full((M,), -1, jnp.int32),
        n_visible=jnp.ones((M,), jnp.int32),
        n_found=jnp.ones((M,), jnp.int32),
        obs_kf=jnp.full((M, O), NO_KF, jnp.int32),
        obs_feat=jnp.zeros((M, O), jnp.int32),
        obs_n=jnp.zeros((M,), jnp.int32),
    )
    return MapState(
        kfs=kfs,
        mps=mps,
        next_kf=jnp.int32(0),
        next_mp=jnp.int32(0),
        insert_counter=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Keyframe / landmark allocation
# ---------------------------------------------------------------------------


def grow_map(m: MapState, new_kf_cap: int = None, new_mp_cap: int = None) -> MapState:
    """Enlarge the arenas, preserving content AND arena indices.

    The reference's server map grows without bound (std::map, Map.h); fixed
    TPU arenas instead re-allocate between jit invocations.  Growth is
    APPEND-ONLY — existing rows keep their indices, so every table holding
    arena indices (agent id tables, place-recognition dbs, finder/matcher
    state) stays valid with no remap (the never-compact invariant).  New rows
    get ``empty_map`` defaults.  Shapes change, so downstream jits recompile
    — grow geometrically (double) to amortize.
    """
    K0, M0 = m.kfs.capacity, m.mps.capacity
    K1 = max(int(new_kf_cap or K0), K0)
    M1 = max(int(new_mp_cap or M0), M0)
    if K1 == K0 and M1 == M0:
        return m
    tmpl = empty_map(K1, M1, m.kfs.n_feat, m.mps.max_obs)

    def splice(old, new):
        return new.at[tuple(slice(0, s) for s in old.shape)].set(old)

    return MapState(
        kfs=jax.tree.map(splice, m.kfs, tmpl.kfs),
        mps=jax.tree.map(splice, m.mps, tmpl.mps),
        next_kf=m.next_kf,
        next_mp=m.next_mp,
        insert_counter=m.insert_counter,
    )


def add_keyframe(
    m: MapState,
    kf_id,
    client_id,
    timestamp,
    R_cw,
    t_cw,
    xy,
    desc,
    octave,
    angle,
    feat_valid,
    mp_assoc,
) -> tuple[MapState, jnp.ndarray]:
    """Allocate the next KF slot.  mp_assoc [N]: landmark arena idx or NO_MP.
    Returns (new_map, kf_arena_idx).  Registers reverse observations."""
    k = m.next_kf
    kfs = m.kfs
    kfs = kfs.replace(
        kf_id=kfs.kf_id.at[k].set(kf_id),
        client_id=kfs.client_id.at[k].set(client_id),
        timestamp=kfs.timestamp.at[k].set(timestamp),
        valid=kfs.valid.at[k].set(True),
        bad=kfs.bad.at[k].set(False),
        insert_order=kfs.insert_order.at[k].set(m.insert_counter),
        R_cw=kfs.R_cw.at[k].set(R_cw),
        t_cw=kfs.t_cw.at[k].set(t_cw),
        xy=kfs.xy.at[k].set(xy),
        desc=kfs.desc.at[k].set(desc),
        octave=kfs.octave.at[k].set(octave),
        angle=kfs.angle.at[k].set(angle),
        feat_valid=kfs.feat_valid.at[k].set(feat_valid),
        mp_idx=kfs.mp_idx.at[k].set(mp_assoc),
    )
    m = m.replace(kfs=kfs, next_kf=k + 1, insert_counter=m.insert_counter + 1)
    m = register_observations(m, k, mp_assoc)
    return m, k


def add_keyframes(
    m: MapState,
    kf_ids,        # [B]
    client_ids,    # [B]
    timestamps,    # [B]
    R_cw,          # [B,3,3]
    t_cw,          # [B,3]
    xy,            # [B,N,2]
    desc,          # [B,N,32]
    octave,        # [B,N]
    angle,         # [B,N]
    feat_valid,    # [B,N]
    mp_assoc,      # [B,N] landmark arena idx or NO_MP
    new_valid,     # [B] which rows actually allocate
) -> tuple[MapState, jnp.ndarray]:
    """Batch-allocate keyframe slots (the [B]-row analogue of add_keyframe).

    Masked rows write to the reserved last slot as exact no-ops (the arena
    scatter discipline).  Reverse observations are registered for ALL rows at
    once — per-landmark ranks make concurrent observations of the same
    landmark from several new keyframes land in distinct obs slots.
    Returns (map, arena_idx [B], -1 for masked rows)."""
    B = kf_ids.shape[0]
    K = m.kfs.capacity
    offs = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    idx = jnp.where(new_valid, m.next_kf + offs, K - 1)
    idx = jnp.clip(idx, 0, K - 1)
    sel = new_valid

    def _expand(mask, val):
        return mask.reshape(mask.shape + (1,) * (val.ndim - mask.ndim))

    kfs = m.kfs

    def upd(field, val):
        cur = field[idx]
        delta = jnp.where(_expand(sel, val), val.astype(field.dtype) - cur,
                          jnp.zeros_like(cur))
        return field.at[idx].add(delta)

    kfs = kfs.replace(
        kf_id=upd(kfs.kf_id, kf_ids),
        client_id=upd(kfs.client_id, client_ids),
        timestamp=upd(kfs.timestamp, timestamps),
        valid=kfs.valid.at[idx].max(sel),
        bad=kfs.bad.at[idx].min(~sel),
        insert_order=upd(kfs.insert_order, m.insert_counter + offs),
        R_cw=upd(kfs.R_cw, R_cw),
        t_cw=upd(kfs.t_cw, t_cw),
        xy=upd(kfs.xy, xy),
        desc=upd(kfs.desc, desc),
        octave=upd(kfs.octave, octave),
        angle=upd(kfs.angle, angle),
        feat_valid=kfs.feat_valid.at[idx].max(_expand(sel, feat_valid) & feat_valid),
        mp_idx=upd(kfs.mp_idx, mp_assoc),
    )
    n_new = jnp.sum(sel.astype(jnp.int32))
    m = m.replace(kfs=kfs, next_kf=m.next_kf + n_new,
                  insert_counter=m.insert_counter + n_new)

    # reverse observations, flattened over [B*N] with per-landmark ranks
    mps = m.mps
    N = mp_assoc.shape[1]
    flat_mp = jnp.where(sel[:, None], mp_assoc, NO_MP).reshape(-1)
    has = flat_mp >= 0
    target = jnp.where(has, flat_mp, 0)
    # rank of each hit among all hits on the same landmark (stable order)
    skey = jnp.where(has, target, jnp.int32(2**30))
    order = jnp.argsort(skey, stable=True)
    sorted_t = skey[order]
    first = jnp.searchsorted(sorted_t, sorted_t, side="left")
    rank_sorted = jnp.arange(B * N, dtype=jnp.int32) - first.astype(jnp.int32)
    rank = jnp.zeros((B * N,), jnp.int32).at[order].set(rank_sorted)
    slot = jnp.clip(mps.obs_n[target] + rank, 0, mps.max_obs - 1)
    kf_of = jnp.broadcast_to(idx[:, None], (B, N)).reshape(-1)
    feat_of = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)).reshape(-1)
    old_kf = mps.obs_kf[target, slot]
    old_feat = mps.obs_feat[target, slot]
    obs_kf = mps.obs_kf.at[target, slot].add(jnp.where(has, kf_of - old_kf, 0))
    obs_feat = mps.obs_feat.at[target, slot].add(jnp.where(has, feat_of - old_feat, 0))
    obs_n = mps.obs_n.at[target].add(jnp.where(has, 1, 0))
    obs_n = jnp.minimum(obs_n, mps.max_obs)
    m = m.replace(mps=mps.replace(obs_kf=obs_kf, obs_feat=obs_feat, obs_n=obs_n))
    return m, jnp.where(sel, idx, -1)


def register_observations(m: MapState, kf_idx, mp_assoc) -> MapState:
    """Append (kf_idx, feat) to each associated landmark's reverse-obs table.

    mp_assoc [N]: landmark index per feature slot (NO_MP = none).  Idempotence
    is NOT checked (the reference asserts instead, MapPoint::AddObservation).
    """
    mps = m.mps
    N = mp_assoc.shape[0]
    has = mp_assoc >= 0
    target = jnp.where(has, mp_assoc, 0)
    # slot to write = current obs_n of that landmark, +rank among this KF's
    # new obs hitting the same landmark (normally 0 or 1 per landmark per KF)
    slot = jnp.clip(mps.obs_n[target], 0, mps.max_obs - 1)
    # scatter as add-of-delta: masked entries contribute 0, so the index
    # collisions of all the NO_MP slots (routed to landmark 0) are no-ops
    old_kf = mps.obs_kf[target, slot]
    old_feat = mps.obs_feat[target, slot]
    obs_kf = mps.obs_kf.at[target, slot].add(jnp.where(has, kf_idx - old_kf, 0))
    obs_feat = mps.obs_feat.at[target, slot].add(
        jnp.where(has, jnp.arange(N, dtype=jnp.int32) - old_feat, 0)
    )
    obs_n = mps.obs_n.at[target].add(jnp.where(has, 1, 0))
    obs_n = jnp.minimum(obs_n, mps.max_obs)
    return m.replace(mps=mps.replace(obs_kf=obs_kf, obs_feat=obs_feat, obs_n=obs_n))


def add_mappoints(
    m: MapState,
    n_new,
    pos,
    desc,
    normal,
    min_dist,
    max_dist,
    ref_kf,
    mp_ids,
    client_id,
    new_valid,
    inserted_stamp=None,
) -> tuple[MapState, jnp.ndarray]:
    """Batch-allocate up to B landmark slots (fixed B = pos.shape[0], actual
    count = n_new via new_valid mask).  Returns (map, arena_idx [B])."""
    B = pos.shape[0]
    offs = jnp.cumsum(new_valid.astype(jnp.int32)) - 1  # compacted offsets
    idx = jnp.where(new_valid, m.next_mp + offs, m.mps.capacity - 1)
    idx = jnp.clip(idx, 0, m.mps.capacity - 1)
    mps = m.mps
    sel = new_valid

    # scatter as add-of-delta (XOR-of-delta for bools) so the collided writes
    # of masked-out entries (all routed to the last slot) are exact no-ops
    def _expand(mask, val):
        return mask.reshape(mask.shape + (1,) * (val.ndim - mask.ndim))

    def upd(field, val):
        cur = field[idx]
        delta = jnp.where(_expand(sel, val), val.astype(field.dtype) - cur, jnp.zeros_like(cur))
        return field.at[idx].add(delta)

    mps = mps.replace(
        mp_id=upd(mps.mp_id, mp_ids),
        client_id=upd(mps.client_id, client_id),
        # bool fields: monotone scatter (max sets True, min clears) — no-ops
        # for masked entries and for colliding duplicates
        valid=mps.valid.at[idx].max(sel),
        bad=mps.bad.at[idx].min(~sel),
        pos=upd(mps.pos, pos),
        normal=upd(mps.normal, normal),
        desc=upd(mps.desc, desc),
        min_dist=upd(mps.min_dist, min_dist),
        max_dist=upd(mps.max_dist, max_dist),
        ref_kf=upd(mps.ref_kf, ref_kf),
        # first_kf_id is the CULLING AGE STAMP (the reference's
        # mInsertedWithKF): by default the reference keyframe, but server
        # ingest passes the keyframe cursor at ARRIVAL time — a landmark
        # re-sent late must not inherit the age of its (old) reference KF
        first_kf_id=upd(
            mps.first_kf_id,
            ref_kf if inserted_stamp is None
            else jnp.broadcast_to(inserted_stamp, ref_kf.shape).astype(mps.first_kf_id.dtype),
        ),
        n_visible=upd(mps.n_visible, jnp.ones_like(mps.n_visible[idx])),
        n_found=upd(mps.n_found, jnp.ones_like(mps.n_found[idx])),
        obs_n=upd(mps.obs_n, jnp.zeros_like(mps.obs_n[idx])),
        obs_kf=upd(mps.obs_kf, jnp.full_like(mps.obs_kf[idx], NO_KF)),
    )
    m = m.replace(mps=mps, next_mp=m.next_mp + n_new)
    return m, jnp.where(new_valid, idx, NO_MP)


# ---------------------------------------------------------------------------
# Derived graph structure
# ---------------------------------------------------------------------------


def covisibility_matrix(m: MapState) -> jnp.ndarray:
    """[K,K] int32: number of landmarks shared between keyframe pairs.

    weights[a,b] = |{p : a in obs(p) and b in obs(p)}| — derived from the
    reverse-obs tables in one one-hot matmul chain (KeyFrame::UpdateConnections
    recomputes this per-KF with hash maps)."""
    K = m.kfs.capacity
    mps = m.mps
    O = mps.max_obs
    slot_valid = (
        (jnp.arange(O)[None, :] < mps.obs_n[:, None])
        & (mps.obs_kf >= 0)
        & mps.valid[:, None]
        & ~mps.bad[:, None]
    )
    tgt = jnp.clip(mps.obs_kf, 0, K - 1)
    M = mps.capacity
    # chunk the landmark axis: the [M,K] one-hot incidence would be ~0.5 GB
    # at stress scale (K=1024, M=131k); a scan over landmark blocks keeps the
    # intermediate at [B,K] while the MXU still sees big matmuls
    B = 8192
    n_blocks = max(1, (M + B - 1) // B)
    pad = n_blocks * B - M
    tgt_p = jnp.pad(tgt, ((0, pad), (0, 0)))
    sv_p = jnp.pad(slot_valid, ((0, pad), (0, 0)))

    def block(carry, inp):
        tgt_b, sv_b = inp
        A = jnp.zeros((B, K), jnp.float32)
        A = A.at[jnp.arange(B)[:, None], tgt_b].add(sv_b.astype(jnp.float32))
        A = jnp.minimum(A, 1.0)
        return carry + A.T @ A, None

    W, _ = jax.lax.scan(
        block,
        jnp.zeros((K, K), jnp.float32),
        (tgt_p.reshape(n_blocks, B, O), sv_p.reshape(n_blocks, B, O)),
    )
    W = W.astype(jnp.int32)
    W = W - jnp.diag(jnp.diag(W))
    alive = m.kfs.valid & ~m.kfs.bad
    W = jnp.where(alive[:, None] & alive[None, :], W, 0)
    return W


def covis_row(m: MapState, kf_idx) -> jnp.ndarray:
    """One keyframe's covisibility row [K] without forming the full matrix:
    the scalable query for vicinity packing / neighbor lookups
    (KeyFrame::GetBestCovisibilityKeyFrames semantics)."""
    kfs, mps = m.kfs, m.mps
    K = kfs.capacity
    O = mps.max_obs
    # landmarks observed by kf_idx (via its forward links)
    mp = kfs.mp_idx[kf_idx]
    has = mp >= 0
    mpc = jnp.clip(mp, 0, mps.capacity - 1)
    sel = has & mps.valid[mpc] & ~mps.bad[mpc]
    # their observing keyframes from the reverse table
    obs_kf = mps.obs_kf[mpc]                       # [N,O]
    ok = sel[:, None] & (jnp.arange(O)[None, :] < mps.obs_n[mpc][:, None]) & (obs_kf >= 0)
    row = jnp.zeros((K,), jnp.int32).at[
        jnp.clip(obs_kf, 0, K - 1).reshape(-1)
    ].add(ok.reshape(-1).astype(jnp.int32))
    row = row.at[kf_idx].set(0)
    alive = kfs.valid & ~kfs.bad
    return jnp.where(alive, row, 0)


def add_loop_edge(kfs: KeyFrameStore, a, b):
    """Record an undirected loop edge in BOTH endpoints' fixed-size tables
    (KeyFrame::AddLoopEdge — the reference keeps a set ``mspLoopEdges`` per
    KF and new closures append, LoopFinder.cpp:647-665).  Duplicates are
    no-ops.  Returns (kfs', n_dropped) — n_dropped > 0 means an endpoint's
    table was full (callers surface it; no silent caps)."""

    def app(tbl, i, v):
        row = tbl[i]
        dup = jnp.any(row == v)
        free = row < 0
        has_free = jnp.any(free)
        slot = jnp.argmax(free)
        can = has_free & ~dup
        tbl = tbl.at[i, slot].add(jnp.where(can, v - row[slot], 0))
        return tbl, jnp.where(~dup & ~has_free, 1, 0)

    tbl, d1 = app(kfs.loop_edges, a, b)
    tbl, d2 = app(tbl, b, a)
    return kfs.replace(loop_edges=tbl), d1 + d2


@partial(jax.jit, static_argnames=("max_kfs", "hops"))
def vicinity_khop(m: MapState, root, max_kfs: int, hops: int = 4):
    """k-hop covisibility expansion from ``root`` in ONE compiled call — the
    selection step of Map::PackVicinityToMsg (cslam/src/Map.cpp:1065-1155,
    BFS over covisibility from the agent's current KF) without the per-row
    host dispatches.  Two scatters per hop (forward links -> landmark set,
    reverse obs -> neighbor set) instead of one covis_row per visited KF.

    Returns (sel [max_kfs] arena indices, sel_valid [max_kfs]) ordered by
    (hop asc, root-covisibility desc, newest first) — BFS-like priority."""
    kfs, mps = m.kfs, m.mps
    K, N = kfs.capacity, kfs.n_feat
    M, O = mps.capacity, mps.max_obs
    alive = kfs.valid & ~kfs.bad
    unreached = jnp.int32(K + 1)
    hop = jnp.where(jnp.arange(K) == root, 0, unreached)

    mp = jnp.clip(kfs.mp_idx, 0, M - 1)
    mp_has = (kfs.mp_idx >= 0) & kfs.feat_valid & alive[:, None]
    lm_alive = mps.valid & ~mps.bad
    okf = jnp.clip(mps.obs_kf, 0, K - 1)
    obs_ok = (jnp.arange(O)[None, :] < mps.obs_n[:, None]) & (mps.obs_kf >= 0)

    def body(h, hop):
        frontier = hop == h
        lm = jnp.zeros((M,), bool).at[mp.reshape(-1)].max(
            (mp_has & frontier[:, None]).reshape(-1)
        ) & lm_alive
        nb = jnp.zeros((K,), bool).at[okf.reshape(-1)].max(
            (obs_ok & lm[:, None]).reshape(-1)
        )
        return jnp.where(nb & alive & (hop > h + 1), h + 1, hop)

    hop = jax.lax.fori_loop(0, hops, body, hop)
    w_root = covis_row(m, root)
    # lexicographic order via successive stable sorts, least-significant
    # key first (int64 packing would need x64)
    o = jnp.argsort(-kfs.insert_order, stable=True)
    o = o[jnp.argsort(-w_root[o], stable=True)]
    o = o[jnp.argsort(hop[o], stable=True)]
    sel = o[:max_kfs]
    return sel, hop[sel] <= hops


def covis_neighbors(W, kf_idx, top_k: int, min_weight: int = 15):
    """Top-K covisible neighbors of a keyframe (weight >= 15 rule,
    KeyFrame.cpp:673).  Returns (idx [top_k], weight [top_k], valid [top_k])."""
    row = W[kf_idx]
    w, idx = jax.lax.top_k(row, top_k)
    return idx, w, w >= min_weight


def spanning_tree(m: MapState, W) -> jnp.ndarray:
    """parent[k]: the earlier-inserted keyframe with the highest covisibility
    (client rule: parent = top covisible among already-inserted KFs,
    KeyFrame.cpp:715-741; the server's parent-id<own-id rule coincides with
    insert order here).  Root(s) get NO_KF."""
    order = m.kfs.insert_order
    earlier = order[None, :] < order[:, None]  # [K,K] candidate mask
    alive = m.kfs.valid & ~m.kfs.bad
    Wm = jnp.where(earlier & alive[None, :], W, -1)
    best = jnp.argmax(Wm, axis=1).astype(jnp.int32)
    best_w = jnp.take_along_axis(Wm, best[:, None], axis=1)[:, 0]
    has_parent = (best_w > 0) & alive
    return jnp.where(has_parent, best, NO_KF)


def update_normal_and_depth(m: MapState, scale_factor: float = 1.2, n_levels: int = 8) -> MapState:
    """Recompute landmark viewing normals and scale-invariance distances from
    the observation tables (MapPoint::UpdateNormalAndDepth,
    cslam/src/MapPoint.cpp)."""
    mps = m.mps
    kfs = m.kfs
    O = mps.max_obs
    slot_valid = (jnp.arange(O)[None, :] < mps.obs_n[:, None]) & (mps.obs_kf >= 0)
    kf = jnp.clip(mps.obs_kf, 0, kfs.capacity - 1)
    centers = kfs.center()[kf]  # [M,O,3]
    d = mps.pos[:, None, :] - centers
    dn = d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(slot_valid[..., None], dn, 0.0), axis=1)
    normal = normal / jnp.clip(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    refk = jnp.clip(mps.ref_kf, 0, kfs.capacity - 1)
    dist_ref = jnp.linalg.norm(mps.pos - kfs.center()[refk], axis=-1)
    feat = jnp.clip(mps.obs_feat, 0, kfs.n_feat - 1)
    # octave of the observation in the reference keyframe: find the slot whose
    # obs_kf == ref_kf (fall back to slot 0)
    is_ref = (mps.obs_kf == mps.ref_kf[:, None]) & slot_valid
    ref_slot = jnp.argmax(is_ref, axis=1)
    oct_ref = kfs.octave[refk, feat[jnp.arange(mps.capacity), ref_slot]]
    level_sf = jnp.power(scale_factor, oct_ref.astype(jnp.float32))
    max_dist = dist_ref * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))
    has_obs = mps.obs_n > 0
    return m.replace(
        mps=mps.replace(
            normal=jnp.where(has_obs[:, None], normal, mps.normal),
            max_dist=jnp.where(has_obs, max_dist, mps.max_dist),
            min_dist=jnp.where(has_obs, min_dist, mps.min_dist),
        )
    )


def compute_distinctive_descriptors(m: MapState) -> MapState:
    """Per-landmark representative descriptor = the observation descriptor
    with minimum median Hamming distance to the others
    (MapPoint::ComputeDistinctiveDescriptors, cslam/src/MapPoint.cpp:929-994)."""
    from ..ops import hamming

    mps = m.mps
    kfs = m.kfs
    O = mps.max_obs
    slot_valid = (jnp.arange(O)[None, :] < mps.obs_n[:, None]) & (mps.obs_kf >= 0)
    kf = jnp.clip(mps.obs_kf, 0, kfs.capacity - 1)
    feat = jnp.clip(mps.obs_feat, 0, kfs.n_feat - 1)
    descs = kfs.desc[kf, feat]  # [M,O,32]
    bits = hamming.unpack_bits(descs).astype(jnp.float32)  # [M,O,256]
    dots = jnp.einsum("mob,mpb->mop", bits, bits)
    ones = jnp.sum(bits, axis=-1)
    dist = ones[:, :, None] + ones[:, None, :] - 2.0 * dots  # [M,O,O]
    big = 1e6
    pair_ok = slot_valid[:, :, None] & slot_valid[:, None, :]
    dist = jnp.where(pair_ok, dist, big)
    med = jnp.median(dist, axis=-1)  # [M,O]
    med = jnp.where(slot_valid, med, big)
    best = jnp.argmin(med, axis=-1)
    new_desc = descs[jnp.arange(mps.capacity), best]
    has = mps.obs_n > 0
    return m.replace(mps=mps.replace(desc=jnp.where(has[:, None], new_desc, mps.desc)))


def erase_mappoints(m: MapState, mp_mask) -> MapState:
    """SetBadFlag for a batch of landmarks: mark bad and detach forward
    associations (the graveyard entry keeps pos for message-chain recovery,
    like the reference's mmpErasedMapPoints)."""
    mps = m.mps.replace(bad=m.mps.bad | mp_mask)
    # detach forward links kf.mp_idx pointing at erased landmarks
    kfs = m.kfs
    tgt = jnp.clip(kfs.mp_idx, 0, mps.capacity - 1)
    dead = mp_mask[tgt] & (kfs.mp_idx >= 0)
    mp_idx = jnp.where(dead, NO_MP, kfs.mp_idx)
    return m.replace(kfs=kfs.replace(mp_idx=mp_idx), mps=mps)


def erase_keyframes(m: MapState, kf_mask) -> MapState:
    """SetBadFlag for keyframes: mark bad, remove their reverse observations
    from landmarks (KeyFrame::SetBadFlag, cslam/src/KeyFrame.cpp:936-1144 —
    the re-parenting of children is handled by re-deriving the spanning tree)."""
    kfs = m.kfs.replace(bad=m.kfs.bad | kf_mask)
    mps = m.mps
    kf_safe = jnp.clip(mps.obs_kf, 0, kfs.capacity - 1)
    obs_dead = kf_mask[kf_safe] & (mps.obs_kf >= 0)
    obs_kf = jnp.where(obs_dead, NO_KF, mps.obs_kf)
    # compact: recount valid slots (obs stay sparse until next compaction)
    obs_valid = obs_kf >= 0
    within = jnp.arange(mps.max_obs)[None, :] < mps.obs_n[:, None]
    obs_n = jnp.sum((obs_valid & within).astype(jnp.int32), axis=1)
    # reference-KF fixup (MapPoint::EraseObservation, cslam/src/MapPoint.cpp:
    # mpRefKF follows the first surviving observation when its KF dies; a
    # landmark left with no observations dies with it) — alive landmarks must
    # always reference an alive keyframe (check_structure invariant)
    ref_dead = (mps.ref_kf >= 0) & kf_mask[jnp.clip(mps.ref_kf, 0, kfs.capacity - 1)]
    slot_ok = obs_valid & within
    has_obs = slot_ok.any(axis=1)
    first = jnp.argmax(slot_ok, axis=1)
    new_ref = jnp.where(has_obs, obs_kf[jnp.arange(mps.capacity), first], NO_KF)
    ref2 = jnp.where(ref_dead, new_ref, mps.ref_kf)
    newly_bad = mps.valid & ref_dead & ~has_obs & ~mps.bad
    bad2 = mps.bad | newly_bad
    # detach forward links to landmarks newly killed by the ref-KF fixup —
    # an alive KF may still hold an over-cap forward link (dropped from the
    # reverse table) that would otherwise dangle until the next rebuild
    tgt = jnp.clip(kfs.mp_idx, 0, mps.capacity - 1)
    dangling = newly_bad[tgt] & (kfs.mp_idx >= 0)
    mp_idx2 = jnp.where(dangling, NO_MP, kfs.mp_idx)
    return m.replace(
        kfs=kfs.replace(mp_idx=mp_idx2),
        mps=mps.replace(obs_kf=obs_kf, obs_n=obs_n, ref_kf=ref2, bad=bad2),
    )


def rebuild_observations(m: MapState) -> MapState:
    """Rebuild the reverse landmark->keyframe tables from the forward
    ``kf.mp_idx`` links (sort-based grouping, fully batched).

    This makes landmark replacement (MapPoint::Replace,
    cslam/src/MapPoint.cpp:583) a pure forward-link rewrite: redirect
    ``mp_idx`` entries, then call this to re-derive observations."""
    kfs, mps = m.kfs, m.mps
    K, N = kfs.capacity, kfs.n_feat
    O = mps.max_obs
    M = mps.capacity

    kf_alive = kfs.valid & ~kfs.bad
    mp_flat = kfs.mp_idx.reshape(-1)  # [K*N]
    live = (mp_flat >= 0) & jnp.repeat(kf_alive, N) & kfs.feat_valid.reshape(-1)
    mp_key = jnp.where(live, mp_flat, M)  # dead entries sort to the end
    order = jnp.argsort(mp_key, stable=True)
    sorted_mp = mp_key[order]
    # rank within group = position - first index of that landmark's group
    first_of = jnp.searchsorted(sorted_mp, jnp.arange(M + 1))
    rank = jnp.arange(K * N) - first_of[jnp.clip(sorted_mp, 0, M)]
    src_kf = (order // N).astype(jnp.int32)
    src_feat = (order % N).astype(jnp.int32)

    write = (sorted_mp < M) & (rank < O)
    tgt_mp = jnp.where(write, sorted_mp, 0)
    tgt_slot = jnp.where(write, rank, 0)

    # ranks are unique per (landmark, slot) by construction; masked writes all
    # hit (0,0) with delta 0 — collision-safe add-of-delta scatter
    obs_kf = jnp.full((M, O), NO_KF, jnp.int32).at[tgt_mp, tgt_slot].add(
        jnp.where(write, src_kf - NO_KF, 0)
    )
    obs_feat = jnp.zeros((M, O), jnp.int32).at[tgt_mp, tgt_slot].add(
        jnp.where(write, src_feat, 0)
    )
    obs_n = jnp.zeros((M,), jnp.int32).at[tgt_mp].add(write.astype(jnp.int32))

    # consistency invariant: forward links whose observation overflowed the
    # O-slot cap must be DROPPED, not silently kept — a link without a
    # reverse slot is invisible to BA and drifts out of the optimized gauge
    overflow = live[order] & (sorted_mp < M) & (rank >= O)
    # scatter as add-of-delta (clears to NO_MP); masked entries target (0,0)
    # with delta 0
    dk = jnp.where(overflow, src_kf, 0)
    df = jnp.where(overflow, src_feat, 0)
    cur = kfs.mp_idx[dk, df]
    mp_idx2 = kfs.mp_idx.at[dk, df].add(jnp.where(overflow, NO_MP - cur, 0))
    return m.replace(
        kfs=kfs.replace(mp_idx=mp_idx2),
        mps=mps.replace(obs_kf=obs_kf, obs_feat=obs_feat, obs_n=obs_n),
    )


def replace_mappoints(m: MapState, loser, winner, rebuild: bool = True) -> MapState:
    """Batched MapPoint::Replace: every forward link to ``loser[i]`` is
    redirected to ``winner[i]``, losers are marked bad, reverse tables are
    rebuilt.  loser/winner: [B] arena indices (entries with loser<0 ignored).
    If a keyframe already observes the winner, its duplicate link to the
    loser is dropped instead of redirected."""
    B = loser.shape[0]
    Mcap = m.mps.capacity
    act = (loser >= 0) & (winner >= 0) & (loser != winner)
    # redirect table old->new (one hop; callers must not chain losers).
    # Single-winner max scatter: callers whose loser lanes collide (a landmark
    # losing both as a candidate and as a displaced `existing` in one batch)
    # get a deterministic winner instead of a garbage summed index
    safe_l = jnp.where(act, loser, Mcap - 1)
    won = jnp.full((Mcap,), -1, jnp.int32).at[safe_l].max(
        jnp.where(act, winner, -1)
    )
    redirect = jnp.where(won >= 0, won, jnp.arange(Mcap, dtype=jnp.int32))
    kfs = m.kfs
    old = kfs.mp_idx
    has = old >= 0
    new = jnp.where(has, redirect[jnp.clip(old, 0, Mcap - 1)], old)
    # drop duplicates: if a KF row now contains the same landmark twice, keep
    # the first occurrence (per-row one-hot check)
    K, N = old.shape
    # sort each row by landmark id, mark repeats, map back
    row_sorted_idx = jnp.argsort(jnp.where(has, new, Mcap + 1), axis=1, stable=True)
    row_sorted = jnp.take_along_axis(new, row_sorted_idx, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((K, 1), bool), row_sorted[:, 1:] == row_sorted[:, :-1]], axis=1
    ) & (row_sorted >= 0)
    dup = jnp.zeros((K, N), bool).at[
        jnp.arange(K)[:, None], row_sorted_idx
    ].set(dup_sorted)
    new = jnp.where(dup, NO_MP, new)
    mps = m.mps.replace(bad=m.mps.bad.at[jnp.where(act, loser, 0)].max(act))
    m = m.replace(kfs=kfs.replace(mp_idx=new), mps=mps)
    # callers batching several replaces may defer the (full-arena) reverse-
    # table rebuild to the end of their pass — the forward/reverse invariant
    # must hold again before the enclosing jit step returns
    return rebuild_observations(m) if rebuild else m


def compact_map(m: MapState) -> MapState:
    """Defragment both arenas: drop bad/erased entities, left-pack the alive
    ones, and remap every cross-index (mp_idx, obs_kf, ref_kf, parent,
    loop_edge).  The TPU analogue of the reference's physical erasure after
    ``MapTrimming`` (cslam/src/Map.cpp:857-1063) — run between jit steps when
    an allocation cursor approaches capacity; all shapes are preserved."""
    kfs, mps = m.kfs, m.mps
    K, M = kfs.capacity, mps.capacity

    kf_keep = kfs.valid & ~kfs.bad
    mp_keep = mps.valid & ~mps.bad & (mps.obs_n > 0)

    # stable left-pack permutation: alive entries first, in original order
    kf_perm = jnp.argsort(~kf_keep, stable=True)         # new slot -> old slot
    mp_perm = jnp.argsort(~mp_keep, stable=True)
    n_kf = jnp.sum(kf_keep.astype(jnp.int32))
    n_mp = jnp.sum(mp_keep.astype(jnp.int32))
    # old slot -> new slot (NO_KF/-1 for dropped)
    kf_remap = jnp.full((K,), NO_KF, jnp.int32).at[kf_perm].set(jnp.arange(K, dtype=jnp.int32))
    kf_remap = jnp.where(kf_keep, kf_remap, NO_KF)
    mp_remap = jnp.full((M,), NO_MP, jnp.int32).at[mp_perm].set(jnp.arange(M, dtype=jnp.int32))
    mp_remap = jnp.where(mp_keep, mp_remap, NO_MP)

    def _lookup(table, idx, none_val):
        safe = jnp.clip(idx, 0, table.shape[0] - 1)
        return jnp.where(idx >= 0, table[safe], none_val)

    # permute keyframe fields
    kfs2 = jax.tree.map(lambda x: x[kf_perm], kfs)
    kfs2 = kfs2.replace(
        valid=jnp.arange(K) < n_kf,
        bad=jnp.zeros((K,), bool),
        mp_idx=_lookup(mp_remap, kfs2.mp_idx, NO_MP),
        parent=_lookup(kf_remap, kfs2.parent, NO_KF),
        loop_edges=_lookup(kf_remap, kfs2.loop_edges, NO_KF),
    )
    # permute landmark fields
    mps2 = jax.tree.map(lambda x: x[mp_perm], mps)
    obs_kf2 = _lookup(kf_remap, mps2.obs_kf, NO_KF)
    mps2 = mps2.replace(
        valid=jnp.arange(M) < n_mp,
        bad=jnp.zeros((M,), bool),
        obs_kf=obs_kf2,
        ref_kf=_lookup(kf_remap, mps2.ref_kf, NO_KF),
    )
    m2 = m.replace(kfs=kfs2, mps=mps2, next_kf=n_kf, next_mp=n_mp)
    m2 = compact_observations(m2)
    # landmarks whose reference keyframe was dropped: re-anchor to first obs
    mps3 = m2.mps
    no_ref = (mps3.ref_kf < 0) & m2.mps.valid
    mps3 = mps3.replace(ref_kf=jnp.where(no_ref, mps3.obs_kf[:, 0], mps3.ref_kf))
    return m2.replace(mps=mps3)


def transform_map(m: MapState, s, R, t) -> MapState:
    """Apply a Sim3 gauge change S = (s, R, t): world' = S(world).

    Keyframe poses become T_cw' = [R_cw R^T, (t_cw - R_cw R^T t / s) ... ]
    — derived from T_cw' = se3_of( T_cw.to_sim3() o S^-1 ): rotation
    R_cw R^T, translation (t_cw - R_cw R^T t)/s after rescaling, landmark
    positions X' = s R X + t.  (The reference's MapMerger correction loop,
    cslam/src/MapMerger.cpp:349-395.)"""
    kfs, mps = m.kfs, m.mps
    # S^-1 = (1/s, R^T, -R^T t / s)
    Rt = R.T
    # T_cw o S^-1 as Sim3: scale 1/s, rotation R_cw R^T,
    # translation R_cw(-R^T t / s) + t_cw; to SE3: [Rot, trans * s]
    new_R = kfs.R_cw @ Rt
    trans_sim = (kfs.R_cw @ (-(Rt @ t) / s)) + kfs.t_cw  # [K,3]
    new_t = trans_sim * s
    pos2 = s * (mps.pos @ R.T) + t
    return m.replace(
        kfs=kfs.replace(R_cw=new_R, t_cw=new_t, pose_version=kfs.pose_version + 1),
        mps=mps.replace(pos=pos2, pos_version=mps.pos_version + 1),
    )


def compaction_remap(m: MapState):
    """The old->new arena index mapping that compact_map would apply
    (numpy arrays; -1 = dropped).  Lets callers remap external id tables."""
    kf_keep = np.asarray(m.kfs.valid & ~m.kfs.bad)
    mp_keep = np.asarray(m.mps.valid & ~m.mps.bad & (m.mps.obs_n > 0))
    kf_map = np.full(kf_keep.shape[0], -1, np.int64)
    kf_map[kf_keep] = np.arange(kf_keep.sum())
    mp_map = np.full(mp_keep.shape[0], -1, np.int64)
    mp_map[mp_keep] = np.arange(mp_keep.sum())
    return kf_map, mp_map


def merge_maps(m_into: MapState, m_from: MapState, s, R, t) -> MapState:
    """Union-map construction (Map merge-ctor, cslam/src/Map.cpp:70-172):
    append ``m_from``'s entities into ``m_into``'s arenas, transforming them
    by the Sim3 (s, R, t) that maps m_from's world into m_into's world.

    Both maps should be compacted first; the result reuses m_into's capacity
    (must fit both).  Returns the fused MapState; m_from keyframe arena index
    i becomes ``m_into.next_kf + i``, landmarks likewise.
    """
    a = m_into
    b = transform_map(compact_map(m_from), s, R, t)
    K, M = a.kfs.capacity, a.mps.capacity
    nk = a.next_kf
    nm = a.next_mp

    def splice(dst, src, cursor, n_src_cap):
        """Write src[0:cap] into dst starting at cursor (masked by validity)."""
        idx = cursor + jnp.arange(n_src_cap)
        idx_c = jnp.clip(idx, 0, dst.shape[0] - 1)
        keep = idx < dst.shape[0]
        cur = dst[idx_c]
        val = src[: n_src_cap]
        sel = keep.reshape((n_src_cap,) + (1,) * (val.ndim - 1))
        return dst.at[idx_c].set(jnp.where(sel, val, cur))

    # remap b's cross-indices by the offsets
    bk = b.kfs
    bm = b.mps
    def off_kf(x):
        return jnp.where(x >= 0, x + nk, x)

    def off_mp(x):
        return jnp.where(x >= 0, x + nm, x)

    bk = bk.replace(
        mp_idx=off_mp(bk.mp_idx), parent=off_kf(bk.parent),
        loop_edges=off_kf(bk.loop_edges),
        insert_order=jnp.where(bk.valid, bk.insert_order + a.insert_counter, bk.insert_order),
    )
    bm = bm.replace(obs_kf=off_kf(bm.obs_kf), ref_kf=off_kf(bm.ref_kf))

    kfs = a.kfs
    for f in kfs.__dataclass_fields__:
        kfs = kfs.replace(**{f: splice(getattr(kfs, f), getattr(bk, f), nk, b.kfs.capacity)})
    mps = a.mps
    for f in mps.__dataclass_fields__:
        mps = mps.replace(**{f: splice(getattr(mps, f), getattr(bm, f), nm, b.mps.capacity)})

    return a.replace(
        kfs=kfs,
        mps=mps,
        next_kf=nk + b.next_kf,
        next_mp=nm + b.next_mp,
        insert_counter=a.insert_counter + b.insert_counter,
    )


def compact_observations(m: MapState) -> MapState:
    """Left-pack each landmark's reverse-obs slots (after erasures)."""
    mps = m.mps
    O = mps.max_obs
    alive = mps.obs_kf >= 0
    order = jnp.argsort(~alive, axis=1, stable=True)  # alive slots first
    obs_kf = jnp.take_along_axis(mps.obs_kf, order, axis=1)
    obs_feat = jnp.take_along_axis(mps.obs_feat, order, axis=1)
    obs_n = jnp.sum(alive.astype(jnp.int32), axis=1)
    return m.replace(mps=mps.replace(obs_kf=obs_kf, obs_feat=obs_feat, obs_n=obs_n))


def check_structure(m: MapState) -> list:
    """Deep structural validation — the reference's ``Map::CheckStructure``
    (cslam/src/Map.cpp:1672-1800, compiled under DEBUGGING2) as a host-side
    diagnostic.  Returns a list of human-readable violations (empty = OK).

    Checks the invariants that have caused real bugs (CLAUDE.md):
      * forward links (kfs.mp_idx) and the reverse obs tables agree;
      * obs_n counts match the populated obs slots and never exceed the cap;
      * alive landmarks have an alive reference keyframe;
      * keyframe ids are unique per client among alive keyframes;
      * arena fill counters bound the valid flags.
    """
    errs = []
    kfs, mps = m.kfs, m.mps
    K, M, N, O = kfs.capacity, mps.capacity, kfs.n_feat, mps.max_obs
    kf_alive = np.asarray(kfs.valid & ~kfs.bad)
    mp_alive = np.asarray(mps.valid & ~mps.bad)
    mp_idx = np.asarray(kfs.mp_idx)
    obs_kf = np.asarray(mps.obs_kf)
    obs_feat = np.asarray(mps.obs_feat)
    obs_n = np.asarray(mps.obs_n)
    feat_valid = np.asarray(kfs.feat_valid)

    if kf_alive[int(m.next_kf):].any():
        errs.append("valid keyframe beyond next_kf fill counter")
    if mp_alive[int(m.next_mp):].any():
        errs.append("valid landmark beyond next_mp fill counter")

    # id uniqueness per client
    ids = np.asarray(kfs.kf_id)[kf_alive]
    cids = np.asarray(kfs.client_id)[kf_alive]
    pairs = list(zip(cids.tolist(), ids.tolist()))
    if len(pairs) != len(set(pairs)):
        errs.append("duplicate (client_id, kf_id) among alive keyframes")

    # reverse table: each populated slot names an alive KF whose forward
    # link points back at this landmark
    for p in np.where(mp_alive)[0]:
        n = int(obs_n[p])
        if n > O:
            errs.append(f"mp {p}: obs_n {n} > capacity {O}")
            continue
        for s in range(n):
            k, f = int(obs_kf[p, s]), int(obs_feat[p, s])
            if k < 0 or k >= K or not kf_alive[k]:
                errs.append(f"mp {p} obs slot {s}: dead/invalid keyframe {k}")
            elif f < 0 or f >= N or not feat_valid[k, f]:
                errs.append(f"mp {p} obs slot {s}: invalid feature {f} of kf {k}")
            elif mp_idx[k, f] != p:
                errs.append(
                    f"mp {p} obs slot {s}: kf {k} feat {f} forward link is "
                    f"{int(mp_idx[k, f])} (reverse/forward mismatch)"
                )
        if (obs_kf[p, n:O] != int(NO_KF)).any():
            errs.append(f"mp {p}: populated obs slot beyond obs_n={n}")

    # forward links point at alive landmarks; over-cap forward links (not
    # present in the reverse table) violate the both-sides discipline
    for k in np.where(kf_alive)[0]:
        row = mp_idx[k]
        for f in np.where(row >= 0)[0]:
            p = int(row[f])
            if p >= M or not mp_alive[p]:
                errs.append(f"kf {k} feat {f}: forward link to dead landmark {p}")
                continue
            n = int(obs_n[p])
            hit = ((obs_kf[p, :n] == k) & (obs_feat[p, :n] == f)).any()
            if not hit:
                errs.append(
                    f"kf {k} feat {f} -> mp {p}: forward link missing from "
                    "the reverse table"
                )

    # alive landmarks reference an alive keyframe
    ref = np.asarray(mps.ref_kf)
    for p in np.where(mp_alive)[0]:
        r = int(ref[p])
        if r < 0 or r >= K or not kf_alive[r]:
            errs.append(f"mp {p}: reference keyframe {r} dead/invalid")

    return errs
