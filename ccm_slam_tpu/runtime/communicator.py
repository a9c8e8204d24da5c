"""Client<->server map synchronization: delta messages, acks, relative encoding.

TPU-native re-design of ``Communicator`` + the ``ccmslam_msgs`` wire schema
(cslam/src/Communicator.cpp, cslam_msgs/msg/*.msg, SURVEY §2.5/§5.8):

* unit of exchange = one ``MapMsg`` pytree per cycle: a fixed-capacity batch
  of keyframes (full or pose-update-only ~ KF/KFred), landmarks (MP/MPred),
  ack id arrays and weak acks;
* keyframe poses are encoded RELATIVE to their predecessor (and parent)
  keyframe — gauge-robust: the server reconstructs against ITS OWN copy of
  the predecessor, applying the client->server-map Sim3 scale to the
  translation (KeyFrame.cpp:1334-1366);
* landmark positions are encoded in their reference keyframe's camera frame
  (MapPoint.cpp:1012-1055);
* reliability: per-entity sent/acked state machines; entities may only be
  trimmed from the client map once sent AND acked (CanBeForgotten,
  KeyFrame.cpp:1964-1974); un-decodable receptions trigger weak acks that
  force a full resend (SetWeakAck/SetSendFull semantics).

The transport itself is a plain Python queue here (single-process
deterministic testing — the Disturber concept); the multi-host runtime moves
these same pytrees over jax device-to-host streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import map_store as ms
from ..utils.lie import SE3


@struct.dataclass
class KFMsgBatch:
    valid: jnp.ndarray      # [B]
    full: jnp.ndarray       # [B] full message vs pose-update-only (KFred)
    kf_id: jnp.ndarray      # [B]
    client_id: jnp.ndarray  # [B]
    timestamp: jnp.ndarray  # [B]
    # pose of this KF relative to its predecessor: T_c_pred = T_cw o T_predw^-1
    R_cpred: jnp.ndarray    # [B,3,3]
    t_cpred: jnp.ndarray    # [B,3]
    pred_kf_id: jnp.ndarray  # [B] (-1: none -> absolute pose in R_cpred)
    # parent-reference alternative (KF.msg:32 mTcpar): lets the receiver
    # reconstruct through the spanning-tree parent when the predecessor
    # never arrives (KeyFrame.cpp:1857-1948 fallback chain)
    R_cpar: jnp.ndarray     # [B,3,3]
    t_cpar: jnp.ndarray     # [B,3]
    par_kf_id: jnp.ndarray  # [B] (-1: none)
    # features (full only)
    xy: jnp.ndarray         # [B,N,2]
    desc: jnp.ndarray       # [B,N,32]
    octave: jnp.ndarray     # [B,N]
    angle: jnp.ndarray      # [B,N]
    feat_valid: jnp.ndarray  # [B,N]
    mp_assoc_id: jnp.ndarray  # [B,N] landmark per-agent ids (-1 none)


@struct.dataclass
class MPMsgBatch:
    valid: jnp.ndarray      # [B]
    full: jnp.ndarray       # [B]
    mp_id: jnp.ndarray      # [B]
    client_id: jnp.ndarray  # [B]
    pos_ref: jnp.ndarray    # [B,3] position in the reference KF's camera frame
    ref_kf_id: jnp.ndarray  # [B]
    ref_client_id: jnp.ndarray  # [B] owner of the reference KF
    desc: jnp.ndarray       # [B,32]
    normal_ref: jnp.ndarray  # [B,3] normal in ref KF camera frame
    min_dist: jnp.ndarray   # [B]
    max_dist: jnp.ndarray   # [B]
    # observations (MP.msg's 3 parallel arrays): which client keyframes see
    # this landmark at which feature slot
    obs_kf_id: jnp.ndarray  # [B,O]
    obs_feat: jnp.ndarray   # [B,O]
    obs_valid: jnp.ndarray  # [B,O]


@dataclass
class MapMsg:
    kfs: KFMsgBatch
    mps: MPMsgBatch
    ack_kf_ids: np.ndarray
    ack_mp_ids: np.ndarray
    weak_ack_kf_id: int = -1
    weak_ack_mp_id: int = -1
    closest_kf_id: int = -1
    msg_id: int = 0

    @property
    def empty(self) -> bool:
        return (
            not bool(jnp.any(self.kfs.valid))
            and not bool(jnp.any(self.mps.valid))
        )


# MapMsg travels across process boundaries (native TCP transport): register
# it as a pytree so generic leaf conversion (device->host before pickling)
# descends into it.
jax.tree_util.register_pytree_node(
    MapMsg,
    lambda m: (
        (m.kfs, m.mps, m.ack_kf_ids, m.ack_mp_ids),
        (m.weak_ack_kf_id, m.weak_ack_mp_id, m.closest_kf_id, m.msg_id),
    ),
    lambda aux, ch: MapMsg(ch[0], ch[1], ch[2], ch[3], *aux),
)


@dataclass
class ClientCommState:
    """Per-entity send state machine, arena-aligned (client side)."""

    kf_sent: np.ndarray          # version sent so far (-1 = never)
    kf_acked: np.ndarray         # bool
    mp_sent: np.ndarray
    mp_acked: np.ndarray
    kf_sent_msg: np.ndarray      # msg counter of the last send (retry timer)
    mp_sent_msg: np.ndarray
    # entities that arrived FROM the server (vicinity feedback) — never
    # re-sent (mbFromServer, Map.cpp:236-240) and immediately forgettable
    kf_from_server: np.ndarray = None
    mp_from_server: np.ndarray = None
    msg_counter: int = 0
    resend_after: int = 3        # unacked entities go out again (full) after
                                 # this many publish cycles

    @classmethod
    def create(cls, kf_cap: int, mp_cap: int):
        return cls(
            kf_sent=np.full(kf_cap, -1, np.int64),
            kf_acked=np.zeros(kf_cap, bool),
            mp_sent=np.full(mp_cap, -1, np.int64),
            mp_acked=np.zeros(mp_cap, bool),
            kf_sent_msg=np.full(kf_cap, -1, np.int64),
            mp_sent_msg=np.full(mp_cap, -1, np.int64),
            kf_from_server=np.zeros(kf_cap, bool),
            mp_from_server=np.zeros(mp_cap, bool),
        )


def _relative_pose(m: ms.MapState, k, pred):
    """T_c_pred = T_cw o T_predw^-1 for arena indices k, pred (pred may be -1
    -> absolute)."""
    T_c = SE3(R=m.kfs.R_cw[k], t=m.kfs.t_cw[k])
    has = pred >= 0
    p = jnp.clip(pred, 0, m.kfs.capacity - 1)
    T_p = SE3(R=m.kfs.R_cw[p], t=m.kfs.t_cw[p])
    T_rel = T_c.compose(T_p.inverse())
    R = jnp.where(has[..., None, None], T_rel.R, T_c.R)
    t = jnp.where(has[..., None], T_rel.t, T_c.t)
    return R, t


def publish_client(
    m: ms.MapState,
    st: ClientCommState,
    client_id: int,
    max_kfs: int,
    max_mps: int,
    current_kf_id: int = -1,
) -> tuple[MapMsg, ClientCommState]:
    """Drain the out-state into one MapMsg (PublishMapClient,
    Communicator.cpp:484-634): full messages for never-sent entities,
    pose/position updates for moved ones, bounded per cycle."""
    kfs, mps = m.kfs, m.mps
    K, M, N = kfs.capacity, mps.capacity, kfs.n_feat

    # never re-send entities that came FROM the server (vicinity feedback):
    # foreign client id, or own-id entities re-delivered by the server after
    # a local trim (mbFromServer, Map.cpp:236-240)
    own_kf = np.asarray(kfs.client_id) == client_id
    own_mp = np.asarray(mps.client_id) == client_id
    if st.kf_from_server is not None:
        own_kf = own_kf & ~st.kf_from_server
        own_mp = own_mp & ~st.mp_from_server
    alive_kf = np.asarray(kfs.valid & ~kfs.bad) & own_kf
    ver_kf = np.asarray(kfs.pose_version)
    timeout_kf = (
        (st.kf_sent >= 0)
        & ~st.kf_acked
        & (st.msg_counter - st.kf_sent_msg >= st.resend_after)
    )
    need_full_kf = alive_kf & ((st.kf_sent < 0) | timeout_kf)
    need_upd_kf = alive_kf & ~need_full_kf & (st.kf_sent >= 0) & (ver_kf > st.kf_sent)
    # oldest-first by kf id (the reference sends in id order)
    ids_np = np.asarray(kfs.kf_id)
    order = np.argsort(ids_np)
    sel_kf = [k for k in order if need_full_kf[k] or need_upd_kf[k]][:max_kfs]

    alive_mp = np.asarray(mps.valid & ~mps.bad) & own_mp
    ver_mp = np.asarray(mps.pos_version)
    timeout_mp = (
        (st.mp_sent >= 0)
        & ~st.mp_acked
        & (st.msg_counter - st.mp_sent_msg >= st.resend_after)
    )
    need_full_mp = alive_mp & ((st.mp_sent < 0) | timeout_mp)
    need_upd_mp = alive_mp & ~need_full_mp & (st.mp_sent >= 0) & (ver_mp > st.mp_sent)
    sel_mp = np.where(need_full_mp | need_upd_mp)[0][:max_mps]

    B_kf = max_kfs
    B_mp = max_mps
    kf_idx = np.full(B_kf, 0, np.int64)
    kf_valid = np.zeros(B_kf, bool)
    kf_full = np.zeros(B_kf, bool)
    for i, k in enumerate(sel_kf):
        kf_idx[i] = k
        kf_valid[i] = True
        kf_full[i] = bool(need_full_kf[k])
    mp_idx = np.full(B_mp, 0, np.int64)
    mp_valid = np.zeros(B_mp, bool)
    mp_full = np.zeros(B_mp, bool)
    for i, p in enumerate(sel_mp):
        mp_idx[i] = p
        mp_valid[i] = True
        mp_full[i] = bool(need_full_mp[p])

    kf_idx_j = jnp.asarray(kf_idx)
    mp_idx_j = jnp.asarray(mp_idx)

    # predecessor = OWN alive KF with the largest id smaller than ours (the
    # server resolves pred_kf_id through this agent's id table — a foreign
    # vicinity KF's id would resolve to the wrong entity)
    ids = jnp.asarray(ids_np)
    alive_j = kfs.valid & ~kfs.bad & (kfs.client_id == client_id)
    own = ids[kf_idx_j]
    smaller = (ids[None, :] < own[:, None]) & alive_j[None, :]
    pred_arena = jnp.argmax(jnp.where(smaller, ids[None, :], -1), axis=1)
    has_pred = jnp.any(smaller, axis=1)
    pred_arena = jnp.where(has_pred, pred_arena, -1)
    R_rel, t_rel = _relative_pose(m, kf_idx_j, pred_arena)
    pred_id = jnp.where(has_pred, ids[jnp.clip(pred_arena, 0, K - 1)], -1)
    # parent alternative (mTcpar): spanning-tree parent, only when it has a
    # smaller id than ours (the receiver's chains must stay acyclic) and is
    # not the predecessor itself.  The tree is derived from covisibility at
    # publish time (client arenas are small; the reference maintains it
    # incrementally under locks, KeyFrame.cpp:715-741)
    parent_derived = ms.spanning_tree(m, ms.covisibility_matrix(m))
    par_arena = jnp.where(kfs.parent >= 0, kfs.parent, parent_derived)[kf_idx_j]
    # foreign (server-fed) keyframes may never be parents on the wire: the
    # receiver resolves par_kf_id through the agent's OWN id table
    # (KeyFrame.cpp:718-723 excludes server KFs as spanning parents)
    par_own = kfs.client_id[jnp.clip(par_arena, 0, K - 1)] == client_id
    par_ok = (
        (par_arena >= 0)
        & par_own
        & alive_j[jnp.clip(par_arena, 0, K - 1)]
        & (ids[jnp.clip(par_arena, 0, K - 1)] < own)
        & (par_arena != pred_arena)
    )
    par_arena = jnp.where(par_ok, par_arena, -1)
    R_par, t_par = _relative_pose(m, kf_idx_j, par_arena)
    par_id = jnp.where(par_ok, ids[jnp.clip(par_arena, 0, K - 1)], -1)

    # landmark ids for associations
    assoc = kfs.mp_idx[kf_idx_j]  # [B,N]
    assoc_safe = jnp.clip(assoc, 0, M - 1)
    assoc_id = jnp.where(assoc >= 0, mps.mp_id[assoc_safe], -1)

    kf_batch = KFMsgBatch(
        valid=jnp.asarray(kf_valid),
        full=jnp.asarray(kf_full),
        kf_id=ids[kf_idx_j],
        client_id=jnp.full((B_kf,), client_id, jnp.int32),
        timestamp=kfs.timestamp[kf_idx_j],
        R_cpred=R_rel,
        t_cpred=t_rel,
        pred_kf_id=pred_id,
        R_cpar=R_par,
        t_cpar=t_par,
        par_kf_id=par_id,
        xy=kfs.xy[kf_idx_j],
        desc=kfs.desc[kf_idx_j],
        octave=kfs.octave[kf_idx_j],
        angle=kfs.angle[kf_idx_j],
        feat_valid=kfs.feat_valid[kf_idx_j],
        mp_assoc_id=assoc_id,
    )

    # landmark relative encoding: camera frame of the reference keyframe
    ref = jnp.clip(mps.ref_kf[mp_idx_j], 0, K - 1)
    T_ref = SE3(R=kfs.R_cw[ref], t=kfs.t_cw[ref])
    pos_ref = T_ref.apply(mps.pos[mp_idx_j])
    nrm_ref = jnp.einsum("bij,bj->bi", T_ref.R, mps.normal[mp_idx_j])
    # observations: reverse-obs slots translated to client kf ids
    O = mps.max_obs
    obs_kf = mps.obs_kf[mp_idx_j]  # [B,O] arena idx
    obs_ok = (jnp.arange(O)[None, :] < mps.obs_n[mp_idx_j][:, None]) & (obs_kf >= 0)
    obs_kf_safe = jnp.clip(obs_kf, 0, K - 1)
    mp_batch = MPMsgBatch(
        valid=jnp.asarray(mp_valid),
        full=jnp.asarray(mp_full),
        mp_id=mps.mp_id[mp_idx_j],
        client_id=jnp.full((B_mp,), client_id, jnp.int32),
        pos_ref=pos_ref,
        ref_kf_id=kfs.kf_id[ref],
        ref_client_id=jnp.full((B_mp,), client_id, jnp.int32),
        desc=mps.desc[mp_idx_j],
        normal_ref=nrm_ref,
        min_dist=mps.min_dist[mp_idx_j],
        max_dist=mps.max_dist[mp_idx_j],
        obs_kf_id=jnp.where(obs_ok, kfs.kf_id[obs_kf_safe], -1),
        obs_feat=mps.obs_feat[mp_idx_j],
        obs_valid=obs_ok,
    )

    # update the send state
    st.kf_sent = st.kf_sent.copy()
    st.mp_sent = st.mp_sent.copy()
    st.kf_sent_msg = st.kf_sent_msg.copy()
    st.mp_sent_msg = st.mp_sent_msg.copy()
    for k in sel_kf:
        st.kf_sent[k] = ver_kf[k]
        st.kf_sent_msg[k] = st.msg_counter
    for p in sel_mp:
        st.mp_sent[p] = ver_mp[p]
        st.mp_sent_msg[p] = st.msg_counter
    st.msg_counter += 1
    return (
        MapMsg(
            kfs=kf_batch,
            mps=mp_batch,
            ack_kf_ids=np.zeros(0, np.int64),
            ack_mp_ids=np.zeros(0, np.int64),
            closest_kf_id=current_kf_id,
            msg_id=st.msg_counter,
        ),
        st,
    )


def apply_server_acks(st: ClientCommState, m: ms.MapState, msg: MapMsg) -> ClientCommState:
    """Mark entities acked (MapCbClient ack processing, :228-260); weak acks
    force a future full resend (SetSendFull)."""
    ids_kf = np.asarray(m.kfs.kf_id)
    ids_mp = np.asarray(m.mps.mp_id)
    st.kf_acked = st.kf_acked.copy()
    st.mp_acked = st.mp_acked.copy()
    for a in msg.ack_kf_ids:
        hits = np.where(ids_kf == a)[0]
        if len(hits):
            st.kf_acked[hits[0]] = True
    for a in msg.ack_mp_ids:
        hits = np.where(ids_mp == a)[0]
        if len(hits):
            st.mp_acked[hits[0]] = True
    if msg.weak_ack_kf_id >= 0:
        st.kf_sent = st.kf_sent.copy()
        resend = (ids_kf <= msg.weak_ack_kf_id) & ~st.kf_acked
        st.kf_sent[resend] = -1
    if msg.weak_ack_mp_id >= 0:
        st.mp_sent = st.mp_sent.copy()
        resend = (ids_mp <= msg.weak_ack_mp_id) & ~st.mp_acked
        st.mp_sent[resend] = -1
    return st


def trimmable_mask(m: ms.MapState, st: ClientCommState) -> jnp.ndarray:
    """CanBeForgotten: sent at least once AND acked (KeyFrame.cpp:1964);
    server-fed vicinity entities are forgettable immediately (the client
    never owes them to anyone — Communicator.cpp:136-148 culls them)."""
    ok = (st.kf_sent >= 0) & st.kf_acked
    if st.kf_from_server is not None:
        ok = ok | st.kf_from_server
    return jnp.asarray(ok)


def remap_client_state(st: ClientCommState, kf_remap, mp_remap) -> ClientCommState:
    """Fix the arena-aligned send state after a client map compaction
    (``ms.compact_map`` permutes arena slots; ``ms.compaction_remap`` gives
    old->new).  Dropped entities' state is discarded; fresh slots start
    never-sent."""
    kf_remap = np.asarray(kf_remap)
    mp_remap = np.asarray(mp_remap)
    new = ClientCommState.create(st.kf_sent.shape[0], st.mp_sent.shape[0])
    new.msg_counter = st.msg_counter
    new.resend_after = st.resend_after
    ksrc = np.where(kf_remap >= 0)[0]
    new.kf_sent[kf_remap[ksrc]] = st.kf_sent[ksrc]
    new.kf_acked[kf_remap[ksrc]] = st.kf_acked[ksrc]
    new.kf_sent_msg[kf_remap[ksrc]] = st.kf_sent_msg[ksrc]
    msrc = np.where(mp_remap >= 0)[0]
    new.mp_sent[mp_remap[msrc]] = st.mp_sent[msrc]
    new.mp_acked[mp_remap[msrc]] = st.mp_acked[msrc]
    new.mp_sent_msg[mp_remap[msrc]] = st.mp_sent_msg[msrc]
    if st.kf_from_server is not None:
        new.kf_from_server[kf_remap[ksrc]] = st.kf_from_server[ksrc]
        new.mp_from_server[mp_remap[msrc]] = st.mp_from_server[msrc]
    return new


def ingest_server_map(
    m: ms.MapState,
    msg: MapMsg,
    own_client_id: int,
    foreign_kf_table: dict,
    foreign_mp_table: dict,
    comm_state: ClientCommState = None,
):
    """Client-side ingestion of server vicinity feedback — batched
    (ProcessKfInClient/ProcessMpInClient, Communicator.cpp:730-1026):
    foreign keyframes/landmarks enter the client map with their original
    client ids (they are never re-sent and never become spanning parents).
    Entities carrying the agent's OWN client id are resolved against the
    live arena by kf/mp id: known ones become pose/position updates (the
    server handing back loop-corrected poses), trimmed-away ones are
    re-instantiated and flagged from-server so they are never re-sent.

    Vicinity poses arrive absolute in the client gauge (pred_id == -1), so
    unlike the server side no chain resolution is needed: known entities are
    pose/position-updated with one scatter, unknown ones are allocated with
    one ``ms.add_keyframes``/``ms.add_mappoints`` call.

    foreign_*_table: {(client_id, id) -> arena idx}, updated in place.
    ``comm_state`` (optional, updated in place): new arenas are marked
    from-server; own pose updates are recorded as already-synced so the
    server's own correction does not echo back as a client pose update.
    Returns the updated map."""
    kfb = msg.kfs
    Bk = int(kfb.valid.shape[0])
    K, M = m.kfs.capacity, m.mps.capacity

    own_kf_alive = np.asarray(m.kfs.valid & ~m.kfs.bad) & (
        np.asarray(m.kfs.client_id) == own_client_id
    )
    own_kf_ids = np.asarray(m.kfs.kf_id)
    own_kf_lookup = {
        int(own_kf_ids[k]): int(k) for k in np.where(own_kf_alive)[0]
    }

    def _kf_arena(c, i):
        if int(c) == own_client_id:
            hit = own_kf_lookup.get(int(i), -1)
            if hit >= 0:
                return hit
        return foreign_kf_table.get((int(c), int(i)), -1)

    if Bk:
        valid = np.asarray(kfb.valid)
        cids = np.asarray(kfb.client_id)
        ids = np.asarray(kfb.kf_id)
        known = np.array(
            [_kf_arena(c, i) for c, i in zip(cids, ids)],
            np.int32,
        )
        full = np.asarray(kfb.full)
        is_upd = valid & (known >= 0)
        room = int(m.next_kf) + np.cumsum((valid & (known < 0) & full).astype(np.int64)) <= K - 1
        is_new = valid & (known < 0) & full & room
        # associations: landmark ids -> arena (foreign table, plus the live
        # arena for own-id landmarks on re-instated own keyframes)
        assoc_ids = np.asarray(kfb.mp_assoc_id)
        assoc = np.full(assoc_ids.shape, -1, np.int32)
        if is_new.any():
            own_mp_alive0 = np.asarray(m.mps.valid & ~m.mps.bad) & (
                np.asarray(m.mps.client_id) == own_client_id
            )
            own_mp_ids0 = np.asarray(m.mps.mp_id)
            own_mp_lookup0 = {
                int(own_mp_ids0[p]): int(p) for p in np.where(own_mp_alive0)[0]
            }
            for b in np.where(is_new)[0]:
                cid = int(cids[b])
                for j, mid in enumerate(assoc_ids[b]):
                    if mid >= 0:
                        hit = (own_mp_lookup0.get(int(mid), -1)
                               if cid == own_client_id else -1)
                        if hit < 0:
                            hit = foreign_mp_table.get((cid, int(mid)), -1)
                        assoc[b, j] = hit
        # one scatter for pose updates
        ui = np.where(is_upd, known, K - 1)
        upd_j = jnp.asarray(is_upd)
        uij = jnp.asarray(ui)
        kfs = m.kfs
        kfs = kfs.replace(
            R_cw=kfs.R_cw.at[uij].add(
                jnp.where(upd_j[:, None, None], kfb.R_cpred - kfs.R_cw[uij], 0.0)
            ),
            t_cw=kfs.t_cw.at[uij].add(
                jnp.where(upd_j[:, None], kfb.t_cpred - kfs.t_cw[uij], 0.0)
            ),
            pose_version=kfs.pose_version.at[uij].add(jnp.where(upd_j, 1, 0)),
        )
        m = m.replace(kfs=kfs)
        # one batched allocation for the new keyframes
        m, arenas = ms.add_keyframes(
            m, kfb.kf_id, kfb.client_id, kfb.timestamp,
            kfb.R_cpred, kfb.t_cpred,
            kfb.xy, kfb.desc, kfb.octave, kfb.angle, kfb.feat_valid,
            jnp.asarray(assoc), jnp.asarray(is_new),
        )
        arenas = np.asarray(arenas)
        for b in np.where(is_new)[0]:
            foreign_kf_table[(int(cids[b]), int(ids[b]))] = int(arenas[b])
        if comm_state is not None:
            comm_state.kf_from_server[arenas[is_new]] = True
            # own pose updates came FROM the server: record them as synced
            # (no echo back); read the post-update versions in one transfer
            own_upd = is_upd & (cids == own_client_id)
            if own_upd.any():
                vers = np.asarray(m.kfs.pose_version)[known[own_upd]]
                comm_state.kf_sent[known[own_upd]] = np.maximum(
                    comm_state.kf_sent[known[own_upd]], vers
                )

    mpb = msg.mps
    Bm = int(mpb.valid.shape[0])
    if Bm:
        valid = np.asarray(mpb.valid)
        cids = np.asarray(mpb.client_id)
        ids = np.asarray(mpb.mp_id)
        own_mp_alive = np.asarray(m.mps.valid & ~m.mps.bad) & (
            np.asarray(m.mps.client_id) == own_client_id
        )
        own_mp_ids = np.asarray(m.mps.mp_id)
        own_mp_lookup = {
            int(own_mp_ids[p]): int(p) for p in np.where(own_mp_alive)[0]
        }

        def _mp_arena(c, i):
            if int(c) == own_client_id:
                hit = own_mp_lookup.get(int(i), -1)
                if hit >= 0:
                    return hit
            return foreign_mp_table.get((int(c), int(i)), -1)

        known = np.array(
            [_mp_arena(c, i) for c, i in zip(cids, ids)],
            np.int32,
        )
        ref_arena = np.array(
            [
                _kf_arena(rc, ri)
                for rc, ri in zip(np.asarray(mpb.ref_client_id), np.asarray(mpb.ref_kf_id))
            ],
            np.int32,
        )
        ref_ok = ref_arena >= 0
        is_upd = valid & (known >= 0) & ref_ok
        room = int(m.next_mp) + np.cumsum((valid & (known < 0) & ref_ok).astype(np.int64)) <= M - 2
        is_new = valid & (known < 0) & ref_ok & room
        ra = jnp.asarray(np.where(ref_ok, ref_arena, 0))
        T_ref = SE3(R=m.kfs.R_cw[ra], t=m.kfs.t_cw[ra])
        pos_w = T_ref.inverse().apply(mpb.pos_ref)
        normal_w = jnp.einsum("bji,bj->bi", T_ref.R, mpb.normal_ref)
        ui = np.where(is_upd, known, M - 1)
        uij = jnp.asarray(ui)
        upd_j = jnp.asarray(is_upd)
        mps = m.mps
        mps = mps.replace(
            pos=mps.pos.at[uij].add(jnp.where(upd_j[:, None], pos_w - mps.pos[uij], 0.0)),
            pos_version=mps.pos_version.at[uij].add(jnp.where(upd_j, 1, 0)),
        )
        m = m.replace(mps=mps)
        m, arenas = ms.add_mappoints(
            m,
            n_new=jnp.sum(jnp.asarray(is_new)),
            pos=pos_w,
            desc=mpb.desc,
            normal=normal_w,
            min_dist=mpb.min_dist,
            max_dist=mpb.max_dist,
            ref_kf=ra.astype(jnp.int32),
            mp_ids=mpb.mp_id,
            client_id=mpb.client_id,
            new_valid=jnp.asarray(is_new),
        )
        arenas = np.asarray(arenas)
        for b in np.where(is_new)[0]:
            foreign_mp_table[(int(cids[b]), int(ids[b]))] = int(arenas[b])
        if comm_state is not None:
            comm_state.mp_from_server[arenas[is_new]] = True
            own_upd = is_upd & (cids == own_client_id)
            if own_upd.any():
                vers = np.asarray(m.mps.pos_version)[known[own_upd]]
                comm_state.mp_sent[known[own_upd]] = np.maximum(
                    comm_state.mp_sent[known[own_upd]], vers
                )
    return m
