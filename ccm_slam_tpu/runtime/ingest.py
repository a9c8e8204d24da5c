"""Batched, jit-compiled message ingestion (server and client side).

TPU-native replacement for the reference's per-entity ingest loops
(``Communicator::ProcessKfInServer``/``ProcessMpInServer``,
cslam/src/Communicator.cpp:815-1139): one compiled program consumes a whole
``MapMsg`` batch — the reference's per-cycle budget is 400 KFs + 12k MPs
(cslam/conf/config.yaml:99-100); here the entire batch lands in a handful of
device ops.

Design:

* **Dense id->arena tables** ([kf_id_space]/[mp_id_space] int32, -1 =
  unknown) replace the host hash maps on the hot path; the host dicts are
  kept in sync for the (rare) host-side orchestration that needs them.
* **Keyframes**: a ``lax.scan`` in kf-id order — predecessor chains inside a
  batch resolve in one pass because a predecessor always has a smaller id
  (the reference sorts its in-buffer the same way).  Per item the scan
  either (a) pose-updates a known KF, (b) allocates a new arena slot via
  ``ms.add_keyframe`` under ``lax.cond``, (c) marks it pending (predecessor
  AND parent both missing, KeyFrame.cpp:1857-1948 fallback order), or
  (d) flags a weak ack (update for an unknown KF).
* **Landmarks**: fully vectorized — no per-item loop.  Reference-KF lookup,
  Sim3-scaled position reconstruction, duplicate-id dedup inside the batch,
  one ``ms.add_mappoints`` call for all new landmarks, and masked scatters
  for the forward links + reverse observation tables.
* Weak acks carry the highest processed id (SetWeakAckKF/MP,
  Communicator.cpp:1286-1300) — including for LANDMARKS, which the server
  must emit when an update references an unknown landmark.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..models import map_store as ms
from ..utils.lie import SE3, Sim3

NO_MP = ms.NO_MP
NO_KF = ms.NO_KF


@struct.dataclass
class IngestTables:
    """Per-agent device-resident id translation state."""

    kf_id2arena: jnp.ndarray   # [kf_id_space] int32 (-1 unknown)
    mp_id2arena: jnp.ndarray   # [mp_id_space] int32
    max_kf_id: jnp.ndarray     # scalar int32: highest ingested kf id (weak ack)
    max_mp_id: jnp.ndarray     # scalar int32


def empty_tables(kf_id_space: int = 1 << 16, mp_id_space: int = 1 << 20) -> IngestTables:
    return IngestTables(
        kf_id2arena=jnp.full((kf_id_space,), -1, jnp.int32),
        mp_id2arena=jnp.full((mp_id_space,), -1, jnp.int32),
        max_kf_id=jnp.int32(-1),
        max_mp_id=jnp.int32(-1),
    )


def tables_from_dicts(kf_table: dict, mp_table: dict,
                      kf_id_space: int = 1 << 16, mp_id_space: int = 1 << 20) -> IngestTables:
    """Rebuild device tables from the host dicts (after merges remap arenas)."""
    import numpy as np

    kf = np.full(kf_id_space, -1, np.int32)
    for i, a in kf_table.items():
        if 0 <= i < kf_id_space:
            kf[i] = a
    mp = np.full(mp_id_space, -1, np.int32)
    for i, a in mp_table.items():
        if 0 <= i < mp_id_space:
            mp[i] = a
    return IngestTables(
        kf_id2arena=jnp.asarray(kf),
        mp_id2arena=jnp.asarray(mp),
        max_kf_id=jnp.int32(max(kf_table.keys(), default=-1)),
        max_mp_id=jnp.int32(max(mp_table.keys(), default=-1)),
    )


def _lookup(table, idx):
    """table[idx] with -1 for out-of-range / negative ids."""
    ok = (idx >= 0) & (idx < table.shape[0])
    return jnp.where(ok, table[jnp.clip(idx, 0, table.shape[0] - 1)], -1)


def _server_ingest_core(m: ms.MapState, tab: IngestTables, kfb, mpb,
                        S_s, S_R, S_t, agent_id):
    """Ingest one (keyframe batch, landmark batch) into the server map.

    kfb: KFMsgBatch-shaped pytree [Bk]; mpb: MPMsgBatch-shaped pytree [Bm]
    (both may include re-queued pending items).  S_* = client->map Sim3.

    Returns (m', tab', out) where out carries per-item masks:
      kf_ack, kf_pend, new_kf_arena (=-1 unless newly allocated),
      mp_ack, mp_pend, weak_kf (scalar bool), weak_mp (scalar bool).
    """
    K = m.kfs.capacity
    M = m.mps.capacity
    N = m.kfs.n_feat
    S_inv = Sim3(s=S_s, R=S_R, t=S_t).inverse()

    # ---------------- keyframes -------------------------------------------
    # Two phases: (A) a SMALL id-ordered scan that only resolves the
    # pred/parent pose chains and assigns arena slots (carry = pose arrays +
    # id table, ~300 KB — carrying the whole map through a per-item
    # lax.cond copies tens of MB per step); (B) one vectorized masked
    # ``ms.add_keyframes`` that lands every payload field in single scatters.
    Bk = kfb.valid.shape[0]
    order = jnp.argsort(jnp.where(kfb.valid, kfb.kf_id, jnp.int32(2**30)))
    kfb = jax.tree.map(lambda x: x[order], kfb)

    small = jax.tree.map(
        lambda x: x,
        dict(valid=kfb.valid, full=kfb.full, kf_id=kfb.kf_id,
             pred_kf_id=kfb.pred_kf_id, par_kf_id=kfb.par_kf_id,
             R_cpred=kfb.R_cpred, t_cpred=kfb.t_cpred,
             R_cpar=kfb.R_cpar, t_cpar=kfb.t_cpar),
    )

    def kf_body(carry, item):
        R_all, t_all, pv_all, tkf, next_kf, weak = carry
        kf_id = item["kf_id"]
        known = _lookup(tkf, kf_id)
        # predecessor-first, parent-fallback reference resolution
        # (SetPoseFromMessage, KeyFrame.cpp:1857-1900)
        pred_arena = _lookup(tkf, item["pred_kf_id"])
        par_arena = _lookup(tkf, item["par_kf_id"])
        use_pred = (item["pred_kf_id"] >= 0) & (pred_arena >= 0)
        use_par = ~use_pred & (item["par_kf_id"] >= 0) & (par_arena >= 0)
        is_abs = (item["pred_kf_id"] < 0) & (item["par_kf_id"] < 0)
        ref_arena = jnp.where(use_pred, pred_arena, jnp.where(use_par, par_arena, 0))
        ra = jnp.clip(ref_arena, 0, K - 1)
        T_ref = SE3(R=R_all[ra], t=t_all[ra])
        R_rel = jnp.where(use_par, item["R_cpar"], item["R_cpred"])
        t_rel = jnp.where(use_par, item["t_cpar"], item["t_cpred"]) * S_s
        T_chain = SE3(R=R_rel, t=t_rel).compose(T_ref)
        # reference-less: absolute pose in the client gauge -> map gauge
        T_abs0 = (
            SE3(R=item["R_cpred"], t=item["t_cpred"]).to_sim3().compose(S_inv).to_se3_scaled()
        )
        resolved = use_pred | use_par | is_abs
        T_R = jnp.where(is_abs, T_abs0.R, T_chain.R)
        T_t = jnp.where(is_abs, T_abs0.t, T_chain.t)

        is_update = item["valid"] & (known >= 0)
        can_add = item["valid"] & (known < 0) & item["full"] & resolved & (next_kf < K - 1)
        pend = item["valid"] & (known < 0) & item["full"] & ~resolved
        weak_i = item["valid"] & (known < 0) & ~item["full"]  # update for unknown KF

        # write the resolved pose into the carry: at the known slot for
        # updates, at the freshly-assigned slot for adds (descendant chain
        # items must see it)
        k_new = jnp.where(can_add, next_kf, -1)
        wslot = jnp.where(is_update, jnp.clip(known, 0, K - 1),
                          jnp.where(can_add, next_kf, K - 1))
        w = is_update | can_add
        R_all = R_all.at[wslot].add(jnp.where(w, T_R - R_all[wslot], 0.0))
        t_all = t_all.at[wslot].add(jnp.where(w, T_t - t_all[wslot], 0.0))
        pv_all = pv_all.at[wslot].add(jnp.where(is_update, 1, 0))
        next_kf = next_kf + can_add.astype(next_kf.dtype)
        ti = jnp.clip(kf_id, 0, tkf.shape[0] - 1)
        tkf = tkf.at[ti].set(jnp.where(can_add, k_new, tkf[ti]))
        ack = is_update | can_add
        return (R_all, t_all, pv_all, tkf, next_kf, weak | weak_i), (
            ack, pend, k_new, can_add, T_R, T_t,
        )

    carry0 = (m.kfs.R_cw, m.kfs.t_cw, m.kfs.pose_version,
              tab.kf_id2arena, m.next_kf, jnp.bool_(False))
    (R_all, t_all, pv_all, tkf, _, weak_kf), (
        kf_ack, kf_pend, new_arena, can_add, T_R_b, T_t_b
    ) = jax.lax.scan(kf_body, carry0, small)
    m = m.replace(kfs=m.kfs.replace(R_cw=R_all, t_cw=t_all, pose_version=pv_all))

    # (B) vectorized payload landing for the added keyframes.  Slot order in
    # add_keyframes (next_kf + cumsum) matches the scan's assignment because
    # the batch is still id-sorted here.
    assoc_arena = _lookup(tab.mp_id2arena, kfb.mp_assoc_id)      # [B,N]
    aa = jnp.clip(assoc_arena, 0, M - 1)
    assoc_ok = (assoc_arena >= 0) & m.mps.valid[aa] & ~m.mps.bad[aa]
    assoc = jnp.where(assoc_ok & can_add[:, None], assoc_arena, NO_MP)
    m, arenas_b = ms.add_keyframes(
        m, kfb.kf_id, jnp.full((Bk,), agent_id, jnp.int32), kfb.timestamp,
        T_R_b, T_t_b, kfb.xy, kfb.desc, kfb.octave, kfb.angle, kfb.feat_valid,
        assoc, can_add,
    )

    # un-sort the outputs back to caller order
    inv = jnp.argsort(order)
    kf_ack, kf_pend, new_arena = kf_ack[inv], kf_pend[inv], new_arena[inv]
    kfb_orig = jax.tree.map(lambda x: x[inv], kfb)
    max_kf_id = jnp.maximum(tab.max_kf_id, jnp.max(jnp.where(kf_ack, kfb_orig.kf_id, -1), initial=-1))

    # ---------------- landmarks: fully vectorized -------------------------
    Bm = mpb.valid.shape[0]
    mp_id = mpb.mp_id
    # dedup within the batch: keep the FIRST occurrence of each id
    sort_i = jnp.argsort(jnp.where(mpb.valid, mp_id, jnp.int32(2**30)))
    if Bm > 1:
        sorted_ids = mp_id[sort_i]
        dup_sorted = jnp.concatenate(
            [jnp.array([False]), sorted_ids[1:] == sorted_ids[:-1]]
        )
        dup = jnp.zeros((Bm,), bool).at[sort_i].set(dup_sorted)
    else:
        dup = jnp.zeros((Bm,), bool)
    valid = mpb.valid & ~dup

    ref_arena = _lookup(tkf, mpb.ref_kf_id)
    ref_ok = ref_arena >= 0
    ra = jnp.clip(ref_arena, 0, K - 1)
    T_ref = SE3(R=m.kfs.R_cw[ra], t=m.kfs.t_cw[ra])
    pos_w = T_ref.inverse().apply(mpb.pos_ref * S_s)
    normal_w = jnp.einsum("bji,bj->bi", T_ref.R, mpb.normal_ref)

    known = _lookup(tab.mp_id2arena, mp_id)
    ka = jnp.clip(known, 0, M - 1)
    known_bad = m.mps.bad[ka]
    is_update = valid & ref_ok & (known >= 0) & ~known_bad
    # retired server-side (fused/culled): ack, never resurrect
    is_retired = valid & (known >= 0) & known_bad
    is_new = valid & ref_ok & (known < 0) & mpb.full
    mp_pend = valid & ~ref_ok & mpb.full
    weak_mp = jnp.any(valid & (known < 0) & ~mpb.full)

    # position updates (unique ids after dedup -> plain scatter is exact)
    ui = jnp.where(is_update, ka, M - 1)
    mps = m.mps
    old_pos = mps.pos[ui]
    mps = mps.replace(
        pos=mps.pos.at[ui].add(jnp.where(is_update[:, None], pos_w - old_pos, 0.0)),
        pos_version=mps.pos_version.at[ui].add(jnp.where(is_update, 1, 0)),
    )
    m = m.replace(mps=mps)

    # batch allocation of new landmarks
    room = m.next_mp + jnp.cumsum(is_new.astype(jnp.int32)) <= M - 2
    is_new = is_new & room
    m, new_mp_arena = ms.add_mappoints(
        m,
        n_new=jnp.sum(is_new),
        pos=pos_w,
        desc=mpb.desc,
        normal=normal_w,
        min_dist=mpb.min_dist * S_s,
        max_dist=mpb.max_dist * S_s,
        ref_kf=ra,
        mp_ids=mp_id,
        client_id=jnp.full((Bm,), agent_id, jnp.int32),
        new_valid=is_new,
        inserted_stamp=m.next_kf,   # arrival-time age stamp (mInsertedWithKF)
    )
    p_arena = jnp.where(is_new, new_mp_arena, jnp.where(is_update | is_retired, ka, -1))
    tmp2 = tab.mp_id2arena
    ti = jnp.clip(mp_id, 0, tmp2.shape[0] - 1)
    tmp2 = tmp2.at[ti].set(jnp.where(is_new, new_mp_arena, tmp2[ti]))

    # observation linking [Bm, O]: claim free forward slots on known KFs,
    # then append the successful claims to the reverse tables
    O = mpb.obs_kf_id.shape[1]
    obs_kf_arena = _lookup(tkf, mpb.obs_kf_id)                   # [Bm,O]
    link_ok = (
        (is_new | is_update)[:, None]
        & mpb.obs_valid
        & (obs_kf_arena >= 0)
    )
    oka = jnp.clip(obs_kf_arena, 0, K - 1)
    link_ok = link_ok & ~m.kfs.bad[oka]
    feat = jnp.clip(mpb.obs_feat, 0, N - 1)
    free = m.kfs.mp_idx[oka, feat] < 0
    link_ok = link_ok & free
    # forward: scatter p_arena into (kf, feat); add-of-delta for masked lanes
    tgt_k = jnp.where(link_ok, oka, 0).reshape(-1)
    tgt_f = jnp.where(link_ok, feat, 0).reshape(-1)
    val = jnp.broadcast_to(p_arena[:, None], link_ok.shape).reshape(-1)
    cur = m.kfs.mp_idx[tgt_k, tgt_f]
    mp_idx2 = m.kfs.mp_idx.at[tgt_k, tgt_f].add(
        jnp.where(link_ok.reshape(-1), val - cur, 0)
    )
    m = m.replace(kfs=m.kfs.replace(mp_idx=mp_idx2))
    # reverse: append each landmark's successful links at obs_n + rank
    rank = jnp.cumsum(link_ok.astype(jnp.int32), axis=1) - 1     # [Bm,O]
    pa = jnp.clip(p_arena, 0, M - 1)
    slot = jnp.clip(m.mps.obs_n[pa][:, None] + rank, 0, m.mps.max_obs - 1)
    tgt_p = jnp.where(link_ok, pa[:, None], 0).reshape(-1)
    tgt_s = jnp.where(link_ok, slot, 0).reshape(-1)
    lk = link_ok.reshape(-1)
    okf = m.mps.obs_kf
    cur_kf = okf[tgt_p, tgt_s]
    okf = okf.at[tgt_p, tgt_s].add(jnp.where(lk, jnp.where(link_ok, oka, 0).reshape(-1) - cur_kf, 0))
    ofe = m.mps.obs_feat
    cur_fe = ofe[tgt_p, tgt_s]
    ofe = ofe.at[tgt_p, tgt_s].add(jnp.where(lk, jnp.where(link_ok, feat, 0).reshape(-1) - cur_fe, 0))
    on = m.mps.obs_n.at[jnp.where(link_ok, pa[:, None], 0).reshape(-1)].add(lk.astype(jnp.int32))
    on = jnp.minimum(on, m.mps.max_obs)
    m = m.replace(mps=m.mps.replace(obs_kf=okf, obs_feat=ofe, obs_n=on))

    mp_ack = is_update | is_new | is_retired
    max_mp_id = jnp.maximum(tab.max_mp_id, jnp.max(jnp.where(mp_ack, mp_id, -1), initial=-1))

    tab2 = IngestTables(
        kf_id2arena=tkf, mp_id2arena=tmp2,
        max_kf_id=max_kf_id, max_mp_id=max_mp_id,
    )
    out = dict(
        kf_ack=kf_ack, kf_pend=kf_pend, new_kf_arena=new_arena,
        mp_ack=mp_ack, mp_pend=mp_pend, mp_arena=p_arena, mp_new=is_new,
        weak_kf=weak_kf, weak_mp=weak_mp,
    )
    return m, tab2, out


@partial(jax.jit, static_argnames=("capacity",))
def _pack_pending_jit(batch, pend_mask, capacity: int):
    """Left-pack the pending items of a message batch into a fixed-capacity
    buffer batch (valid mask marks live rows).  Returns (buffer, overflowed)."""
    B = pend_mask.shape[0]
    order = jnp.argsort(~pend_mask, stable=True)
    if capacity > B:
        order = jnp.concatenate([order, jnp.zeros((capacity - B,), order.dtype)])
    order = order[:capacity]
    packed = jax.tree.map(lambda x: x[order], batch)
    n = jnp.sum(pend_mask.astype(jnp.int32))
    live = jnp.arange(capacity) < jnp.minimum(n, capacity)
    packed = packed.replace(valid=live)
    return packed, n > capacity


server_ingest_batch = jax.jit(_server_ingest_core)


def empty_pending(batch, capacity: int):
    """An all-invalid pending buffer with the same per-item structure as
    ``batch`` (fixed [capacity] rows)."""
    return jax.tree.map(
        lambda x: jnp.zeros((capacity,) + x.shape[1:], x.dtype), batch
    )


@partial(jax.jit, static_argnames=("Pk", "Pm"))
def server_ingest_full(m: ms.MapState, tab: IngestTables,
                       finder_db, matcher_db,
                       pend_kfb, pend_mpb, kfb, mpb, vocab,
                       S_s, S_R, S_t, agent_id, matcher_base,
                       Pk: int, Pm: int):
    """The WHOLE per-message server ingest as one compiled program: pending
    concat, chain resolution, arena landing, BoW vectors + both
    place-recognition db registrations, and the pending-buffer repack.  On
    the tunneled TPU backend every separate dispatch costs ~25 ms of
    latency; this fuses what used to be ~8 dispatches into one.

    Returns (m', tab', finder_db', matcher_db', pend_kfb', pend_mpb', out);
    out additionally carries kf_overflow/mp_overflow."""
    from ..models import keyframe_db as kdb

    kfb = concat_batches.__wrapped__(pend_kfb, kfb)
    mpb = concat_batches.__wrapped__(pend_mpb, mpb)
    m, tab, out = _server_ingest_core(m, tab, kfb, mpb, S_s, S_R, S_t, agent_id)

    new_arena = out["new_kf_arena"]
    new_mask = new_arena >= 0
    vecs = kdb.batch_vectors.__wrapped__(vocab, m.kfs.desc, m.kfs.feat_valid, new_arena)
    finder_db = kdb.register_vectors.__wrapped__(
        finder_db, new_arena, vecs, new_mask, agent_id
    )
    rows = jnp.where(new_mask, matcher_base + new_arena, -1)
    matcher_db = kdb.register_vectors.__wrapped__(
        matcher_db, rows, vecs, new_mask, agent_id
    )

    pend_kfb2, kf_over = _pack_pending_jit.__wrapped__(kfb, out["kf_pend"], Pk)
    pend_mpb2, mp_over = _pack_pending_jit.__wrapped__(mpb, out["mp_pend"], Pm)
    out = dict(out, kf_over=kf_over, mp_over=mp_over,
               kf_ids=kfb.kf_id, mp_ids=mpb.mp_id,
               max_kf_id=tab.max_kf_id, max_mp_id=tab.max_mp_id)
    return m, tab, finder_db, matcher_db, pend_kfb2, pend_mpb2, out


def pack_pending(batch, pend_mask, capacity: int):
    """Left-pack pending items into a fixed-capacity buffer batch (valid mask
    marks live rows).  Returns (buffer, overflowed); (None, False) for
    zero-size inputs."""
    if pend_mask.shape[0] == 0:
        return None, False
    return _pack_pending_jit(batch, pend_mask, capacity)


@jax.jit
def any_valid(a_valid, b_valid):
    """jnp.any over two masks in one dispatch (MapMsg.empty costs two eager
    tunnel round-trips on the remote TPU backend)."""
    return jnp.any(a_valid) | jnp.any(b_valid)


@jax.jit
def concat_batches(a, b):
    """Concatenate two message batches along the item axis (jitted: one
    dispatch instead of one eager op per pytree leaf — eager leaf ops each
    pay the full remote-dispatch latency on the tunneled TPU backend)."""
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)
