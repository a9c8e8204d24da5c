"""Central server: per-agent map ingestion, place recognition, map fusion,
and the global-BA scheduler with the reference's preemption rules.

TPU-native re-design of ``ServerSystem`` + ``ClientHandler`` + the server
sides of ``Communicator``/``LocalMapping`` (cslam/src/server/ServerSystem.cpp,
cslam/src/ClientHandler.cpp, Communicator.cpp:167-226 + 382-482,
Mapping.cpp:123-196):

* one ``MapState`` arena per agent until maps merge (then agents share a
  slot), one shared BoW database, one cross-map matcher;
* message ingestion reconstructs absolute poses through the predecessor
  chain with the client->server-map Sim3 gauge applied to translations
  (the relative wire encoding is what makes this work across gauges);
* GBA runs in small interruptible chunks between ingestion steps —
  fresh agent data preempts it (INTERRUPTBA), merge-GBA is protected
  (DONOTINTERRUPTMERGE), and full quiescence triggers the final GBA
  (FINALBA, Communicator.cpp:444-480);
* everything is a pure function over pytrees — the reference's all-module
  lock hierarchy (CentralControl) has no equivalent because there is no
  shared mutable state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..models import map_store as ms
from ..ops import bow
from ..solvers import ba
from ..utils.camera import Camera
from ..utils.lie import SE3, Sim3
from . import mapping as mapping_mod
from ..models import keyframe_db as kdb_mod
from .communicator import MapMsg
from .loop_closing import LoopFinder
from .map_matching import MapMatcher
from .tracking import apply_ba_result, build_ba_problem


@dataclass
class AgentState:
    client_id: int
    map_slot: int
    # client gauge -> server-map gauge (updated on merges; ChangeMap /
    # mg2oS_wcurmap_wclientmap, ClientHandler.cpp:221-241)
    S_map_client: Sim3
    kf_table: dict = field(default_factory=dict)   # client kf_id -> arena idx
    mp_table: dict = field(default_factory=dict)   # client mp_id -> arena idx
    # device-side batched-ingest state: dense id->arena tables (rebuilt
    # lazily from the dicts after merges) + fixed-capacity pending buffers
    # (pred/ref-missing entities re-queued into the next ingest call)
    ing_tables: object = None
    pending_kfb: object = None
    pending_mpb: object = None
    last_data_step: int = -1  # -1: never sent data
    finished: bool = False
    next_server_kf: int = 0  # ingestion counter for mapping-side bookkeeping
    # agent-reported nearest keyframe (Map.msg ClosestKf_Id, recorded by
    # MapCbServer Communicator.cpp:432-442) — the vicinity BFS root
    closest_kf_id: int = -1


@dataclass
class Server:
    cfg: SystemConfig
    cam: Camera
    vocab: bow.Vocabulary
    n_agents: int = 4
    maps: Dict[int, ms.MapState] = field(default_factory=dict)
    agents: Dict[int, AgentState] = field(default_factory=dict)
    matcher: MapMatcher = None
    finders: Dict[int, LoopFinder] = field(default_factory=dict)
    step_counter: int = 0
    # GBA scheduling state
    gba_dirty: Dict[int, bool] = field(default_factory=dict)
    gba_progress: Dict[int, int] = field(default_factory=dict)
    # LM carry (lam, CG warm start, entry cost) across interruptible chunks:
    # dropped whenever the slot's problem changes so chunked == monolithic
    gba_state: Dict[int, object] = field(default_factory=dict)
    final_gba_done: Dict[int, bool] = field(default_factory=dict)
    gba_last_cost: Dict[int, object] = field(default_factory=dict)
    quiescence_steps: int = 30
    gba_chunk_iters: int = 2
    gba_total_iters: int = 20
    # optional device mesh: GBA switches to the landmark-sharded distributed
    # solver when set (parallel/dist_ba); None = single-device
    mesh: object = None

    def __post_init__(self):
        cap = self.cfg.capacity
        # arenas start small and grow geometrically (ensure_capacity):
        # solver/compile shapes track the actual map size instead of the
        # configured high-water mark
        kf0 = min(cap.server_max_kfs, 64)
        mp0 = min(cap.server_max_mps, 8192)
        if self.matcher is None:
            self.matcher = MapMatcher(
                cfg=self.cfg, cam=self.cam, vocab=self.vocab,
                n_slots=self.n_agents, kf_capacity=kf0,
            )
        for a in range(self.n_agents):
            self.maps[a] = ms.empty_map(
                kf0, mp0, cap.max_keypoints, cap.max_obs_per_mp,
            )
            self.agents[a] = AgentState(
                client_id=a, map_slot=a, S_map_client=Sim3.identity()
            )
            self.finders[a] = LoopFinder(
                cfg=self.cfg, cam=self.cam, vocab=self.vocab,
                db=None, map_id=a,
            )
            # the per-map loop finder shares the matcher's database view by
            # using its own db sized to the map arena
            from ..models import keyframe_db as kdb

            self.finders[a].db = kdb.empty_db(kf0, self.vocab.n_words)
            self.gba_dirty[a] = False
            self.gba_progress[a] = 0
            self.final_gba_done[a] = False

    # ------------------------------------------------------------------ ingest

    def ensure_capacity(self, slot: int):
        """Geometric arena growth near the high-water mark — the reference's
        unbounded server map (std::map) recast as re-allocation between jit
        invocations.  Arena indices are preserved (append-only growth), so
        agent id tables and the place-recognition databases stay valid; the
        shared cross-map database re-grids its per-slot stride."""
        m = self.maps[slot]
        K, M = m.kfs.capacity, m.mps.capacity
        K1 = K * 2 if int(m.next_kf) >= (K * 17) // 20 else K
        M1 = M * 2 if int(m.next_mp) >= (M * 17) // 20 else M
        if K1 == K and M1 == M:
            return
        self.maps[slot] = ms.grow_map(m, K1, M1)
        if K1 != K:
            from ..models import keyframe_db as kdb

            self.finders[slot].db = kdb.grow(self.finders[slot].db, K1)
            self.matcher.grow(K1)

    def ingest(self, agent_id: int, msg: MapMsg) -> MapMsg:
        """Process one client message; returns the ack message.

        Batched/jitted replacement of the reference's per-entity ingest loops
        (ProcessKfInServer/ProcessMpInServer, Communicator.cpp:815-1139):
        pending buffers are concatenated to the fresh batch and the whole
        thing lands in ONE compiled call (runtime/ingest.py); only small
        id/mask arrays cross back to the host for bookkeeping."""
        from . import ingest as ing

        ag = self.agents[agent_id]
        slot = ag.map_slot
        self.ensure_capacity(slot)
        m = self.maps[slot]

        if bool(ing.any_valid(msg.kfs.valid, msg.mps.valid)):
            ag.last_data_step = self.step_counter
            ag.finished = False
            # fresh data preempts a running (non-final) GBA: INTERRUPTBA
            self.gba_progress[slot] = 0
            self.gba_state.pop(slot, None)
            self.final_gba_done[slot] = False

        S_g = ag.S_map_client
        cap = self.cfg.capacity
        if ag.ing_tables is None:
            ag.ing_tables = ing.tables_from_dicts(
                ag.kf_table, ag.mp_table, cap.kf_id_space, cap.mp_id_space
            )
        # fixed-capacity pending buffers (pred/ref-missing entities re-enter
        # ahead of the fresh batch, like the reference's in-buffer)
        Pk = max(8, int(msg.kfs.valid.shape[0]))
        Pm = max(256, int(msg.mps.valid.shape[0]))
        if ag.pending_kfb is None or int(ag.pending_kfb.valid.shape[0]) != Pk:
            ag.pending_kfb = ing.empty_pending(msg.kfs, Pk)
        if ag.pending_mpb is None or int(ag.pending_mpb.valid.shape[0]) != Pm:
            ag.pending_mpb = ing.empty_pending(msg.mps, Pm)

        # ONE compiled call for the whole message: concat + chain resolution
        # + arena landing + BoW + db registration + pending repack
        (m, ag.ing_tables, self.finders[slot].db, self.matcher.db,
         ag.pending_kfb, ag.pending_mpb, out) = ing.server_ingest_full(
            m, ag.ing_tables, self.finders[slot].db, self.matcher.db,
            ag.pending_kfb, ag.pending_mpb, msg.kfs, msg.mps, self.vocab,
            S_g.s, S_g.R, S_g.t, jnp.int32(agent_id),
            jnp.int32(slot * self.matcher.kf_capacity), Pk=Pk, Pm=Pm,
        )

        # ---- host bookkeeping: ONE device->host transfer per message ----
        host = jax.device_get(out)
        kf_ids, kf_ack = host["kf_ids"], host["kf_ack"]
        new_arena = host["new_kf_arena"]
        mp_ids, mp_ack = host["mp_ids"], host["mp_ack"]
        is_new_kf = new_arena >= 0
        for kid, arena in zip(kf_ids[is_new_kf], new_arena[is_new_kf]):
            ag.kf_table[int(kid)] = int(arena)
        for mid, arena in zip(mp_ids[host["mp_new"]], host["mp_arena"][host["mp_new"]]):
            ag.mp_table[int(mid)] = int(arena)
        weak_kf = int(host["max_kf_id"]) if bool(host["weak_kf"]) or bool(host["kf_over"]) else -1
        weak_mp = int(host["max_mp_id"]) if bool(host["weak_mp"]) or bool(host["mp_over"]) else -1
        if msg.closest_kf_id >= 0:
            ag.closest_kf_id = int(msg.closest_kf_id)

        self.maps[slot] = m
        self.gba_dirty[slot] = True
        empty_kf = jax.tree.map(lambda x: x[:0], msg.kfs)
        empty_mp = jax.tree.map(lambda x: x[:0], msg.mps)
        return MapMsg(
            kfs=empty_kf,
            mps=empty_mp,
            ack_kf_ids=kf_ids[kf_ack].astype(np.int64),
            ack_mp_ids=mp_ids[mp_ack].astype(np.int64),
            weak_ack_kf_id=weak_kf,
            weak_ack_mp_id=weak_mp,
        )

    def reset_agent(self, agent_id: int):
        """Client reset while connected (Tracking::Reset restarts kf/mp ids
        at 0, Tracking.cpp:961-985; Communicator::ResetIfRequested clears the
        buffers): drop the agent's id tables + pending buffers and erase its
        own entities from its map slot, so re-sent ids allocate fresh arena
        entries instead of aliasing the dead run's slots."""
        ag = self.agents[agent_id]
        slot = ag.map_slot
        m = self.maps[slot]
        own_kf = m.kfs.valid & ~m.kfs.bad & (m.kfs.client_id == agent_id)
        own_mp = m.mps.valid & ~m.mps.bad & (m.mps.client_id == agent_id)
        m = ms.erase_keyframes(m, own_kf)
        m = ms.erase_mappoints(m, own_mp)
        self.maps[slot] = m
        # dead rows must leave the place-recognition databases too
        self.finders[slot].db = kdb_mod.erase(self.finders[slot].db, own_kf)
        gmask = jnp.zeros((self.matcher.db.capacity,), bool)
        lo = slot * self.matcher.kf_capacity
        gmask = gmask.at[lo : lo + own_kf.shape[0]].set(own_kf)
        self.matcher.db = kdb_mod.erase(self.matcher.db, gmask)
        ag.kf_table.clear()
        ag.mp_table.clear()
        ag.ing_tables = None
        ag.pending_kfb = None
        ag.pending_mpb = None
        ag.closest_kf_id = -1
        ag.S_map_client = Sim3.identity()
        ag.last_data_step = -1
        self.gba_state.pop(slot, None)
        self.final_gba_done[slot] = False

    # ------------------------------------------------------------- maintenance

    def mapping_step(self, agent_id: int, new_kf_arena: int):
        """Server-side per-keyframe maintenance: fuse + loop detection
        (RunServer, Mapping.cpp:123-196)."""
        ag = self.agents[agent_id]
        slot = ag.map_slot
        m = self.maps[slot]
        # server landmark culling precedes fusion (RunServer order,
        # Mapping.cpp:123-196: ProcessNewKeyFrame -> MapPointCullingServer ->
        # SearchInNeighbors)
        m, _ = mapping_mod.cull_mappoints_server(m, self.cfg)
        m, _, _, _ = mapping_mod.fuse_neighbors(m, jnp.int32(new_kf_arena), self.cam, self.cfg)
        if self.cfg.mapping.red_thres < 1.0:
            # server keyframe redundancy culling (KeyFrameCullingV3 gate);
            # culled rows must leave the place-recognition databases too
            m, n_culled = mapping_mod.cull_redundant_keyframes(m, self.cfg)
            if int(n_culled) > 0:
                dead = m.kfs.valid & m.kfs.bad
                self.finders[slot].db = kdb_mod.erase(self.finders[slot].db, dead)
                gmask = jnp.zeros((self.matcher.db.capacity,), bool)
                lo = slot * self.matcher.kf_capacity
                gmask = gmask.at[lo : lo + dead.shape[0]].set(dead)
                self.matcher.db = kdb_mod.erase(self.matcher.db, gmask)
        self.maps[slot] = m
        self.gba_state.pop(slot, None)  # problem changed: carried LM state is stale
        # intra-map loop closure
        m2, closed = self.finders[slot].try_close(m, new_kf_arena)
        self.maps[slot] = m2
        if closed:
            self.gba_dirty[slot] = True
            self.gba_progress[slot] = 0
        # cross-map matching
        res = self.matcher.try_match(
            slot, self.maps[slot], new_kf_arena,
            {s: mm for s, mm in self.maps.items() if s != slot},
        )
        if res is not None:
            self._apply_merge(slot, res)
        return closed, res is not None

    def _apply_merge(self, slot_from: int, res):
        """Absorb slot_from's map into the matched map; re-route its agents
        (MapMerger::MergeMaps tail + ClientHandler::ChangeMap)."""
        target_slot = res.target_slot
        if target_slot is None or target_slot < 0 or target_slot not in self.maps:
            return
        self.maps[target_slot] = res.fused
        del self.maps[slot_from]
        self.matcher.retire_map(slot_from)
        # re-register the absorbed keyframes under the target slot
        fused = res.fused
        alive = np.asarray(fused.kfs.valid & ~fused.kfs.bad)
        for k in range(res.kf_offset, int(fused.next_kf)):
            if alive[k]:
                self.matcher.insert_keyframe(target_slot, fused, k)
        # remap agent bookkeeping: the absorbed map was compacted during the
        # splice, so route old arena indices through the exact remap first
        for ag in self.agents.values():
            if ag.map_slot == slot_from:
                ag.map_slot = target_slot
                ag.S_map_client = res.S_from_to.compose(ag.S_map_client)
                ag.kf_table = {
                    kid: int(res.kf_remap[arena]) + res.kf_offset
                    for kid, arena in ag.kf_table.items()
                    if res.kf_remap[arena] >= 0
                }
                ag.mp_table = {
                    mid: int(res.mp_remap[arena]) + res.mp_offset
                    for mid, arena in ag.mp_table.items()
                    if res.mp_remap[arena] >= 0
                }
                # device id tables point at pre-merge arenas: rebuild lazily
                ag.ing_tables = None
        # merge-GBA: protected, run to completion now (DONOTINTERRUPTMERGE)
        self._run_gba(target_slot, iters=self.gba_total_iters)
        self.gba_dirty[target_slot] = False
        self.gba_progress[target_slot] = self.gba_total_iters

    # ------------------------------------------------------------------- GBA

    def _run_gba(self, slot: int, iters: int, with_stats: bool = True,
                 carry: bool = False, block: bool = True):
        """One GBA invocation for a map slot.  ``carry=True`` (interruptible
        chunks) threads the per-slot LM state (lam, CG warm start, entry
        cost) so the chunked schedule lands on the monolithic optimum; the
        state is dropped by every mutation path (ingest/mapping/merge) and on
        arena growth (shape change).

        ``block=False`` dispatches the solve WITHOUT waiting for the device:
        JAX execution is async, so the host returns immediately with the
        result arrays as futures already installed in ``self.maps[slot]`` —
        the device queue orders any later ingest work after the chunk, and
        the host meanwhile prepares/acks the next messages (the reference's
        GBA-thread/ingest-thread overlap, LoopFinder.cpp:688 + Map.cpp:1402,
        without the locks).  ``self.gba_last_cost[slot]`` holds the pending
        cost; read it via ``gba_cost(slot)`` to synchronize on demand."""
        m = self.maps[slot]
        alive = m.kfs.valid & ~m.kfs.bad
        order = jnp.where(alive, m.kfs.insert_order, jnp.iinfo(jnp.int32).max)
        oldest2 = jnp.argsort(order)[:2]
        fixed = jnp.zeros((m.kfs.capacity,), bool).at[oldest2].set(True)
        prob = build_ba_problem(m, self.cam, fixed_mask=fixed)
        state = self.gba_state.get(slot) if carry else None
        if state is not None and state[1].shape[0] != prob.R.shape[0]:
            state = None  # arena grew between chunks
        if self.mesh is not None:
            from ..parallel import dist_ba

            probs = dist_ba.shard_problem(prob, self.mesh)
            R, t, X, cost, new_state = dist_ba.dist_ba_solve(
                probs, self.mesh, iters=iters, state=state, return_state=True
            )
        else:
            R, t, X, cost, n_good, new_state = ba.ba_solve(
                prob, iters=iters, with_stats=with_stats,
                state=state, return_state=True,
            )
        if carry:
            self.gba_state[slot] = new_state
        else:
            self.gba_state.pop(slot, None)
        self.maps[slot] = apply_ba_result(m, R, t, X, moved_kf_mask=~fixed & alive)
        self.gba_last_cost[slot] = cost
        return float(cost) if block else cost

    def idle_step(self):
        """One scheduler tick: advance interruptible GBAs; trigger final GBA
        on quiescence (RunServer + FINALBA)."""
        self.step_counter += 1
        for slot in list(self.maps.keys()):
            agents_here = [a for a in self.agents.values() if a.map_slot == slot]
            if not agents_here:
                continue
            if int(self.maps[slot].next_kf) < 3:
                continue  # nothing to optimize (empty/embryonic map)
            # FINALBA requires agents that SENT data and then went idle
            # (Communicator.cpp:456-480: the 30 s timer starts at the first
            # empty message AFTER data) — never-connected agents don't count
            quiet = all(
                a.last_data_step >= 0
                and self.step_counter - a.last_data_step >= self.quiescence_steps
                for a in agents_here
            )
            if quiet and not self.final_gba_done[slot]:
                # final GBA: run to completion
                self._run_gba(slot, iters=self.gba_total_iters)
                self.final_gba_done[slot] = True
                self.gba_dirty[slot] = False
                continue
            if self.gba_dirty[slot] and self.gba_progress[slot] < self.gba_total_iters:
                # interruptible chunk (stats only on the final GBA); the LM
                # state carries across chunks while the problem is unchanged.
                # Dispatched WITHOUT blocking: ingestion continues on the
                # host while the chunk runs on-device
                self._run_gba(
                    slot, iters=self.gba_chunk_iters, with_stats=False,
                    carry=True, block=False,
                )
                self.gba_progress[slot] += self.gba_chunk_iters
                if self.gba_progress[slot] >= self.gba_total_iters:
                    self.gba_dirty[slot] = False

    def gba_cost(self, slot: int):
        """Synchronize on the most recent GBA result of a slot (host-side
        barrier for code that needs the converged cost)."""
        c = self.gba_last_cost.get(slot)
        return None if c is None else float(c)

    # --------------------------------------------------------------- vicinity

    def pack_vicinity(self, agent_id: int, max_kfs: int = None, max_mps: int = 2000) -> "MapMsg":
        """Server->client feedback: the covisibility neighborhood of the
        agent's most recent keyframe, encoded in the CLIENT's gauge
        (Map::PackVicinityToMsg, cslam/src/Map.cpp:1065-1155 +
        KeyFrame::ConvertToMessage server branch :1332-1386).  Disabled when
        Comm.Server.KfsToClient == 0 (the shipped default)."""
        from .communicator import KFMsgBatch, MPMsgBatch, MapMsg

        if max_kfs is None:
            max_kfs = self.cfg.comm.server_kfs_to_client
        ag = self.agents[agent_id]
        m = self.maps[ag.map_slot]
        if max_kfs <= 0 or not ag.kf_table:
            empty = MapMsg(
                kfs=None, mps=None, ack_kf_ids=np.zeros(0, np.int64),
                ack_mp_ids=np.zeros(0, np.int64),
            )
            return empty

        # k-hop covisibility expansion from the agent's REPORTED nearest
        # keyframe (Map.msg ClosestKf_Id — on a revisit this is an OLD
        # keyframe, which is exactly when feedback matters), falling back to
        # the newest ingested one; ONE jitted call instead of a host BFS
        # issuing a ~25 ms covis_row dispatch per visited KF.
        start = ag.kf_table.get(ag.closest_kf_id,
                                ag.kf_table[max(ag.kf_table.keys())])
        sel_j, sel_ok = ms.vicinity_khop(m, jnp.int32(start), max_kfs)
        sel = [int(s) for s, ok in zip(np.asarray(sel_j), np.asarray(sel_ok)) if ok]
        if not sel:
            return MapMsg(
                kfs=None, mps=None, ack_kf_ids=np.zeros(0, np.int64),
                ack_mp_ids=np.zeros(0, np.int64),
            )

        # encode in the client gauge: T_client = se3_scaled(T_map o S_mc)
        S_mc = ag.S_map_client
        kfs = m.kfs
        sel_j = jnp.asarray(np.asarray(sel, np.int64))
        T_map = SE3(R=kfs.R_cw[sel_j], t=kfs.t_cw[sel_j])
        Smc_b = Sim3(
            s=jnp.broadcast_to(S_mc.s, (len(sel),)),
            R=jnp.broadcast_to(S_mc.R, (len(sel), 3, 3)),
            t=jnp.broadcast_to(S_mc.t, (len(sel), 3)),
        )
        T_cl = T_map.to_sim3().compose(Smc_b).to_se3_scaled()

        assoc = kfs.mp_idx[sel_j]
        mpc = jnp.clip(assoc, 0, m.mps.capacity - 1)
        assoc_id = jnp.where(assoc >= 0, m.mps.mp_id[mpc], -1)
        B = len(sel)
        kf_batch = KFMsgBatch(
            valid=jnp.ones(B, bool),
            full=jnp.ones(B, bool),
            kf_id=kfs.kf_id[sel_j],
            client_id=kfs.client_id[sel_j],
            timestamp=kfs.timestamp[sel_j],
            R_cpred=T_cl.R,
            t_cpred=T_cl.t,
            pred_kf_id=jnp.full(B, -1, jnp.int32),  # absolute, client gauge
            R_cpar=T_cl.R,
            t_cpar=T_cl.t,
            par_kf_id=jnp.full(B, -1, jnp.int32),
            xy=kfs.xy[sel_j],
            desc=kfs.desc[sel_j],
            octave=kfs.octave[sel_j],
            angle=kfs.angle[sel_j],
            feat_valid=kfs.feat_valid[sel_j],
            mp_assoc_id=assoc_id,
        )

        # landmarks of the vicinity keyframes, encoded in the FIRST vicinity
        # keyframe's camera frame (client-gauge)
        mps = m.mps
        lm_mask = np.zeros(mps.capacity, bool)
        assoc_np = np.asarray(assoc)
        for row in assoc_np:
            lm_mask[row[row >= 0]] = True
        lm_mask &= np.asarray(mps.valid & ~mps.bad)
        lm_sel = np.where(lm_mask)[0][:max_mps]
        Bm = len(lm_sel)
        lm_j = jnp.asarray(lm_sel)
        ref_k = sel_j[0]
        T_ref_cl = SE3(R=T_cl.R[0], t=T_cl.t[0])
        X_cl = S_mc.inverse().apply(mps.pos[lm_j])
        pos_ref = T_ref_cl.apply(X_cl)
        nrm_cl = jnp.einsum("ij,bj->bi", S_mc.R.T, mps.normal[lm_j])
        mp_batch = MPMsgBatch(
            valid=jnp.ones(Bm, bool),
            full=jnp.ones(Bm, bool),
            mp_id=mps.mp_id[lm_j],
            client_id=mps.client_id[lm_j],
            pos_ref=pos_ref,
            ref_kf_id=jnp.full(Bm, int(kfs.kf_id[ref_k]), jnp.int32),
            ref_client_id=jnp.full(Bm, int(kfs.client_id[ref_k]), jnp.int32),
            desc=mps.desc[lm_j],
            normal_ref=jnp.einsum("ij,bj->bi", T_ref_cl.R, nrm_cl),
            min_dist=mps.min_dist[lm_j] / S_mc.s,
            max_dist=mps.max_dist[lm_j] / S_mc.s,
            obs_kf_id=jnp.full((Bm, mps.max_obs), -1, jnp.int32),
            obs_feat=jnp.zeros((Bm, mps.max_obs), jnp.int32),
            obs_valid=jnp.zeros((Bm, mps.max_obs), bool),
        )
        return MapMsg(
            kfs=kf_batch, mps=mp_batch,
            ack_kf_ids=np.zeros(0, np.int64), ack_mp_ids=np.zeros(0, np.int64),
        )

    # ------------------------------------------------------------- load / save

    def save_map(self, slot: int, path: str):
        """Persist one server map (the ccmslam_savemap service equivalent)."""
        from ..io import checkpoint as ckpt

        ckpt.save_map(path, self.maps[slot])

    def load_map(self, slot: int, path: str):
        """Load a previously saved map into a slot (Server.launch LoadMap
        flow): ids remapped to client 0, entities registered in the place-
        recognition databases, and agent 0's communication disabled (the
        reference disables that agent's comm, Communicator ctor early-return
        Communicator.cpp:51) — here: its id tables point at the loaded map so
        duplicate ingestion becomes pose updates."""
        from ..io import checkpoint as ckpt

        m = ckpt.remap_to_client(ckpt.load_map(path), client_id=0)
        self.maps[slot] = m
        ag = self.agents[0]
        ag.map_slot = slot
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        ids = np.asarray(m.kfs.kf_id)
        for k in np.where(alive)[0]:
            ag.kf_table[int(ids[k])] = int(k)
            self.finders[slot].insert_keyframe(m, int(k))
            self.matcher.insert_keyframe(slot, m, int(k))
        mp_alive = np.asarray(m.mps.valid & ~m.mps.bad)
        mp_ids = np.asarray(m.mps.mp_id)
        for p in np.where(mp_alive)[0]:
            ag.mp_table[int(mp_ids[p])] = int(p)
        ag.ing_tables = None  # rebuild from the repopulated dicts
        return m

    # ---------------------------------------------------------------- queries

    def trajectory(self, agent_id: int):
        """(timestamps, R_cw, t_cw) of the agent's keyframes in its map,
        ordered by kf id (the KF_GBA_<agent>.csv content)."""
        ag = self.agents[agent_id]
        m = self.maps[ag.map_slot]
        items = sorted(ag.kf_table.items())
        arena = [a for _, a in items]
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        arena = [a for a in arena if alive[a]]
        ts = np.asarray(m.kfs.timestamp)[arena]
        R = np.asarray(m.kfs.R_cw)[arena]
        t = np.asarray(m.kfs.t_cw)[arena]
        return ts, R, t
