"""Inter-map place recognition and map fusion.

TPU-native re-design of ``MapMatcher`` (cslam/src/MapMatcher.cpp) and
``MapMerger`` (cslam/src/MapMerger.cpp).  The reference performs a global
lock storm to mutate both maps in place; here maps are immutable pytrees, so
fusion is *speculative*: a trial union map is built by array splicing, the
Sim3 and the guided-projection gate are evaluated on it, and only on success
does the real (gauge-corrected) fused map replace the originals.

Flow (reference call stack §3.3):
  MapMatcher::DetectLoop   -> shared-DB query over other maps
  MapMatcher::ComputeSim3  -> estimate_sim3 on the trial union arena
  MapMerger::MergeMaps     -> merge_maps (gauge Sim3) + correct_loop reuse
                              (merge edge + fusion + essential graph)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..models import keyframe_db as kdb
from ..models import map_store as ms
from ..ops import bow
from ..solvers.pose_graph import relative_sim3
from ..utils.lie import SE3, Sim3
from .loop_closing import correct_loop, estimate_sim3, guided_projection_count


def gauge_from_match(m_fused: ms.MapState, kf_q_off, kf_c, S_qc: Sim3) -> Sim3:
    """S mapping the query map's world into the matched map's world:
    S_ba = (S_qc o T_cw(candidate))^-1 o T_qw(query)  — the reference's
    ``g2oS_wm_wc`` (MapMerger.cpp:279-284)."""
    kfs = m_fused.kfs
    T_c = SE3(R=kfs.R_cw[kf_c], t=kfs.t_cw[kf_c])
    T_q = SE3(R=kfs.R_cw[kf_q_off], t=kfs.t_cw[kf_q_off])
    S_qwB = S_qc.compose(T_c.to_sim3())
    return S_qwB.inverse().compose(T_q.to_sim3())


@dataclass
class MergeResult:
    fused: ms.MapState
    S_from_to: Sim3      # maps the absorbed map's world into the fused world
    kf_offset: int       # absorbed map's keyframe arena offset in the fused map
    mp_offset: int
    target_slot: int = -1  # map slot that absorbed the query map
    # exact old->compacted arena remaps of the ABSORBED map (it is compacted
    # during the splice; -1 = dropped) for external id-table fixup
    kf_remap: object = None
    mp_remap: object = None


@dataclass
class MapMatcher:
    """Server-wide cross-map matcher (host orchestration).

    The shared database uses a global index space: keyframe (map_slot, k)
    lives at db row map_slot * K_cap + k (the reference shares one
    KeyFrameDatabase across all maps, ServerSystem.cpp:49)."""

    cfg: SystemConfig
    cam: object
    vocab: bow.Vocabulary
    n_slots: int
    kf_capacity: int
    db: kdb.KeyFrameDB = None
    rng: object = None

    def __post_init__(self):
        if self.db is None:
            self.db = kdb.empty_db(self.n_slots * self.kf_capacity, self.vocab.n_words)
        if self.rng is None:
            self.rng = jax.random.PRNGKey(777)

    def global_idx(self, map_slot: int, kf_idx: int) -> int:
        return map_slot * self.kf_capacity + kf_idx

    def insert_keyframe(self, map_slot: int, m: ms.MapState, kf_idx: int):
        vec, _ = bow.transform(self.vocab, m.kfs.desc[kf_idx], m.kfs.feat_valid[kf_idx])
        self.db = kdb.add(self.db, self.global_idx(map_slot, kf_idx), vec, map_slot)

    def insert_keyframes(self, map_slot: int, m: ms.MapState, kf_idxs):
        """Batched registration: one vmapped BoW transform + one scatter."""
        if len(kf_idxs) == 0:
            return
        idx = jnp.asarray(kf_idxs, jnp.int32)
        vecs, _ = bow.transform_batch(self.vocab, m.kfs.desc[idx], m.kfs.feat_valid[idx])
        gidx = jnp.asarray([self.global_idx(map_slot, int(k)) for k in kf_idxs], jnp.int32)
        self.db = kdb.add(self.db, gidx, vecs, map_slot)

    def retire_map(self, map_slot: int):
        """Drop a map's db rows (after it has been absorbed by a merge)."""
        lo = map_slot * self.kf_capacity
        mask = jnp.zeros((self.db.capacity,), bool).at[lo : lo + self.kf_capacity].set(True)
        self.db = kdb.erase(self.db, mask)

    def grow(self, new_kf_capacity: int):
        """Widen the per-slot stride when a map arena grows: rows re-placed
        from slot*old + k to slot*new + k (arena indices unchanged)."""
        if new_kf_capacity <= self.kf_capacity:
            return
        self.db = kdb.regrid(self.db, self.kf_capacity, new_kf_capacity, self.n_slots)
        self.kf_capacity = new_kf_capacity

    def detect(self, map_slot: int, m: ms.MapState, kf_idx: int, maps: dict = None):
        """Cross-map candidates for one keyframe: [(map_slot_b, kf_b), ...].

        maps: {slot: MapState} of the OTHER maps (as passed to try_match);
        the query map is added internally.  Their real covisibility graphs
        drive the candidate-group score accumulation."""
        if int(m.kfs.kf_id[kf_idx]) < self.cfg.placerec.start_map_matching_after_kf:
            return []
        vec, _ = bow.transform(self.vocab, m.kfs.desc[kf_idx], m.kfs.feat_valid[kf_idx])
        all_maps = dict(maps or {})
        all_maps[map_slot] = m
        cand_mask, scores = kdb.detect_map_match_candidates(
            self.db, vec, jnp.int32(map_slot), self._global_covis(all_maps),
            min_score=0.015,
        )
        out = []
        s_np = np.asarray(scores)
        for g in np.where(np.asarray(cand_mask))[0]:
            out.append((int(g) // self.kf_capacity, int(g) % self.kf_capacity, float(s_np[g])))
        out.sort(key=lambda x: -x[2])
        return out

    def _global_covis(self, maps: dict, top_k: int = 10):
        """SPARSE global covisibility over the shared-db index space
        (slot*stride + arena idx): per-row top-k covisible neighbor lists
        from the REAL per-map covisibility matrices — a dense [n,n] global
        graph is a stress-scale memory wall, and candidate-group pooling
        (GetBestCovisibilityKeyFrames, Database.cpp:260-292) only ever reads
        each row's top covisible neighbors."""
        n = self.db.capacity
        nbr_g = jnp.tile(jnp.arange(n, dtype=jnp.int32)[:, None], (1, top_k))
        for slot, mm in maps.items():
            W = ms.covisibility_matrix(mm).astype(jnp.int32)
            lo = slot * self.kf_capacity
            K = min(W.shape[0], self.kf_capacity)
            w, nbr = jax.lax.top_k(W[:K, :K], top_k)
            # rows with no covisible neighbor point at themselves (no-op in
            # the group accumulation)
            self_idx = jnp.arange(K, dtype=jnp.int32)[:, None]
            nbr = jnp.where(w > 0, nbr + lo, self_idx + lo)
            nbr_g = nbr_g.at[lo : lo + K].set(nbr.astype(jnp.int32))
        return nbr_g

    def try_match(self, map_slot_a: int, m_a: ms.MapState, kf_idx: int,
                  maps: dict):
        """Attempt a cross-map match + merge for keyframe kf_idx of map A.

        maps: {map_slot: MapState}.  Returns MergeResult or None; on success
        map A is absorbed into map B (A's entities appended to B's arena)."""
        for slot_b, kf_b, score in self.detect(map_slot_a, m_a, kf_idx, maps)[:3]:
            if slot_b == map_slot_a or slot_b not in maps:
                continue
            m_b = maps[slot_b]
            # trial union: plain concatenation (identity gauge) to evaluate
            # the match on one arena.  The TARGET map is spliced AS-IS — a
            # compaction here would shift its arena indices and silently
            # invalidate every id table pointing into it
            trial = ms.merge_maps(m_b, m_a, jnp.float32(1.0), jnp.eye(3), jnp.zeros(3))
            kf_off = int(m_b.next_kf) + kf_idx_after_compact(m_a, kf_idx)
            mp_off = int(m_b.next_mp)
            self.rng, key = jax.random.split(self.rng)
            est = estimate_sim3(
                key, trial, jnp.int32(kf_off), jnp.int32(kf_b), self.cam, self.cfg
            )
            if not bool(est["success"]):
                continue
            W_trial = ms.covisibility_matrix(trial)
            n_total, loop_mask, t_idx, okm = guided_projection_count(
                trial, jnp.int32(kf_off), jnp.int32(kf_b), est["S_qc"], self.cam,
                self.cfg, W_trial,
            )
            if int(n_total) < self.cfg.placerec.total_matches_thres:
                continue
            # real fusion with the gauge Sim3
            S_ba = gauge_from_match(trial, jnp.int32(kf_off), jnp.int32(kf_b), est["S_qc"])
            fused = ms.merge_maps(m_b, m_a, S_ba.s, S_ba.R, S_ba.t)
            # the gauge alignment already satisfies the loop constraint; the
            # merge edge for the essential graph must be measured from the
            # FUSED poses (merge_maps flattened A's Sim3 scale into SE3 —
            # reusing the pre-merge S_qc would re-apply the scale as error)
            kfs_f = fused.kfs
            T_q = SE3(R=kfs_f.R_cw[kf_off], t=kfs_f.t_cw[kf_off]).to_sim3()
            T_c = SE3(R=kfs_f.R_cw[kf_b], t=kfs_f.t_cw[kf_b]).to_sim3()
            S_qc_fused = T_q.compose(T_c.inverse())
            fused, _, cl_info = correct_loop(
                fused, jnp.int32(kf_off), jnp.int32(kf_b), S_qc_fused, self.cam,
                self.cfg, loop_mask=loop_mask, gp_t_idx=t_idx, gp_okm=okm,
            )
            if int(cl_info["covis_edges_dropped"]) > 0:
                print(f"[merge] essential graph dropped "
                      f"{int(cl_info['covis_edges_dropped'])} of "
                      f"{int(cl_info['covis_edges'])} strong covisibility edges")
            kf_remap, mp_remap = ms.compaction_remap(m_a)
            return MergeResult(
                fused=fused, S_from_to=S_ba, kf_offset=int(m_b.next_kf),
                mp_offset=mp_off, target_slot=slot_b,
                kf_remap=kf_remap, mp_remap=mp_remap,
            )
        return None


def kf_idx_after_compact(m: ms.MapState, kf_idx: int) -> int:
    """Arena index of a keyframe after compact_map (merge_maps compacts the
    absorbed map): its rank among alive keyframes in stable order."""
    keep = np.asarray(m.kfs.valid & ~m.kfs.bad)
    return int(np.sum(keep[:kf_idx]))
