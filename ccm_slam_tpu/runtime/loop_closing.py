"""Loop closing: detection, Sim(3) estimation, map correction, pose graph.

TPU-native re-design of ``LoopFinder`` (cslam/src/LoopFinder.cpp) — the
server-side intra-map loop pipeline:

  DetectLoop (:103-229)   -> detect(): BoW candidates + covisibility
                             consistency over 3 consecutive detections
  ComputeSim3 (:231-405)  -> estimate_sim3(): exact descriptor matching +
                             batched Sim3 RANSAC + robust pair refinement +
                             guided reprojection against the loop neighborhood
  CorrectLoop (:407-707)  -> correct_loop(): Sim3-propagate the current
                             neighborhood, fuse duplicate landmarks, Sim(3)
                             essential-graph optimization
  (GBA launch :688-694 is the server scheduler's job, runtime/server.py)

The reference's all-agent lock storm becomes: every stage is a pure function
MapState -> MapState; the host driver simply applies them in sequence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..models import keyframe_db as kdb
from ..models import map_store as ms
from ..ops import bow, matching
from ..solvers import sim3 as sim3_solver
from ..solvers import pose_graph as pg
from ..solvers.reproj import level_sigma2
from ..utils.lie import SE3, Sim3, orthonormalize


# ---------------------------------------------------------------------------
# Sim3 estimation between two keyframes
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def estimate_sim3(key, m: ms.MapState, kf_q, kf_c, cam, cfg: SystemConfig):
    """Match landmarks of query/candidate keyframes and estimate S_qc
    (candidate-camera -> query-camera similarity).

    Returns dict(success, S_qc, n_inliers, n_total) — thresholds from
    cfg.placerec (matches>=20 to attempt, inliers>=20, total>=40 handled by
    the caller after guided projection)."""
    kfs, mps = m.kfs, m.mps
    N = kfs.n_feat

    def kf_mp_state(k):
        mp = kfs.mp_idx[k]
        has = mp >= 0
        mpc = jnp.clip(mp, 0, mps.capacity - 1)
        ok = has & mps.valid[mpc] & ~mps.bad[mpc] & kfs.feat_valid[k]
        return mp, mpc, ok

    mp_q, mpc_q, ok_q = kf_mp_state(kf_q)
    mp_c, mpc_c, ok_c = kf_mp_state(kf_c)

    q_idx, dist, okm = matching.match_brute(
        kfs.desc[kf_q], ok_q, kfs.desc[kf_c], ok_c,
        th_dist=matching.TH_LOW, nn_ratio=0.75,
        q_angle=kfs.angle[kf_q], t_angle=kfs.angle[kf_c],
    )
    n_matches = jnp.sum(okm)

    # camera-frame 3D of the matched landmark in each keyframe
    tgt = jnp.clip(q_idx, 0, N - 1)
    Xq = (kfs.R_cw[kf_q] @ mps.pos[mpc_q].T).T + kfs.t_cw[kf_q]      # [N,3]
    Xc_all = (kfs.R_cw[kf_c] @ mps.pos[mpc_c].T).T + kfs.t_cw[kf_c]
    Xc = Xc_all[tgt]
    uv_q = kfs.xy[kf_q]
    uv_c = kfs.xy[kf_c][tgt]
    sf = cfg.extractor.scale_factor
    s2_q = level_sigma2(kfs.octave[kf_q], sf)
    s2_c = level_sigma2(kfs.octave[kf_c], sf)[tgt]
    max_err_q = 9.210 * s2_q
    max_err_c = 9.210 * s2_c

    S_qc, inl, n_in = sim3_solver.ransac_sim3(
        key, Xq, Xc, uv_q, uv_c, okm, max_err_q, max_err_c,
        cam.fx, cam.fy, cam.cx, cam.cy,
        n_hypotheses=cfg.placerec.max_iterations,
    )
    S_ref, inl2, n_in2 = sim3_solver.optimize_sim3(
        S_qc, Xq, Xc, uv_q, uv_c, inl, s2_q, s2_c,
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    success = (n_matches >= cfg.placerec.matches_thres) & (
        n_in2 >= cfg.placerec.inliers_thres
    )
    return {
        "success": success,
        "S_qc": S_ref,
        "n_matches": n_matches,
        "n_inliers": n_in2,
        "matched_mp": jnp.where(okm & inl2, mp_c[tgt], ms.NO_MP),  # per query-feature
    }


@partial(jax.jit, static_argnames=("cfg",))
def guided_projection_count(m: ms.MapState, kf_q, kf_c, S_qc: Sim3, cam, cfg: SystemConfig, covis_W):
    """Project the loop neighborhood's landmarks into the query keyframe
    through S_qc and count matches (SearchByProjection with the Sim3 cloud,
    LoopFinder.cpp:355-377). Returns (n_total, loop_mp_mask [M])."""
    kfs, mps = m.kfs, m.mps
    # loop landmark set: candidate + its covisible neighbors' landmarks
    nbr_idx, nbr_w, _ = ms.covis_neighbors(covis_W, kf_c, 10, min_weight=1)
    loop_mask = jnp.zeros((mps.capacity,), bool)
    row = kfs.mp_idx[kf_c]
    loop_mask = loop_mask.at[jnp.clip(row, 0, mps.capacity - 1)].max(row >= 0)
    for i in range(10):
        r = kfs.mp_idx[nbr_idx[i]]
        has = (r >= 0) & (nbr_w[i] > 0)
        loop_mask = loop_mask.at[jnp.clip(r, 0, mps.capacity - 1)].max(has)
    loop_mask = loop_mask & mps.valid & ~mps.bad

    # S_qw = S_qc o T_cw(candidate): world -> query-camera similarity
    T_cw = SE3(R=kfs.R_cw[kf_c], t=kfs.t_cw[kf_c])
    S_qw = S_qc.compose(T_cw.to_sim3())
    Xq = S_qw.apply(mps.pos)
    z = Xq[:, 2]
    uv = jnp.stack(
        [cam.fx * Xq[:, 0] / jnp.clip(z, 1e-6) + cam.cx,
         cam.fy * Xq[:, 1] / jnp.clip(z, 1e-6) + cam.cy], -1
    )
    q_ok = loop_mask & (z > 0) & cam.in_bounds(uv)
    sf = cfg.extractor.scale_factor
    dist3 = jnp.linalg.norm(Xq, axis=-1)
    pred_oct = matching.predict_octave(dist3, mps.max_dist * S_qw.s, sf, cfg.extractor.n_levels)
    radius = 10.0 * jnp.power(sf, pred_oct.astype(jnp.float32))
    t_idx, dmin, okm = matching.match_in_window(
        uv, mps.desc, q_ok, kfs.xy[kf_q], kfs.desc[kf_q], kfs.feat_valid[kf_q],
        radius=radius, th_dist=matching.TH_LOW, nn_ratio=1.0,
    )
    okm = matching._unique_target(t_idx, dmin, okm, kfs.n_feat)
    return jnp.sum(okm), loop_mask, t_idx, okm


# ---------------------------------------------------------------------------
# Loop correction
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "ess_iters"))
def correct_loop(
    m: ms.MapState,
    kf_q,
    kf_c,
    S_qc: Sim3,
    cam,
    cfg: SystemConfig,
    ess_iters: int = 20,
    loop_mask=None,
    gp_t_idx=None,
    gp_okm=None,
):
    """Sim3-correct the query neighborhood, then optimize the Sim(3)
    essential graph over the whole map (CorrectLoop + OptimizeEssentialGraph
    LoopClosure).  Returns (map', cost)."""
    kfs, mps = m.kfs, m.mps
    K = kfs.capacity
    alive = kfs.valid & ~kfs.bad

    W = ms.covisibility_matrix(m)
    parent = ms.spanning_tree(m, W)

    # --- corrected Sim3 poses for the query's neighborhood -----------------
    T_cw_cand = SE3(R=kfs.R_cw[kf_c], t=kfs.t_cw[kf_c])
    S_qw_corr = S_qc.compose(T_cw_cand.to_sim3())  # corrected query pose (with scale)
    T_all = SE3(R=kfs.R_cw, t=kfs.t_cw)            # batched, current estimates
    T_qw = SE3(R=kfs.R_cw[kf_q], t=kfs.t_cw[kf_q])
    # neighborhood: query + covisible
    nbhd = (W[kf_q] > 0).at[kf_q].set(True) & alive
    # S_iw_corr = T_iq o S_qw_corr,  T_iq = T_iw o T_qw^-1
    T_iq = T_all.compose(T_qw.inverse())  # batched [K]
    S_corr = T_iq.to_sim3().compose(
        Sim3(
            s=jnp.broadcast_to(S_qw_corr.s, (K,)),
            R=jnp.broadcast_to(S_qw_corr.R, (K, 3, 3)),
            t=jnp.broadcast_to(S_qw_corr.t, (K, 3)),
        )
    )
    # pre-correction poses as Sim3 (scale 1)
    S_pre = T_all.to_sim3()

    # landmark correction: move each neighborhood landmark with its
    # reference keyframe's correction  X' = S_corr_ref^-1( S_pre_ref(X) )
    ref = jnp.clip(mps.ref_kf, 0, K - 1)
    mp_move = mps.valid & ~mps.bad & nbhd[ref]
    S_pre_ref = jax.tree.map(lambda x: x[ref], S_pre)
    S_corr_ref = jax.tree.map(lambda x: x[ref], S_corr)
    X_new = S_corr_ref.inverse().apply(S_pre_ref.apply(mps.pos))
    pos2 = jnp.where(mp_move[:, None], X_new, mps.pos)

    # --- landmark fusion across the loop (LoopFinder.cpp:619-644 + 709-734) --
    # write the corrected geometry into the working map, then (a) replace the
    # query's matched landmarks by their loop counterparts and (b) project the
    # loop landmark set into the corrected neighborhood keyframes
    T_corr_se3 = S_corr.to_se3_scaled()
    kfs_work = kfs.replace(
        R_cw=jnp.where(nbhd[:, None, None], orthonormalize(T_corr_se3.R), kfs.R_cw),
        t_cw=jnp.where(nbhd[:, None], T_corr_se3.t, kfs.t_cw),
    )
    m_work = m.replace(kfs=kfs_work, mps=mps.replace(pos=pos2))
    if loop_mask is not None:
        from . import mapping as mapping_mod

        # (a) direct replacements from the guided projection: loop landmark
        # lm matched query feature gp_t_idx[lm]
        Mcap = mps.capacity
        N = kfs.n_feat
        lm_ids = jnp.arange(Mcap, dtype=jnp.int32)
        f_idx = jnp.clip(gp_t_idx, 0, N - 1)
        existing = m_work.kfs.mp_idx[kf_q][f_idx]
        okg = gp_okm & loop_mask
        # free feature -> associate loop landmark
        free_hit = okg & (existing < 0)
        row = m_work.kfs.mp_idx[kf_q]
        tsafe = jnp.where(free_hit, f_idx, N - 1)
        row = row.at[tsafe].add(jnp.where(free_hit, lm_ids - row[tsafe], 0))
        m_work = m_work.replace(
            kfs=m_work.kfs.replace(mp_idx=m_work.kfs.mp_idx.at[kf_q].set(row))
        )
        # occupied -> loop landmark wins the merge
        dup = okg & (existing >= 0) & (existing != lm_ids)
        loser = jnp.where(dup, jnp.clip(existing, 0, Mcap - 1), -1)
        winner = jnp.where(dup, lm_ids, -1)
        m_work = ms.replace_mappoints(m_work, loser, winner)
        # (b) SearchAndFuse into the neighborhood (top covisible + query)
        nbr_idx, nbr_w, _ = ms.covis_neighbors(W, kf_q, 8, min_weight=1)
        m_work, _, _ = mapping_mod.fuse_into(
            m_work, kf_q, loop_mask, cam, cfg, radius_base=4.0, prefer_candidate=True
        )
        for i in range(8):
            tgt = nbr_idx[i]
            mask_i = loop_mask & (nbr_w[i] > 0)
            m_work, _, _ = mapping_mod.fuse_into(
                m_work, tgt, mask_i, cam, cfg, radius_base=4.0, prefer_candidate=True
            )
        # refresh derived graph structure after fusion
        W = ms.covisibility_matrix(m_work)
        parent = ms.spanning_tree(m_work, W)
    mps = m_work.mps
    pos2 = mps.pos
    ref = jnp.clip(mps.ref_kf, 0, K - 1)

    # --- essential graph ----------------------------------------------------
    # vertex init: corrected Sim3 for the neighborhood, current poses else
    S_vert = jax.tree.map(
        lambda c, p: jnp.where(
            nbhd.reshape((K,) + (1,) * (p.ndim - 1)), c, p
        ),
        S_corr,
        S_pre,
    )
    # edges: spanning tree + strong covisibility + the loop edge.
    # measurements from PRE-correction relative poses (odometry as drifted),
    # loop edge measured by the Sim3 estimate.
    has_parent = parent >= 0
    e1_i = jnp.arange(K, dtype=jnp.int32)
    e1_j = jnp.clip(parent, 0, K - 1)
    e1_valid = has_parent & alive & alive[e1_j]
    S1 = pg.relative_sim3(S_pre, jax.tree.map(lambda x: x[e1_j], S_pre))

    # strong covisibility edges (weight >= ess_graph_min_feats), upper triangle
    strong = (W >= cfg.opt.ess_graph_min_feats) & alive[:, None] & alive[None, :]
    strong = jnp.triu(strong, 1)
    # flatten to a bounded edge list: top E pairs by weight.  The cap is NOT
    # silent: the count of strong edges beyond it is surfaced in `info` and
    # logged by the host callers (repo no-silent-caps rule)
    E_cov = K * 4
    n_strong = jnp.sum(strong)
    flat_w = jnp.where(strong, W, 0).reshape(-1)
    topw, topi = jax.lax.top_k(flat_w, E_cov)
    e2_i = (topi // K).astype(jnp.int32)
    e2_j = (topi % K).astype(jnp.int32)
    e2_valid = topw > 0
    S2 = pg.relative_sim3(
        jax.tree.map(lambda x: x[e2_i], S_pre), jax.tree.map(lambda x: x[e2_j], S_pre)
    )

    # loop edge: S_qc maps candidate-cam -> query-cam = measured S_q_c
    e3_i = jnp.array([kf_q], jnp.int32)
    e3_j = jnp.array([kf_c], jnp.int32)
    S3 = Sim3(s=S_qc.s[None], R=S_qc.R[None], t=S_qc.t[None])
    e3_valid = jnp.array([True])

    # ALL previously recorded loop edges (the per-KF table mirrors
    # mspLoopEdges — every lap of a loop world accumulates one; the essential
    # graph must see them all, Optimizer.cpp:1120-1160 sLoopEdges).  Edges
    # are stored in both endpoints; keep the canonical i<j orientation.
    L = kfs.loop_edges.shape[1]
    e4_i = jnp.repeat(jnp.arange(K, dtype=jnp.int32), L)
    le_flat = kfs.loop_edges.reshape(-1)
    e4_j = jnp.clip(le_flat, 0, K - 1)
    e4_valid = (le_flat >= 0) & alive[e4_i] & alive[e4_j] & (e4_i < e4_j)
    S4 = pg.relative_sim3(
        jax.tree.map(lambda x: x[e4_i], S_pre), jax.tree.map(lambda x: x[e4_j], S_pre)
    )

    def cat(*xs):
        return jnp.concatenate(xs)

    prob = pg.PoseGraphProblem(
        S_w=S_vert,
        fixed=jnp.arange(K) == kf_c,  # loop-match KF anchors the graph
        vert_valid=alive,
        i_idx=cat(e1_i, e2_i, e3_i, e4_i),
        j_idx=cat(e1_j, e2_j, e3_j, e4_j),
        S_meas=jax.tree.map(lambda *x: jnp.concatenate(x), S1, S2, S3, S4),
        edge_valid=cat(e1_valid, e2_valid, e3_valid, e4_valid),
        weight=jnp.ones((K + E_cov + 1 + K * L,), jnp.float32),
    )
    S_opt, cost = pg.optimize_pose_graph(prob, iters=ess_iters)

    # --- apply: poses [R, t/s]; landmarks via reference-KF transform --------
    T_new = S_opt.to_se3_scaled()
    kfs = m_work.kfs  # carries the fused forward links
    kfs2 = kfs.replace(
        R_cw=jnp.where(alive[:, None, None], orthonormalize(T_new.R), kfs.R_cw),
        t_cw=jnp.where(alive[:, None], T_new.t, kfs.t_cw),
        pose_version=kfs.pose_version + alive.astype(jnp.int32),
    )
    kfs2, le_dropped = ms.add_loop_edge(kfs2, kf_q, kf_c)
    # landmark update: X'' = S_opt_ref^-1( S_vert_ref(X') )
    S_vert_ref = jax.tree.map(lambda x: x[ref], S_vert)
    S_opt_ref = jax.tree.map(lambda x: x[ref], S_opt)
    mp_ok = mps.valid & ~mps.bad & alive[ref]
    X_final = S_opt_ref.inverse().apply(S_vert_ref.apply(pos2))
    mps2 = mps.replace(
        pos=jnp.where(mp_ok[:, None], X_final, pos2),
        pos_version=mps.pos_version + 1,
    )
    info = {
        "covis_edges": n_strong,
        "covis_edges_dropped": jnp.maximum(0, n_strong - E_cov),
        "loop_edges_dropped": le_dropped,
    }
    return m.replace(kfs=kfs2, mps=mps2), cost, info


# ---------------------------------------------------------------------------
# Host driver with consistency bookkeeping
# ---------------------------------------------------------------------------


@dataclass
class LoopFinder:
    """Per-map loop detector/corrector (host orchestration).

    Consistency rule (LoopFinder::DetectLoop:152-215): a candidate's
    covisibility group must be "consistent" (share a member) with groups from
    `covisibility_consistency_th` consecutive detections before ComputeSim3
    is attempted."""

    cfg: SystemConfig
    cam: object
    vocab: bow.Vocabulary
    db: kdb.KeyFrameDB
    map_id: int = 0
    last_loop_kf_id: int = -10**9
    prev_groups: list = field(default_factory=list)  # [(mask ndarray, count)]
    rng: object = None

    def __post_init__(self):
        if self.rng is None:
            self.rng = jax.random.PRNGKey(1234 + self.map_id)

    def insert_keyframe(self, m: ms.MapState, kf_idx: int):
        vec, _ = bow.transform(
            self.vocab, m.kfs.desc[kf_idx], m.kfs.feat_valid[kf_idx]
        )
        self.db = kdb.add(self.db, kf_idx, vec, self.map_id)
        return vec

    def insert_keyframes(self, m: ms.MapState, kf_idxs):
        """Batched registration (one vmapped BoW transform + one scatter) —
        the per-message path of the jitted server ingest."""
        if len(kf_idxs) == 0:
            return
        idx = jnp.asarray(kf_idxs, jnp.int32)
        vecs, _ = bow.transform_batch(self.vocab, m.kfs.desc[idx], m.kfs.feat_valid[idx])
        self.db = kdb.add(self.db, idx, vecs, self.map_id)

    def detect(self, m: ms.MapState, kf_idx: int, covis_W):
        """Returns list of consistent-enough candidate arena indices."""
        # ALWAYS register the keyframe first: early keyframes are exactly the
        # candidates later queries must find (the reference adds to the
        # database unconditionally, Mapping.cpp:173)
        vec = self.insert_keyframe(m, kf_idx)
        kf_id = int(m.kfs.kf_id[kf_idx])
        if int(jnp.sum(m.kfs.valid & ~m.kfs.bad)) < 10:
            return []
        if kf_id < self.last_loop_kf_id + self.cfg.placerec.new_loop_thres:
            return []
        min_score, has_nbr = kdb.min_covisible_score(self.db, vec, kf_idx, covis_W)
        if not bool(has_nbr):
            return []
        cand_mask, scores = kdb.detect_loop_candidates(
            self.db, vec, jnp.int32(kf_idx), jnp.int32(self.map_id), covis_W, min_score
        )
        cand = np.where(np.asarray(cand_mask))[0]
        if len(cand) == 0:
            self.prev_groups = []
            return []

        # covisibility-consistency over consecutive detections
        Wnp = np.asarray(covis_W)
        consistent_enough = []
        new_groups = []
        for c in cand:
            group = set(np.where(Wnp[c] > 0)[0].tolist()) | {int(c)}
            best_count = 0
            for mask, count in self.prev_groups:
                if group & mask:
                    best_count = max(best_count, count + 1)
            new_groups.append((group, best_count))
            if best_count + 1 >= self.cfg.placerec.covisibility_consistency_th:
                consistent_enough.append(int(c))
        self.prev_groups = new_groups
        return consistent_enough

    def try_close(self, m: ms.MapState, kf_idx: int):
        """Full loop pipeline for one keyframe.  Returns (map, closed?)."""
        covis_W = ms.covisibility_matrix(m)
        candidates = self.detect(m, kf_idx, covis_W)
        for cand in candidates[:3]:
            self.rng, key = jax.random.split(self.rng)
            est = estimate_sim3(key, m, jnp.int32(kf_idx), jnp.int32(cand), self.cam, self.cfg)
            if not bool(est["success"]):
                continue
            n_total, loop_mask, t_idx, okm = guided_projection_count(
                m, jnp.int32(kf_idx), jnp.int32(cand), est["S_qc"], self.cam, self.cfg, covis_W
            )
            if int(n_total) < self.cfg.placerec.total_matches_thres:
                continue
            # no-silent-caps: the guided projection only sees the candidate's
            # top-10 covisible neighbors (LoopFinder.cpp:355 vicinity)
            n_nbr = int(jnp.sum(covis_W[cand] > 0))
            if n_nbr > 10:
                print(f"[loop] guided projection truncated candidate "
                      f"vicinity {n_nbr} -> 10 neighbors")
            m, cost, info = correct_loop(
                m, jnp.int32(kf_idx), jnp.int32(cand), est["S_qc"], self.cam, self.cfg,
                loop_mask=loop_mask, gp_t_idx=t_idx, gp_okm=okm,
            )
            if int(info["covis_edges_dropped"]) > 0:
                print(f"[loop] essential graph kept top {int(info['covis_edges'])-int(info['covis_edges_dropped'])} "
                      f"of {int(info['covis_edges'])} strong covisibility edges")
            if int(info["loop_edges_dropped"]) > 0:
                print(f"[loop] loop-edge table full on an endpoint: "
                      f"{int(info['loop_edges_dropped'])} direction(s) dropped "
                      f"(raise map_store.MAX_LOOP_EDGES)")
            self.last_loop_kf_id = int(m.kfs.kf_id[kf_idx])
            self.prev_groups = []
            return m, True
        return m, False
