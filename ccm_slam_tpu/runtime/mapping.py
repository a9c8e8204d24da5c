"""Local mapping: landmark creation, culling, fusion, trimming, local BA.

TPU-native counterpart of the client side of ``LocalMapping``
(cslam/src/Mapping.cpp:42-121 RunClient) plus ``Map::MapTrimming``
(cslam/src/Map.cpp:857-1063).  The reference runs this on its own thread with
try-locks against Tracking/Comm; here it is a deterministic step invoked
right after each keyframe insertion — same work, snapshot semantics instead
of locks (the multi-agent runtime interleaves these steps explicitly).

Stage mapping:
  MapPointCullingClient (:704)   -> cull_mappoints()
  CreateNewMapPoints (:284-469)  -> triangulate_new_points()
  SearchInNeighbors (:471-547)   -> fuse_neighbors()
  Map::MapTrimming               -> trim_keyframes()
  LocalBundleAdjustmentClient    -> local_ba()
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..models import map_store as ms
from ..ops import initializer as init_ops
from ..ops import matching
from ..solvers import ba
from ..solvers.reproj import level_sigma2
from .tracking import apply_ba_result, build_ba_problem

NO_MP = ms.NO_MP


@partial(jax.jit, static_argnames=("cfg",))
def cull_mappoints(m: ms.MapState, cur_kf_id, cfg: SystemConfig):
    """Recent-landmark culling (MapPointCullingClient semantics): erase
    landmarks with found/visible < 0.25, or older than 2 KFs with <= 2
    observations."""
    mps = m.mps
    alive = mps.valid & ~mps.bad
    found_ratio = mps.n_found.astype(jnp.float32) / jnp.clip(
        mps.n_visible.astype(jnp.float32), 1.0
    )
    age = cur_kf_id - mps.first_kf_id
    bad1 = found_ratio < 0.25
    bad2 = (age >= 2) & (mps.obs_n <= 2)
    recent = age <= 3  # only recently created landmarks are on trial
    kill = alive & recent & (bad1 | bad2)
    return ms.erase_mappoints(m, kill), jnp.sum(kill)


@partial(jax.jit, static_argnames=("cfg",))
def cull_mappoints_server(m: ms.MapState, cfg: SystemConfig):
    """Server-side recent-landmark culling (MapPointCullingServer,
    cslam/src/Mapping.cpp:738-770): landmarks whose found-ratio fell below
    0.25, or that are >= 3 ingested keyframes old with <= 3 observations,
    are retired.  'Age' uses the keyframe arena cursor vs the landmark's
    reference keyframe slot — the arena grows monotonically with server
    ingestion, the analogue of the reference's mCountKFs counter."""
    mps = m.mps
    alive = mps.valid & ~mps.bad
    age = m.next_kf - jnp.clip(mps.first_kf_id, 0, None)
    found_ratio = mps.n_found.astype(jnp.float32) / jnp.clip(
        mps.n_visible.astype(jnp.float32), 1.0
    )
    recent = age <= 4  # only recently ingested landmarks are on trial
    kill = alive & recent & ((found_ratio < 0.25) | ((age >= 3) & (mps.obs_n <= 3)))
    return ms.erase_mappoints(m, kill), jnp.sum(kill)


@partial(jax.jit, static_argnames=("cfg", "n_neighbors"))
def triangulate_new_points(
    m: ms.MapState, kf_idx, cam, cfg: SystemConfig, n_neighbors: int = 10,
    next_mp_id=None, client_id=0,
):
    """Epipolar search + triangulation against the top covisible neighbors
    (CreateNewMapPoints).  Returns (map', n_created)."""
    kfs = m.kfs
    N = kfs.n_feat
    sf = cfg.extractor.scale_factor

    row = ms.covis_row(m, kf_idx)
    nbr_w, nbr_idx = jax.lax.top_k(row, n_neighbors)

    R1 = kfs.R_cw[kf_idx]
    t1 = kfs.t_cw[kf_idx]
    O1 = -(R1.T @ t1)
    total_created = jnp.int32(0)
    if next_mp_id is None:
        next_mp_id = m.next_mp

    K_mat = cam.K

    def one_neighbor(carry, nb_and_w):
        m, total = carry
        nb, w_nb = nb_and_w
        kfs = m.kfs
        R2 = kfs.R_cw[nb]
        t2 = kfs.t_cw[nb]
        O2 = -(R2.T @ t2)

        # baseline / scene-depth ratio gate (Mapping.cpp:316-325)
        baseline = jnp.linalg.norm(O2 - O1)
        # median depth of neighbor's landmarks as scene depth proxy
        mp_nb = kfs.mp_idx[nb]
        has_nb = mp_nb >= 0
        z_nb = ((R2 @ m.mps.pos[jnp.clip(mp_nb, 0, m.mps.capacity - 1)].T).T + t2)[:, 2]
        med_depth = jnp.nanmedian(jnp.where(has_nb, z_nb, jnp.nan))
        med_depth = jnp.where(jnp.isfinite(med_depth) & (med_depth > 0), med_depth, 1.0)
        nb_ok = (w_nb > 0) & (nb != kf_idx) & (baseline / med_depth > 0.01)

        # With Xc1 = R12 Xc2 + t12 the epipolar constraint is
        # x1^T F x2 = 0 for F = K^-T [t12]x R12 K^-1, so lines in image 2 are
        # l2 = F^T x1 = x1 @ F — exactly what epipolar_line_dist2 computes.
        R12 = R1 @ R2.T
        t12 = t1 - (R12 @ t2)
        E = jnp.array(
            [[0.0, -t12[2], t12[1]], [t12[2], 0.0, -t12[0]], [-t12[1], t12[0], 0.0]]
        ) @ R12
        Kinv = jnp.linalg.inv(K_mat)
        F_for_mask = Kinv.T @ E @ Kinv

        free1 = kfs.feat_valid[kf_idx] & (kfs.mp_idx[kf_idx] < 0)
        free2 = kfs.feat_valid[nb] & (kfs.mp_idx[nb] < 0)
        s2_2 = level_sigma2(kfs.octave[nb], sf)
        idx2, dist, okm = matching.search_for_triangulation(
            kfs.desc[kf_idx], free1 & nb_ok, kfs.xy[kf_idx], kfs.angle[kf_idx],
            level_sigma2(kfs.octave[kf_idx], sf),
            kfs.desc[nb], free2, kfs.xy[nb], kfs.angle[nb], s2_2,
            F_for_mask,
        )

        # triangulate matched pairs
        P1 = K_mat @ jnp.concatenate([R1, t1[:, None]], 1)
        P2 = K_mat @ jnp.concatenate([R2, t2[:, None]], 1)
        p1 = kfs.xy[kf_idx]
        p2 = kfs.xy[nb][jnp.clip(idx2, 0, N - 1)]
        X = init_ops.triangulate(P1, P2, p1, p2)

        # acceptance gates (Mapping.cpp:388-457)
        Xc1 = (R1 @ X.T).T + t1
        Xc2 = (R2 @ X.T).T + t2
        z1, z2 = Xc1[:, 2], Xc2[:, 2]
        r1 = jnp.stack(
            [cam.fx * Xc1[:, 0] / jnp.clip(z1, 1e-9) + cam.cx - p1[:, 0],
             cam.fy * Xc1[:, 1] / jnp.clip(z1, 1e-9) + cam.cy - p1[:, 1]], -1
        )
        r2 = jnp.stack(
            [cam.fx * Xc2[:, 0] / jnp.clip(z2, 1e-9) + cam.cx - p2[:, 0],
             cam.fy * Xc2[:, 1] / jnp.clip(z2, 1e-9) + cam.cy - p2[:, 1]], -1
        )
        s2_1v = level_sigma2(kfs.octave[kf_idx], sf)
        s2_2v = s2_2[jnp.clip(idx2, 0, N - 1)]
        ray1 = X - O1
        ray2 = X - O2
        cos_par = jnp.sum(ray1 * ray2, -1) / jnp.clip(
            jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12
        )
        d1 = jnp.linalg.norm(ray1, axis=-1)
        d2 = jnp.linalg.norm(ray2, axis=-1)
        ratio_dist = d2 / jnp.clip(d1, 1e-9)
        oct1 = kfs.octave[kf_idx]
        oct2 = kfs.octave[nb][jnp.clip(idx2, 0, N - 1)]
        ratio_oct = jnp.power(sf, (oct1 - oct2).astype(jnp.float32))
        ratio_factor = 1.5 * sf
        good = (
            okm
            & nb_ok
            & jnp.all(jnp.isfinite(X), -1)
            & (z1 > 0)
            & (z2 > 0)
            & (cos_par < 0.9998)
            & (jnp.sum(r1 * r1, -1) < 5.991 * s2_1v)
            & (jnp.sum(r2 * r2, -1) < 5.991 * s2_2v)
            & (ratio_dist * ratio_factor > ratio_oct)
            & (ratio_dist < ratio_oct * ratio_factor)
        )

        # allocate landmarks
        dist1 = d1
        lsf = jnp.power(sf, oct1.astype(jnp.float32))
        max_d = dist1 * lsf
        min_d = max_d / (sf ** (cfg.extractor.n_levels - 1))
        normal = (ray1 / jnp.clip(d1[:, None], 1e-9) + ray2 / jnp.clip(d2[:, None], 1e-9))
        normal = normal / jnp.clip(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
        m, new_idx = ms.add_mappoints(
            m,
            n_new=jnp.sum(good),
            pos=X,
            desc=kfs.desc[kf_idx],
            normal=normal,
            min_dist=min_d,
            max_dist=max_d,
            ref_kf=jnp.full((N,), kf_idx, jnp.int32),
            mp_ids=next_mp_id + total + jnp.cumsum(good.astype(jnp.int32)) - 1,
            client_id=jnp.full((N,), client_id, jnp.int32),
            new_valid=good,
        )
        # forward links in both keyframes (collision-free: feature slots unique)
        kfs2 = m.kfs
        mp_row1 = kfs2.mp_idx[kf_idx]
        mp_row1 = jnp.where(good, new_idx, mp_row1)
        feat2 = jnp.where(good, idx2, N - 1)
        row2 = kfs2.mp_idx[nb]
        delta2 = jnp.where(good, new_idx - row2[feat2], 0)
        mp_row2 = row2.at[feat2].add(delta2)
        kfs2 = kfs2.replace(
            mp_idx=kfs2.mp_idx.at[kf_idx].set(mp_row1).at[nb].set(mp_row2)
        )
        m = m.replace(kfs=kfs2)
        # reverse obs for the two keyframes
        m = ms.register_observations(m, kf_idx, jnp.where(good, new_idx, NO_MP))
        m = ms.register_observations(m, nb, jnp.where(good, new_idx, NO_MP))
        return (m, total + jnp.sum(good)), None

    for i in range(n_neighbors):
        (m, total_created), _ = one_neighbor((m, total_created), (nbr_idx[i], nbr_w[i]))

    m = ms.update_normal_and_depth(m, sf, cfg.extractor.n_levels)
    return m, total_created


def fuse_into(
    m: ms.MapState,
    target_kf,
    cand_mask,
    cam,
    cfg: SystemConfig,
    radius_base: float = 3.0,
    prefer_candidate: bool = False,
):
    """Project candidate landmarks into target_kf and fuse (ORBmatcher::Fuse
    semantics): free feature -> new association; occupied feature -> merge.
    `prefer_candidate` forces the candidate to win merges regardless of
    observation count (the loop-closure rule, LoopFinder.cpp:619-644)."""
    sf = cfg.extractor.scale_factor
    kfs, mps = m.kfs, m.mps
    N = kfs.n_feat
    R = kfs.R_cw[target_kf]
    t = kfs.t_cw[target_kf]
    Xc = (R @ mps.pos.T).T + t
    z = Xc[:, 2]
    uv = jnp.stack(
        [cam.fx * Xc[:, 0] / jnp.clip(z, 1e-6) + cam.cx,
         cam.fy * Xc[:, 1] / jnp.clip(z, 1e-6) + cam.cy], -1
    )
    Ow = -(R.T @ t)
    view = mps.pos - Ow
    dist3 = jnp.linalg.norm(view, axis=-1)
    cosv = jnp.sum(view * mps.normal, -1) / jnp.clip(dist3, 1e-9)
    ok = (
        cand_mask
        & mps.valid
        & ~mps.bad
        & (z > 0)
        & cam.in_bounds(uv)
        & (dist3 >= 0.8 * mps.min_dist)
        & (dist3 <= 1.2 * mps.max_dist)
        & (cosv > 0.5)
    )
    pred_oct = matching.predict_octave(dist3, mps.max_dist, sf, cfg.extractor.n_levels)
    radius = radius_base * jnp.power(sf, pred_oct.astype(jnp.float32))
    t_idx, dmin, okm = matching.match_in_window(
        uv, mps.desc, ok, kfs.xy[target_kf], kfs.desc[target_kf],
        kfs.feat_valid[target_kf],
        radius=radius, th_dist=matching.TH_LOW, nn_ratio=1.0,
        t_octave=kfs.octave[target_kf], octave_min=pred_oct - 1, octave_max=pred_oct + 1,
    )
    okm = matching._unique_target(t_idx, dmin, okm, N)

    existing = kfs.mp_idx[target_kf][jnp.clip(t_idx, 0, N - 1)]
    Mcap = mps.capacity
    self_ids = jnp.arange(Mcap, dtype=jnp.int32)
    # case A: free feature -> new association
    free_hit = okm & (existing < 0)
    row = kfs.mp_idx[target_kf]
    tsafe = jnp.where(free_hit, t_idx, N - 1)
    delta = jnp.where(free_hit, self_ids - row[tsafe], 0)
    row = row.at[tsafe].add(delta)
    m = m.replace(kfs=kfs.replace(mp_idx=kfs.mp_idx.at[target_kf].set(row)))
    # case B: occupied -> merge; keep the landmark with more observations
    dup_hit = okm & (existing >= 0) & (existing != self_ids)
    ex_safe = jnp.clip(existing, 0, Mcap - 1)
    if prefer_candidate:
        cand_wins = jnp.ones((Mcap,), bool)
    else:
        cand_wins = mps.obs_n[self_ids] > mps.obs_n[ex_safe]
    loser = jnp.where(dup_hit, jnp.where(cand_wins, ex_safe, self_ids), -1)
    winner = jnp.where(dup_hit, jnp.where(cand_wins, self_ids, ex_safe), -1)
    m = ms.replace_mappoints(m, loser, winner)
    return m, jnp.sum(free_hit), jnp.sum(dup_hit)


def _fuse_subset(m, target_kf, cand_idx, cand_ok, cam, cfg,
                 radius_base=3.0, rebuild=True):
    """fuse_into over a COMPACT candidate index set [P] — the per-keyframe
    fusion work then scales with the candidate count, not the arena size.
    Same semantics as fuse_into (obs-count merge rule); the reverse-table
    rebuild can be deferred by the caller batching several passes."""
    sf = cfg.extractor.scale_factor
    kfs, mps = m.kfs, m.mps
    N = kfs.n_feat
    Mcap = mps.capacity
    ci = jnp.clip(cand_idx, 0, Mcap - 1)
    pos = mps.pos[ci]
    R = kfs.R_cw[target_kf]
    t = kfs.t_cw[target_kf]
    Xc = (R @ pos.T).T + t
    z = Xc[:, 2]
    uv = jnp.stack(
        [cam.fx * Xc[:, 0] / jnp.clip(z, 1e-6) + cam.cx,
         cam.fy * Xc[:, 1] / jnp.clip(z, 1e-6) + cam.cy], -1
    )
    Ow = -(R.T @ t)
    view = pos - Ow
    dist3 = jnp.linalg.norm(view, axis=-1)
    cosv = jnp.sum(view * mps.normal[ci], -1) / jnp.clip(dist3, 1e-9)
    ok = (
        cand_ok
        & mps.valid[ci]
        & ~mps.bad[ci]
        & (z > 0)
        & cam.in_bounds(uv)
        & (dist3 >= 0.8 * mps.min_dist[ci])
        & (dist3 <= 1.2 * mps.max_dist[ci])
        & (cosv > 0.5)
    )
    pred_oct = matching.predict_octave(dist3, mps.max_dist[ci], sf, cfg.extractor.n_levels)
    radius = radius_base * jnp.power(sf, pred_oct.astype(jnp.float32))
    t_idx, dmin, okm = matching.match_in_window(
        uv, mps.desc[ci], ok, kfs.xy[target_kf], kfs.desc[target_kf],
        kfs.feat_valid[target_kf],
        radius=radius, th_dist=matching.TH_LOW, nn_ratio=1.0,
        t_octave=kfs.octave[target_kf], octave_min=pred_oct - 1, octave_max=pred_oct + 1,
    )
    okm = matching._unique_target(t_idx, dmin, okm, N)

    existing = kfs.mp_idx[target_kf][jnp.clip(t_idx, 0, N - 1)]
    free_hit = okm & (existing < 0)
    row = kfs.mp_idx[target_kf]
    tsafe = jnp.where(free_hit, t_idx, N - 1)
    delta = jnp.where(free_hit, ci - row[tsafe], 0)
    row = row.at[tsafe].add(delta)
    m = m.replace(kfs=kfs.replace(mp_idx=kfs.mp_idx.at[target_kf].set(row)))
    dup_hit = okm & (existing >= 0) & (existing != ci)
    ex_safe = jnp.clip(existing, 0, Mcap - 1)
    cand_wins = mps.obs_n[ci] > mps.obs_n[ex_safe]
    loser = jnp.where(dup_hit, jnp.where(cand_wins, ex_safe, ci), -1)
    winner = jnp.where(dup_hit, jnp.where(cand_wins, ci, ex_safe), -1)
    m = ms.replace_mappoints(m, loser, winner, rebuild=rebuild)
    return m, jnp.sum(free_hit), jnp.sum(dup_hit), loser, winner


@partial(jax.jit, static_argnames=("cfg", "n_neighbors"))
def fuse_neighbors(m: ms.MapState, kf_idx, cam, cfg: SystemConfig, n_neighbors: int = 10):
    """Duplicate-landmark fusion with covisible neighbors (SearchInNeighbors
    + ORBmatcher::Fuse): project each neighbor's landmarks into the target
    keyframe and the target's landmarks into each neighbor."""
    sf = cfg.extractor.scale_factor
    N = m.kfs.n_feat
    row = ms.covis_row(m, kf_idx)
    nbr_w, nbr_idx = jax.lax.top_k(row, n_neighbors)

    # candidates: the neighbors' landmark rows, as a COMPACT [n_neighbors*N]
    # index set (arena-wide masks would make each fusion pass O(M))
    cand_idx = m.kfs.mp_idx[nbr_idx].reshape(-1)            # [n_neighbors*N]
    cand_ok = (cand_idx >= 0) & jnp.repeat(nbr_w > 0, N)
    # dedup within the set (same landmark seen by several neighbors) and
    # exclude landmarks already associated in the target
    ci = jnp.clip(cand_idx, 0, m.mps.capacity - 1)
    first = jnp.zeros((m.mps.capacity,), jnp.int32).at[ci].max(
        jnp.where(cand_ok, jnp.arange(cand_idx.shape[0], dtype=jnp.int32) + 1, 0)
    )
    cand_ok = cand_ok & (first[ci] == jnp.arange(cand_idx.shape[0], dtype=jnp.int32) + 1)
    own = m.kfs.mp_idx[kf_idx]
    in_target = jnp.zeros((m.mps.capacity,), bool).at[
        jnp.clip(own, 0, m.mps.capacity - 1)
    ].max(own >= 0)
    cand_ok = cand_ok & ~in_target[ci]

    # loser->winner redirect table accumulated across the whole pass, so the
    # tracker can implement CheckReplacedInLastFrame (Tracking.cpp:469):
    # last-frame associations to fused-away landmarks follow their winner
    # instead of silently dying with the loser's bad flag
    Mcap = m.mps.capacity
    redirect = jnp.arange(Mcap, dtype=jnp.int32)

    def _compose(redirect, loser, winner):
        act = (loser >= 0) & (winner >= 0) & (loser != winner)
        safe_l = jnp.where(act, loser, Mcap - 1)
        # single-winner max scatter: if two lanes ever name the same loser
        # (they shouldn't — candidates exclude the target row — but replace
        # paths have collided before) the larger winner index wins
        # deterministically instead of producing a garbage sum
        won = jnp.full((Mcap,), -1, jnp.int32).at[safe_l].max(
            jnp.where(act, winner, -1)
        )
        step = jnp.where(won >= 0, won, jnp.arange(Mcap, dtype=jnp.int32))
        return step[redirect]

    m, n_add, n_merge, lo, wi = _fuse_subset(m, kf_idx, cand_idx, cand_ok,
                                             cam, cfg, rebuild=False)
    redirect = _compose(redirect, lo, wi)

    # reverse direction: project the target's landmarks into each neighbor.
    # Candidates already linked in the neighbor's row stay ELIGIBLE: their
    # window match against a different feature merges cross-duplicates
    # (c<->existing) that single-shot fusion otherwise never unifies —
    # excluding them (tried round 5) measurably starved covisibility and
    # tripled loop-world ATE.  Collision safety for the redirect table comes
    # from the single-winner max scatters in _compose/replace_mappoints.
    own2 = m.kfs.mp_idx[kf_idx]
    own_ok0 = own2 >= 0
    for i in range(n_neighbors):
        nb = nbr_idx[i]
        mm, a, g, lo, wi = _fuse_subset(
            m, nb, own2, own_ok0 & (nbr_w[i] > 0),
            cam, cfg, rebuild=False)
        m = mm
        n_add = n_add + a
        n_merge = n_merge + g
        redirect = _compose(redirect, lo, wi)

    # one deferred rebuild restores the forward/reverse invariant for the
    # whole pass (each _fuse_subset only rewrote forward links + bad flags)
    m = ms.rebuild_observations(m)
    m = ms.update_normal_and_depth(m, sf, cfg.extractor.n_levels)
    m = ms.compute_distinctive_descriptors(m)
    return m, n_add, n_merge, redirect


@partial(jax.jit, static_argnames=("cfg",))
def keyframe_redundancy(m: ms.MapState, cfg: SystemConfig):
    """Per-keyframe redundancy ratio (KeyFrameCullingV3, Mapping.cpp:771-863):
    the fraction of a keyframe's landmarks that are observed >= 3 more times
    by other keyframes at the same or finer pyramid scale (+1 tolerance).

    Returns ratio [K]; the server culls keyframes with ratio >= RedThres."""
    kfs, mps = m.kfs, m.mps
    K, N = kfs.capacity, kfs.n_feat
    O = mps.max_obs
    # for each (kf k, feat n) with landmark p: octave of OUR observation
    mp = kfs.mp_idx  # [K,N]
    has = (mp >= 0) & kfs.feat_valid
    mpc = jnp.clip(mp, 0, mps.capacity - 1)
    own_oct = kfs.octave  # [K,N]
    # octave of every observation of p: gather through the reverse table
    obs_kf = jnp.clip(mps.obs_kf, 0, K - 1)           # [M,O]
    obs_feat = jnp.clip(mps.obs_feat, 0, N - 1)
    obs_ok = (jnp.arange(O)[None, :] < mps.obs_n[:, None]) & (mps.obs_kf >= 0)
    obs_oct = kfs.octave[obs_kf, obs_feat]            # [M,O]
    # count per landmark per own-octave threshold: we need, for (k,n),
    # #obs of p at octave <= own_oct+1, excluding k itself
    p_oct = obs_oct[mpc]                              # [K,N,O]
    p_ok = obs_ok[mpc]                                # [K,N,O]
    p_kf = mps.obs_kf[mpc]                            # [K,N,O]
    fine = p_ok & (p_oct <= (own_oct[..., None] + 1)) & (p_kf != jnp.arange(K)[:, None, None])
    n_fine = jnp.sum(fine, axis=-1)                   # [K,N]
    redundant = has & (n_fine >= 3)
    n_mps = jnp.sum(has, axis=1)
    ratio = jnp.sum(redundant, axis=1) / jnp.clip(n_mps, 1)
    alive = kfs.valid & ~kfs.bad
    return jnp.where(alive & (n_mps > 0), ratio, 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def cull_redundant_keyframes(m: ms.MapState, cfg: SystemConfig, protect_recent: int = 20):
    """Server keyframe culling: erase keyframes whose redundancy ratio
    exceeds RedThres (skipping the most recent window and the two oldest
    gauge anchors).  Returns (map, n_culled)."""
    ratio = keyframe_redundancy(m, cfg)
    kfs = m.kfs
    alive = kfs.valid & ~kfs.bad
    order = kfs.insert_order
    newest = jnp.max(jnp.where(alive, order, -1))
    recent = order > newest - protect_recent
    oldest = jnp.sort(jnp.where(alive, order, jnp.iinfo(jnp.int32).max))[:2]
    anchor = (order == oldest[0]) | (order == oldest[1])
    kill = alive & ~recent & ~anchor & (ratio >= cfg.mapping.red_thres)
    m = ms.erase_keyframes(m, kill)
    m = ms.compact_observations(m)
    return m, jnp.sum(kill)


@partial(jax.jit, static_argnames=("cfg",))
def trim_keyframes(m: ms.MapState, cfg: SystemConfig, trimmable=None):
    """Client local-map bound (Map::MapTrimming, cslam/src/Map.cpp:857-1063):
    keep the newest LocalMapSize keyframes by insertion order, erase the rest.

    ``trimmable`` [K] bool (CanBeForgotten, KeyFrame.cpp:1964-1974: sent AND
    acked — ``communicator.trimmable_mask``): keyframes beyond the window
    that are NOT yet trimmable are kept (never drop un-synced data) and
    reported in n_held so callers can surface comm backpressure.

    Returns (map', n_trimmed, n_held)."""
    kfs = m.kfs
    alive = kfs.valid & ~kfs.bad
    order = jnp.where(alive, kfs.insert_order, -1)
    rank = jnp.sum(order[:, None] < order[None, :], axis=1)  # bigger = older
    keep = rank < cfg.mapping.local_map_size
    over = alive & ~keep
    if trimmable is None:
        kill = over
        n_held = jnp.int32(0)
    else:
        kill = over & trimmable
        n_held = jnp.sum(over & ~trimmable)
    m = ms.erase_keyframes(m, kill)
    # landmarks that lost all observations die with their keyframes
    orphan = m.mps.valid & ~m.mps.bad & (m.mps.obs_n == 0)
    m = ms.erase_mappoints(m, orphan)
    return m, jnp.sum(kill), n_held


@partial(jax.jit, static_argnames=("cfg", "iters"))
def local_ba(m: ms.MapState, kf_idx, cam, cfg: SystemConfig, iters: int = 15):
    """Windowed local BA (LocalBundleAdjustmentClient, Optimizer.cpp:349-644):
    the new keyframe + its covisible neighbors (weight >= 15) are free, the
    other observers of their landmarks enter as FIXED anchors, and only the
    local landmarks move.  The subproblem is gathered into fixed
    (max_cams, max_points) shapes so per-keyframe cost is independent of the
    arena size; afterwards observations failing the chi2 gate are detached.

    Returns (map', cost, n_good_obs, n_truncated) — n_truncated counts
    cameras+landmarks that did not fit the window caps (callers surface it:
    no silent caps)."""
    kfs, mps = m.kfs, m.mps
    K, M, N, O = kfs.capacity, mps.capacity, kfs.n_feat, mps.max_obs
    C = min(cfg.mapping.local_ba_max_cams, K)
    P = min(cfg.mapping.local_ba_max_points, M)
    alive = kfs.valid & ~kfs.bad
    alive_mp = mps.valid & ~mps.bad

    # free set: the new KF + covisibility neighbors at the standard
    # weight>=15 rule; the two oldest alive keyframes stay fixed (the
    # reference fixes KF0/KF1, Optimizer.cpp:412-418) — the monocular gauge
    # anchor
    row = ms.covis_row(m, kf_idx)
    free = ((row >= 15).at[kf_idx].set(True)) & alive
    order = jnp.where(alive, kfs.insert_order, jnp.iinfo(jnp.int32).max)
    oldest2 = jnp.argsort(order)[:2]
    free = free.at[oldest2].set(False)

    # local landmarks: observed by any free camera (reverse tables)
    slot_ok = (jnp.arange(O)[None, :] < mps.obs_n[:, None]) & (mps.obs_kf >= 0)
    okf = jnp.clip(mps.obs_kf, 0, K - 1)
    lm_local = jnp.any(slot_ok & free[okf], axis=1) & alive_mp
    n_lm_local = jnp.sum(lm_local.astype(jnp.int32))
    lm_sel = jnp.argsort(~lm_local, stable=True)[:P]
    lm_live = jnp.arange(P) < jnp.minimum(n_lm_local, P)

    # cameras: free + anchors (observers of the selected landmarks)
    obs_sel_kf = okf[lm_sel]                                  # [P,O]
    sel_ok = slot_ok[lm_sel] & lm_live[:, None]
    needed = jnp.zeros((K,), bool).at[obs_sel_kf.reshape(-1)].max(sel_ok.reshape(-1))
    cam_in = (needed | free) & alive
    prio = jnp.where(free, 2_000_000 + row,
                     jnp.where(cam_in, 1_000_000 + row, -1))
    prio_top, cam_order = jax.lax.top_k(prio, C)
    cam_live = prio_top >= 1_000_000
    cam_lut = jnp.full((K,), -1, jnp.int32).at[cam_order].set(
        jnp.where(cam_live, jnp.arange(C, dtype=jnp.int32), -1)
    )
    n_trunc = (jnp.sum(cam_in.astype(jnp.int32)) - jnp.sum(cam_live.astype(jnp.int32))
               + n_lm_local - jnp.sum(lm_live.astype(jnp.int32)))

    # gather the subproblem
    ci = cam_lut[obs_sel_kf]                                  # [P,O] local cam idx
    obs_valid = sel_ok & (ci >= 0)
    ci_safe = jnp.clip(ci, 0, C - 1)
    feat = jnp.clip(mps.obs_feat[lm_sel], 0, N - 1)
    uv = kfs.xy[obs_sel_kf, feat]
    sigma2 = level_sigma2(kfs.octave[obs_sel_kf, feat])
    cam_fixed = ~free[cam_order] | ~cam_live
    point_valid = lm_live & (jnp.sum(obs_valid, 1) >= 2)
    prob = ba.BAProblem(
        R=kfs.R_cw[cam_order], t=kfs.t_cw[cam_order], X=mps.pos[lm_sel],
        cam_idx=ci_safe, uv=uv, sigma2=sigma2, obs_valid=obs_valid,
        cam_fixed=cam_fixed, point_valid=point_valid,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
    )
    R, t, X, cost, n_good = ba.ba_solve(prob, iters=iters)

    # scatter back: free camera poses + moved landmarks (delta discipline)
    move_cam = ~cam_fixed
    co = jnp.where(move_cam, cam_order, K - 1)
    kfs2 = kfs.replace(
        R_cw=kfs.R_cw.at[co].add(jnp.where(move_cam[:, None, None], R - kfs.R_cw[co], 0.0)),
        t_cw=kfs.t_cw.at[co].add(jnp.where(move_cam[:, None], t - kfs.t_cw[co], 0.0)),
        pose_version=kfs.pose_version.at[co].add(move_cam.astype(jnp.int32)),
    )
    po = jnp.where(point_valid, lm_sel, M - 1)
    mps2 = mps.replace(
        pos=mps.pos.at[po].add(jnp.where(point_valid[:, None], X - mps.pos[po], 0.0)),
        pos_version=mps.pos_version.at[po].add(point_valid.astype(jnp.int32)),
    )
    m = m.replace(kfs=kfs2, mps=mps2)

    # outlier observation removal on the subproblem
    good_obs = ba.classify_outliers(prob, R, t, X)
    bad_obs = prob.obs_valid & ~good_obs
    cur = m.kfs.mp_idx[obs_sel_kf, feat]
    still_linked = cur == lm_sel[:, None]
    rm = bad_obs & still_linked
    delta = jnp.where(rm, NO_MP - cur, 0)
    mp_idx2 = m.kfs.mp_idx.at[obs_sel_kf, feat].add(delta)
    m = m.replace(kfs=m.kfs.replace(mp_idx=mp_idx2))
    m = ms.rebuild_observations(m)
    return m, cost, n_good, n_trunc
