"""Client visual-odometry front-end: the per-frame tracking pipeline.

TPU-native re-design of ``Tracking`` (cslam/src/Tracking.cpp:95-743).  The
reference is a thread with pervasive locking; here each stage is a pure
jitted function over (MapState, Frame) and a thin host ``Tracker`` drives the
per-frame state machine (NOT_INITIALIZED -> OK -> LOST) — the only host<->
device traffic per frame is a handful of scalar counters for the branch
decisions, exactly the data the reference also inspects.

Stage mapping (reference -> here):
  MonocularInitialization (:290)      -> initialize()
  TrackWithMotionModel (:567)         -> track_with_motion_model()
  TrackReferenceKeyFrame (:514)       -> track_reference_kf()
  TrackLocalMap (:621) + SearchLocalPoints (:745) -> track_local_map()
  NeedNewKeyFrame/CreateNewKeyFrame (:662,:710)   -> Tracker.process()
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..models import map_store as ms
from ..ops import initializer as init_ops
from ..ops import matching
from ..solvers import ba, pose_opt
from ..solvers.reproj import level_sigma2
from ..utils.lie import SE3, orthonormalize
from .frame import Frame

NO_MP = ms.NO_MP


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def match_for_initialization(f_ref: Frame, f_cur: Frame, cfg: SystemConfig):
    idx, dist, ok = matching.search_for_initialization(
        f_ref.xy, f_ref.desc, f_ref.valid, f_ref.angle, f_ref.octave,
        f_cur.xy, f_cur.desc, f_cur.valid, f_cur.angle, f_cur.octave,
    )
    return idx, ok, jnp.sum(ok)


@partial(jax.jit, static_argnames=("cfg",))
def initialize_map(key, f_ref: Frame, f_cur: Frame, match_idx, match_ok, cam, cfg: SystemConfig, client_id=0):
    """Two-view bootstrap + initial map construction + full BA + median-depth
    normalization (MonocularInitialization + CreateInitialMapMonocular).

    Returns (map_state, f_ref', f_cur', success, n_good).
    """
    cap = cfg.capacity
    N = f_ref.n_feat
    p1 = f_ref.xy
    p2 = f_cur.xy[jnp.clip(match_idx, 0, N - 1)]
    out = init_ops.initialize_two_view(key, p1, p2, match_ok, cam.K, sigma=1.0)

    good = out["good"] & out["success"]
    X = out["X"]

    # median depth scaling (ComputeSceneMedianDepth: scale so median z == 1)
    z = jnp.where(good, X[:, 2], jnp.nan)
    med = jnp.nanmedian(z)
    med = jnp.where(jnp.isfinite(med) & (med > 1e-6), med, 1.0)
    scale = 1.0 / med
    X = X * scale
    t_kf1 = out["t"] * scale

    m = ms.empty_map(cap.client_max_kfs, cap.client_max_mps, N, cap.max_obs_per_mp)

    # landmarks: one per good match; descriptor/octave from the current frame
    cur_feat = jnp.clip(match_idx, 0, N - 1)
    n_new = jnp.sum(good)
    m, mp_idx = ms.add_mappoints(
        m,
        n_new=n_new,
        pos=X,
        desc=f_cur.desc[cur_feat],
        normal=jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1)),
        min_dist=jnp.zeros(N),
        max_dist=jnp.full(N, jnp.inf),
        ref_kf=jnp.ones(N, jnp.int32),  # KF1
        mp_ids=jnp.arange(N, dtype=jnp.int32),
        client_id=jnp.full((N,), client_id, jnp.int32),
        new_valid=good,
    )

    # keyframe 0: identity; associations at ref-frame feature slots
    m, k0 = ms.add_keyframe(
        m, jnp.int32(0), jnp.int32(client_id), f_ref.timestamp,
        jnp.eye(3), jnp.zeros(3),
        f_ref.xy, f_ref.desc, f_ref.octave, f_ref.angle, f_ref.valid,
        mp_assoc=mp_idx,
    )
    # keyframe 1: recovered pose; associations live at matched feature slots
    assoc1 = jnp.full((N,), NO_MP, jnp.int32)
    tgt = jnp.where(good, cur_feat, N - 1)
    assoc1 = assoc1.at[tgt].add(jnp.where(good, mp_idx - assoc1[tgt], 0))
    m, k1 = ms.add_keyframe(
        m, jnp.int32(1), jnp.int32(client_id), f_cur.timestamp,
        out["R"], t_kf1,
        f_cur.xy, f_cur.desc, f_cur.octave, f_cur.angle, f_cur.valid,
        mp_assoc=assoc1,
    )
    m = ms.update_normal_and_depth(m, cfg.extractor.scale_factor, cfg.extractor.n_levels)

    # full BA on the 2-view problem (GlobalBundleAdjustemntClient, 20 iters)
    prob = build_ba_problem(m, cam, fixed_mask=jnp.arange(cap.client_max_kfs) == 0)
    R_b, t_b, X_b, cost, n_ba = ba.ba_solve(prob, iters=20)
    m = apply_ba_result(m, R_b, t_b, X_b, jnp.ones(cap.client_max_kfs, bool))

    # Post-BA depth/parallax hygiene.  Points that barely passed CheckRT's
    # parallax gate have quasi-unobservable depth; the 2-view BA can push
    # them to near-infinity where they survive every later chi2 gate (any
    # translation projects them identically) and anchor the pose optimizer
    # to rotation-only solutions.  The reference is exposed to the same
    # failure (Initializer.cpp:794 gates pre-BA only) but its evaluation
    # scenes are depth-bounded; long sight-lines (corridors) need the
    # post-BA re-gate.
    alive = m.mps.valid & ~m.mps.bad
    O1 = -(m.kfs.R_cw[k1].T @ m.kfs.t_cw[k1])
    ray0 = m.mps.pos
    ray1 = m.mps.pos - O1
    cosp = jnp.sum(ray0 * ray1, -1) / jnp.clip(
        jnp.linalg.norm(ray0, axis=-1) * jnp.linalg.norm(ray1, axis=-1), 1e-12
    )
    z0 = m.mps.pos[:, 2]  # KF0 is the identity: depth == z
    medz = jnp.nanmedian(jnp.where(alive, z0, jnp.nan))
    medz = jnp.where(jnp.isfinite(medz) & (medz > 0), medz, 1.0)
    junk = alive & ((cosp > 0.99997) | (z0 > 8.0 * medz) | (z0 <= 0))
    m = ms.erase_mappoints(m, junk)
    n_new = jnp.sum(alive & ~junk)

    # frames updated.  NOTE: masked-out rows of mp_idx/assoc1 carry the
    # arena-slot sentinel capacity-1 (add_mappoints routes rejects there);
    # the (idx >= 0) guard below is what keeps a junk flag on that slot from
    # leaking into real associations — keep it if this is ever refactored.
    mp_idx2 = jnp.where(junk[jnp.clip(mp_idx, 0, cap.client_max_mps - 1)] & (mp_idx >= 0),
                        NO_MP, mp_idx)
    assoc1b = jnp.where(junk[jnp.clip(assoc1, 0, cap.client_max_mps - 1)] & (assoc1 >= 0),
                        NO_MP, assoc1)
    f_ref2 = f_ref.replace(R_cw=jnp.eye(3), t_cw=jnp.zeros(3), mp=mp_idx2)
    f_cur2 = f_cur.replace(
        R_cw=m.kfs.R_cw[k1], t_cw=m.kfs.t_cw[k1], mp=assoc1b
    )
    return m, f_ref2, f_cur2, out["success"], n_new


def build_ba_problem(m: ms.MapState, cam, fixed_mask, extra_point_mask=None) -> ba.BAProblem:
    """Whole-arena BA problem: every valid KF is a camera (fixed per mask),
    every valid landmark with >=2 obs is a point; observations come straight
    from the reverse-obs tables."""
    kfs, mps = m.kfs, m.mps
    O = mps.max_obs
    slot_ok = (jnp.arange(O)[None, :] < mps.obs_n[:, None]) & (mps.obs_kf >= 0)
    kf = jnp.clip(mps.obs_kf, 0, kfs.capacity - 1)
    feat = jnp.clip(mps.obs_feat, 0, kfs.n_feat - 1)
    uv = kfs.xy[kf, feat]
    sigma2 = level_sigma2(kfs.octave[kf, feat])
    kf_alive = kfs.valid & ~kfs.bad
    obs_valid = slot_ok & kf_alive[kf]
    point_valid = mps.valid & ~mps.bad & (jnp.sum(obs_valid, 1) >= 2)
    if extra_point_mask is not None:
        point_valid = point_valid & extra_point_mask
    return ba.BAProblem(
        R=kfs.R_cw,
        t=kfs.t_cw,
        X=mps.pos,
        cam_idx=kf,
        uv=uv,
        sigma2=sigma2,
        obs_valid=obs_valid,
        cam_fixed=fixed_mask | ~kf_alive,
        point_valid=point_valid,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
    )


def apply_ba_result(m: ms.MapState, R, t, X, moved_kf_mask) -> ms.MapState:
    kfs = m.kfs.replace(
        R_cw=jnp.where(moved_kf_mask[:, None, None], R, m.kfs.R_cw),
        t_cw=jnp.where(moved_kf_mask[:, None], t, m.kfs.t_cw),
        pose_version=m.kfs.pose_version + moved_kf_mask.astype(jnp.int32),
    )
    mps = m.mps.replace(pos=X, pos_version=m.mps.pos_version + 1)
    return m.replace(kfs=kfs, mps=mps)


# ---------------------------------------------------------------------------
# Per-frame tracking stages
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "window_factor"))
def track_with_motion_model(
    m: ms.MapState, frame: Frame, last: Frame, vel_R, vel_t, cam, cfg: SystemConfig,
    window_factor: float = 1.0,
):
    """Project last frame's landmarks with the constant-velocity prediction
    and run windowed matching + pose-only BA (TrackWithMotionModel, :567)."""
    R_pred = vel_R @ last.R_cw
    t_pred = (vel_R @ last.t_cw) + vel_t

    has_mp = last.mp >= 0
    mp = jnp.clip(last.mp, 0, m.mps.capacity - 1)
    alive = has_mp & m.mps.valid[mp] & ~m.mps.bad[mp]
    Xw = m.mps.pos[mp]
    Xc = (R_pred @ Xw.T).T + t_pred
    uv_pred = jnp.stack(
        [cam.fx * Xc[:, 0] / jnp.clip(Xc[:, 2], 1e-6) + cam.cx,
         cam.fy * Xc[:, 1] / jnp.clip(Xc[:, 2], 1e-6) + cam.cy], -1
    )
    q_valid = alive & (Xc[:, 2] > 0)

    sf = cfg.extractor.scale_factor
    radius = 15.0 * window_factor * jnp.power(sf, last.octave.astype(jnp.float32))
    t_idx, dist, okm = matching.match_in_window(
        uv_pred, last.desc, q_valid, frame.xy, frame.desc, frame.valid,
        radius=radius, th_dist=matching.TH_HIGH, nn_ratio=0.9,
        t_octave=frame.octave, octave_min=last.octave - 1, octave_max=last.octave + 1,
    )
    # per-feature association on the current frame (unique-target resolved)
    okm = matching._unique_target(t_idx, dist, okm, frame.n_feat)
    assoc = jnp.full((frame.n_feat,), NO_MP, jnp.int32)
    tsafe = jnp.where(okm, t_idx, frame.n_feat - 1)
    assoc = assoc.at[tsafe].add(jnp.where(okm, mp - assoc[tsafe], 0))
    n_matches = jnp.sum(okm)

    frame2, n_inliers = _pose_opt_on_assoc(m, frame, assoc, R_pred, t_pred, cam, cfg)
    return frame2, n_matches, n_inliers


@partial(jax.jit, static_argnames=("cfg",))
def track_reference_kf(m: ms.MapState, frame: Frame, ref_kf, cam, cfg: SystemConfig):
    """Brute descriptor matching against the reference keyframe's landmark
    features + pose-only BA from the last pose (TrackReferenceKeyFrame)."""
    kfs = m.kfs
    ref_desc = kfs.desc[ref_kf]
    ref_mp = kfs.mp_idx[ref_kf]
    ref_has = ref_mp >= 0
    mp = jnp.clip(ref_mp, 0, m.mps.capacity - 1)
    ref_ok = ref_has & m.mps.valid[mp] & ~m.mps.bad[mp] & kfs.feat_valid[ref_kf]

    q_idx, dist, okm = matching.match_brute(
        frame.desc, frame.valid, ref_desc, ref_ok,
        th_dist=matching.TH_LOW, nn_ratio=0.7,
        q_angle=frame.angle, t_angle=kfs.angle[ref_kf],
    )
    assoc = jnp.where(okm, mp[jnp.clip(q_idx, 0, frame.n_feat - 1)], NO_MP)
    n_matches = jnp.sum(okm)
    frame2, n_inliers = _pose_opt_on_assoc(m, frame, assoc, frame.R_cw, frame.t_cw, cam, cfg)
    return frame2, n_matches, n_inliers


def _pose_opt_on_assoc(m, frame, assoc, R0, t0, cam, cfg):
    has = assoc >= 0
    mp = jnp.clip(assoc, 0, m.mps.capacity - 1)
    X = m.mps.pos[mp]
    R, t, inlier, n_in = pose_opt.optimize_pose(
        R0, t0, X, frame.xy, has, frame.sigma2,
        cam.fx, cam.fy, cam.cx, cam.cy,
        rounds=cfg.opt.pose_opt_rounds, iters_per_round=cfg.opt.pose_opt_its_per_round,
    )
    assoc2 = jnp.where(inlier, assoc, NO_MP)
    return frame.replace(R_cw=R, t_cw=t, mp=assoc2), n_in


@partial(jax.jit, static_argnames=("cfg", "window_factor"))
def track_local_map(m: ms.MapState, frame: Frame, cam, cfg: SystemConfig,
                    window_factor: float = 1.0):
    """Match ALL alive landmarks into the frame (v1.1 semantics: the local map
    is the whole client map, readme.md:242) with frustum + viewing-angle
    gates, then a final pose-only BA (TrackLocalMap + SearchLocalPoints).

    Returns (map', frame', n_inliers) — the map comes back with updated
    visible/found counters."""
    mps = m.mps
    alive = mps.valid & ~mps.bad

    Xc = (frame.R_cw @ mps.pos.T).T + frame.t_cw
    z = Xc[:, 2]
    uv = jnp.stack(
        [cam.fx * Xc[:, 0] / jnp.clip(z, 1e-6) + cam.cx,
         cam.fy * Xc[:, 1] / jnp.clip(z, 1e-6) + cam.cy], -1
    )
    Ow = -(frame.R_cw.T @ frame.t_cw)
    view = mps.pos - Ow
    dist = jnp.linalg.norm(view, axis=-1)
    cos_view = jnp.sum(view * mps.normal, -1) / jnp.clip(dist, 1e-9)

    in_frustum = (
        alive
        & (z > 0)
        & cam.in_bounds(uv)
        & (dist >= 0.8 * mps.min_dist)
        & (dist <= 1.2 * mps.max_dist)
        & (cos_view > 0.5)
    )
    # already-tracked landmarks are not searched again (but count as visible)
    already = jnp.zeros((mps.capacity,), bool)
    has = frame.mp >= 0
    already = already.at[jnp.clip(frame.mp, 0, mps.capacity - 1)].max(has)

    sf = cfg.extractor.scale_factor
    pred_oct = matching.predict_octave(dist, mps.max_dist, sf, cfg.extractor.n_levels)
    r_base = jnp.where(cos_view > 0.998, 2.5, 4.0)
    radius = r_base * window_factor * jnp.power(sf, pred_oct.astype(jnp.float32))

    free_feat = frame.valid & (frame.mp < 0)
    t_idx, dmin, okm = matching.match_in_window(
        uv, mps.desc, in_frustum & ~already, frame.xy, frame.desc, free_feat,
        radius=radius, th_dist=matching.TH_HIGH, nn_ratio=0.8,
        t_octave=frame.octave, octave_min=pred_oct - 1, octave_max=pred_oct + 1,
    )
    okm = matching._unique_target(t_idx, dmin, okm, frame.n_feat)
    # scatter landmark indices onto the frame's free feature slots
    assoc = frame.mp
    tsafe = jnp.where(okm, t_idx, frame.n_feat - 1)
    delta = jnp.where(okm, jnp.arange(mps.capacity, dtype=jnp.int32) - assoc[tsafe], 0)
    assoc = assoc.at[tsafe].add(delta)

    frame2, n_in = _pose_opt_on_assoc(m, frame, assoc, frame.R_cw, frame.t_cw, cam, cfg)

    # visibility / found statistics (MapPoint::IncreaseVisible/Found)
    n_visible = mps.n_visible + in_frustum.astype(jnp.int32)
    found = jnp.zeros((mps.capacity,), jnp.int32)
    fmp = jnp.clip(frame2.mp, 0, mps.capacity - 1)
    found = found.at[fmp].add((frame2.mp >= 0).astype(jnp.int32))
    m2 = m.replace(mps=mps.replace(n_visible=n_visible, n_found=mps.n_found + found))

    # reference-KF re-selection (UpdateLocalKeyFrames, Tracking.cpp:956):
    # every tracked landmark votes for the keyframes observing it; the
    # max-sharing KF becomes mpReferenceKF.  Without this, the KF decision's
    # nRefMatches keys off a stale reference and revisits of mapped terrain
    # never insert keyframes (c2 starvation on return legs).
    obs_kf = m.mps.obs_kf[fmp]                       # [N, O]
    obs_live = (jnp.arange(m.mps.max_obs)[None, :] < m.mps.obs_n[fmp][:, None]) \
        & (frame2.mp >= 0)[:, None] & (obs_kf >= 0)
    votes = jnp.zeros((m.kfs.capacity,), jnp.int32).at[
        jnp.clip(obs_kf, 0, m.kfs.capacity - 1).reshape(-1)
    ].add(obs_live.reshape(-1).astype(jnp.int32))
    votes = jnp.where(m.kfs.valid & ~m.kfs.bad, votes, -1)
    best_kf = jnp.argmax(votes)
    return m2, frame2, n_in, best_kf


@partial(jax.jit, static_argnames=("cfg",))
def create_keyframe(m: ms.MapState, frame: Frame, kf_id, client_id, cfg: SystemConfig):
    m, k = ms.add_keyframe(
        m, kf_id, client_id, frame.timestamp, frame.R_cw, frame.t_cw,
        frame.xy, frame.desc, frame.octave, frame.angle, frame.valid,
        mp_assoc=frame.mp,
    )
    return m, k


def motion_velocity(frame: Frame, last: Frame):
    """T_vel = T_cur * T_last^-1 (constant-velocity model)."""
    T_cur = SE3(R=frame.R_cw, t=frame.t_cw)
    T_last = SE3(R=last.R_cw, t=last.t_cw)
    V = T_cur.compose(T_last.inverse())
    # transpose-as-inverse is only exact on SO(3): without re-projection the
    # pred->track->velocity loop amplifies float32 defects ~2.4x per frame
    return orthonormalize(V.R), V.t
