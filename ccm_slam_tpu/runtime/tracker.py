"""Host-side per-agent front-end driver: the state machine that strings the
jitted tracking/mapping stages into a visual-odometry pipeline.

Corresponds to the control flow of ``Tracking::Track`` (cslam/src/
Tracking.cpp:126-287) plus the client ``LocalMapping`` loop invoked per new
keyframe.  Only scalar counters cross the host boundary per frame; all array
state stays on device.

Tracking-loss policy matches the reference by default: reset if lost before
``init_kfs`` keyframes after initialization, else permanently LOST
(Tracking.cpp:187-191,248-259; PnPsolver is dead code in the reference).
``enable_relocalization`` additionally arms a live PnP recovery path that the
reference only ships as dead code."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..models import map_store as ms
from ..ops import orb
from ..utils.camera import Camera
from ..utils.lie import SE3
from . import mapping, tracking
from .frame import Frame, build_frame

NOT_INITIALIZED = 0
OK = 1
LOST = 2


@dataclass
class TrajectoryEntry:
    timestamp: float
    R_cw: object
    t_cw: object


@dataclass
class Tracker:
    cfg: SystemConfig
    cam: Camera
    client_id: int = 0
    state: int = NOT_INITIALIZED
    map: Optional[ms.MapState] = None
    ref_frame: Optional[Frame] = None      # init reference
    last_frame: Optional[Frame] = None
    vel_R: object = None
    vel_t: object = None
    has_velocity: bool = False
    ref_kf: int = 0
    next_kf_id: int = 0
    frames_since_kf: int = 0
    kfs_since_init: int = 0
    n_lost_frames: int = 0
    prev_inliers: int = 0
    trajectory: list = field(default_factory=list)
    kf_events: list = field(default_factory=list)  # new-KF arena idx stream (for comm/mapping)
    rng: object = None
    enable_mapping: bool = True
    enable_trimming: bool = False  # standalone eval keeps the full map
    # CanBeForgotten gate for trimming (Map::MapTrimming only erases sent &&
    # acked entities): server-connected drivers set this to a callable
    # map -> [K] bool (communicator.trimmable_mask over the live comm state)
    trim_mask_fn: object = None
    enable_relocalization: bool = False  # opt-in PnP recovery (see _relocalize)
    # bumped on every young-map reset (Tracking.cpp:248-259): drivers watch
    # it to resync arena-aligned external state (ClientCommState, server-side
    # agent tables) — a fresh KF landing in a previously-sent arena slot must
    # not inherit the old sent/acked flags
    reset_epoch: int = 0
    last_compaction: object = None  # (kf_remap, mp_remap) of the latest compact
    stats: dict = field(default_factory=lambda: {"kf_created": 0, "mp_created": 0})

    def __post_init__(self):
        if self.rng is None:
            self.rng = jax.random.PRNGKey(42 + self.client_id)

    # -- public API ---------------------------------------------------------

    def process_image(self, img, timestamp: float):
        ex = self.cfg.extractor
        nf = ex.n_features * (ex.init_features_factor if self.state == NOT_INITIALIZED else 1)
        nf = min(nf, self.cfg.capacity.max_keypoints)
        feats = orb.extract(
            img,
            n_features=nf,
            n_levels=ex.n_levels,
            scale_factor=ex.scale_factor,
            ini_th=float(ex.ini_th_fast),
            min_th=float(ex.min_th_fast),
            cell=ex.cell_size,
            capacity=self.cfg.capacity.max_keypoints,
        )
        frame = build_frame(feats, self.cam, timestamp, ex.scale_factor)
        return self.process_frame(frame)

    def process_frame(self, frame: Frame):
        """Returns the tracked Frame (pose populated) or None before init."""
        if self.state == NOT_INITIALIZED:
            return self._initialize(frame)
        if self.state == LOST:
            if self.enable_relocalization and self.map is not None:
                out = self._relocalize(frame)
                if out is not None:
                    return out
            self.trajectory.append(None)
            return None
        return self._track(frame)

    def _neighborhood_lm_mask(self, ref_kf: int):
        """Landmarks observed by ref_kf's covisibility neighborhood — the
        candidate set for local (near-loss-point) recovery.  Restricting the
        match set is what makes PnP work in repetitive-texture worlds: a
        whole-map brute match is dominated by aliased correspondences."""
        m = self.map
        row = ms.covis_row(m, jnp.int32(ref_kf))
        nbhd = (row > 0).at[ref_kf].set(True)
        mp = m.kfs.mp_idx
        has = (mp >= 0) & nbhd[:, None]
        mask = jnp.zeros((m.mps.capacity,), bool).at[
            jnp.clip(mp, 0, m.mps.capacity - 1).reshape(-1)
        ].max(has.reshape(-1))
        return mask & m.mps.valid & ~m.mps.bad

    def _pnp_recover(self, frame: Frame, cand_mask, tag: str):
        """Match against a candidate landmark set, RANSAC-PnP the absolute
        pose, refine, and gate on local-map inliers.  Returns the recovered
        Frame or None."""
        from ..ops import matching, pnp

        m = self.map
        t_idx, _, okm = matching.match_brute(
            frame.desc, frame.valid, m.mps.desc, cand_mask,
            th_dist=matching.TH_LOW, nn_ratio=0.75, check_rotation=False,
        )
        self.stats[f"reloc_{tag}_match"] = int(jnp.sum(okm))
        if self.stats[f"reloc_{tag}_match"] < 15:
            self.stats["reloc_fail"] = f"{tag}:brute"
            return None
        mp = jnp.clip(t_idx, 0, m.mps.capacity - 1)
        self.rng, key = jax.random.split(self.rng)
        res = pnp.ransac_pnp(
            key, m.mps.pos[mp], frame.xy, okm, frame.sigma2,
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
        )
        self.stats[f"reloc_{tag}_pnp"] = int(res["n_inliers"])
        if not bool(res["success"]) or int(res["n_inliers"]) < 15:
            self.stats["reloc_fail"] = f"{tag}:pnp"
            return None
        assoc = jnp.where(okm & res["inliers"], mp, ms.NO_MP)
        frame2, n_in = tracking._pose_opt_on_assoc(
            m, frame, assoc, res["R"], res["t"], self.cam, self.cfg
        )
        # local-map search from the recovered pose, then the standard gate
        m2, frame3, n_in2, best_kf = tracking.track_local_map(
            m, frame2, self.cam, self.cfg, window_factor=2.0
        )
        self.stats[f"reloc_{tag}_lm"] = int(n_in2)
        if int(n_in2) < self.cfg.tracking.local_map_inlier_thres:
            self.stats["reloc_fail"] = f"{tag}:localmap"
            return None
        self.map = m2
        self.ref_kf = int(best_kf)
        self.stats["reloc_fail"] = f"{tag}:ok"
        return frame3

    def _relocalize(self, frame: Frame):
        """Opt-in relocalization after tracking loss.

        The reference ships the machinery as dead code — PnPsolver
        (cslam/src/PnPSolver.cpp) and DetectRelocalizationCandidates
        (cslam/src/Database.cpp:329-439) are compiled but never called; a
        lost mature map stays permanently LOST (Tracking.cpp:187-191).  Here
        the capability is live behind ``enable_relocalization``, staged:

        1. LOCAL: match only the last reference keyframe's covisibility
           neighborhood (the camera usually sits right where it lost —
           the corner-loss case) — RANSAC-PnP + pose refine;
        2. GLOBAL: whole-map brute match + PnP (teleport recovery; weak in
           repetitive-texture worlds, kept as the last resort)."""
        frame3 = self._pnp_recover(
            frame, self._neighborhood_lm_mask(self.ref_kf), "local"
        )
        if frame3 is None:
            alive = self.map.mps.valid & ~self.map.mps.bad
            frame3 = self._pnp_recover(frame, alive, "global")
        if frame3 is None:
            return None
        self.state = OK
        self.last_frame = frame3
        self.has_velocity = False
        self.frames_since_kf = 0
        self.trajectory.append(
            TrajectoryEntry(float(frame3.timestamp), frame3.R_cw, frame3.t_cw)
        )
        return frame3

    # -- initialization -----------------------------------------------------

    def _initialize(self, frame: Frame):
        if self.ref_frame is None or int(frame.n) < 100:
            self.ref_frame = frame if int(frame.n) >= 100 else None
            self.trajectory.append(None)
            return None
        idx, ok, n = tracking.match_for_initialization(self.ref_frame, frame, self.cfg)
        if int(n) < 100:
            # too few matches: restart from this frame (Tracking.cpp:317)
            self.ref_frame = frame
            self.trajectory.append(None)
            return None
        self.rng, key = jax.random.split(self.rng)
        m, f_ref, f_cur, success, n_good = tracking.initialize_map(
            key, self.ref_frame, frame, idx, ok, self.cam, self.cfg,
            client_id=jnp.int32(self.client_id),
        )
        if not bool(success) or int(n_good) < 80:
            self.trajectory.append(None)
            return None
        self.map = m
        self.state = OK
        self.last_frame = f_cur
        self.ref_kf = 1
        self.next_kf_id = 2
        self.frames_since_kf = 0
        self.kfs_since_init = 0
        self.has_velocity = False
        self.stats["kf_created"] += 2
        self.stats["mp_created"] += int(n_good)
        self.kf_events.extend([0, 1])
        self.trajectory.append(
            TrajectoryEntry(float(frame.timestamp), f_cur.R_cw, f_cur.t_cw)
        )
        return f_cur

    # -- per-frame tracking -------------------------------------------------

    def _track(self, frame: Frame):
        cfg = self.cfg
        t = cfg.tracking
        n_inliers = 0
        tracked = None

        self.stats["path"] = "none"
        if self.has_velocity:
            f2, n_match, n_in = tracking.track_with_motion_model(
                self.map, frame, self.last_frame, self.vel_R, self.vel_t, self.cam, cfg
            )
            self.stats["path"] = "mm"
            if int(n_match) < t.motion_model_inlier_thres_search:
                # widen the window once (reference retries with th*2;
                # cfg.tracking.mm_retry_window for faster-turning platforms)
                f2, n_match, n_in = tracking.track_with_motion_model(
                    self.map, frame, self.last_frame, self.vel_R, self.vel_t,
                    self.cam, cfg, window_factor=t.mm_retry_window,
                )
                self.stats["path"] = "mm2"
            # BOTH gates must pass — a near-threshold inlier count on too few
            # matches means the prediction is off; fall back to the reference
            # keyframe instead of committing to a weak pose
            if (
                int(n_match) >= t.motion_model_inlier_thres_search
                and int(n_in) >= t.motion_model_inlier_thres_opt
            ):
                tracked = f2
                n_inliers = int(n_in)
            self.stats["mm_n_match"] = int(n_match)
            self.stats["mm_n_in"] = int(n_in)

        if tracked is None:
            # fall back to reference-KF tracking from the last pose
            frame_init = frame.replace(
                R_cw=self.last_frame.R_cw, t_cw=self.last_frame.t_cw
            )
            f2, n_match, n_in = tracking.track_reference_kf(
                self.map, frame_init, jnp.int32(self.ref_kf), self.cam, cfg
            )
            self.stats["path"] = self.stats["path"] + "+ref"
            self.stats["ref_n_match"] = int(n_match)
            self.stats["ref_n_in"] = int(n_in)
            if int(n_match) >= t.ref_kf_inlier_thres_search and int(n_in) >= t.ref_kf_inlier_thres_opt:
                tracked = f2
                n_inliers = int(n_in)

        if tracked is None and self.enable_relocalization:
            # on-the-spot PnP rescue BEFORE declaring loss: both gates can
            # fail with plenty of raw matches when the pose prior is wrong
            # (corner whip desyncs the velocity model) — a prior-free
            # RANSAC-PnP against the reference neighborhood recovers the
            # pose from the same matches the optimizer just rejected
            rec = self._pnp_recover(
                frame, self._neighborhood_lm_mask(self.ref_kf), "inline"
            )
            if rec is not None:
                self.stats["path"] = self.stats["path"] + "+pnp"
                tracked = rec
                n_inliers = self.stats.get("reloc_inline_lm", 0)
                self.has_velocity = False  # velocity model was wrong

        if tracked is None:
            return self._handle_lost(frame)

        # local-map refinement; when associations collapsed relative to the
        # previous frame, re-search with a widened window from the refined
        # pose (the multi-octave reference gets this leniency from its coarse
        # pyramid levels; a single re-search restores dropped associations)
        self.map, f3, n_in3, best_kf = tracking.track_local_map(self.map, tracked, self.cam, cfg)
        self.stats["lm_n_in_a"] = int(n_in3)
        # near-loss rescue ONLY (the reference widens its search th only
        # after relocalization, Tracking.cpp:757-763): a soft "associations
        # dropped" trigger would silently re-acquire a drifted revisit at
        # 3x the radius and rob the loop finder of the closure
        if int(n_in3) < t.local_map_inlier_thres:
            self.map, f3b, n_in3b, best_kf_b = tracking.track_local_map(
                self.map, f3, self.cam, cfg, window_factor=3.0
            )
            self.stats["path"] = self.stats["path"] + "+wide"
            if int(n_in3b) > int(n_in3):
                f3, n_in3, best_kf = f3b, n_in3b, best_kf_b
        # mpReferenceKF re-selection (Tracking.cpp:956): the KF sharing most
        # tracked landmarks becomes the reference for both the fallback
        # tracker and the NeedNewKeyFrame baseline
        self.ref_kf = int(best_kf)
        if int(n_in3) < t.matches_inliers_thres:
            return self._handle_lost(frame)
        tracked = f3
        n_inliers = int(n_in3)
        self.prev_inliers = n_inliers

        # velocity update + bookkeeping
        self.vel_R, self.vel_t = tracking.motion_velocity(tracked, self.last_frame)
        self.has_velocity = True
        self.last_frame = tracked
        self.frames_since_kf += 1
        self.trajectory.append(
            TrajectoryEntry(float(tracked.timestamp), tracked.R_cw, tracked.t_cw)
        )

        # keyframe decision (NeedNewKeyFrame, Tracking.cpp:662-708): the
        # reference requires (c1a || c1b) && c2 where c2 = tracking weakened
        # vs the ref KF's mature landmarks (TrackedMapPoints(minObs), minObs=3
        # once the map has >2 KFs — fresh 2-obs triangulations don't count).
        # Our mapping runs synchronously so "local mapping idle" is always
        # true: with MinFrames=0, c1b holds every frame and the decision
        # reduces to c2 (a KF on every weakening, never while strong).
        min_obs = 2 if self.kfs_since_init + 2 <= 2 else 3
        ref_assoc = self.map.kfs.mp_idx[self.ref_kf]
        ref_mp = jnp.clip(ref_assoc, 0, self.map.mps.capacity - 1)
        ref_n = int(
            jnp.sum(
                (ref_assoc >= 0)
                & self.map.mps.valid[ref_mp]
                & ~self.map.mps.bad[ref_mp]
                & (self.map.mps.obs_n[ref_mp] >= min_obs)
            )
        )
        c1 = self.frames_since_kf >= t.min_frames
        c2 = n_inliers < ref_n * t.th_ref_ratio and n_inliers > t.matches_inliers_thres
        need = c1 and c2
        self.stats["last_ref_n"] = ref_n
        self.stats["last_inliers"] = n_inliers
        if need and int(self.map.next_kf) < self.cfg.capacity.client_max_kfs - 1:
            self._create_keyframe(tracked)
        return tracked

    def _create_keyframe(self, frame: Frame):
        cfg = self.cfg
        self.map, k = tracking.create_keyframe(
            self.map, frame, jnp.int32(self.next_kf_id), jnp.int32(self.client_id), cfg
        )
        k = int(k)
        self.ref_kf = k
        self.next_kf_id += 1
        self.frames_since_kf = 0
        self.kfs_since_init += 1
        self.stats["kf_created"] += 1
        self.kf_events.append(k)

        if self.enable_mapping:
            self.map, n_culled = mapping.cull_mappoints(
                self.map, jnp.int32(self.next_kf_id - 1), cfg
            )
            self.map, n_new = mapping.triangulate_new_points(
                self.map, jnp.int32(k), self.cam, cfg,
                client_id=jnp.int32(self.client_id),
            )
            self.stats["mp_created"] += int(n_new)
            self.map, _, _, redir = mapping.fuse_neighbors(self.map, jnp.int32(k), self.cam, cfg)
            self._check_replaced(redir)
            if self.enable_trimming:
                trimmable = (None if self.trim_mask_fn is None
                             else self.trim_mask_fn(self.map))
                self.map, n_trim, n_held = mapping.trim_keyframes(
                    self.map, cfg, trimmable
                )
                self.stats["kf_trimmed"] = (
                    self.stats.get("kf_trimmed", 0) + int(n_trim)
                )
                if int(n_held) > 0:  # comm backpressure: over-window KFs not
                    self.stats["trim_held"] = int(n_held)  # yet sent+acked
            self.map, cost, n_good, n_trunc = mapping.local_ba(
                self.map, jnp.int32(k), self.cam, cfg
            )
            if cfg.mapping.second_fuse_pass:
                # second fuse pass on the refined geometry: landmarks whose
                # depth error pushed them outside the tight pre-BA fuse window
                # get re-observed in the new KF, then a short BA refines them
                self.map, n_re, _, redir = mapping.fuse_neighbors(self.map, jnp.int32(k), self.cam, cfg)
                self._check_replaced(redir)
                if int(n_re) > 0:
                    self.map, cost, n_good, n_trunc = mapping.local_ba(
                        self.map, jnp.int32(k), self.cam, cfg, iters=8
                    )
            if int(n_trunc) > 0:
                # no silent caps: the local-BA window dropped anchors/points
                self.stats["local_ba_truncated"] = (
                    self.stats.get("local_ba_truncated", 0) + int(n_trunc)
                )
                print(f"[tracker] local_ba window truncated {int(n_trunc)} entities "
                      f"(raise mapping.local_ba_max_cams/points)")
            # NOTE: the tracked frame keeps its tracking pose (the reference
            # does the same — frames are never rewritten by BA); rewriting it
            # desynchronizes the constant-velocity model from the pose it was
            # derived from and the next prediction jumps

        # arena pressure: compact when cursors approach capacity
        cap = self.cfg.capacity
        if int(self.map.next_kf) > cap.client_max_kfs - 4 or int(
            self.map.next_mp
        ) > cap.client_max_mps - 2 * cap.max_keypoints:
            # the tracker itself holds arena indices across this compaction
            # (last_frame.mp feeds the next motion-model search) — remap them
            # or the next frame matches against a permuted arena
            kf_remap, mp_remap = ms.compaction_remap(self.map)
            self.map = ms.compact_map(self.map)
            self.ref_kf = self._find_kf_slot(self.next_kf_id - 1)
            # surface the remap so owners of external arena-index tables
            # (standalone loop finder, comm state) can fix themselves up
            self.last_compaction = (kf_remap, mp_remap)
            if self.last_frame is not None:
                old = jnp.asarray(self.last_frame.mp)
                remap = jnp.asarray(mp_remap, jnp.int32)
                new = jnp.where(old >= 0, remap[jnp.clip(old, 0, remap.shape[0] - 1)], ms.NO_MP)
                self.last_frame = self.last_frame.replace(mp=new)

    def _check_replaced(self, redirect):
        """CheckReplacedInLastFrame (cslam/src/Tracking.cpp:469): route the
        last frame's landmark associations through the fuse pass's
        loser->winner table, so motion-model tracking keeps (not drops) the
        seeds whose landmarks were just merged away."""
        if self.last_frame is None:
            return
        old = jnp.asarray(self.last_frame.mp)
        cap = redirect.shape[0]
        new = jnp.where(old >= 0, redirect[jnp.clip(old, 0, cap - 1)], old)
        # dedup: if the frame observed both loser and winner, redirecting
        # creates two features on one landmark — keep the first (the same
        # rule as replace_mappoints), or the next create_keyframe would copy
        # a duplicate forward link into the arena (check_structure violation)
        order = jnp.argsort(jnp.where(new >= 0, new, cap + 1), stable=True)
        srt = new[order]
        dup_srt = jnp.concatenate(
            [jnp.zeros((1,), bool), srt[1:] == srt[:-1]]
        ) & (srt >= 0)
        dup = jnp.zeros_like(dup_srt).at[order].set(dup_srt)
        new = jnp.where(dup, ms.NO_MP, new)
        self.last_frame = self.last_frame.replace(mp=new)

    def _find_kf_slot(self, kf_id: int) -> int:
        ids = self.map.kfs.kf_id
        alive = self.map.kfs.valid & ~self.map.kfs.bad
        hit = jnp.where(alive & (ids == kf_id), jnp.arange(ids.shape[0]), -1)
        return int(jnp.max(hit))

    def _handle_lost(self, frame: Frame):
        if self.kfs_since_init < self.cfg.tracking.init_kfs:
            # young map: full reset (Tracking.cpp:248-259); kf/mp ids restart
            # at 0 like the reference (KeyFrame::nNextId = 0, Tracking::Reset)
            self.state = NOT_INITIALIZED
            self.map = None
            self.ref_frame = None
            self.last_frame = None
            self.has_velocity = False
            self.next_kf_id = 0
            self.kf_events.append(-1)  # reset marker
            self.reset_epoch += 1
        else:
            self.state = LOST
        self.n_lost_frames += 1
        self.trajectory.append(None)
        return None
