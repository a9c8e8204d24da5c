"""Standalone single-agent SLAM system: tracking + loop closure + GBA in one
process — BASELINE config 2 ("single-agent with full server-side
optimization"), equivalent to running the reference's client and server on
one machine for one agent.

Wires a ``Tracker`` to a ``LoopFinder`` over the same map arena and runs the
interruptible GBA schedule after loop closures and on quiescence.  The
vocabulary can be pretrained or bootstrapped from the first keyframes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..models import keyframe_db as kdb
from ..ops import bow
from ..solvers import ba
from ..utils.camera import Camera
from .loop_closing import LoopFinder
from .tracker import OK, Tracker
from .tracking import apply_ba_result, build_ba_problem


@dataclass
class StandaloneSystem:
    cfg: SystemConfig
    cam: Camera
    vocab: Optional[bow.Vocabulary] = None
    n_words: int = 1024
    tracker: Tracker = None
    finder: LoopFinder = None
    gba_after_loop_iters: int = 20
    _kf_seen: int = 0
    stats: dict = field(default_factory=lambda: {"loops_closed": 0, "gba_runs": 0})

    def __post_init__(self):
        if self.tracker is None:
            self.tracker = Tracker(cfg=self.cfg, cam=self.cam)

    def _ensure_finder(self):
        if self.finder is not None:
            return
        if self.vocab is None:
            # bootstrap the codebook from the map's current descriptors
            m = self.tracker.map
            descs = m.kfs.desc.reshape(-1, 32)
            valid = m.kfs.feat_valid.reshape(-1)
            self.vocab = bow.train_vocabulary(
                jax.random.PRNGKey(7), descs, valid, n_words=self.n_words, iters=6
            )
        self.finder = LoopFinder(
            cfg=self.cfg,
            cam=self.cam,
            vocab=self.vocab,
            db=kdb.empty_db(self.cfg.capacity.client_max_kfs, self.vocab.n_words),
            map_id=0,
        )

    def process_frame(self, frame):
        """Track one frame; on new keyframes, attempt loop closure and run
        GBA after a successful closure.  Returns the tracked Frame or None."""
        n_kf_before = self.tracker.stats["kf_created"]
        out = self.tracker.process_frame(frame)
        self._post_track(n_kf_before)
        return out

    def _post_track(self, n_kf_before: int):
        if self.tracker.map is None:
            return
        self._handle_compaction()
        if self.tracker.stats["kf_created"] > n_kf_before:
            self._ensure_finder()
            new_arena = self.tracker.ref_kf
            m, closed = self.finder.try_close(self.tracker.map, new_arena)
            self.tracker.map = m
            if closed:
                self.stats["loops_closed"] += 1
                self.run_gba(self.gba_after_loop_iters)
                # poses jumped: rebuild the velocity model next frame, and
                # hand tracking the POST-GBA pose of the loop keyframe
                m2 = self.tracker.map
                self.tracker.has_velocity = False
                self.tracker.last_frame = self.tracker.last_frame.replace(
                    R_cw=m2.kfs.R_cw[new_arena], t_cw=m2.kfs.t_cw[new_arena]
                )
            self._cull_redundant()

    def _handle_compaction(self):
        """Arena compaction permutes keyframe indices; the finder's db rows
        and consistency state hold the OLD indices — remap/reset them (the
        never-compact-under-others invariant, honored by fixup)."""
        if getattr(self.tracker, "last_compaction", None) is None:
            return
        kf_remap, _ = self.tracker.last_compaction
        self.tracker.last_compaction = None
        if self.finder is not None:
            from ..models import keyframe_db as kdb

            self.finder.db = kdb.remap(self.finder.db, kf_remap)
            self.finder.prev_groups = []  # consistency restarts (rare event)

    def _cull_redundant(self):
        """Keyframe redundancy culling (KeyFrameCullingV3): the standalone
        system IS client+server in one process, so the server-side culling
        belongs here — without it a noisy sequence inserts keyframes at near
        frame rate and the arena overflows.  Culled rows are erased from the
        place-recognition database (bad keyframes must not stay queryable)."""
        from ..models import keyframe_db as kdb
        from ..runtime import mapping as mapping_mod

        if self.cfg.mapping.red_thres >= 1.0:
            return
        m, n = mapping_mod.cull_redundant_keyframes(self.tracker.map, self.cfg)
        if int(n) > 0:
            self.tracker.map = m
            if self.finder is not None:
                dead = m.kfs.valid & m.kfs.bad
                self.finder.db = kdb.erase(self.finder.db, dead)

    def process_image(self, img, timestamp: float):
        n_kf_before = self.tracker.stats["kf_created"]
        out = self.tracker.process_image(img, timestamp)
        self._post_track(n_kf_before)
        return out

    def run_gba(self, iters: int = 20):
        """Full-map BA with the two oldest keyframes as gauge anchors."""
        if self.tracker.map is None:
            raise RuntimeError("run_gba before initialization: no map yet")
        m = self.tracker.map
        alive = m.kfs.valid & ~m.kfs.bad
        order = jnp.where(alive, m.kfs.insert_order, jnp.iinfo(jnp.int32).max)
        oldest2 = jnp.argsort(order)[:2]
        fixed = jnp.zeros((m.kfs.capacity,), bool).at[oldest2].set(True)
        prob = build_ba_problem(m, self.cam, fixed_mask=fixed)
        R, t, X, cost, _ = ba.ba_solve(prob, iters=iters)
        self.tracker.map = apply_ba_result(m, R, t, X, moved_kf_mask=~fixed & alive)
        self.stats["gba_runs"] += 1
        return float(cost)

    def keyframe_trajectory(self):
        """(timestamps, R_cw, t_cw) by keyframe id — the KF_GBA_0.csv data."""
        m = self.tracker.map
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        idxs = np.where(alive)[0]
        idxs = idxs[np.argsort(np.asarray(m.kfs.kf_id)[idxs])]
        return (
            np.asarray(m.kfs.timestamp)[idxs],
            np.asarray(m.kfs.R_cw)[idxs],
            np.asarray(m.kfs.t_cw)[idxs],
        )
