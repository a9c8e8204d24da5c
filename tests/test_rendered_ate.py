"""Accuracy gates on RENDERED PIXELS — the in-repo stand-in for the
reference's EuRoC ATE protocol (readme.md:185-194, evo_ape Sim3 alignment;
trajectory writer cslam/src/Map.cpp:1610-1670).  EuRoC itself cannot be
downloaded in this environment, so these gates drive the FULL pipeline —
XLA-raycast 3D worlds through the real radtan camera, the real ORB
extractor, matching, BA, loop closure, comm and merge — and assert explicit
ATE bounds from ground truth.

Three gates mirror BASELINE configs 1-3:
  1. corridor, single agent           -> tracking + local mapping ATE
  2. loop circuit, standalone system  -> closure fired + GBA + post-GBA ATE
  3. two corridor agents + server     -> cross-map merge + per-agent ATE

Resolution factor 0.4 (301x192) keeps each gate in CI minutes; the
full-resolution (752x480) numbers live in BASELINE.md (TPU run via
``scripts/run_euroc.py --dataset rendered --factor 1.0``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import rendered_ci_config
from ccm_slam_tpu.io.rendered import RenderedSequence
from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers
from ccm_slam_tpu.runtime.tracker import LOST, Tracker
from ccm_slam_tpu.utils.camera import Camera

CACHE = os.environ.get("CCM_RENDER_CACHE", "/tmp/ccm_render_cache")
FACTOR = 0.4


def _kf_trajectory(m):
    alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
    idxs = np.where(alive)[0]
    idxs = idxs[np.argsort(np.asarray(m.kfs.kf_id)[idxs])]
    ts = np.asarray(m.kfs.timestamp)[idxs]
    R = np.asarray(m.kfs.R_cw)[idxs]
    t = np.asarray(m.kfs.t_cw)[idxs]
    return ts, np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))


def _gt_lookup(seq, ts):
    gt_ts, gt_pos, _ = seq.ground_truth()
    idx = np.searchsorted(gt_ts, ts)
    idx = np.clip(idx, 0, len(gt_ts) - 1)
    return gt_pos[idx]


def _drive(seq, system, n):
    tracked = 0
    for i, fr in enumerate(seq.frames()):
        if i >= n:
            break
        out = system.process_image(jnp.asarray(fr.image), fr.timestamp)
        if out is not None:
            tracked += 1
    return tracked


@pytest.mark.rendered
class TestCorridorSingleAgent:
    """BASELINE config 1: single agent down the corridor, pixels in."""

    def test_corridor_ate(self):
        cfg = rendered_ci_config(factor=FACTOR)
        cam = Camera.from_config(cfg.camera)
        n = 200
        seq = RenderedSequence(world="corridor", seed=0, n_frames=n,
                               span=(0.0, 0.22), cam=cfg.camera, cache_dir=CACHE)
        tr = Tracker(cfg=cfg, cam=cam)
        tracked = _drive(seq, tr, n)
        assert tr.state != LOST
        assert tracked >= 0.8 * n, tracked
        ts, est = _kf_trajectory(tr.map)
        gt = _gt_lookup(seq, ts)
        rmse, _ = ate_rmse(est, gt, align="sim3")
        span = np.linalg.norm(gt.max(0) - gt.min(0))
        assert rmse < 0.010 * span + 0.02, (rmse, span)  # ~1% of trajectory


