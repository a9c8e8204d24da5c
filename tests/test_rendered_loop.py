"""Split from test_rendered_ate so pytest-xdist (--dist loadfile) runs the
three rendered accuracy gates on separate workers (each is CI-minutes)."""

from tests.test_rendered_ate import (  # shared helpers (classes NOT imported
    CACHE, FACTOR, _drive, _gt_lookup, _kf_trajectory,  # -> no double collection)
)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import rendered_ci_config
from ccm_slam_tpu.io.rendered import RenderedSequence
from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers
from ccm_slam_tpu.runtime.tracker import LOST, Tracker
from ccm_slam_tpu.utils.camera import Camera

import os


@pytest.mark.rendered
class TestLoopClosureRendered:
    """BASELINE config 2: the rendered loop circuit must close + GBA."""

    def test_loop_closes_and_ate(self):
        from ccm_slam_tpu.runtime.standalone import StandaloneSystem

        cfg = rendered_ci_config(factor=FACTOR)
        cam = Camera.from_config(cfg.camera)
        n = 340
        seq = RenderedSequence(world="loop", seed=0, n_frames=n,
                               span=(0.0, 1.08), cam=cfg.camera, cache_dir=CACHE)
        sys_ = StandaloneSystem(cfg=cfg, cam=cam, n_words=1024)
        tracked = _drive(seq, sys_, n)
        assert sys_.tracker.state != LOST
        assert tracked >= 0.8 * n, tracked
        assert sys_.stats["loops_closed"] >= 1
        assert sys_.stats["gba_runs"] >= 1
        # final GBA on quiescence (FINALBA, Communicator.cpp:456-480): the
        # in-run GBA only ran right after the closure
        sys_.run_gba(40)
        ts, est = _kf_trajectory(sys_.tracker.map)
        gt = _gt_lookup(seq, ts)
        rmse, _ = ate_rmse(est, gt, align="sim3")
        span = np.linalg.norm(gt.max(0) - gt.min(0))
        print(f"rendered loop: ATE {rmse:.3f} m over span {span:.1f} m, "
              f"{len(ts)} KFs, loops={sys_.stats['loops_closed']}")
        # Measured seed sensitivity (r5 bisect, identical code, tracker rng
        # 42/43/44): 0.75 / 1.55 / 3.97 m over the 37.7 m span — the
        # monocular interior scale modes are weakly observable and the
        # closure geometry is a near-threshold event, so per-seed outcomes
        # scatter ~5x.  The bound is a regression gate at the top of that
        # measured band, NOT an accuracy claim (BASELINE.md carries the
        # distribution).  Also measured: a 2-lap drive does NOT tighten this
        # — a *tracked* revisit stays covisible with lap 1, so the finder
        # correctly never fires again (no second closure to harvest).
        assert rmse < 0.115 * span + 0.05, (rmse, span)


