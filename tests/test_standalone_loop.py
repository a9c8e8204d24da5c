"""BASELINE config 2 in miniature: single agent tracks an out-and-back loop
with naturally accumulated drift; the standalone system must recognize the
revisit (BoW), close the loop, and reduce the trajectory error."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import (
    CameraConfig,
    CapacityConfig,
    ExtractorConfig,
    PlaceRecConfig,
    SystemConfig,
)
from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers
from ccm_slam_tpu.runtime.standalone import StandaloneSystem
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import SE3, se3_exp
from tests.test_tracking_e2e import N_SLOTS, make_world, render_frame


def loop_trajectory(n_frames=110):
    """Out along x with yaw, then back to the start."""
    poses = []
    half = n_frames // 2
    for i in range(n_frames):
        if i < half:
            s = i / half
        else:
            s = (n_frames - 1 - i) / half
        T_wc = se3_exp(
            jnp.array([2.2 * s, 0.03 * np.sin(6 * s), 0.5 * s, 0.0, 0.12 * s, 0.0])
        )
        poses.append(SE3(R=T_wc[0], t=T_wc[1]).inverse())
    return poses


@pytest.fixture(scope="module")
def loop_run():
    cfg = SystemConfig(
        extractor=ExtractorConfig(n_features=N_SLOTS, n_levels=1),
        capacity=CapacityConfig(
            max_keypoints=N_SLOTS, client_max_kfs=48, client_max_mps=4096, max_obs_per_mp=12
        ),
        placerec=PlaceRecConfig(covisibility_consistency_th=1, new_loop_thres=10),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    world = make_world(seed=21)
    poses = loop_trajectory(110)
    rng = np.random.RandomState(17)
    sys_ = StandaloneSystem(cfg=cfg, cam=cam, n_words=512)
    est, gt = [], []
    for i, T in enumerate(poses):
        f = render_frame(world, T, cam, rng)
        f = f.replace(timestamp=jnp.float32(i * 0.05))
        out = sys_.process_frame(f)
        if out is not None:
            est.append(np.asarray(camera_centers(out.R_cw, out.t_cw)))
            gt.append(np.asarray(camera_centers(T.R, T.t)))
    return sys_, np.stack(est), np.stack(gt), poses


class TestStandaloneLoop:
    """The single-octave synthetic makes in-the-loop closure run-sensitive
    (the controlled closure path is covered by test_loop_closing); these
    gates assert the robust invariants of the full standalone stack."""

    def test_survives_most_of_run(self, loop_run):
        sys_, est, gt, poses = loop_run
        assert len(est) >= 0.75 * len(poses)

    def test_keyframe_trajectory_drift_bounded(self, loop_run):
        sys_, est, gt, poses = loop_run
        ts, R, t = sys_.keyframe_trajectory()
        gt_centers = {round(i * 0.05, 3): np.asarray(camera_centers(T.R, T.t))
                      for i, T in enumerate(poses)}
        kf_est = np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))
        kf_gt = np.stack([gt_centers[round(float(x), 3)] for x in ts])
        rmse, _ = ate_rmse(kf_est, kf_gt)
        # drift-level bound (loop closure, when it fires, tightens this)
        assert rmse < 0.25, rmse

    def test_loop_machinery_wired(self, loop_run):
        """The finder must have been created, fed every keyframe, and run
        its detection pipeline (db populated = detection had candidates to
        see; closures are asserted in the controlled loop tests)."""
        sys_, est, gt, poses = loop_run
        assert sys_.finder is not None
        assert int(jnp.sum(sys_.finder.db.valid)) >= 10


@pytest.fixture(scope="module")
def loop_run_multioctave():
    """The same out-and-back run with the multi-octave renderer: the scale-
    invariance envelope (min/max_dist from the detection octave) survives the
    2.2 m depth sweep, so the revisit keyframes keep enough landmark
    associations for the Sim3 stage — closure fires deterministically.
    (The single-octave fixture above collapses that envelope to +-20% and
    documents the resulting run-sensitivity.)"""
    from tests.test_tracking_e2e import render_frame_multioctave

    cfg = SystemConfig(
        extractor=ExtractorConfig(n_features=N_SLOTS, n_levels=4),
        capacity=CapacityConfig(
            max_keypoints=N_SLOTS, client_max_kfs=48, client_max_mps=4096,
            # landmarks stay visible for the whole synthetic run: the obs
            # table must hold the full revisit history or forward links get
            # dropped (rebuild_observations cap discipline)
            max_obs_per_mp=32,
        ),
        placerec=PlaceRecConfig(covisibility_consistency_th=1, new_loop_thres=10),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    world = make_world(seed=21)
    poses = loop_trajectory(110)
    rng = np.random.RandomState(17)
    sys_ = StandaloneSystem(cfg=cfg, cam=cam, n_words=512)
    est, gt = [], []
    for i, T in enumerate(poses):
        f = render_frame_multioctave(world, T, cam, rng)
        f = f.replace(timestamp=jnp.float32(i * 0.05))
        out = sys_.process_frame(f)
        if out is not None:
            est.append(np.asarray(camera_centers(out.R_cw, out.t_cw)))
            gt.append(np.asarray(camera_centers(T.R, T.t)))
    return sys_, np.stack(est), np.stack(gt), poses


class TestStandaloneLoopMultiOctave:
    def test_loop_closed_and_gba_ran(self, loop_run_multioctave):
        sys_, est, gt, poses = loop_run_multioctave
        assert sys_.stats["loops_closed"] >= 1
        assert sys_.stats["gba_runs"] >= 1
        assert sys_.tracker.state == 1  # OK: closure + GBA kept tracking alive

    def test_tracked_whole_run(self, loop_run_multioctave):
        sys_, est, gt, poses = loop_run_multioctave
        assert len(est) >= 0.9 * len(poses)

    def test_loop_edge_recorded(self, loop_run_multioctave):
        """The closure must leave a loop edge in the map (pose-graph input +
        viewer marker data, LoopFinder::CorrectLoop bookkeeping)."""
        sys_, *_ = loop_run_multioctave
        m = sys_.tracker.map
        loop_edges = np.asarray(m.kfs.loop_edge)
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        assert (alive & (loop_edges >= 0)).sum() >= 1

    def test_post_gba_keyframe_ate(self, loop_run_multioctave):
        sys_, est, gt, poses = loop_run_multioctave
        ts, R, t = sys_.keyframe_trajectory()
        gt_centers = {round(i * 0.05, 3): np.asarray(camera_centers(T.R, T.t))
                      for i, T in enumerate(poses)}
        kf_est = np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))
        kf_gt = np.stack([gt_centers[round(float(x), 3)] for x in ts])
        rmse, _ = ate_rmse(kf_est, kf_gt)
        assert rmse < 0.35, rmse


class TestLoopMapStructure:
    def test_post_closure_map_structure(self, loop_run_multioctave):
        """The loop correction + fusion + GBA pipeline must leave the
        forward/reverse observation tables consistent (CheckStructure)."""
        from ccm_slam_tpu.models import map_store as ms

        sys_, *_ = loop_run_multioctave
        errs = ms.check_structure(sys_.tracker.map)
        assert errs == [], errs[:10]
