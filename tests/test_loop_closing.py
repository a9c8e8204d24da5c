"""Loop-closure integration test: an out-and-back trajectory with simulated
odometric drift on the return leg; the final keyframe revisits the start and
must be recognized (BoW), aligned (Sim3), and corrected (essential graph)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import CameraConfig, CapacityConfig, PlaceRecConfig, SystemConfig
from ccm_slam_tpu.models import keyframe_db as kdb
from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.ops import bow
from ccm_slam_tpu.runtime.loop_closing import LoopFinder
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import SE3

N_FEAT = 96
N_WORDS = 256


def build_drifted_map():
    """11 keyframes: x = 0..5..0 looking +z; return leg drifted by +0.35 x.
    Landmarks at z~6; the return leg owns duplicate (drifted) copies."""
    rng = np.random.RandomState(0)
    xs_true = [0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0]
    drift = np.array([0.0] * 6 + [0.07, 0.14, 0.21, 0.28, 0.35])

    # world landmarks: dense line at z in [5.5, 7], x in [-2, 7]
    n_lm = 360
    lx = rng.uniform(-2, 7, n_lm)
    ly = rng.uniform(-1.5, 1.5, n_lm)
    lz = rng.uniform(5.5, 7.0, n_lm)
    world = np.stack([lx, ly, lz], 1).astype(np.float32)
    wdesc = rng.randint(0, 256, (n_lm, 32), dtype=np.uint8)

    cfg = SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=N_FEAT, client_max_kfs=16, client_max_mps=1024, max_obs_per_mp=8
        ),
        placerec=PlaceRecConfig(covisibility_consistency_th=1, new_loop_thres=0),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375

    m = ms.empty_map(16, 1024, N_FEAT, 8)
    lm_arena = {}  # (world_idx, leg) -> arena idx

    for k, (xt, dr) in enumerate(zip(xs_true, drift)):
        leg = 0 if k <= 5 else 1
        x_est = xt + dr  # drifted estimate
        T_true = SE3(R=jnp.eye(3), t=-jnp.array([xt, 0.0, 0.0]))  # cam at (x,0,0), +z
        T_est = SE3(R=jnp.eye(3), t=-jnp.array([x_est, 0.0, 0.0]))
        # visible world landmarks
        vis = np.where(np.abs(lx - xt) < 1.6)[0][:N_FEAT]
        # measurements from TRUE geometry
        Xc = np.asarray(T_true.apply(jnp.asarray(world[vis])))
        uv = np.stack(
            [fx * Xc[:, 0] / Xc[:, 2] + cx, fy * Xc[:, 1] / Xc[:, 2] + cy], 1
        ).astype(np.float32)
        n = len(vis)
        # landmark arena entries: return leg gets duplicates at drifted pos
        assoc = np.full(N_FEAT, -1, np.int64)
        new_world, new_desc, new_pos = [], [], []
        for j, wi in enumerate(vis):
            key = (wi, leg)
            if key not in lm_arena:
                # position consistent with the (drifted) pose estimates:
                # X_est = T_est^-1( T_true(world) )
                pos = np.asarray(T_est.inverse().apply(T_true.apply(jnp.asarray(world[wi]))))
                lm_arena[key] = ("new", wi, pos)
        # allocate new landmarks for this KF in one batch
        batch = [(key, v) for key, v in lm_arena.items() if isinstance(v, tuple) and v[0] == "new"]
        if batch:
            B = len(batch)
            pos_arr = np.stack([v[2] for _, v in batch])
            desc_arr = np.stack([wdesc[v[1]] for _, v in batch])
            pad = max(0, N_FEAT - B)
            m, idxs = ms.add_mappoints(
                m,
                n_new=jnp.int32(B),
                pos=jnp.asarray(np.pad(pos_arr, ((0, pad), (0, 0)))[:N_FEAT]),
                desc=jnp.asarray(np.pad(desc_arr, ((0, pad), (0, 0)))[:N_FEAT]),
                normal=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (N_FEAT, 1)),
                min_dist=jnp.full(N_FEAT, 0.1),
                max_dist=jnp.full(N_FEAT, 50.0),
                ref_kf=jnp.full(N_FEAT, k, jnp.int32),
                mp_ids=jnp.arange(N_FEAT, dtype=jnp.int32) + k * N_FEAT,
                client_id=jnp.zeros(N_FEAT, jnp.int32),
                new_valid=jnp.arange(N_FEAT) < B,
            )
            for bi, (key, _) in enumerate(batch):
                lm_arena[key] = int(idxs[bi])
        for j, wi in enumerate(vis):
            assoc[j] = lm_arena[(wi, leg)]

        xy = np.zeros((N_FEAT, 2), np.float32)
        xy[:n] = uv
        desc = np.zeros((N_FEAT, 32), np.uint8)
        desc[:n] = wdesc[vis]
        valid = np.zeros(N_FEAT, bool)
        valid[:n] = True
        m, _ = ms.add_keyframe(
            m,
            kf_id=jnp.int32(k),
            client_id=jnp.int32(0),
            timestamp=jnp.float32(k * 0.5),
            R_cw=T_est.R,
            t_cw=T_est.t,
            xy=jnp.asarray(xy),
            desc=jnp.asarray(desc),
            octave=jnp.zeros(N_FEAT, jnp.int32),
            angle=jnp.zeros(N_FEAT),
            feat_valid=jnp.asarray(valid),
            mp_assoc=jnp.asarray(assoc.astype(np.int32)),
        )
    return m, cfg, cam, jnp.asarray(wdesc), np.array(xs_true), drift


@pytest.fixture(scope="module")
def closed_loop():
    m, cfg, cam, wdesc, xs_true, drift = build_drifted_map()
    vocab = bow.train_vocabulary(
        jax.random.PRNGKey(0), wdesc, jnp.ones(wdesc.shape[0], bool), n_words=N_WORDS, iters=6
    )
    db = kdb.empty_db(16, N_WORDS)
    lf = LoopFinder(cfg=cfg, cam=cam, vocab=vocab, db=db, map_id=0)
    # register keyframes 0..9 (the history)
    for k in range(10):
        lf.insert_keyframe(m, k)
    m_before = m
    m2, closed = lf.try_close(m, 10)
    if closed:
        # the reference launches GBA right after the essential graph
        # (LoopFinder::RunGBA); same here: arena-wide BA, two-KF gauge
        from ccm_slam_tpu.runtime.tracking import apply_ba_result, build_ba_problem
        from ccm_slam_tpu.solvers import ba

        fixed = jnp.arange(m2.kfs.capacity) < 2
        prob = build_ba_problem(m2, cam, fixed_mask=fixed)
        R, t, X, cost, _ = ba.ba_solve(prob, iters=20)
        alive = m2.kfs.valid & ~m2.kfs.bad
        m2 = apply_ba_result(m2, R, t, X, moved_kf_mask=~fixed & alive)
    return m_before, m2, closed, xs_true, drift


class TestLoopClosing:
    def test_loop_detected_and_closed(self, closed_loop):
        _, m2, closed, _, _ = closed_loop
        assert closed

    def test_drift_removed(self, closed_loop):
        m_before, m2, closed, xs_true, drift = closed_loop
        centers_before = np.asarray(m_before.kfs.center())[:11]
        centers_after = np.asarray(m2.kfs.center())[:11]
        err_before = np.abs(centers_before[:, 0] - xs_true)
        err_after = np.abs(centers_after[:, 0] - xs_true)
        # the end-of-loop drift (0.35) should be mostly gone
        assert err_before[10] > 0.3
        assert err_after[10] < 0.1, err_after
        # total drift reduced substantially
        assert err_after.sum() < 0.5 * err_before.sum(), (err_before, err_after)

    def test_anchor_unmoved(self, closed_loop):
        m_before, m2, _, _, _ = closed_loop
        # loop-match KF (0) is the fixed anchor of the essential graph
        np.testing.assert_allclose(
            np.asarray(m2.kfs.t_cw[0]), np.asarray(m_before.kfs.t_cw[0]), atol=1e-5
        )

    def test_loop_edge_recorded(self, closed_loop):
        _, m2, _, _, _ = closed_loop
        # undirected edge recorded in BOTH endpoints' tables (mspLoopEdges)
        assert 0 in np.asarray(m2.kfs.loop_edges[10]).tolist()
        assert 10 in np.asarray(m2.kfs.loop_edges[0]).tolist()
