"""End-to-end client front-end test on a synthetic world: deterministic
single-process replacement for the reference's rosbag evaluation (SURVEY §4:
the reference has no tests; this is the in-repo integration gate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import (
    CameraConfig,
    CapacityConfig,
    ExtractorConfig,
    SystemConfig,
)
from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers
from ccm_slam_tpu.models.map_store import NO_MP
from ccm_slam_tpu.runtime.frame import Frame
from ccm_slam_tpu.runtime.tracker import OK, Tracker
from ccm_slam_tpu.solvers.reproj import level_sigma2
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import SE3, se3_exp

N_SLOTS = 256


def small_config():
    return SystemConfig(
        extractor=ExtractorConfig(n_features=N_SLOTS, n_levels=1),
        capacity=CapacityConfig(
            max_keypoints=N_SLOTS,
            client_max_kfs=24,
            client_max_mps=2048,
            max_obs_per_mp=12,
            covis_neighbors=8,
        ),
    )


@dataclasses.dataclass
class SynthWorld:
    points: np.ndarray      # [L,3]
    desc: np.ndarray        # [L,32] uint8


def make_world(seed=0, n=600):
    """Landmark density tuned so that <= N_SLOTS points are visible per frame
    (the render cap then never churns the visible set — a real detector
    re-fires on the same corners).  Depth range 3-8m at ~0.035m/frame motion
    gives EuRoC-like triangulation geometry."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-5, 7, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(3.0, 8.0, n)
    desc = rng.randint(0, 256, (n, 32), dtype=np.uint8)
    return SynthWorld(points=pts, desc=desc)


def make_trajectory(n_frames=60):
    """Smooth sideways arc with slight forward motion and yaw."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        x = 2.0 * s
        z = 0.6 * s
        yaw = 0.15 * s
        T_wc = se3_exp(jnp.array([x, 0.05 * np.sin(4 * s), z, 0.0, yaw, 0.0]))
        # T_cw = inverse
        T = SE3(R=T_wc[0], t=T_wc[1]).inverse()
        poses.append(T)
    return poses


def render_frame(world: SynthWorld, T_cw: SE3, cam, rng, noise_px=0.3, flip_bits=3):
    Xc = np.asarray(T_cw.apply(jnp.asarray(world.points)))
    z = Xc[:, 2]
    uv = np.stack(
        [
            float(cam.fx) * Xc[:, 0] / np.maximum(z, 1e-6) + float(cam.cx),
            float(cam.fy) * Xc[:, 1] / np.maximum(z, 1e-6) + float(cam.cy),
        ],
        -1,
    )
    vis = (z > 0.5) & (uv[:, 0] > 10) & (uv[:, 0] < 742) & (uv[:, 1] > 10) & (uv[:, 1] < 470)
    idx = np.where(vis)[0]
    # deterministic subset (a real detector re-fires on the same corners);
    # shuffle only the slot order so nothing aligns by accident
    idx = idx[:N_SLOTS]
    rng.shuffle(idx)
    n = len(idx)
    xy = np.zeros((N_SLOTS, 2), np.float32)
    desc = np.zeros((N_SLOTS, 32), np.uint8)
    xy[:n] = uv[idx] + rng.randn(n, 2) * noise_px
    d = world.desc[idx].copy()
    # flip a few bits to emulate descriptor noise
    for _ in range(flip_bits):
        byte = rng.randint(0, 32, n)
        bit = rng.randint(0, 8, n)
        d[np.arange(n), byte] ^= (1 << bit).astype(np.uint8)
    desc[:n] = d
    valid = np.zeros(N_SLOTS, bool)
    valid[:n] = True
    octave = np.zeros(N_SLOTS, np.int32)
    return Frame(
        timestamp=jnp.float32(0.0),
        xy=jnp.asarray(xy),
        desc=jnp.asarray(desc),
        octave=jnp.asarray(octave),
        angle=jnp.zeros(N_SLOTS),
        sigma2=level_sigma2(jnp.asarray(octave)),
        valid=jnp.asarray(valid),
        R_cw=jnp.eye(3),
        t_cw=jnp.zeros(3),
        mp=jnp.full((N_SLOTS,), NO_MP, jnp.int32),
    )


@pytest.fixture(scope="module")
def tracked_run():
    cfg = small_config()
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    world = make_world()
    poses = make_trajectory(60)
    rng = np.random.RandomState(7)
    tracker = Tracker(cfg=cfg, cam=cam)
    results = []
    for i, T in enumerate(poses):
        f = render_frame(world, T, cam, rng)
        f = f.replace(timestamp=jnp.float32(i * 0.05))
        out = tracker.process_frame(f)
        results.append(out)
    return tracker, results, poses


class TestTrackingE2E:
    def test_initializes_and_tracks(self, tracked_run):
        tracker, results, poses = tracked_run
        assert tracker.state == OK
        n_tracked = sum(r is not None for r in results)
        assert n_tracked >= 0.85 * len(results), n_tracked

    def test_keyframes_created(self, tracked_run):
        tracker, _, _ = tracked_run
        assert tracker.stats["kf_created"] >= 3
        assert int(tracker.map.next_mp) > 100

    def test_trajectory_accuracy(self, tracked_run):
        tracker, results, poses = tracked_run
        est, gt = [], []
        for r, T in zip(results, poses):
            if r is None:
                continue
            est.append(np.asarray(camera_centers(r.R_cw, r.t_cw)))
            gt.append(np.asarray(camera_centers(T.R, T.t)))
        est = np.stack(est)
        gt = np.stack(gt)
        rmse, _ = ate_rmse(est, gt, align="sim3")
        # trajectory spans ~2.1m; demand cm-level ATE after Sim3 alignment
        assert rmse < 0.05, rmse

    def test_map_consistency(self, tracked_run):
        """Every forward link matches a reverse observation."""
        tracker, _, _ = tracked_run
        m = tracker.map
        kfs, mps = m.kfs, m.mps
        n_kf = int(m.next_kf)
        mp_idx = np.asarray(kfs.mp_idx)
        obs_kf = np.asarray(mps.obs_kf)
        obs_feat = np.asarray(mps.obs_feat)
        obs_n = np.asarray(mps.obs_n)
        bad = np.asarray(mps.bad)
        checked = 0
        for k in range(min(n_kf, 6)):
            for f in range(N_SLOTS):
                mp = mp_idx[k, f]
                if mp >= 0 and not bad[mp]:
                    o = obs_kf[mp][: obs_n[mp]]
                    ff = obs_feat[mp][: obs_n[mp]]
                    assert ((o == k) & (ff == f)).any(), (k, f, mp)
                    checked += 1
        assert checked > 50


def render_frame_multioctave(world, T_cw, cam, rng, n_levels=4):
    """Render with per-feature octaves 0..3: coarser octaves get noisier
    detections and looser gates, like the real pyramid extractor."""
    Xc = np.asarray(T_cw.apply(jnp.asarray(world.points)))
    z = Xc[:, 2]
    uv = np.stack(
        [
            float(cam.fx) * Xc[:, 0] / np.maximum(z, 1e-6) + float(cam.cx),
            float(cam.fy) * Xc[:, 1] / np.maximum(z, 1e-6) + float(cam.cy),
        ],
        -1,
    )
    vis = (z > 0.5) & (uv[:, 0] > 10) & (uv[:, 0] < 742) & (uv[:, 1] > 10) & (uv[:, 1] < 470)
    idx = np.where(vis)[0][:N_SLOTS]
    rng.shuffle(idx)
    n = len(idx)
    # deterministic per landmark, skewed like real per-level budgets
    # (~60% octave 0 — initialization matches only octave-0 features)
    octave = np.maximum(0, (idx % 8) - 4).astype(np.int32)
    sf = 1.2 ** octave[:n]
    xy = np.zeros((N_SLOTS, 2), np.float32)
    xy[:n] = uv[idx] + rng.randn(n, 2) * (0.3 * sf)[:, None]
    desc = np.zeros((N_SLOTS, 32), np.uint8)
    desc[:n] = world.desc[idx]
    valid = np.zeros(N_SLOTS, bool)
    valid[:n] = True
    oct_arr = np.zeros(N_SLOTS, np.int32)
    oct_arr[:n] = octave[:n]
    return Frame(
        timestamp=jnp.float32(0.0),
        xy=jnp.asarray(xy),
        desc=jnp.asarray(desc),
        octave=jnp.asarray(oct_arr),
        angle=jnp.zeros(N_SLOTS),
        sigma2=level_sigma2(jnp.asarray(oct_arr)),
        valid=jnp.asarray(valid),
        R_cw=jnp.eye(3),
        t_cw=jnp.zeros(3),
        mp=jnp.full((N_SLOTS,), NO_MP, jnp.int32),
    )


class TestMultiOctaveTracking:
    def test_tracks_with_octave_spread(self):
        """Multi-octave features (scaled noise + per-octave gates) must track
        at least as robustly as the single-octave case."""
        cfg = dataclasses.replace(
            small_config(), extractor=ExtractorConfig(n_features=N_SLOTS, n_levels=4)
        )
        cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
        world = make_world(seed=11)
        poses = make_trajectory(50)
        rng = np.random.RandomState(3)
        tracker = Tracker(cfg=cfg, cam=cam)
        est, gt = [], []
        for i, T in enumerate(poses):
            f = render_frame_multioctave(world, T, cam, rng)
            f = f.replace(timestamp=jnp.float32(i * 0.05))
            out = tracker.process_frame(f)
            if out is not None:
                est.append(np.asarray(camera_centers(out.R_cw, out.t_cw)))
                gt.append(np.asarray(camera_centers(T.R, T.t)))
        assert tracker.state == OK
        assert len(est) >= 0.8 * len(poses)
        rmse, _ = ate_rmse(np.stack(est), np.stack(gt))
        assert rmse < 0.1, rmse


class TestCheckReplaced:
    """CheckReplacedInLastFrame semantics (cslam/src/Tracking.cpp:469): when
    a fuse pass merges away a landmark the last frame observes, the
    association must be redirected to the winner, not dropped."""

    def test_fuse_redirect_and_last_frame(self, tracked_run):
        from ccm_slam_tpu.runtime import mapping

        tracker, _, _ = tracked_run
        m = tracker.map
        Mcap = m.mps.capacity
        k = tracker.ref_kf

        # pick a feature in the current keyframe with an alive landmark p
        row = np.asarray(m.kfs.mp_idx[k])
        fv = np.asarray(m.kfs.feat_valid[k])
        alive = np.asarray(m.mps.valid & ~m.mps.bad)
        cand_feats = np.where((row >= 0) & fv & alive[np.clip(row, 0, Mcap - 1)]
                              & (np.asarray(m.mps.obs_n)[np.clip(row, 0, Mcap - 1)] >= 2))[0]
        assert len(cand_feats) > 0
        f = int(cand_feats[0])
        p = int(row[f])

        # covisible neighbor with a free feature slot
        from ccm_slam_tpu.models import map_store as ms

        W = np.asarray(ms.covisibility_matrix(m))
        nbrs = np.argsort(W[k])[::-1]
        nb = int(nbrs[0])
        assert W[k, nb] > 0
        nb_row = np.asarray(m.kfs.mp_idx[nb])
        nb_fv = np.asarray(m.kfs.feat_valid[nb])
        free = np.where((nb_row < 0) & nb_fv)[0]
        if len(free):
            g = int(free[0])
        else:
            # dense world: every neighbor slot is linked — displace one whose
            # landmark is well-observed elsewhere (it only loses this one obs)
            obs_n = np.asarray(m.mps.obs_n)
            occ = np.where(
                nb_fv & (nb_row >= 0) & (nb_row != p)
                & (obs_n[np.clip(nb_row, 0, Mcap - 1)] >= 3)
            )[0]
            assert len(occ) > 0
            g = int(occ[0])

        # plant a duplicate landmark q (same geometry/descriptor as p) seen
        # only by the neighbor: the fuse pass must merge q into p
        q = int(m.next_mp)
        assert q < Mcap
        mps = m.mps
        mps2 = mps.replace(
            valid=mps.valid.at[q].set(True),
            bad=mps.bad.at[q].set(False),
            pos=mps.pos.at[q].set(mps.pos[p]),
            normal=mps.normal.at[q].set(mps.normal[p]),
            desc=mps.desc.at[q].set(mps.desc[p]),
            min_dist=mps.min_dist.at[q].set(mps.min_dist[p]),
            max_dist=mps.max_dist.at[q].set(mps.max_dist[p]),
            ref_kf=mps.ref_kf.at[q].set(nb),
        )
        kfs2 = m.kfs.replace(mp_idx=m.kfs.mp_idx.at[nb, g].set(q))
        m2 = ms.rebuild_observations(
            m.replace(mps=mps2, kfs=kfs2, next_mp=jnp.int32(q + 1))
        )
        assert int(m2.mps.obs_n[q]) == 1

        m3, n_add, n_merge, redir = mapping.fuse_neighbors(
            m2, jnp.int32(k), tracker.cam, tracker.cfg
        )
        redir = np.asarray(redir)
        iden = np.arange(Mcap)
        moved = redir != iden
        # q lost the merge (fewer observations than p) and redirects to p
        assert moved[q], "planted duplicate was not fused"
        assert redir[q] == p
        assert bool(m3.mps.bad[q])
        # every moved entry is now bad and points at an alive landmark
        alive3 = np.asarray(m3.mps.valid & ~m3.mps.bad)
        assert np.asarray(m3.mps.bad)[moved].all()
        assert alive3[redir[moved]].all()

        # the tracker plumbing: a last frame observing q follows it to p
        lf = tracker.last_frame
        saved = lf
        try:
            tracker.last_frame = lf.replace(mp=lf.mp.at[0].set(q))
            tracker._check_replaced(jnp.asarray(redir))
            assert int(tracker.last_frame.mp[0]) == p
        finally:
            tracker.last_frame = saved
