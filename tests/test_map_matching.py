"""Cross-map place recognition + merge: two agents cover overlapping corridors
in different gauges (scale + offset); the matcher must align and fuse them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import CameraConfig, CapacityConfig, PlaceRecConfig, SystemConfig
from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.ops import bow
from ccm_slam_tpu.runtime.map_matching import MapMatcher
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import SE3, Sim3, so3_exp

N_FEAT = 96
FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375


def make_world(rng, n=260):
    lx = rng.uniform(-2, 6, n)
    ly = rng.uniform(-1.5, 1.5, n)
    lz = rng.uniform(5.5, 7.0, n)
    return np.stack([lx, ly, lz], 1).astype(np.float32), rng.randint(
        0, 256, (n, 32), dtype=np.uint8
    )


def build_agent_map(world, wdesc, xs, gauge: Sim3, kf_id_base=0, client_id=0):
    """KFs at world x positions `xs` looking +z; map stored in `gauge`'s frame
    (world' = gauge(world))."""
    m = ms.empty_map(16, 1024, N_FEAT, 8)
    lm_arena = {}
    lx = world[:, 0]
    for k, xt in enumerate(xs):
        T_true = SE3(R=jnp.eye(3), t=-jnp.array([xt, 0.0, 0.0]))
        vis = np.where(np.abs(lx - xt) < 1.6)[0][:N_FEAT]
        Xc = np.asarray(T_true.apply(jnp.asarray(world[vis])))
        uv = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX, FY * Xc[:, 1] / Xc[:, 2] + CY], 1)
        n = len(vis)
        new = [wi for wi in vis if wi not in lm_arena]
        if new:
            B = len(new)
            pos = np.asarray(gauge.apply(jnp.asarray(world[new])))
            pad = max(0, N_FEAT - B)
            m, idxs = ms.add_mappoints(
                m,
                n_new=jnp.int32(B),
                pos=jnp.asarray(np.pad(pos, ((0, pad), (0, 0)))[:N_FEAT]),
                desc=jnp.asarray(np.pad(np.stack([wdesc[w] for w in new]), ((0, pad), (0, 0)))[:N_FEAT]),
                normal=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (N_FEAT, 1)),
                min_dist=jnp.full(N_FEAT, 0.01),
                max_dist=jnp.full(N_FEAT, 100.0),
                ref_kf=jnp.full(N_FEAT, k, jnp.int32),
                mp_ids=jnp.arange(N_FEAT, dtype=jnp.int32) + k * N_FEAT,
                client_id=jnp.full(N_FEAT, client_id, jnp.int32),
                new_valid=jnp.arange(N_FEAT) < B,
            )
            for bi, wi in enumerate(new):
                lm_arena[wi] = int(idxs[bi])
        assoc = np.full(N_FEAT, -1, np.int32)
        for j, wi in enumerate(vis):
            assoc[j] = lm_arena[wi]
        # pose in the gauge frame: T'_cw = se3( T_cw o gauge^-1 )
        Tg = T_true.to_sim3().compose(gauge.inverse())
        T_est = Tg.to_se3_scaled()
        xy = np.zeros((N_FEAT, 2), np.float32)
        xy[:n] = uv
        desc = np.zeros((N_FEAT, 32), np.uint8)
        desc[:n] = wdesc[vis]
        valid = np.zeros(N_FEAT, bool)
        valid[:n] = True
        m, _ = ms.add_keyframe(
            m, jnp.int32(kf_id_base + k), jnp.int32(client_id), jnp.float32(k * 0.5),
            T_est.R, T_est.t,
            jnp.asarray(xy), jnp.asarray(desc), jnp.zeros(N_FEAT, jnp.int32),
            jnp.zeros(N_FEAT), jnp.asarray(valid), jnp.asarray(assoc),
        )
    return m


@pytest.fixture(scope="module")
def merged():
    rng = np.random.RandomState(1)
    world, wdesc = make_world(rng)
    cfg = SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=N_FEAT, client_max_kfs=16, client_max_mps=1024, max_obs_per_mp=8
        ),
        placerec=PlaceRecConfig(start_map_matching_after_kf=0),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    # map B in the identity gauge covering x=0..2
    m_b = build_agent_map(world, wdesc, [0.0, 1.0, 2.0], Sim3.identity(), client_id=1)
    # map A in a scaled+shifted gauge covering x=1..3 (overlap at 1..2)
    gauge_a = Sim3(
        s=jnp.float32(1.5), R=so3_exp(jnp.array([0.0, 0.0, 0.05])), t=jnp.array([0.4, -0.2, 0.1])
    )
    m_a = build_agent_map(world, wdesc, [3.0, 2.0, 1.0], gauge_a, kf_id_base=50, client_id=0)

    vocab = bow.train_vocabulary(
        jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
        n_words=256, iters=6,
    )
    matcher = MapMatcher(cfg=cfg, cam=cam, vocab=vocab, n_slots=4, kf_capacity=16)
    # register map B's keyframes in the shared DB under slot 1
    for k in range(3):
        matcher.insert_keyframe(1, m_b, k)
    # query with map A's last keyframe (x=1, overlapping B's corridor)
    res = matcher.try_match(0, m_a, 2, {1: m_b})
    return m_a, m_b, res, world, gauge_a


class TestMapMatching:
    def test_merge_found(self, merged):
        _, _, res, _, _ = merged
        assert res is not None

    def test_gauge_recovered(self, merged):
        m_a, m_b, res, world, gauge_a = merged
        # S_from_to must undo gauge_a (map A world -> true/B world)
        S = res.S_from_to
        inv = gauge_a.inverse()
        np.testing.assert_allclose(float(S.s), float(inv.s), rtol=0.05)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(inv.t), atol=0.1)

    def test_fused_map_consistent(self, merged):
        m_a, m_b, res, world, _ = merged
        fused = res.fused
        n_kf = int(jnp.sum(fused.kfs.valid & ~fused.kfs.bad))
        assert n_kf == 6
        # keyframe centers of the absorbed map land near their true positions
        centers = np.asarray(fused.kfs.center())
        ids = np.asarray(fused.kfs.kf_id)
        for kf_id, x_true in [(50, 3.0), (51, 2.0), (52, 1.0)]:
            k = int(np.where(ids == kf_id)[0][0])
            assert abs(centers[k, 0] - x_true) < 0.15, (kf_id, centers[k])

    def test_duplicates_fused(self, merged):
        m_a, m_b, res, _, _ = merged
        fused = res.fused
        # seam landmarks should have been merged: alive landmark count is well
        # below the naive sum
        n_a = int(jnp.sum(m_a.mps.valid & ~m_a.mps.bad))
        n_b = int(jnp.sum(m_b.mps.valid & ~m_b.mps.bad))
        n_f = int(jnp.sum(fused.mps.valid & ~fused.mps.bad))
        assert n_f < n_a + n_b - 20, (n_a, n_b, n_f)
