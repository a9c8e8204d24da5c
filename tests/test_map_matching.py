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

# world/agent-map builders now live in the package (shared with the
# multi-process deployment runner); re-exported here for the other tests
from ccm_slam_tpu.io.synthetic import CX, CY, FX, FY, N_FEAT, build_agent_map, make_world

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

    def test_global_covis_is_real_per_map_covis(self, merged):
        """Candidate grouping must use the REAL covisibility graphs, laid out
        block-diagonally in the shared-db index space — not an arena-adjacency
        proxy (post-merge/culling arena order != spatial adjacency)."""
        m_a, m_b, _, _, _ = merged
        cfg = SystemConfig(
            capacity=CapacityConfig(
                max_keypoints=N_FEAT, client_max_kfs=16, client_max_mps=1024,
                max_obs_per_mp=8,
            ),
            placerec=PlaceRecConfig(start_map_matching_after_kf=0),
        )
        cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(0), m_b.kfs.desc[0], m_b.kfs.feat_valid[0],
            n_words=64, iters=2,
        )
        matcher = MapMatcher(cfg=cfg, cam=cam, vocab=vocab, n_slots=4, kf_capacity=16)
        nbr_g = np.asarray(matcher._global_covis({0: m_a, 1: m_b}))
        stride = matcher.kf_capacity
        for slot, m in [(0, m_a), (1, m_b)]:
            W = np.asarray(ms.covisibility_matrix(m))[:16, :16]
            lo = slot * stride
            for k in range(16):
                got = set(nbr_g[lo + k]) - {lo + k}
                # every real covisible neighbor in the row's top-10 must be
                # present (sparse form of the block-diagonal real graph)
                top = np.argsort(-W[k])[:10]
                expect = {lo + int(n) for n in top if W[k, n] > 0}
                assert expect <= (got | {lo + k}), (slot, k, expect, got)
                # and no cross-map neighbors
                assert all(lo <= g < lo + stride for g in got), (slot, k, got)

    def test_merge_with_shuffled_arena_order(self):
        """Arena order deliberately decorrelated from spatial adjacency:
        keyframes inserted in interleaved x order, so arena-adjacent slots
        share no landmarks.  Grouping by real covisibility must still find
        and fuse the overlap (an index-adjacency proxy pools the wrong
        neighbors here)."""
        rng = np.random.RandomState(5)
        world, wdesc = make_world(rng, n=420)
        cfg = SystemConfig(
            capacity=CapacityConfig(
                max_keypoints=N_FEAT, client_max_kfs=16, client_max_mps=1024,
                max_obs_per_mp=8,
            ),
            placerec=PlaceRecConfig(start_map_matching_after_kf=0),
        )
        cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
        # interleaved spatial order: consecutive arena slots are ~2m apart
        # (disjoint landmark sets), spatial neighbors are 3-4 slots apart
        xs_b = [0.0, 2.0, 4.0, 0.5, 2.5, 4.5, 1.0, 3.0]
        m_b = build_agent_map(world, wdesc, xs_b, Sim3.identity(), client_id=1,
                              kf_cap=16, mp_cap=2048)
        gauge_a = Sim3(
            s=jnp.float32(1.3), R=so3_exp(jnp.array([0.0, 0.0, -0.04])),
            t=jnp.array([-0.3, 0.1, 0.2]),
        )
        m_a = build_agent_map(world, wdesc, [3.0, 2.0, 1.0], gauge_a,
                              kf_id_base=50, client_id=0, kf_cap=16, mp_cap=2048)
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
            n_words=256, iters=6,
        )
        matcher = MapMatcher(cfg=cfg, cam=cam, vocab=vocab, n_slots=4, kf_capacity=16)
        for k in range(len(xs_b)):
            matcher.insert_keyframe(1, m_b, k)
        res = matcher.try_match(0, m_a, 2, {1: m_b})
        assert res is not None
        inv = gauge_a.inverse()
        np.testing.assert_allclose(float(res.S_from_to.s), float(inv.s), rtol=0.05)

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
