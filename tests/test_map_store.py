import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.utils import lie

K_CAP, M_CAP, N_FEAT, MAX_OBS = 8, 64, 16, 4


def fresh():
    return ms.empty_map(K_CAP, M_CAP, N_FEAT, MAX_OBS)


def add_kf(m, kf_id, mp_assoc=None, t=None):
    if mp_assoc is None:
        mp_assoc = jnp.full((N_FEAT,), ms.NO_MP)
    key = jax.random.PRNGKey(kf_id)
    return ms.add_keyframe(
        m,
        kf_id=jnp.int32(kf_id),
        client_id=jnp.int32(0),
        timestamp=jnp.float32(kf_id * 0.05),
        R_cw=jnp.eye(3),
        t_cw=t if t is not None else jnp.zeros(3),
        xy=jax.random.uniform(key, (N_FEAT, 2)) * 100,
        desc=jax.random.randint(key, (N_FEAT, 32), 0, 256, dtype=jnp.uint8),
        octave=jnp.zeros((N_FEAT,), jnp.int32),
        angle=jnp.zeros((N_FEAT,)),
        feat_valid=jnp.ones((N_FEAT,), bool),
        mp_assoc=mp_assoc,
    )


def add_mps(m, n, ref_kf=0):
    key = jax.random.PRNGKey(100 + n)
    B = 8
    valid = jnp.arange(B) < n
    return ms.add_mappoints(
        m,
        n_new=jnp.int32(n),
        pos=jax.random.normal(key, (B, 3)) + jnp.array([0.0, 0.0, 5.0]),
        desc=jax.random.randint(key, (B, 32), 0, 256, dtype=jnp.uint8),
        normal=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (B, 1)),
        min_dist=jnp.ones(B),
        max_dist=jnp.full(B, 10.0),
        ref_kf=jnp.full(B, ref_kf, jnp.int32),
        mp_ids=jnp.arange(B, dtype=jnp.int32),
        client_id=jnp.zeros(B, jnp.int32),
        new_valid=valid,
    )


class TestAllocation:
    def test_add_keyframes(self):
        m = fresh()
        m, k0 = add_kf(m, 0)
        m, k1 = add_kf(m, 1)
        assert int(k0) == 0 and int(k1) == 1
        assert int(m.next_kf) == 2
        assert bool(m.kfs.valid[0]) and bool(m.kfs.valid[1]) and not bool(m.kfs.valid[2])

    def test_add_mappoints_masked(self):
        m = fresh()
        m, idx = add_mps(m, 5)
        assert int(m.next_mp) == 5
        assert np.array_equal(np.asarray(idx[:5]), np.arange(5))
        assert np.all(np.asarray(idx[5:]) == -1)
        assert int(jnp.sum(m.mps.valid)) == 5

    def test_observation_registration(self):
        m = fresh()
        m, _ = add_mps(m, 3)
        assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0).at[1].set(1).at[5].set(2)
        m, k = add_kf(m, 0, mp_assoc=assoc)
        assert int(m.mps.obs_n[0]) == 1
        assert int(m.mps.obs_kf[0, 0]) == int(k)
        assert int(m.mps.obs_feat[0, 0]) == 0
        assert int(m.mps.obs_feat[2, 0]) == 5


class TestGraph:
    def _two_kf_shared(self, n_shared):
        m = fresh()
        m, _ = add_mps(m, 8)
        a0 = jnp.full((N_FEAT,), ms.NO_MP)
        a1 = jnp.full((N_FEAT,), ms.NO_MP)
        for i in range(n_shared):
            a0 = a0.at[i].set(i)
            a1 = a1.at[i + 2].set(i)  # different feature slots, same landmarks
        m, _ = add_kf(m, 0, mp_assoc=a0)
        m, _ = add_kf(m, 1, mp_assoc=a1)
        return m

    def test_covisibility_counts(self):
        m = self._two_kf_shared(4)
        W = ms.covisibility_matrix(m)
        assert int(W[0, 1]) == 4 and int(W[1, 0]) == 4
        assert int(W[0, 0]) == 0

    def test_spanning_tree(self):
        m = self._two_kf_shared(4)
        W = ms.covisibility_matrix(m)
        parent = ms.spanning_tree(m, W)
        assert int(parent[0]) == int(ms.NO_KF)  # root
        assert int(parent[1]) == 0

    def test_covis_neighbors_threshold(self):
        m = self._two_kf_shared(4)
        W = ms.covisibility_matrix(m)
        idx, w, ok = ms.covis_neighbors(W, 1, top_k=4, min_weight=15)
        assert int(idx[0]) == 0 and int(w[0]) == 4
        assert not bool(ok[0])  # 4 < 15
        idx, w, ok = ms.covis_neighbors(W, 1, top_k=4, min_weight=3)
        assert bool(ok[0])


class TestDerived:
    def test_normal_and_depth(self):
        m = fresh()
        m, _ = add_mps(m, 2)
        # place the landmark at z=5, camera at origin looking +z
        m = m.replace(mps=m.mps.replace(pos=m.mps.pos.at[0].set(jnp.array([0.0, 0.0, 5.0]))))
        assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0)
        m, k = add_kf(m, 0, mp_assoc=assoc)
        m = m.replace(mps=m.mps.replace(ref_kf=m.mps.ref_kf.at[0].set(k)))
        m = ms.update_normal_and_depth(m)
        np.testing.assert_allclose(np.asarray(m.mps.normal[0]), [0, 0, 1.0], atol=1e-5)
        np.testing.assert_allclose(float(m.mps.max_dist[0]), 5.0, rtol=1e-5)
        np.testing.assert_allclose(float(m.mps.min_dist[0]), 5.0 / 1.2**7, rtol=1e-4)

    def test_distinctive_descriptor(self):
        m = fresh()
        m, _ = add_mps(m, 1)
        # three observations: two similar descs, one outlier -> pick a similar one
        a0 = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0)
        m, k0 = add_kf(m, 0, mp_assoc=a0)
        m, k1 = add_kf(m, 1, mp_assoc=a0)
        m, k2 = add_kf(m, 2, mp_assoc=a0)
        d_sim = jnp.zeros(32, jnp.uint8).at[0].set(3)
        d_sim2 = jnp.zeros(32, jnp.uint8).at[0].set(1)
        d_out = jnp.full((32,), 255, jnp.uint8)
        kfs = m.kfs
        kfs = kfs.replace(
            desc=kfs.desc.at[k0, 0].set(d_sim).at[k1, 0].set(d_sim2).at[k2, 0].set(d_out)
        )
        m = m.replace(kfs=kfs)
        m = ms.compute_distinctive_descriptors(m)
        got = np.asarray(m.mps.desc[0])
        assert got[0] in (1, 3) and got[1:].sum() == 0

    def test_erase_mappoint_detaches(self):
        m = fresh()
        m, _ = add_mps(m, 2)
        assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0).at[1].set(1)
        m, k = add_kf(m, 0, mp_assoc=assoc)
        mask = jnp.zeros(M_CAP, bool).at[0].set(True)
        m = ms.erase_mappoints(m, mask)
        assert bool(m.mps.bad[0])
        assert int(m.kfs.mp_idx[k, 0]) == int(ms.NO_MP)
        assert int(m.kfs.mp_idx[k, 1]) == 1  # untouched

    def test_erase_keyframe_removes_obs(self):
        m = fresh()
        m, _ = add_mps(m, 1)
        assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0)
        m, k0 = add_kf(m, 0, mp_assoc=assoc)
        m, k1 = add_kf(m, 1, mp_assoc=assoc)
        assert int(m.mps.obs_n[0]) == 2
        mask = jnp.zeros(K_CAP, bool).at[k0].set(True)
        m = ms.erase_keyframes(m, mask)
        m = ms.compact_observations(m)
        assert int(m.mps.obs_n[0]) == 1
        assert int(m.mps.obs_kf[0, 0]) == int(k1)

    def test_jit_add(self):
        @jax.jit
        def step(m):
            m, _ = add_mps(m, 4)
            assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0)
            m, k = add_kf(m, 7, mp_assoc=assoc)
            return m

        m = step(fresh())
        assert int(m.next_kf) == 1 and int(m.next_mp) == 4


class TestCompaction:
    def test_compact_map_remaps(self):
        m = fresh()
        m, mp_idx = add_mps(m, 4)
        a0 = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(0).at[1].set(2)
        a1 = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(2).at[1].set(3)
        m, k0 = add_kf(m, 0, mp_assoc=a0)
        m, k1 = add_kf(m, 1, mp_assoc=a1)
        # erase kf0 and landmarks 0,1 -> after compaction: 1 KF, landmarks 2,3
        m = ms.erase_keyframes(m, jnp.zeros(K_CAP, bool).at[k0].set(True))
        m = ms.erase_mappoints(m, jnp.zeros(M_CAP, bool).at[0].set(True).at[1].set(True))
        m2 = ms.compact_map(m)
        assert int(m2.next_kf) == 1
        # landmark 1 (id) had no obs from kf1 -> dropped too; 2 and 3 survive
        assert int(m2.next_mp) == 2
        # surviving KF is old kf1 with id 1
        assert int(m2.kfs.kf_id[0]) == 1
        # forward links of new kf0 point to compacted landmark slots
        mp0 = int(m2.kfs.mp_idx[0, 0])  # was landmark id 2
        mp1 = int(m2.kfs.mp_idx[0, 1])  # was landmark id 3
        assert mp0 >= 0 and mp1 >= 0
        assert int(m2.mps.mp_id[mp0]) == 2
        assert int(m2.mps.mp_id[mp1]) == 3
        # reverse obs consistent
        assert int(m2.mps.obs_kf[mp0, 0]) == 0
        assert int(m2.mps.obs_n[mp0]) == 1

    def test_compact_keeps_consistency(self):
        m = fresh()
        m, _ = add_mps(m, 6)
        for i in range(4):
            assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(i).at[1].set((i + 1) % 6)
            m, _ = add_kf(m, i, mp_assoc=assoc)
        m = ms.erase_keyframes(m, jnp.zeros(K_CAP, bool).at[1].set(True))
        m2 = ms.compact_map(m)
        # every forward link has a matching reverse observation
        kfs, mps = m2.kfs, m2.mps
        for k in range(int(m2.next_kf)):
            for f in range(N_FEAT):
                mp = int(kfs.mp_idx[k, f])
                if mp >= 0:
                    obs = np.asarray(mps.obs_kf[mp][: int(mps.obs_n[mp])])
                    feats = np.asarray(mps.obs_feat[mp][: int(mps.obs_n[mp])])
                    assert any((obs == k) & (feats == f)), (k, f, mp, obs, feats)


class TestCheckStructure:
    def test_clean_map_passes(self):
        from tests.test_map_store import fresh, add_kf, add_mps

        m = fresh()
        m, _ = add_mps(m, 4)
        a = jnp.full((16,), -1, jnp.int32)
        m, _ = add_kf(m, 0, mp_assoc=a.at[0].set(0).at[1].set(1))
        m, _ = add_kf(m, 1, mp_assoc=a.at[2].set(2))
        assert ms.check_structure(m) == []

    def test_detects_forward_reverse_mismatch(self):
        from tests.test_map_store import fresh, add_kf, add_mps

        m = fresh()
        m, _ = add_mps(m, 4)
        a = jnp.full((16,), -1, jnp.int32)
        m, _ = add_kf(m, 0, mp_assoc=a.at[0].set(0).at[1].set(1))
        # corrupt: forward link without a reverse entry
        m_bad = m.replace(kfs=m.kfs.replace(mp_idx=m.kfs.mp_idx.at[0, 5].set(2)))
        errs = ms.check_structure(m_bad)
        assert any("missing from" in e for e in errs), errs
        # corrupt: reverse entry pointing at the wrong feature
        m_bad2 = m.replace(mps=m.mps.replace(obs_feat=m.mps.obs_feat.at[0, 0].add(1)))
        errs2 = ms.check_structure(m_bad2)
        assert errs2, errs2

    def test_detects_dead_reference(self):
        from tests.test_map_store import fresh, add_kf, add_mps

        m = fresh()
        m, _ = add_mps(m, 2)
        a = jnp.full((16,), -1, jnp.int32)
        m, _ = add_kf(m, 0, mp_assoc=a.at[0].set(0))
        m_bad = m.replace(mps=m.mps.replace(ref_kf=m.mps.ref_kf.at[0].set(9)))
        errs = ms.check_structure(m_bad)
        assert any("reference keyframe" in e for e in errs), errs
