import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.utils.lie import Sim3, so3_exp
from tests.test_map_store import K_CAP, M_CAP, N_FEAT, add_kf, add_mps, fresh


class TestTransformMap:
    def test_projection_invariant(self):
        """A gauge change must leave pixel projections unchanged."""
        m = fresh()
        m, _ = add_mps(m, 5)
        m, k = add_kf(m, 0, t=jnp.array([0.2, -0.1, 0.3]))
        fx = fy = 400.0
        X = m.mps.pos[:5]
        Xc = (m.kfs.R_cw[k] @ X.T).T + m.kfs.t_cw[k]
        uv_before = Xc[:, :2] / Xc[:, 2:3]

        s, R, t = 1.7, so3_exp(jnp.array([0.1, -0.3, 0.2])), jnp.array([1.0, 2.0, -0.5])
        m2 = ms.transform_map(m, jnp.float32(s), R, t)
        X2 = m2.mps.pos[:5]
        Xc2 = (m2.kfs.R_cw[k] @ X2.T).T + m2.kfs.t_cw[k]
        uv_after = Xc2[:, :2] / Xc2[:, 2:3]
        np.testing.assert_allclose(np.asarray(uv_after), np.asarray(uv_before), atol=1e-4)
        # depths scale by s
        np.testing.assert_allclose(
            np.asarray(Xc2[:, 2] / Xc[:, 2]), np.full(5, s), rtol=1e-4
        )


class TestMergeMaps:
    def _map_with(self, n_kf, n_mp, id_base=0):
        m = fresh()
        m, _ = add_mps(m, n_mp)
        for i in range(n_kf):
            assoc = jnp.full((N_FEAT,), ms.NO_MP).at[0].set(i % n_mp).at[1].set((i + 1) % n_mp)
            m, _ = add_kf(m, id_base + i, mp_assoc=assoc)
        return m

    def test_merge_counts_and_remap(self):
        ma = self._map_with(3, 4, id_base=0)
        mb = self._map_with(2, 3, id_base=100)
        S = Sim3.identity()
        fused = ms.merge_maps(ma, mb, S.s, S.R, S.t)
        assert int(fused.next_kf) == 5
        assert int(fused.next_mp) == 7
        # b's first KF landed at arena 3 with its id
        assert int(fused.kfs.kf_id[3]) == 100
        # b's forward links remapped beyond a's landmarks
        mp0 = int(fused.kfs.mp_idx[3, 0])
        assert mp0 >= 4
        # reverse obs of that landmark point at the spliced KF
        obs = np.asarray(fused.mps.obs_kf[mp0][: int(fused.mps.obs_n[mp0])])
        assert 3 in obs or 4 in obs

    def test_merge_transform_applied(self):
        ma = self._map_with(2, 3)
        mb = self._map_with(2, 3, id_base=50)
        pos_b = np.asarray(mb.mps.pos[:3])
        s = jnp.float32(2.0)
        R = jnp.eye(3)
        t = jnp.array([10.0, 0.0, 0.0])
        fused = ms.merge_maps(ma, mb, s, R, t)
        got = np.asarray(fused.mps.pos[3:6])
        np.testing.assert_allclose(got, pos_b * 2.0 + np.array([10, 0, 0]), atol=1e-5)

    def test_merged_covisibility(self):
        """Covisibility/spanning derivations still work on the fused arena."""
        ma = self._map_with(3, 4)
        mb = self._map_with(2, 3, id_base=10)
        fused = ms.merge_maps(ma, mb, jnp.float32(1.0), jnp.eye(3), jnp.zeros(3))
        W = ms.covisibility_matrix(fused)
        assert W.shape == (K_CAP, K_CAP)
        # maps are disjoint: no cross-covisibility
        assert int(jnp.sum(W[:3, 3:5])) == 0
