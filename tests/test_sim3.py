import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.solvers import pose_graph, sim3
from ccm_slam_tpu.utils import lie

FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375


def project(X):
    return jnp.stack([FX * X[:, 0] / X[:, 2] + CX, FY * X[:, 1] / X[:, 2] + CY], -1)


class TestUmeyama:
    def test_exact_recovery(self):
        key = jax.random.PRNGKey(0)
        P2 = jax.random.normal(key, (50, 3))
        S_gt = lie.Sim3.exp(jnp.array([0.5, -0.2, 0.8, 0.1, 0.3, -0.2, 0.4]))
        P1 = S_gt.apply(P2)
        S = sim3.umeyama_alignment(P1, P2)
        np.testing.assert_allclose(float(S.s), float(S_gt.s), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(S_gt.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=1e-4)

    def test_fix_scale(self):
        key = jax.random.PRNGKey(1)
        P2 = jax.random.normal(key, (30, 3))
        S_gt = lie.SE3.exp(jnp.array([0.3, 0.1, -0.2, 0.2, -0.1, 0.15])).to_sim3()
        P1 = S_gt.apply(P2)
        S = sim3.umeyama_alignment(P1, P2, fix_scale=True)
        assert float(S.s) == 1.0
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(S_gt.R), atol=1e-5)

    def test_batched(self):
        key = jax.random.PRNGKey(2)
        P2 = jax.random.normal(key, (4, 20, 3))
        xi = jax.random.normal(jax.random.PRNGKey(3), (4, 7)) * 0.3
        S_gt = lie.Sim3.exp(xi)
        P1 = S_gt.apply(P2)
        S = sim3.umeyama_alignment(P1, P2)
        np.testing.assert_allclose(np.asarray(S.s), np.asarray(S_gt.s), rtol=1e-4)


class TestRansacSim3:
    def _make_pair(self, key, n=80, n_out=15):
        kp, ko = jax.random.split(key)
        # landmarks in cam2 frame, in front of both cameras
        Xc2 = jax.random.uniform(kp, (n, 3), minval=-2, maxval=2).at[:, 2].add(8.0)
        S12 = lie.Sim3.exp(jnp.array([0.4, -0.1, 0.2, 0.05, 0.1, -0.08, 0.3]))
        Xc1 = S12.apply(Xc2)
        uv1, uv2 = project(Xc1), project(Xc2)
        # corrupt the first n_out correspondences in frame 1 coordinates
        Xc1 = Xc1.at[:n_out].add(jax.random.normal(ko, (n_out, 3)) * 3.0)
        return Xc1, Xc2, uv1, uv2, S12

    def test_finds_sim3_with_outliers(self):
        Xc1, Xc2, uv1, uv2, S_gt = self._make_pair(jax.random.PRNGKey(4))
        n = Xc1.shape[0]
        max_err = jnp.full(n, 9.21)
        S, inl, n_in = sim3.ransac_sim3(
            jax.random.PRNGKey(5), Xc1, Xc2, uv1, uv2,
            jnp.ones(n, bool), max_err, max_err, FX, FY, CX, CY,
        )
        assert int(n_in) >= 60
        np.testing.assert_allclose(float(S.s), float(S_gt.s), rtol=0.02)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=0.05)

    def test_fix_scale_variant(self):
        key = jax.random.PRNGKey(6)
        Xc2 = jax.random.uniform(key, (60, 3), minval=-2, maxval=2).at[:, 2].add(8.0)
        T12 = lie.SE3.exp(jnp.array([0.3, 0.1, -0.1, 0.04, -0.06, 0.02]))
        Xc1 = T12.apply(Xc2)
        uv1, uv2 = project(Xc1), project(Xc2)
        max_err = jnp.full(60, 9.21)
        S, inl, n_in = sim3.ransac_sim3(
            jax.random.PRNGKey(7), Xc1, Xc2, uv1, uv2,
            jnp.ones(60, bool), max_err, max_err, FX, FY, CX, CY, fix_scale=True,
        )
        assert float(S.s) == 1.0
        assert int(n_in) >= 55


class TestOptimizeSim3:
    def test_refines_noisy_init(self):
        key = jax.random.PRNGKey(8)
        Xc2 = jax.random.uniform(key, (100, 3), minval=-2, maxval=2).at[:, 2].add(8.0)
        S_gt = lie.Sim3.exp(jnp.array([0.2, -0.3, 0.1, 0.06, 0.02, -0.1, 0.25]))
        Xc1 = S_gt.apply(Xc2)
        uv1 = project(Xc1) + jax.random.normal(jax.random.PRNGKey(9), (100, 2)) * 0.3
        uv2 = project(Xc2) + jax.random.normal(jax.random.PRNGKey(10), (100, 2)) * 0.3
        S0 = lie.Sim3.exp(jnp.array([0.03, 0.02, -0.04, 0.01, -0.01, 0.02, 0.05])).compose(S_gt)
        S, inl, n_in = sim3.optimize_sim3(
            S0, Xc1, Xc2, uv1, uv2, jnp.ones(100, bool), jnp.ones(100), jnp.ones(100),
            FX, FY, CX, CY,
        )
        assert int(n_in) >= 95
        np.testing.assert_allclose(float(S.s), float(S_gt.s), rtol=5e-3)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=3e-2)


class TestPoseGraph:
    def _ring_problem(self, n=12, drift=0.15):
        """Odometry ring with drift; a loop edge closes it."""
        # ground truth poses around a circle
        angles = jnp.linspace(0, 2 * np.pi * (n - 1) / n, n)
        xs = jnp.stack([jnp.cos(angles) * 5, jnp.sin(angles) * 5, jnp.zeros(n)], -1)
        xi_gt = jnp.concatenate([xs, jnp.zeros((n, 3))], -1)
        S_gt = lie.SE3.exp(xi_gt).to_sim3()

        # odometry measurements (exact), estimates with accumulated drift
        S_est_list = [S_gt]
        S_est = jax.tree.map(lambda x: np.asarray(x).copy(), S_gt)
        S_est = np.asarray  # placeholder, rebuilt below
        # build drifted estimates: propagate exact odometry + noise
        rng = np.random.RandomState(0)
        mats_s = [1.0]
        est = [lie.Sim3(s=S_gt.s[0], R=S_gt.R[0], t=S_gt.t[0])]
        for k in range(1, n):
            S_rel_gt = (
                lie.Sim3(s=S_gt.s[k], R=S_gt.R[k], t=S_gt.t[k])
                .compose(lie.Sim3(s=S_gt.s[k - 1], R=S_gt.R[k - 1], t=S_gt.t[k - 1]).inverse())
            )
            noise = lie.Sim3.exp(jnp.array(rng.randn(7) * drift / n))
            est.append(noise.compose(S_rel_gt).compose(est[-1]))
        S_est = lie.Sim3(
            s=jnp.stack([e.s for e in est]),
            R=jnp.stack([e.R for e in est]),
            t=jnp.stack([e.t for e in est]),
        )

        # edges: chain (k-1 -> k) with measured exact relative, + loop edge n-1 -> 0
        ii = jnp.arange(1, n)
        jj = jnp.arange(0, n - 1)
        ii = jnp.concatenate([ii, jnp.array([0])])
        jj = jnp.concatenate([jj, jnp.array([n - 1])])
        S_meas = pose_graph.relative_sim3(
            jax.tree.map(lambda x: x[ii], S_gt), jax.tree.map(lambda x: x[jj], S_gt)
        )
        prob = pose_graph.PoseGraphProblem(
            S_w=S_est,
            fixed=jnp.arange(n) == 0,
            vert_valid=jnp.ones(n, bool),
            i_idx=ii,
            j_idx=jj,
            S_meas=S_meas,
            edge_valid=jnp.ones(n, bool),
            weight=jnp.ones(n),
        )
        return prob, S_gt

    def test_closes_loop(self):
        prob, S_gt = self._ring_problem()
        S_opt, cost = pose_graph.optimize_pose_graph(prob, iters=25)
        assert float(cost) < 1e-6, float(cost)
        # after optimization poses should match ground truth (gauge fixed at 0)
        err_t = np.max(np.linalg.norm(np.asarray(S_opt.t) - np.asarray(S_gt.t), axis=-1))
        assert err_t < 1e-2, err_t
        err_s = np.max(np.abs(np.asarray(S_opt.s) - 1.0))
        assert err_s < 1e-3

    def test_fixed_vertex_unmoved(self):
        prob, S_gt = self._ring_problem()
        S_opt, _ = pose_graph.optimize_pose_graph(prob, iters=10)
        np.testing.assert_allclose(np.asarray(S_opt.t[0]), np.asarray(prob.S_w.t[0]), atol=1e-7)

    def test_pcg_matches_dense(self):
        """The matrix-free block-Jacobi PCG path (server-scale essential
        graph) must land on the same optimum as the dense LU path."""
        prob, S_gt = self._ring_problem(n=24, drift=0.25)
        S_d, cost_d = pose_graph.optimize_pose_graph(prob, iters=25, solver="dense")
        S_p, cost_p = pose_graph.optimize_pose_graph(prob, iters=25, solver="pcg")
        assert float(cost_p) < 1e-5, float(cost_p)
        err_t = np.max(np.linalg.norm(np.asarray(S_p.t) - np.asarray(S_d.t), axis=-1))
        assert err_t < 1e-2, err_t
        err_s = np.max(np.abs(np.asarray(S_p.s) - np.asarray(S_d.s)))
        assert err_s < 1e-3, err_s
