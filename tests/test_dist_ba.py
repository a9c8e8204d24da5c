import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.parallel import dist_ba
from ccm_slam_tpu.solvers import ba
from tests.test_solvers import FX, FY, CX, CY, make_ba_problem, synth_scene


@pytest.fixture(scope="module")
def mesh():
    return dist_ba.make_mesh()


class TestDistBA:
    def _problem(self, n_points=160, n_cams=6):
        key = jax.random.PRNGKey(0)
        X, T, uv = synth_scene(key, n_points=n_points, n_cams=n_cams, noise_px=0.3)
        return make_ba_problem(X, T, uv, noise_scale=0.02, key=jax.random.PRNGKey(1)), X, T

    def test_matches_single_device(self, mesh):
        prob, X, T = self._problem()
        R1, t1, X1, c1, _ = ba.ba_solve(prob, iters=15)
        probs = dist_ba.shard_problem(prob, mesh)
        R2, t2, X2, c2 = dist_ba.dist_ba_solve(probs, mesh, iters=15)
        # same LM trajectory -> near-identical results
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-3)
        np.testing.assert_allclose(float(c2), float(c1), rtol=1e-2)

    def test_converges(self, mesh):
        prob, X, T = self._problem()
        cost0 = float(ba._cost(prob, prob.R, prob.t, prob.X, 2.44))
        probs = dist_ba.shard_problem(prob, mesh)
        R, t, Xo, cost = dist_ba.dist_ba_solve(probs, mesh, iters=20)
        assert float(cost) < 0.05 * cost0
        err_t = float(jnp.max(jnp.linalg.norm(t - T.t, axis=-1)))
        assert err_t < 2e-2, err_t

    def test_sharding_layout(self, mesh):
        prob, _, _ = self._problem()
        probs = dist_ba.shard_problem(prob, mesh)
        n_dev = len(jax.devices())
        assert len(probs.X.sharding.device_set) == n_dev
        assert len(probs.R.sharding.device_set) == n_dev  # replicated across all
