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

    def test_chunked_equals_monolithic_with_state_carry(self, mesh):
        """Interruptible chunking (INTERRUPTBA) with solver-state carry must
        follow the same LM trajectory as one monolithic solve."""
        prob, _, _ = self._problem()
        probs = dist_ba.shard_problem(prob, mesh)
        R1, t1, X1, c1 = dist_ba.dist_ba_solve(probs, mesh, iters=12)
        state = None
        pc = probs
        for _ in range(3):
            R2, t2, X2, c2, state = dist_ba.dist_ba_solve(
                pc, mesh, iters=4, state=state, return_state=True
            )
            pc = pc.replace(R=R2, t=t2, X=X2)
        np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-6)

    def test_pcg_backend_matches_single_device_at_scale(self, mesh):
        """Matrix-free distributed PCG (C > 96 path) vs the single-device
        production solver: same optimum at a non-trivial size."""
        n_dev = len(jax.devices())
        C, P, K = 128, ((8192 // n_dev) * n_dev), 4
        key = jax.random.PRNGKey(3)
        X, T, uv = synth_scene(key, n_points=P, n_cams=C, noise_px=0.3)
        prob = make_ba_problem(X, T, uv, noise_scale=0.02, key=jax.random.PRNGKey(4))
        R1, t1, X1, c1, _ = ba.ba_solve(prob, iters=10)
        probs = dist_ba.shard_problem(prob, mesh)
        R2, t2, X2, c2 = dist_ba.dist_ba_solve(probs, mesh, iters=10)
        assert abs(float(c2) - float(c1)) <= 0.05 * float(c1) + 1e-3
        ctr1 = -np.einsum("cji,cj->ci", np.asarray(R1), np.asarray(t1))
        ctr2 = -np.einsum("cji,cj->ci", np.asarray(R2), np.asarray(t2))
        assert np.linalg.norm(ctr1 - ctr2, axis=-1).max() < 5e-3

    def test_sharding_layout(self, mesh):
        prob, _, _ = self._problem()
        probs = dist_ba.shard_problem(prob, mesh)
        n_dev = len(jax.devices())
        assert len(probs.X.sharding.device_set) == n_dev
        assert len(probs.R.sharding.device_set) == n_dev  # replicated across all
