import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.ops import pallas_kernels as pk


def rand_desc(key, n):
    return jax.random.randint(key, (n, 32), 0, 256, dtype=jnp.uint8)


class TestHammingTop2:
    def _check(self, Q, T, q_invalid=0, t_invalid=0, seed=0):
        kq, kt = jax.random.split(jax.random.PRNGKey(seed))
        q = rand_desc(kq, Q)
        t = rand_desc(kt, T)
        qv = jnp.arange(Q) < (Q - q_invalid)
        tv = jnp.arange(T) < (T - t_invalid)
        idx_r, b_r, s_r = pk.hamming_top2_reference(q, qv, t, tv)
        idx_k, b_k, s_k = pk.hamming_top2(q, qv, t, tv, interpret=True)
        vq = np.asarray(qv)
        np.testing.assert_array_equal(np.asarray(b_k)[vq], np.asarray(b_r)[vq])
        np.testing.assert_array_equal(np.asarray(s_k)[vq], np.asarray(s_r)[vq])
        # index must achieve the best distance (ties may pick another column)
        from ccm_slam_tpu.ops import hamming

        d = np.asarray(hamming.hamming_cross(q, t))
        for i in np.where(vq)[0]:
            assert d[i, int(idx_k[i])] == int(b_k[i])

    def test_aligned_shapes(self):
        self._check(256, 512)

    def test_ragged_shapes(self):
        self._check(100, 300, seed=1)

    def test_masked_targets(self):
        self._check(128, 256, t_invalid=200, seed=2)

    def test_masked_queries(self):
        self._check(64, 128, q_invalid=30, seed=3)

    def test_single_tile(self):
        self._check(32, 64, seed=4)


class TestCamTransitions:
    """Golden checks for the PCG camera<->observation transition kernels."""

    def _setup(self, E, C, F, seed=0, oob=False):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        y = jax.random.normal(k1, (E, F), jnp.float32)
        v = jax.random.normal(k2, (C, F), jnp.float32)
        hi = C + 1 if oob else C
        ci = jax.random.randint(k3, (E,), -1 if oob else 0, hi, dtype=jnp.int32)
        return y, v, ci

    @pytest.mark.parametrize("E,C,F", [(2048, 64, 6), (1000, 130, 42), (512, 3, 1)])
    def test_reduce_matches_segment_sum(self, E, C, F):
        y, _, ci = self._setup(E, C, F)
        ref = pk.cam_reduce_reference(y, ci, C)
        out = pk.cam_reduce(y, ci, C, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("E,C,F", [(2048, 64, 6), (1000, 130, 13)])
    def test_broadcast_matches_gather(self, E, C, F):
        _, v, ci = self._setup(E, C, F, seed=1)
        ref = pk.cam_broadcast_reference(v, ci, C)
        out = pk.cam_broadcast(v, ci, C, exact=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("P,K,C", [(300, 8, 70), (128, 4, 300)])
    def test_fused_schur_matvec(self, P, K, C):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
        W = jax.random.normal(k1, (P, K, 6, 3), jnp.float32)
        # masked observations carry zero W rows (as in _build_normal_blocks)
        mask = jax.random.bernoulli(k2, 0.8, (P, K))
        W = W * mask[:, :, None, None]
        A = jax.random.normal(k3, (P, 3, 3), jnp.float32)
        Vinv = A @ jnp.swapaxes(A, -1, -2) + 3.0 * jnp.eye(3)
        ci = jax.random.randint(k4, (P, K), 0, C, dtype=jnp.int32)
        v = jax.random.normal(jax.random.PRNGKey(8), (C, 6), jnp.float32)
        ref = pk.schur_matvec_reference(W, Vinv, ci, C)(v)
        out = pk.make_schur_matvec(W, Vinv, ci, C, exact=True, interpret=True)(v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-3)

    def test_out_of_range_rows_dropped(self):
        y, v, ci = self._setup(777, 50, 4, seed=2, oob=True)
        np.testing.assert_allclose(
            np.asarray(pk.cam_reduce(y, ci, 50, interpret=True)),
            np.asarray(pk.cam_reduce_reference(y, ci, 50)),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(pk.cam_broadcast(v, ci, 50, interpret=True)),
            np.asarray(pk.cam_broadcast_reference(v, ci, 50)),
            rtol=1e-5, atol=1e-5,
        )
