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
