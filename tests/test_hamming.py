import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.ops import hamming


def rand_desc(key, n):
    return jax.random.randint(key, (n, 32), 0, 256, dtype=jnp.uint8)


class TestHamming:
    def test_pack_unpack_roundtrip(self):
        d = rand_desc(jax.random.PRNGKey(0), 16)
        back = hamming.pack_bits(hamming.unpack_bits(d))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(d))

    def test_cross_matches_popcount(self):
        kq, kd = jax.random.split(jax.random.PRNGKey(1))
        q = rand_desc(kq, 64)
        d = rand_desc(kd, 128)
        fast = hamming.hamming_cross(q, d)
        ref = hamming.hamming_cross_popcount(q, d)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))

    def test_self_distance_zero(self):
        d = rand_desc(jax.random.PRNGKey(2), 32)
        dist = hamming.hamming_cross(d, d)
        np.testing.assert_array_equal(np.diag(np.asarray(dist)), np.zeros(32))

    def test_single_bit(self):
        a = jnp.zeros((1, 32), jnp.uint8)
        b = jnp.zeros((1, 32), jnp.uint8).at[0, 5].set(0b00010010)
        assert int(hamming.hamming_cross(a, b)[0, 0]) == 2
        assert int(hamming.hamming_pairwise(a[0], b[0])) == 2

    def test_max_distance(self):
        a = jnp.zeros((1, 32), jnp.uint8)
        b = jnp.full((1, 32), 255, jnp.uint8)
        assert int(hamming.hamming_cross(a, b)[0, 0]) == 256

    def test_masked(self):
        kq, kd = jax.random.split(jax.random.PRNGKey(3))
        q, d = rand_desc(kq, 8), rand_desc(kd, 8)
        qv = jnp.array([True] * 4 + [False] * 4)
        dv = jnp.ones(8, bool)
        dist = hamming.masked_hamming_cross(q, qv, d, dv)
        assert np.all(np.asarray(dist[4:]) == int(hamming.INVALID_DIST))
        assert np.all(np.asarray(dist[:4]) < int(hamming.INVALID_DIST))

    def test_best_match(self):
        dist = jnp.array([[5, 3, 9], [1, 2, 0]])
        idx, best, second = hamming.best_match(dist)
        np.testing.assert_array_equal(np.asarray(idx), [1, 2])
        np.testing.assert_array_equal(np.asarray(best), [3, 0])
        np.testing.assert_array_equal(np.asarray(second), [5, 1])

    def test_mutual_best(self):
        # row0 <-> col1 mutual; row1 best col1 but col1 prefers row0
        dist = jnp.array([[9, 1, 8], [7, 3, 6]])
        idx, valid = hamming.mutual_best(dist)
        np.testing.assert_array_equal(np.asarray(idx), [1, 1])
        np.testing.assert_array_equal(np.asarray(valid), [True, False])

    def test_rotation_histogram(self):
        n = 100
        # 90 matches agree on rotation ~10deg, 10 outliers spread out
        angles_q = jnp.zeros(n)
        angles_t = jnp.concatenate([jnp.full((90,), -10.0), jnp.linspace(50, 300, 10)])
        valid = jnp.ones(n, bool)
        kept = hamming.rotation_histogram_filter(angles_q, angles_t, valid)
        assert bool(jnp.all(kept[:90]))
        assert int(jnp.sum(kept[90:])) <= 3

    def test_jit_grad_shapes(self):
        q = rand_desc(jax.random.PRNGKey(4), 1024)
        d = rand_desc(jax.random.PRNGKey(5), 2048)
        out = jax.jit(hamming.hamming_cross)(q, d)
        assert out.shape == (1024, 2048)
        assert int(out.min()) >= 0 and int(out.max()) <= 256
