import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.utils import lie


def rand_rot(key, batch=()):
    phi = jax.random.normal(key, (*batch, 3)) * 1.5
    return lie.so3_exp(phi)


class TestSO3:
    def test_exp_identity(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_orthonormal(self):
        key = jax.random.PRNGKey(0)
        R = rand_rot(key, (64,))
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(64), atol=1e-5)

    def test_log_exp_roundtrip(self):
        key = jax.random.PRNGKey(1)
        phi = jax.random.normal(key, (128, 3))
        phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True)
        mags = jnp.linspace(1e-6, 3.1, 128)
        phi = phi * mags[:, None]
        back = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(phi), atol=2e-4)

    def test_log_near_pi(self):
        axis = jnp.array([1.0, 2.0, -0.5])
        axis = axis / jnp.linalg.norm(axis)
        phi = axis * (np.pi - 1e-5)
        back = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(phi), atol=1e-3)

    def test_exact_90deg(self):
        phi = jnp.array([0.0, 0.0, np.pi / 2])
        R = lie.so3_exp(phi)
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(np.asarray(R), expected, atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(2)
        xi = jax.random.normal(key, (64, 6))
        # keep |phi| < pi: log returns the principal branch
        phi_norm = jnp.linalg.norm(xi[:, 3:6], axis=-1, keepdims=True)
        xi = xi.at[:, 3:6].multiply(jnp.minimum(1.0, 3.0 / phi_norm))
        R, t = lie.se3_exp(xi)
        back = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)

    def test_compose_inverse(self):
        key1, key2 = jax.random.split(jax.random.PRNGKey(3))
        T1 = lie.SE3.exp(jax.random.normal(key1, (8, 6)))
        T2 = lie.SE3.exp(jax.random.normal(key2, (8, 6)))
        T = T1.compose(T2).compose(T2.inverse()).compose(T1.inverse())
        np.testing.assert_allclose(np.asarray(T.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T.t), np.zeros((8, 3)), atol=1e-5)

    def test_apply_matches_matrix(self):
        key = jax.random.PRNGKey(4)
        T = lie.SE3.exp(jax.random.normal(key, (6,)))
        x = jax.random.normal(jax.random.PRNGKey(5), (10, 3))
        via_mat = (np.asarray(T.matrix()) @ np.concatenate([x, np.ones((10, 1))], 1).T).T[:, :3]
        np.testing.assert_allclose(np.asarray(T.apply(x)), via_mat, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(6)
        xi = jax.random.normal(key, (64, 7)) * jnp.array([1, 1, 1, 1, 1, 1, 0.3])
        s, R, t = lie.sim3_exp(xi)
        back = lie.sim3_log(s, R, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-3)

    def test_exp_small(self):
        xi = jnp.zeros(7).at[0].set(1.0).at[6].set(1e-9)
        s, R, t = lie.sim3_exp(xi)
        assert abs(float(s) - 1.0) < 1e-6
        np.testing.assert_allclose(np.asarray(t), [1.0, 0.0, 0.0], atol=1e-5)

    def test_scale_only(self):
        xi = jnp.zeros(7).at[6].set(jnp.log(2.0))
        s, R, t = lie.sim3_exp(xi)
        np.testing.assert_allclose(float(s), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_compose_apply(self):
        key1, key2 = jax.random.split(jax.random.PRNGKey(7))
        S1 = lie.Sim3.exp(jax.random.normal(key1, (7,)) * 0.5)
        S2 = lie.Sim3.exp(jax.random.normal(key2, (7,)) * 0.5)
        x = jax.random.normal(jax.random.PRNGKey(8), (5, 3))
        lhs = S1.compose(S2).apply(x)
        rhs = S1.apply(S2.apply(x))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    def test_inverse(self):
        S = lie.Sim3.exp(jnp.array([0.3, -0.2, 0.5, 0.1, 0.8, -0.4, 0.4]))
        I = S.compose(S.inverse())
        np.testing.assert_allclose(float(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), np.zeros(3), atol=1e-5)

    def test_se3_embedding(self):
        """A Sim3 with sigma=0 must equal the SE3 exp."""
        xi6 = jnp.array([0.5, -0.3, 0.8, 0.2, -0.6, 0.4])
        xi7 = jnp.concatenate([xi6, jnp.zeros(1)])
        R6, t6 = lie.se3_exp(xi6)
        s, R7, t7 = lie.sim3_exp(xi7)
        np.testing.assert_allclose(np.asarray(R6), np.asarray(R7), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t6), np.asarray(t7), atol=1e-5)


class TestQuat:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(9)
        R = rand_rot(key, (32,))
        back = lie.quat_to_rot(lie.rot_to_quat(R))
        np.testing.assert_allclose(np.asarray(back), np.asarray(R), atol=1e-5)

    def test_identity(self):
        q = lie.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [1.0, 0, 0, 0], atol=1e-6)

    def test_near_pi_rotations(self):
        for axis in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [1.0, 1.0, 0.0]):
            a = jnp.array(axis)
            a = a / jnp.linalg.norm(a)
            R = lie.so3_exp(a * (np.pi - 1e-4))
            back = lie.quat_to_rot(lie.rot_to_quat(R))
            np.testing.assert_allclose(np.asarray(back), np.asarray(R), atol=1e-5)


class TestJit:
    def test_all_jittable(self):
        @jax.jit
        def f(xi7):
            S = lie.Sim3.exp(xi7)
            return S.compose(S.inverse()).log()

        out = f(jnp.ones(7) * 0.1)
        np.testing.assert_allclose(np.asarray(out), np.zeros(7), atol=1e-5)
