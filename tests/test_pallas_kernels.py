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


def _small_ba_problem(P=700, K=4, C=40, seed=0, fixed=2):
    """Miniature BA problem with realistic structure (some invalid obs/points,
    fixed cameras, behind-camera points)."""
    from ccm_slam_tpu.solvers import ba

    rs = np.random.RandomState(seed)
    X = rs.uniform(-10, 10, (P, 3)).astype(np.float32)
    X[:, 2] += 20.0
    t = np.cumsum(rs.randn(C, 3).astype(np.float32) * 0.3, axis=0)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    cam_idx = rs.randint(0, C, (P, K)).astype(np.int32)
    Xc = np.einsum("pkij,pj->pki", R[cam_idx], X) + t[cam_idx]
    z = np.maximum(Xc[..., 2], 1.0)
    uv = np.stack([fx * Xc[..., 0] / z + cx, fy * Xc[..., 1] / z + cy], -1).astype(np.float32)
    uv += rs.randn(P, K, 2).astype(np.float32) * 2.0   # some large -> Huber active
    X[:5, 2] = -30.0                                   # behind-camera gate
    prob = ba.BAProblem(
        R=jnp.asarray(R),
        t=jnp.asarray(t + rs.randn(C, 3).astype(np.float32) * 0.05),
        X=jnp.asarray(X + rs.randn(P, 3).astype(np.float32) * 0.1),
        cam_idx=jnp.asarray(cam_idx),
        uv=jnp.asarray(uv),
        sigma2=jnp.asarray(1.0 + rs.rand(P, K).astype(np.float32)),
        obs_valid=jnp.asarray(rs.rand(P, K) > 0.15),
        cam_fixed=jnp.asarray(np.arange(C) < fixed),
        point_valid=jnp.asarray(rs.rand(P) > 0.05),
        fx=jnp.float32(fx), fy=jnp.float32(fy), cx=jnp.float32(cx), cy=jnp.float32(cy),
    )
    return prob


class TestFusedNormalBlocks:
    DELTA = 2.447651936

    def _golden(self, prob):
        from ccm_slam_tpu.solvers import ba

        U, V, W, g_c, g_p, ci = ba._build_normal_blocks(
            prob, prob.R, prob.t, prob.X, self.DELTA, trans=None
        )
        cost = ba._cost(prob, prob.R, prob.t, prob.X, self.DELTA)
        return U, V, W, g_c, g_p, cost

    @pytest.mark.parametrize("P,K,C,kmajor", [
        (700, 4, 40, False), (300, 8, 130, False), (257, 12, 9, False),
        (700, 4, 40, True), (300, 8, 130, True), (257, 12, 9, True),
    ])
    def test_matches_xla_path(self, P, K, C, kmajor):
        prob = _small_ba_problem(P=P, K=K, C=C, seed=P)
        U, V, W, g_c, g_p, cost = self._golden(prob)
        Uk, Vk, WTk, g_ck, g_pk, costk = pk.fused_normal_blocks(
            prob.R, prob.t, prob.X, prob.point_valid, prob.cam_idx, prob.uv,
            prob.sigma2, prob.obs_valid, prob.cam_fixed, C,
            prob.fx, prob.fy, prob.cx, prob.cy, self.DELTA, interpret=True,
            kmajor=kmajor,
        )
        Wk = pk.unpack_WT(WTk, P, K, kmajor=kmajor)
        # tolerances: f32 summation-order noise scales with the accumulation
        # magnitude (verified against a float64 golden: both paths sit within
        # ~2e-6 relative of it); atol is tied to the largest block entry
        def close(a, b, rel=5e-3):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, rtol=rel, atol=1e-5 * np.abs(b).max() + 1e-6)
        close(Uk, U)
        close(Vk, V)
        close(Wk, W)
        close(g_ck, g_c)
        close(g_pk, g_p)
        assert abs(float(costk) - float(cost)) < 1e-4 * abs(float(cost)) + 1e-2

    def test_fixed_cameras_zeroed(self):
        prob = _small_ba_problem(P=300, K=4, C=20, fixed=5)
        Uk, Vk, WTk, g_ck, g_pk, _ = pk.fused_normal_blocks(
            prob.R, prob.t, prob.X, prob.point_valid, prob.cam_idx, prob.uv,
            prob.sigma2, prob.obs_valid, prob.cam_fixed, 20,
            prob.fx, prob.fy, prob.cx, prob.cy, self.DELTA, interpret=True,
        )
        assert np.allclose(np.asarray(Uk[:5]), 0.0)
        assert np.allclose(np.asarray(g_ck[:5]), 0.0)
        # fixed cameras still constrain landmarks through V
        assert float(jnp.sum(jnp.abs(Vk))) > 0

    def test_cost_kernel_matches(self):
        from ccm_slam_tpu.solvers import ba

        prob = _small_ba_problem(P=500, K=8, C=33, seed=3)
        cost = float(ba._cost(prob, prob.R, prob.t, prob.X, self.DELTA))
        costk = float(pk.fused_reproj_cost(
            prob.R, prob.t, prob.X, prob.point_valid, prob.cam_idx, prob.uv,
            prob.sigma2, prob.obs_valid, 33,
            prob.fx, prob.fy, prob.cx, prob.cy, self.DELTA, interpret=True,
        ))
        assert abs(costk - cost) < 1e-4 * abs(cost) + 1e-2


class TestSchurOps:
    @pytest.mark.parametrize("P,K,C", [(300, 8, 70), (257, 4, 33)])
    def test_ops_match_references(self, P, K, C):
        rng = np.random.RandomState(P)
        W = jnp.asarray(rng.randn(P, K, 6, 3).astype(np.float32))
        Vinv = jnp.asarray(rng.randn(P, 3, 3).astype(np.float32))
        ci = jnp.asarray(rng.randint(0, C, (P, K)).astype(np.int32))
        WT = jnp.asarray(
            np.pad(np.asarray(W).reshape(P * K, 18).T, ((0, 6), (0, 0)))
        )
        off, rhs, wtv = pk.make_schur_ops(Vinv, ci, C, WT=WT, exact=True,
                                          interpret=True)
        # kmajor-packed WT must give identical operators
        WTk = pk._kmajor_cols(WT[:, : P * K], K, pk._matvec_eb(K))
        off2, rhs2, wtv2 = pk.make_schur_ops(Vinv, ci, C, WT=WTk, exact=True,
                                             interpret=True, WT_kmajor=True)
        v = jnp.asarray(rng.randn(C, 6).astype(np.float32))
        q = jnp.asarray(rng.randn(P, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(off(v)),
            np.asarray(pk.schur_matvec_reference(W, Vinv, ci, C)(v)),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(rhs(q)),
            np.asarray(pk.schur_rhs_reference(W, ci, C)(q)),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(wtv(v)),
            np.asarray(pk.schur_wtv_reference(W, ci, C)(v)),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_array_equal(np.asarray(off(v)), np.asarray(off2(v)))
        np.testing.assert_array_equal(np.asarray(rhs(q)), np.asarray(rhs2(q)))
        np.testing.assert_array_equal(np.asarray(wtv(v)), np.asarray(wtv2(v)))
