import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.ops import hamming, initializer, matching
from ccm_slam_tpu.utils import lie

FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375
K = jnp.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])


def rand_desc(key, n):
    return jax.random.randint(key, (n, 32), 0, 256, dtype=jnp.uint8)


def perturb_desc(key, desc, n_bits):
    """Flip n_bits random bits in each descriptor."""
    bits = hamming.unpack_bits(desc)
    n, d = bits.shape
    idx = jax.random.randint(key, (n, n_bits), 0, d)
    flip = jnp.zeros((n, d), jnp.uint8)
    flip = flip.at[jnp.arange(n)[:, None], idx].set(1)
    return hamming.pack_bits(jnp.bitwise_xor(bits, flip))


class TestWindowMatch:
    def test_matches_within_radius(self):
        key = jax.random.PRNGKey(0)
        kd, kp, kn = jax.random.split(key, 3)
        t_xy = jax.random.uniform(kp, (100, 2)) * 400
        t_desc = rand_desc(kd, 100)
        # queries = targets shifted slightly, same descriptors (few flipped bits)
        q_uv = t_xy + jax.random.normal(kn, (100, 2)) * 2.0
        q_desc = perturb_desc(jax.random.PRNGKey(1), t_desc, 5)
        idx, dist, ok = matching.match_in_window(
            q_uv, q_desc, jnp.ones(100, bool), t_xy, t_desc, jnp.ones(100, bool), radius=8.0
        )
        frac = float(jnp.mean((idx == jnp.arange(100)) & ok))
        assert frac > 0.9, frac

    def test_radius_excludes(self):
        t_xy = jnp.array([[0.0, 0.0], [300.0, 300.0]])
        d = rand_desc(jax.random.PRNGKey(2), 2)
        q_uv = jnp.array([[0.0, 0.0]])
        idx, dist, ok = matching.match_in_window(
            q_uv, d[1:2], jnp.ones(1, bool), t_xy, d, jnp.ones(2, bool), radius=10.0
        )
        # target 1 (the descriptor match) is out of radius; target 0 mismatches
        assert not bool(ok[0]) or int(idx[0]) == 0


class TestBruteMatch:
    def test_mutual_unique(self):
        key = jax.random.PRNGKey(3)
        t_desc = rand_desc(key, 64)
        q_desc = perturb_desc(jax.random.PRNGKey(4), t_desc, 4)
        idx, dist, ok = matching.match_brute(
            q_desc, jnp.ones(64, bool), t_desc, jnp.ones(64, bool), check_rotation=False
        )
        assert float(jnp.mean((idx == jnp.arange(64)) & ok)) > 0.85

    def test_duplicate_claims_resolved(self):
        d = rand_desc(jax.random.PRNGKey(5), 4)
        # two identical queries both match target 0
        q = jnp.concatenate([d[0:1], d[0:1]])
        idx, dist, ok = matching.match_brute(
            q, jnp.ones(2, bool), d, jnp.ones(4, bool), th_dist=256, nn_ratio=1.0,
            check_rotation=False,
        )
        assert int(jnp.sum(ok & (idx == 0))) <= 1


class TestEpipolar:
    def test_line_distance(self):
        T = lie.SE3.exp(jnp.array([0.3, 0.0, 0.0, 0.0, 0.0, 0.0]))  # pure x baseline
        # F12 for x2 lines: F = K^-T [t]x R K^-1
        tx = lie.hat(T.t)
        E = tx @ T.R
        F = jnp.linalg.inv(K).T @ E @ jnp.linalg.inv(K)
        # project a 3D point into both cams
        X = jnp.array([[0.5, -0.3, 5.0]])
        x1 = (K @ X[0]) / X[0, 2]
        Xc2 = T.apply(X)[0]
        x2 = (K @ Xc2) / Xc2[2]
        d2 = matching.epipolar_line_dist2(F.T, x1[None, :2], x2[None, :2])
        assert float(d2[0, 0]) < 1e-4


class TestInitializer:
    def _make_pair(self, key, n=200, planar=False, noise=0.3):
        kp, kn1, kn2 = jax.random.split(key, 3)
        X = jax.random.uniform(kp, (n, 3), minval=-3, maxval=3)
        if planar:
            X = X.at[:, 2].set(0.0)
        X = X.at[:, 2].add(8.0)
        T = lie.SE3.exp(jnp.array([0.8, 0.1, 0.05, 0.02, -0.08, 0.01]))  # baseline mostly x
        x1 = (K @ X.T).T
        p1 = x1[:, :2] / x1[:, 2:3]
        Xc2 = T.apply(X)
        x2 = (K @ Xc2.T).T
        p2 = x2[:, :2] / x2[:, 2:3]
        p1 = p1 + jax.random.normal(kn1, p1.shape) * noise
        p2 = p2 + jax.random.normal(kn2, p2.shape) * noise
        return p1, p2, X, T

    def test_general_scene_uses_f(self):
        p1, p2, X, T = self._make_pair(jax.random.PRNGKey(6))
        out = initializer.initialize_two_view(
            jax.random.PRNGKey(7), p1, p2, jnp.ones(200, bool), K
        )
        assert bool(out["success"])
        assert not bool(out["used_h"])
        # recovered direction of translation (up to scale)
        t_est = out["t"] / jnp.linalg.norm(out["t"])
        t_gt = T.t / jnp.linalg.norm(T.t)
        assert float(jnp.abs(jnp.dot(t_est, t_gt))) > 0.999
        # rotation error
        dR = out["R"] @ T.R.T
        assert float(jnp.linalg.norm(lie.so3_log(dR))) < 0.01

    def test_planar_scene_uses_h(self):
        p1, p2, X, T = self._make_pair(jax.random.PRNGKey(8), planar=True)
        out = initializer.initialize_two_view(
            jax.random.PRNGKey(9), p1, p2, jnp.ones(200, bool), K
        )
        assert bool(out["used_h"])
        assert bool(out["success"])
        t_est = out["t"] / jnp.linalg.norm(out["t"])
        t_gt = T.t / jnp.linalg.norm(T.t)
        assert float(jnp.abs(jnp.dot(t_est, t_gt))) > 0.99

    def test_triangulated_structure(self):
        p1, p2, X, T = self._make_pair(jax.random.PRNGKey(10), noise=0.1)
        out = initializer.initialize_two_view(
            jax.random.PRNGKey(11), p1, p2, jnp.ones(200, bool), K
        )
        assert bool(out["success"])
        good = np.asarray(out["good"])
        assert good.sum() > 150
        # structure is recovered up to the scale |t_gt| / |t_est|=1
        scale = float(jnp.linalg.norm(T.t))
        X_est = np.asarray(out["X"])[good] * scale
        X_gt = np.asarray(X)[good]
        err = np.linalg.norm(X_est - X_gt, axis=-1)
        assert np.median(err) < 0.15, np.median(err)

    def test_degenerate_no_parallax(self):
        """Pure rotation: must NOT report success."""
        key = jax.random.PRNGKey(12)
        X = jax.random.uniform(key, (150, 3), minval=-3, maxval=3).at[:, 2].add(8.0)
        R = lie.so3_exp(jnp.array([0.0, 0.1, 0.02]))
        x1 = (K @ X.T).T
        p1 = x1[:, :2] / x1[:, 2:3]
        Xc2 = (R @ X.T).T
        x2 = (K @ Xc2.T).T
        p2 = x2[:, :2] / x2[:, 2:3]
        out = initializer.initialize_two_view(
            jax.random.PRNGKey(13), p1, p2, jnp.ones(150, bool), K
        )
        assert not bool(out["success"])


class TestTriangulate:
    def test_exact(self):
        T = lie.SE3.exp(jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0]))
        X = jnp.array([[0.3, -0.2, 6.0], [1.0, 0.5, 4.0]])
        P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
        P2 = K @ jnp.concatenate([T.R, T.t[:, None]], 1)
        x1 = (K @ X.T).T
        p1 = x1[:, :2] / x1[:, 2:3]
        Xc2 = T.apply(X)
        x2 = (K @ Xc2.T).T
        p2 = x2[:, :2] / x2[:, 2:3]
        Xr = initializer.triangulate(P1, P2, p1, p2)
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-3)


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        from ccm_slam_tpu.ops import pnp

        key = jax.random.PRNGKey(20)
        X = jax.random.uniform(key, (150, 3), minval=-3, maxval=3).at[:, 2].add(9.0)
        T = lie.SE3.exp(jnp.array([0.4, -0.2, 0.6, 0.1, -0.15, 0.08]))
        Xc = T.apply(X)
        uv = jnp.stack(
            [FX * Xc[:, 0] / Xc[:, 2] + CX, FY * Xc[:, 1] / Xc[:, 2] + CY], -1
        )
        uv = uv + jax.random.normal(jax.random.PRNGKey(21), uv.shape) * 0.3
        uv = uv.at[:25].add(80.0)  # gross outliers
        out = pnp.ransac_pnp(
            jax.random.PRNGKey(22), X, uv, jnp.ones(150, bool), jnp.ones(150),
            FX, FY, CX, CY,
        )
        assert bool(out["success"])
        assert int(out["n_inliers"]) > 110
        assert float(jnp.linalg.norm(out["t"] - T.t)) < 0.02
        assert not bool(jnp.any(out["inliers"][:25]))

    def test_degenerate_too_few(self):
        from ccm_slam_tpu.ops import pnp

        X = jax.random.uniform(jax.random.PRNGKey(23), (20, 3)).at[:, 2].add(5.0)
        uv = jax.random.uniform(jax.random.PRNGKey(24), (20, 2)) * 400  # random garbage
        out = pnp.ransac_pnp(
            jax.random.PRNGKey(25), X, uv, jnp.ones(20, bool), jnp.ones(20),
            FX, FY, CX, CY,
        )
        assert not bool(out["success"])
