import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.solvers import ba, pose_opt, reproj
from ccm_slam_tpu.utils import lie

FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375


def synth_scene(key, n_points=200, n_cams=6, noise_px=0.5, spread=4.0):
    """Random points in a box in front of a ring of cameras looking at origin-ish."""
    kp, kc, kn = jax.random.split(key, 3)
    X = jax.random.uniform(kp, (n_points, 3), minval=-spread, maxval=spread)
    X = X.at[:, 2].add(10.0)  # depth 6..14
    # camera c at small lateral offsets, looking down +z
    xi = jax.random.normal(kc, (n_cams, 6)) * jnp.array([0.5, 0.5, 0.3, 0.02, 0.02, 0.02])
    T = lie.SE3.exp(xi)
    uv = []
    for c in range(n_cams):
        Xc = (T.R[c] @ X.T).T + T.t[c]
        uv.append(
            jnp.stack([FX * Xc[:, 0] / Xc[:, 2] + CX, FY * Xc[:, 1] / Xc[:, 2] + CY], -1)
        )
    uv = jnp.stack(uv)  # [C,P,2]
    uv = uv + jax.random.normal(kn, uv.shape) * noise_px
    return X, T, uv


class TestPoseOpt:
    def test_recovers_pose(self):
        key = jax.random.PRNGKey(0)
        X, T, uv = synth_scene(key, n_points=300, n_cams=1, noise_px=0.3)
        # perturb init
        dT = lie.SE3.exp(jnp.array([0.1, -0.08, 0.12, 0.02, -0.015, 0.01]))
        R0 = dT.R @ T.R[0]
        t0 = (dT.R @ T.t[0]) + dT.t
        valid = jnp.ones(300, bool)
        sigma2 = jnp.ones(300)
        R, t, inlier, n_in = pose_opt.optimize_pose(
            R0, t0, X, uv[0], valid, sigma2, FX, FY, CX, CY
        )
        assert int(n_in) > 280
        err_t = float(jnp.linalg.norm(t - T.t[0]))
        err_r = float(jnp.linalg.norm(lie.so3_log(R @ T.R[0].T)))
        assert err_t < 5e-3, err_t
        assert err_r < 5e-4, err_r

    def test_flags_outliers(self):
        key = jax.random.PRNGKey(1)
        X, T, uv = synth_scene(key, n_points=200, n_cams=1, noise_px=0.2)
        uv_bad = uv[0].at[:20].add(60.0)  # 20 gross outliers
        R, t, inlier, n_in = pose_opt.optimize_pose(
            T.R[0], T.t[0], X, uv_bad, jnp.ones(200, bool), jnp.ones(200), FX, FY, CX, CY
        )
        assert not bool(jnp.any(inlier[:20]))
        assert int(jnp.sum(inlier[20:])) > 170
        err_t = float(jnp.linalg.norm(t - T.t[0]))
        assert err_t < 1e-2

    def test_respects_valid_mask(self):
        key = jax.random.PRNGKey(2)
        X, T, uv = synth_scene(key, n_points=100, n_cams=1)
        # garbage measurements on masked-out slots must not affect the solve
        uv_g = uv[0].at[50:].set(1e5)
        valid = jnp.arange(100) < 50
        R, t, inlier, n_in = pose_opt.optimize_pose(
            T.R[0], T.t[0], X, uv_g, valid, jnp.ones(100), FX, FY, CX, CY
        )
        assert int(n_in) >= 45
        assert float(jnp.linalg.norm(t - T.t[0])) < 1e-2


def make_ba_problem(X, T, uv, noise_scale=0.0, key=None, n_fixed=2):
    C, P = uv.shape[0], X.shape[0]
    cam_idx = jnp.broadcast_to(jnp.arange(C)[None, :], (P, C)).astype(jnp.int32)
    uv_t = jnp.swapaxes(uv, 0, 1)  # [P,C,2]
    R0, t0, X0 = T.R, T.t, X
    if noise_scale > 0:
        k1, k2 = jax.random.split(key)
        # perturb non-fixed cameras and all points
        dxi = jax.random.normal(k1, (C, 6)) * noise_scale * jnp.array([1, 1, 1, 0.3, 0.3, 0.3])
        dxi = dxi.at[:n_fixed].set(0.0)
        dT = lie.SE3.exp(dxi)
        R0 = dT.R @ T.R
        t0 = (dT.R @ T.t[..., None])[..., 0] + dT.t
        X0 = X + jax.random.normal(k2, X.shape) * noise_scale * 2.0
    return ba.BAProblem(
        R=R0,
        t=t0,
        X=X0,
        cam_idx=cam_idx,
        uv=uv_t,
        sigma2=jnp.ones((P, C)),
        obs_valid=jnp.ones((P, C), bool),
        cam_fixed=jnp.arange(C) < n_fixed,
        point_valid=jnp.ones(P, bool),
        fx=jnp.float32(FX),
        fy=jnp.float32(FY),
        cx=jnp.float32(CX),
        cy=jnp.float32(CY),
    )


class TestBA:
    def test_converges_from_perturbation(self):
        key = jax.random.PRNGKey(3)
        X, T, uv = synth_scene(key, n_points=150, n_cams=6, noise_px=0.0)
        prob = make_ba_problem(X, T, uv, noise_scale=0.03, key=jax.random.PRNGKey(4))
        cost0 = float(ba._cost(prob, prob.R, prob.t, prob.X, 2.44))
        R, t, Xo, cost, n_good = ba.ba_solve(prob, iters=25)
        assert float(cost) < cost0 * 1e-3, (cost0, float(cost))
        # with zero measurement noise and 2 fixed cams the solution is exact
        err_t = float(jnp.max(jnp.linalg.norm(t - T.t, axis=-1)))
        err_X = float(jnp.max(jnp.linalg.norm(Xo - X, axis=-1)))
        assert err_t < 1e-2, err_t
        assert err_X < 2e-2, err_X

    def test_fixed_cams_not_moved(self):
        key = jax.random.PRNGKey(5)
        X, T, uv = synth_scene(key, n_points=100, n_cams=4, noise_px=0.2)
        prob = make_ba_problem(X, T, uv, noise_scale=0.02, key=jax.random.PRNGKey(6))
        R, t, Xo, cost, _ = ba.ba_solve(prob, iters=10)
        np.testing.assert_allclose(np.asarray(t[:2]), np.asarray(prob.t[:2]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(R[:2]), np.asarray(prob.R[:2]), atol=1e-7)

    def test_noise_floor(self):
        """With pixel noise, the solve should reach the noise-limited cost."""
        key = jax.random.PRNGKey(7)
        X, T, uv = synth_scene(key, n_points=120, n_cams=5, noise_px=0.5)
        prob = make_ba_problem(X, T, uv, noise_scale=0.02, key=jax.random.PRNGKey(8))
        R, t, Xo, cost, n_good = ba.ba_solve(prob, iters=25)
        n_obs = 120 * 5
        # expected chi2 ~ 2*sigma^2 per obs with sigma=0.5px, info=1 => ~0.5 per obs
        assert float(cost) / n_obs < 1.0
        assert int(n_good) == n_obs

    def test_outlier_classification(self):
        key = jax.random.PRNGKey(9)
        X, T, uv = synth_scene(key, n_points=100, n_cams=4, noise_px=0.2)
        uv = uv.at[2, :10].add(50.0)  # camera 2 sees 10 corrupted obs
        prob = make_ba_problem(X, T, uv)
        R, t, Xo, cost, _ = ba.ba_solve(prob, iters=15)
        good = ba.classify_outliers(prob, R, t, Xo)
        assert int(jnp.sum(~good[:10, 2])) >= 8  # corrupted obs flagged
        assert int(jnp.sum(good)) > 370

    def test_masked_obs_ignored(self):
        key = jax.random.PRNGKey(10)
        X, T, uv = synth_scene(key, n_points=80, n_cams=3, noise_px=0.1)
        prob = make_ba_problem(X, T, uv)
        # corrupt half the measurements of cam 2 but mask them out
        uv_bad = prob.uv.at[40:, 2].set(-1e4)
        prob = prob.replace(uv=uv_bad, obs_valid=prob.obs_valid.at[40:, 2].set(False))
        R, t, Xo, cost, _ = ba.ba_solve(prob, iters=15)
        assert float(cost) / (80 * 3) < 1.0


class TestReproj:
    def test_jacobian_matches_autodiff(self):
        key = jax.random.PRNGKey(11)
        X = jax.random.uniform(key, (10, 3), minval=-2, maxval=2).at[:, 2].add(8.0)
        T = lie.SE3.exp(jnp.array([0.2, -0.1, 0.3, 0.05, 0.02, -0.04]))
        uv = jnp.zeros((10, 2))

        def res_fn(xi, X_):
            dR, dt = lie.se3_exp(xi)
            Rn = dR @ T.R
            tn = (dR @ T.t) + dt
            r, _, _ = reproj.project_residual(Rn, tn, X_, uv, FX, FY, CX, CY)
            return r

        J_auto = jax.jacobian(res_fn, argnums=0)(jnp.zeros(6), X)  # [10,2,6]
        Jp_auto = jax.jacobian(lambda X_: res_fn(jnp.zeros(6), X_), argnums=0)(X)
        r, Xc, z = reproj.project_residual(T.R, T.t, X, uv, FX, FY, CX, CY)
        J_ana, Jp_ana = reproj.pose_point_jacobians(T.R, Xc, FX, FY)
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_ana), rtol=1e-3, atol=1e-3)
        # point jacobian: autodiff gives [10,2,10,3]; extract diagonal blocks
        Jp_diag = np.stack([np.asarray(Jp_auto)[i, :, i, :] for i in range(10)])
        np.testing.assert_allclose(Jp_diag, np.asarray(Jp_ana), rtol=1e-3, atol=1e-3)


class TestPcgSchurPath:
    def test_pcg_matches_dense_schur(self):
        """C>192 switches to matrix-free PCG (warm-started, tolerance-gated
        CG): must reach the dense-Schur optimum on the same problem."""
        import bench

        prob = bench.make_problem(C=220, P=4096, K=6, seed=4)
        R1, t1, X1, cost_pcg, _ = ba.ba_solve(prob, iters=12, pcg_backend="xla")
        # same geometry, dense path: slice cameras is not possible (C is the
        # switch), so solve the identical problem with the dense solver by
        # calling the internals
        import jax
        import jax.numpy as jnp

        @jax.jit
        def dense_iters(R, t, X, n=12):
            huber = 2.447651936
            def it(carry, _):
                R, t, X, lam, cost = carry
                U, V, W, g_c, g_p, ci = ba._build_normal_blocks(prob, R, t, X, huber)
                dc, dp = ba._solve_schur(prob, U, V, W, g_c, g_p, ci, lam)
                from ccm_slam_tpu.utils.lie import se3_exp
                dR, dt = se3_exp(dc)
                R2, t2 = dR @ R, (dR @ t[..., None])[..., 0] + dt
                X2 = X + dp
                c2 = ba._cost(prob, R2, t2, X2, huber)
                ok = c2 < cost
                return (jnp.where(ok, R2, R), jnp.where(ok, t2, t),
                        jnp.where(ok, X2, X), jnp.where(ok, lam * 0.3, lam * 5.0),
                        jnp.where(ok, c2, cost)), c2
            c0 = ba._cost(prob, R, t, X, 2.447651936)
            (R, t, X, _, c), _ = jax.lax.scan(it, (R, t, X, jnp.float32(1e-4), c0), None, length=n)
            return R, t, X, c

        _, _, _, cost_dense = dense_iters(prob.R, prob.t, prob.X)
        cost0 = float(ba._cost(prob, prob.R, prob.t, prob.X, 2.447651936))
        # both must agree at the optimum (the residual-noise floor)
        assert float(cost_pcg) < 0.2 * cost0
        assert float(cost_pcg) < 1.02 * float(cost_dense) + 1.0, (
            float(cost_pcg), float(cost_dense))
