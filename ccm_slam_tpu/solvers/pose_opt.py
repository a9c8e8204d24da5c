"""Pose-only bundle adjustment (the per-frame tracking optimizer).

TPU-native counterpart of ``Optimizer::PoseOptimizationClient``
(cslam/src/Optimizer.cpp:215-347): optimize a single camera pose against its
frame's map-point associations with 4 rounds x 10 LM iterations, re-classifying
observations as in/outliers between rounds via the chi2(0.95, 2dof) gate and
dropping the Huber kernel in the final round.

Everything is fixed-shape and jit-compiled: the frame's N feature slots enter
as dense arrays with a validity mask, each LM iteration is a 6x6 solve, and
the round structure is an unrolled scan — one compiled program per frame step,
no host round-trips.  Batched over frames with vmap if desired.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.lie import orthonormalize, se3_exp
from . import reproj


def _gauss_newton_system(R, t, X, uv, w_conf, fx, fy, cx, cy, huber_delta, use_huber):
    """Weighted normal equations H (6x6), b (6), per-obs chi2, depth z."""
    r, Xc, z = reproj.project_residual(R, t, X, uv, fx, fy, cx, cy)
    J, _ = reproj.pose_point_jacobians(R, Xc, fx, fy)  # [N,2,6]
    chi2 = w_conf * jnp.sum(r * r, axis=-1)  # information-weighted squared error
    w_rob = jnp.where(use_huber, reproj.huber_weight(chi2, huber_delta), 1.0)
    w = w_conf * w_rob  # [N]
    # H = sum J^T w J ; b = -sum J^T w r
    Jw = J * w[:, None, None]
    H = jnp.einsum("nij,nik->jk", Jw, J)
    b = -jnp.einsum("nij,ni->j", Jw, r)
    return H, b, chi2, z


@partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def optimize_pose(
    R0,
    t0,
    X,
    uv,
    valid,
    sigma2,
    fx,
    fy,
    cx,
    cy,
    rounds: int = 4,
    iters_per_round: int = 10,
    chi2_thres: float = reproj.CHI2_MONO,
    huber_delta: float = 2.447651936,
):
    """Optimize T_cw = (R0, t0) against point-pixel associations.

    Args:
      X [N,3] world points; uv [N,2] undistorted pixels; valid [N] bool
      association mask; sigma2 [N] per-obs detection variance.
    Returns:
      (R, t, inlier_mask [N], n_inliers) — inlier_mask marks associations
      that pass the chi2 gate at the final pose (the reference's
      ``mvbOutlier`` complement).
    """
    w_conf0 = jnp.where(valid, 1.0 / sigma2, 0.0)

    def lm_iter(carry, _):
        R, t, lam, inlier, use_huber = carry
        w_conf = w_conf0 * inlier
        H, b, chi2, z = _gauss_newton_system(
            R, t, X, uv, w_conf, fx, fy, cx, cy, huber_delta, use_huber
        )
        chi2 = chi2 * (w_conf > 0)  # masked slots contribute nothing
        cost = jnp.sum(jnp.where(use_huber, reproj.huber_rho(chi2, huber_delta), chi2))
        H_damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        dx = jnp.linalg.solve(H_damped, b)
        dR, dt = se3_exp(dx)
        R_new = dR @ R
        t_new = (dR @ t[..., None])[..., 0] + dt
        # evaluate trial cost
        r_new, _, _ = reproj.project_residual(R_new, t_new, X, uv, fx, fy, cx, cy)
        chi2_new = w_conf * jnp.sum(r_new * r_new, axis=-1)
        cost_new = jnp.sum(
            jnp.where(use_huber, reproj.huber_rho(chi2_new, huber_delta), chi2_new)
        )
        accept = (cost_new < cost) & jnp.all(jnp.isfinite(dx))
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        return (R, t, lam, inlier, use_huber), cost

    def round_body(carry, round_idx):
        R, t, inlier = carry
        use_huber = round_idx < rounds - 1  # final round: plain least squares
        (R, t, _, _, _), costs = jax.lax.scan(
            lm_iter,
            (R, t, jnp.float32(1e-3), inlier, use_huber),
            None,
            length=iters_per_round,
        )
        # keep R on SO(3): the dR @ R chain preserves (and the velocity loop
        # feeding this amplifies) any non-orthogonal defect, which acts as a
        # projective warp no orthogonal update can undo
        R = orthonormalize(R)
        # re-classify at the updated pose (reference: chi2 > 5.991 or depth<=0)
        r, _, z = reproj.project_residual(R, t, X, uv, fx, fy, cx, cy)
        chi2 = w_conf0 * jnp.sum(r * r, axis=-1)
        inlier = valid & (chi2 <= chi2_thres) & (z > 0)
        return (R, t, inlier.astype(jnp.float32)), costs[-1]

    init = (orthonormalize(R0), t0, valid.astype(jnp.float32))
    (R, t, inlier_f), _ = jax.lax.scan(round_body, init, jnp.arange(rounds))
    inlier = inlier_f > 0.5
    return R, t, inlier, jnp.sum(inlier.astype(jnp.int32))
