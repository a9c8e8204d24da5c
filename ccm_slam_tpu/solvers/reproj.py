"""Reprojection residuals, analytic Jacobians, and robust weights.

The measurement model shared by every optimizer in the framework (the
counterpart of g2o's ``EdgeSE3ProjectXYZ``/``EdgeSE3ProjectXYZOnlyPose`` in
``cslam/thirdparty/g2o/g2o/types/types_six_dof_expmap.h``):

    r = pi(R_cw X_w + t_cw) - uv_observed          (2-vector, pixels)

Pose updates are *left-multiplicative* tangent increments
``T_cw <- exp([rho, phi]) . T_cw`` so the pose Jacobian has the simple closed
form ``d(Xc)/d(xi) = [I | -hat(Xc)]``.

Per-observation information is ``1/sigma2`` with ``sigma2 = s^{2*octave}``
(the reference's ``mvLevelSigma2`` weighting, cslam/src/Optimizer.cpp:122).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.lie import hat

CHI2_MONO = 5.991  # 95% quantile of chi2 with 2 dof (reference Optimizer.cpp)


def level_sigma2(octave, scale_factor: float = 1.2):
    """sigma^2 of the detection at a pyramid octave."""
    return jnp.power(jnp.float32(scale_factor * scale_factor), octave.astype(jnp.float32))


def project_residual(R_cw, t_cw, X_w, uv, fx, fy, cx, cy):
    """Residual + camera-frame point.

    Shapes broadcast: R_cw [...,3,3], t_cw [...,3], X_w [...,3], uv [...,2].
    Returns (r [...,2], Xc [...,3], z [...]).
    """
    Xc = (R_cw @ X_w[..., None])[..., 0] + t_cw
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[..., 0] / z_safe + cx
    v = fy * Xc[..., 1] / z_safe + cy
    r = jnp.stack([u, v], axis=-1) - uv
    return r, Xc, z


def proj_jacobian_point(Xc, fx, fy):
    """d(pi)/d(Xc): [..., 2, 3]."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def pose_point_jacobians(R_cw, Xc, fx, fy):
    """(J_pose [...,2,6], J_point [...,2,3]) for the left-multiplicative
    pose parametrization [rho, phi] and world-point parametrization."""
    Jproj = proj_jacobian_point(Xc, fx, fy)  # [..., 2, 3]
    # dXc/dxi = [I  -hat(Xc)]
    dXc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), (*Xc.shape[:-1], 3, 3)), -hat(Xc)],
        axis=-1,
    )  # [..., 3, 6]
    J_pose = Jproj @ dXc_dxi  # [..., 2, 6]
    J_point = Jproj @ R_cw  # [..., 2, 3]
    return J_pose, J_point


def huber_weight(chi2, delta: float):
    """IRLS weight of the Huber kernel applied to chi2 (g2o convention:
    kernel delta given on the residual scale, threshold at delta^2)."""
    d2 = delta * delta
    safe = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
    return jnp.where(chi2 <= d2, 1.0, delta / safe)


def huber_rho(chi2, delta: float):
    """Huber cost rho(chi2) for monitoring/accept decisions."""
    d2 = delta * delta
    return jnp.where(chi2 <= d2, chi2, 2.0 * delta * jnp.sqrt(jnp.clip(chi2, 0.0, None)) - d2)
