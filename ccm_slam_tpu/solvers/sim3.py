"""Sim(3) estimation: closed-form alignment, batched RANSAC, pair refinement.

Covers the reference's ``Sim3Solver`` (cslam/src/Sim3Solver.cpp: Horn
closed-form inside a RANSAC loop with reprojection-inlier checks in both
images) and ``Optimizer::OptimizeSim3`` (cslam/src/Optimizer.cpp:861-1056:
joint LM on the relative Sim3 with mutual reprojection residuals and a
chi2(10) gate).

TPU recast: the reference iterates RANSAC hypotheses sequentially on one
thread; here all hypotheses are evaluated at once (vmap over the hypothesis
axis — the same move that replaces the 2-thread H/F race in the initializer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.lie import Sim3, sim3_exp
from . import reproj


def umeyama_alignment(P1, P2, weights=None, fix_scale: bool = False):
    """Closed-form s,R,t minimizing sum w |P1 - (s R P2 + t)|^2.

    P1, P2: [..., N, 3] correspondences.  Returns Sim3 batched over leading
    dims.  (Umeyama's SVD solution — same minimizer as Horn's quaternion
    method used by the reference.)
    """
    if weights is None:
        weights = jnp.ones(P1.shape[:-1], P1.dtype)
    w = weights / jnp.clip(jnp.sum(weights, -1, keepdims=True), 1e-12)
    mu1 = jnp.sum(P1 * w[..., None], axis=-2)  # [...,3]
    mu2 = jnp.sum(P2 * w[..., None], axis=-2)
    Q1 = P1 - mu1[..., None, :]
    Q2 = P2 - mu2[..., None, :]
    # covariance of P2 -> P1
    Sigma = jnp.einsum("...ni,...nj,...n->...ij", Q1, Q2, w)
    U, D, Vt = jnp.linalg.svd(Sigma)
    det = jnp.linalg.det(U @ Vt)
    S_fix = jnp.concatenate(
        [jnp.ones((*det.shape, 2), P1.dtype), jnp.sign(det)[..., None]], axis=-1
    )
    R = (U * S_fix[..., None, :]) @ Vt
    var2 = jnp.sum(jnp.sum(Q2 * Q2, axis=-1) * w, axis=-1)
    s = jnp.where(
        jnp.asarray(fix_scale),
        jnp.ones_like(var2),
        jnp.sum(D * S_fix, axis=-1) / jnp.clip(var2, 1e-12),
    )
    t = mu1 - s[..., None] * (R @ mu2[..., None])[..., 0]
    return Sim3(s=s, R=R, t=t)


def _reproj_err2(S: Sim3, P_src, uv_dst, fx, fy, cx, cy):
    """Squared pixel error of projecting S(P_src) with a pinhole (no pose:
    points are already in the destination *camera* frame after S)."""
    Xc = S.apply(P_src)
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[..., 0] / z_safe + cx
    v = fy * Xc[..., 1] / z_safe + cy
    d = jnp.stack([u, v], -1) - uv_dst
    return jnp.sum(d * d, axis=-1), z


@partial(jax.jit, static_argnames=("n_hypotheses", "fix_scale"))
def ransac_sim3(
    key,
    Xc1,
    Xc2,
    uv1,
    uv2,
    valid,
    max_err1,
    max_err2,
    fx,
    fy,
    cx,
    cy,
    n_hypotheses: int = 300,
    fix_scale: bool = False,
):
    """Batched RANSAC for the Sim3 aligning camera-frame point sets.

    Xc1/Xc2 [N,3]: the same landmarks expressed in KF1's / KF2's camera frame
    (the reference feeds camera-frame coordinates, Sim3Solver.cpp:66-79).
    uv1/uv2 [N,2]: their observed pixels; max_err* [N]: per-obs squared-pixel
    gates (9.210 * sigma2 in the reference, Sim3Solver.cpp:88-104).

    Returns (S12: Sim3, inliers [N] bool, n_inliers).
    """
    # sample 3 correspondences per hypothesis, restricted to valid slots
    logits = jnp.log(valid.astype(jnp.float32) + 1e-12)
    idx = jax.random.categorical(key, logits, shape=(n_hypotheses, 3))
    P1s = Xc1[idx]  # [H,3,3]
    P2s = Xc2[idx]
    S_h = umeyama_alignment(P1s, P2s, fix_scale=fix_scale)  # batched over H

    # inlier check in both images (Sim3Solver::CheckInliers)
    e1, z1 = _reproj_err2(S_h, Xc2[None, :, :], uv1[None, :, :], fx, fy, cx, cy)  # [H,N]
    S_inv = S_h.inverse()
    e2, z2 = _reproj_err2(S_inv, Xc1[None, :, :], uv2[None, :, :], fx, fy, cx, cy)
    inl = valid[None, :] & (e1 < max_err1[None, :]) & (e2 < max_err2[None, :])
    inl = inl & (z1 > 0) & (z2 > 0)
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # refine on the best hypothesis' inliers with a weighted closed-form fit
    w = inl[best].astype(jnp.float32)
    S_ref = umeyama_alignment(Xc1, Xc2, weights=w, fix_scale=fix_scale)
    e1r, z1r = _reproj_err2(S_ref, Xc2, uv1, fx, fy, cx, cy)
    e2r, z2r = _reproj_err2(S_ref.inverse(), Xc1, uv2, fx, fy, cx, cy)
    inl_ref = valid & (e1r < max_err1) & (e2r < max_err2) & (z1r > 0) & (z2r > 0)
    # keep whichever of (refined, raw-best) has more inliers
    better = jnp.sum(inl_ref) >= counts[best]
    pick = lambda a, b: jnp.where(better, a, b)
    S_out = Sim3(
        s=pick(S_ref.s, S_h.s[best]), R=pick(S_ref.R, S_h.R[best]), t=pick(S_ref.t, S_h.t[best])
    )
    inl_out = jnp.where(better, inl_ref, inl[best])
    return S_out, inl_out, jnp.sum(inl_out)


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(
    S12_init: Sim3,
    Xc1,
    Xc2,
    uv1,
    uv2,
    valid,
    sigma2_1,
    sigma2_2,
    fx,
    fy,
    cx,
    cy,
    iters: int = 10,
    huber_delta: float = 3.1622776601683795,
    chi2_thres: float = 10.0,
    fix_scale: bool = False,
):
    """Joint LM refinement of the relative Sim3 (Optimizer::OptimizeSim3).

    Minimizes Huber-robust reprojection of Xc2 through S12 into image 1 and
    of Xc1 through S12^-1 into image 2.  Returns (S12, inliers, n_inliers).
    """

    def residuals(xi):
        S = Sim3.exp(xi).compose(S12_init)
        Xc = S.apply(Xc2)
        z1 = Xc[..., 2]
        z1s = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
        r1 = jnp.stack(
            [fx * Xc[..., 0] / z1s + cx - uv1[..., 0], fy * Xc[..., 1] / z1s + cy - uv1[..., 1]],
            -1,
        )
        Xi = S.inverse().apply(Xc1)
        z2 = Xi[..., 2]
        z2s = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
        r2 = jnp.stack(
            [fx * Xi[..., 0] / z2s + cx - uv2[..., 0], fy * Xi[..., 1] / z2s + cy - uv2[..., 1]],
            -1,
        )
        return r1, r2

    w1 = jnp.where(valid, 1.0 / sigma2_1, 0.0)
    w2 = jnp.where(valid, 1.0 / sigma2_2, 0.0)

    def chi2_of(xi):
        r1, r2 = residuals(xi)
        return w1 * jnp.sum(r1 * r1, -1), w2 * jnp.sum(r2 * r2, -1)

    def cost_of(xi, inlier):
        c1, c2 = chi2_of(xi)
        rho = reproj.huber_rho(c1, huber_delta) + reproj.huber_rho(c2, huber_delta)
        return jnp.sum(rho * inlier)

    def lm_iter(carry, _):
        xi, lam, inlier = carry

        def flat_res(x):
            r1, r2 = residuals(x)
            rw = jnp.concatenate(
                [r1 * jnp.sqrt(w1 * inlier)[:, None], r2 * jnp.sqrt(w2 * inlier)[:, None]], 0
            )
            return rw.reshape(-1)

        r = flat_res(xi)
        J = jax.jacobian(flat_res)(xi)  # [2N*2, 7]
        # Huber IRLS weights on top
        c1, c2 = chi2_of(xi)
        hw = jnp.concatenate(
            [reproj.huber_weight(c1, huber_delta), reproj.huber_weight(c2, huber_delta)]
        )
        hw = jnp.repeat(hw, 2)
        H = J.T @ (J * hw[:, None])
        if fix_scale:
            # zero out the scale direction
            mask = jnp.ones(7).at[6].set(0.0)
            H = H * mask[None, :] * mask[:, None] + jnp.diag(1.0 - mask)
        b = -J.T @ (r * hw)
        if fix_scale:
            b = b * jnp.ones(7).at[6].set(0.0)
        # additive identity floor in the damping: loop keyframes are nearly
        # co-located (t ~ 0), which makes the Sim3 scale unobservable from
        # reprojection — a diag-only floor lets the solver take huge
        # null-space steps that "improve" cost by float noise and destroy
        # the scale recovered by the 3D-3D RANSAC stage
        H = H + lam * (jnp.diag(jnp.diag(H)) + jnp.eye(7))
        dx = jnp.linalg.solve(H, b)
        xi_new = dx + xi  # tangent accumulation around S12_init (re-linearized)
        ok = jnp.all(jnp.isfinite(dx))
        c_old = cost_of(xi, inlier)
        accept = (cost_of(xi_new, inlier) < c_old * (1.0 - 1e-6)) & ok
        xi = jnp.where(accept, xi_new, xi)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (xi, lam, inlier), None

    inlier0 = valid.astype(jnp.float32)
    # round 1
    (xi, _, _), _ = jax.lax.scan(
        lm_iter, (jnp.zeros(7), jnp.float32(1e-4), inlier0), None, length=iters
    )
    # outlier gate then second round (reference re-optimizes with inliers only)
    c1, c2 = chi2_of(xi)
    inlier1 = (valid & (c1 <= chi2_thres) & (c2 <= chi2_thres)).astype(jnp.float32)
    (xi, _, _), _ = jax.lax.scan(
        lm_iter, (xi, jnp.float32(1e-4), inlier1), None, length=iters
    )
    c1, c2 = chi2_of(xi)
    inlier = valid & (c1 <= chi2_thres) & (c2 <= chi2_thres)
    S12 = Sim3.exp(xi).compose(S12_init)
    return S12, inlier, jnp.sum(inlier)
