"""Batched PnP (absolute pose from 2D-3D matches) with RANSAC.

Counterpart of the reference's ``PnPsolver`` (cslam/src/PnPSolver.cpp, EPnP +
RANSAC) — which is compiled but never instantiated there (relocalization is
dead code; tracking loss is terminal, Tracking.cpp:248-259).  This framework
ships a WORKING solver: hypotheses are 6-point DLT pose estimates evaluated
in one vmapped batch, the winner refined by the standard pose optimizer.
The tracker exposes it behind ``enable_relocalization`` (default off, for
behavioral parity with the reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..solvers import pose_opt


def _dlt_pose(X, uv_norm):
    """6+-point DLT for P = [R|t] from world points X [n,3] and NORMALIZED
    image coords uv_norm [n,2] (K already removed).  Returns (R, t)."""
    n = X.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([X, jnp.ones((n, 1))], axis=1)  # [n,4]
    u = uv_norm[:, 0:1]
    v = uv_norm[:, 1:2]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2n,12]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    # orthogonalize: M = s R with R in SO(3)
    U, D, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, det])) @ Vt2
    s = jnp.sum(D * jnp.array([1.0, 1.0, det])) / 3.0
    s = jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    t = P[:, 3] / s
    # cheirality: majority of points must be in front
    z = (R @ X.T).T[:, 2] + t[2]
    flip = jnp.sum(z > 0) < (n // 2)
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # -R is not a rotation (det=-1); repair via SVD again
    U3, _, Vt3 = jnp.linalg.svd(R)
    det3 = jnp.linalg.det(U3 @ Vt3)
    R = U3 @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, det3])) @ Vt3
    return R, t


@partial(jax.jit, static_argnames=("n_hypotheses", "refine"))
def ransac_pnp(
    key,
    X,
    uv,
    valid,
    sigma2,
    fx,
    fy,
    cx,
    cy,
    n_hypotheses: int = 200,
    inlier_chi2: float = 5.991,
    refine: bool = True,
):
    """RANSAC absolute-pose estimation.

    X [N,3] world points matched to undistorted pixels uv [N,2]; valid [N].
    Returns dict(success, R, t, inliers [N], n_inliers).
    """
    N = X.shape[0]
    uv_norm = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=1)

    logits = jnp.log(valid.astype(jnp.float32) + 1e-12)
    idx = jax.random.categorical(key, logits, shape=(n_hypotheses, 6))
    R_h, t_h = jax.vmap(lambda i: _dlt_pose(X[i], uv_norm[i]))(idx)

    # evaluate: reprojection chi2 per hypothesis
    Xc = jnp.einsum("hij,nj->hni", R_h, X) + t_h[:, None, :]
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[..., 0] / zs + cx
    v = fy * Xc[..., 1] / zs + cy
    chi2 = ((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2) / sigma2[None, :]
    inl = valid[None, :] & (chi2 < inlier_chi2) & (z > 0)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    R_b, t_b, inl_b = R_h[best], t_h[best], inl[best]

    if refine:
        # refine against ALL candidate matches: the chi2 rounds inside the
        # pose optimizer reclaim inliers the minimal sample missed
        R_b, t_b, inl_b, n_in = pose_opt.optimize_pose(
            R_b, t_b, X, uv, valid, sigma2, fx, fy, cx, cy, rounds=3, iters_per_round=10
        )
    else:
        n_in = counts[best]
    return {
        "success": n_in >= 10,
        "R": R_b,
        "t": t_b,
        "inliers": inl_b,
        "n_inliers": n_in,
    }
