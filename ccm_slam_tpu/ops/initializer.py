"""Monocular two-view bootstrap: batched H/F RANSAC, model selection, motion
recovery, triangulation.

TPU-native re-design of ``Initializer`` (cslam/src/Initializer.cpp): the
reference races two host threads computing Homography and Fundamental RANSAC
(:100-101); here every hypothesis of BOTH models is evaluated in one batched
pass (vmap over the hypothesis axis), the reference's scoring rules are kept:

* F inlier gate chi2 3.841, score contribution (5.991 - chi2) both directions
  (``CheckFundamental``, :435-530)
* H inlier gate/score 5.991 both directions (``CheckHomography``, :350-433)
* model selection: S_H / (S_H + S_F) > 0.40 -> homography (:112-117)
* ``ReconstructF`` (:466): E from F, 4-way (R,t) disambiguation by cheirality
* ``ReconstructH`` (:568): Faugeras' 8-solution decomposition
* ``CheckRT`` (:794): triangulate, parallax / depth / reprojection gates
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _normalize(pts, valid):
    """Mean/abs-dev normalization (Initializer::Normalize).  Returns
    (pts_norm, T [3,3]) with T mapping raw -> normalized homogeneous."""
    w = valid.astype(pts.dtype)
    n = jnp.clip(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(pts - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.clip(dev, 1e-8)
    pn = (pts - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return pn, T


def _dlt_f(p1, p2):
    """8-point fundamental for one hypothesis: p1,p2 [8,2] -> F [3,3] rank-2."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    U, D, Vt2 = jnp.linalg.svd(F)
    D = D.at[2].set(0.0)
    return U @ jnp.diag(D) @ Vt2


def _dlt_h(p1, p2):
    """4-point homography (x2 ~ H x1): p1,p2 [4,2] -> H [3,3]."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    r1 = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], axis=0)  # [8,9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _score_f(F, p1, p2, valid, sigma: float = 1.0):
    """(score, inlier_mask) per CheckFundamental."""
    th, th_score = 3.841, 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    one = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, one], -1)
    x2 = jnp.concatenate([p2, one], -1)
    l2 = x1 @ F.T  # line in image 2 of p1 (F x1)
    l1 = x2 @ F  # line in image 1 of p2 (F^T x2)
    d2 = jnp.sum(l2 * x2, -1) ** 2 / jnp.clip(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = jnp.sum(l1 * x1, -1) ** 2 / jnp.clip(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    c1, c2 = d1 * inv_s2, d2 * inv_s2
    good = (c1 < th) & (c2 < th) & valid
    score = jnp.sum(
        jnp.where(valid & (c1 < th), th_score - c1, 0.0)
        + jnp.where(valid & (c2 < th), th_score - c2, 0.0)
    )
    return score, good


def _score_h(H, p1, p2, valid, sigma: float = 1.0):
    """(score, inlier_mask) per CheckHomography (symmetric transfer error)."""
    th = 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    one = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, one], -1)
    x2 = jnp.concatenate([p2, one], -1)
    Hx1 = x1 @ H.T
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    Hx2 = x2 @ Hinv.T
    p12 = Hx1[:, :2] / jnp.where(jnp.abs(Hx1[:, 2:3]) < 1e-12, 1e-12, Hx1[:, 2:3])
    p21 = Hx2[:, :2] / jnp.where(jnp.abs(Hx2[:, 2:3]) < 1e-12, 1e-12, Hx2[:, 2:3])
    c2 = jnp.sum((p12 - p2) ** 2, -1) * inv_s2
    c1 = jnp.sum((p21 - p1) ** 2, -1) * inv_s2
    good = (c1 < th) & (c2 < th) & valid
    score = jnp.sum(
        jnp.where(valid & (c1 < th), th - c1, 0.0) + jnp.where(valid & (c2 < th), th - c2, 0.0)
    )
    return score, good


def triangulate(P1, P2, p1, p2):
    """Linear DLT triangulation.  P1,P2 [3,4] projection matrices; p1,p2
    [...,2] pixel coords.  Returns [...,3] world points."""
    A0 = p1[..., 0:1] * P1[2] - P1[0]
    A1 = p1[..., 1:2] * P1[2] - P1[1]
    A2 = p2[..., 0:1] * P2[2] - P2[0]
    A3 = p2[..., 1:2] * P2[2] - P2[1]
    A = jnp.stack([A0, A1, A2, A3], axis=-2)  # [...,4,4]
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., -1, :]
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe[..., None]


def _check_rt(R, t, p1, p2, valid, K, sigma2: float = 1.0, th2: float = 4.0):
    """CheckRT: triangulate under (R, t) and count points passing depth /
    parallax / reprojection gates.  Returns (n_good, good_mask, X, parallax)."""
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P1, P2, p1, p2)  # [N,3] in cam1 frame
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    O2 = -R.T @ t  # camera-2 center in cam1 frame
    n1 = X
    n2 = X - O2
    cos_par = jnp.sum(n1 * n2, -1) / jnp.clip(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    z1 = X[:, 2]
    Xc2 = (R @ X.T).T + t
    z2 = Xc2[:, 2]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u1 = fx * X[:, 0] / jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1) + cx
    v1 = fy * X[:, 1] / jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1) + cy
    u2 = fx * Xc2[:, 0] / jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2) + cx
    v2 = fy * Xc2[:, 1] / jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2) + cy
    e1 = (u1 - p1[:, 0]) ** 2 + (v1 - p1[:, 1]) ** 2
    e2 = (u2 - p2[:, 0]) ** 2 + (v2 - p2[:, 1]) ** 2

    # Reference semantics (Initializer::CheckRT, :794): a near-zero-parallax
    # point (cos >= 0.99998) is COUNTED toward nGood regardless of depth sign
    # (its depth is unobservable so the model isn't penalized), but is never
    # promoted to a landmark (vbGood needs parallax AND positive depths).
    low_par = cos_par >= 0.99998
    counted = (
        valid
        & finite
        & ((z1 > 0) | low_par)
        & ((z2 > 0) | low_par)
        & (e1 < th2 * sigma2)
        & (e2 < th2 * sigma2)
    )
    good = counted & ~low_par
    # parallax statistic: the reference sorts counted cosines ascending and
    # takes index min(50, n-1) — the ~50th LARGEST parallax angle
    cos_sorted = jnp.sort(jnp.where(counted, cos_par, 2.0))
    n_counted = jnp.sum(counted)
    idx = jnp.clip(jnp.minimum(50, n_counted - 1), 0, cos_sorted.shape[0] - 1)
    parallax = jnp.where(
        n_counted > 0,
        jnp.degrees(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0))),
        0.0,
    )
    return jnp.sum(counted), good, X, parallax


def _decompose_e(E):
    """E -> (R1, R2, t) with |t| = 1 (Initializer::DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.clip(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = U @ W.T @ Vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


def _decompose_h(H, K):
    """Faugeras decomposition of a calibrated homography into 8 (R, t)
    candidates (Initializer::ReconstructH)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, D, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0], D[1], D[2]

    denom = jnp.clip(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = +d2
    sin_t = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.clip(
        (d1 + d3) * d2, 1e-12
    )
    cos_t = (d2 * d2 + d1 * d3) / jnp.clip((d1 + d3) * d2, 1e-12)
    for e1, e3, st_sign in ((1, 1, 1.0), (1, -1, -1.0), (-1, 1, -1.0), (-1, -1, 1.0)):
        st = st_sign * sin_t
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        Rp = Rp.at[0, 0].set(cos_t).at[2, 2].set(cos_t)
        Rp = Rp.at[0, 2].set(-st).at[2, 0].set(st)
        tp = jnp.array([e1 * aux1, 0.0, -e3 * aux3]) * (d1 - d3)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    # case d' = -d2
    sin_p = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.clip(
        (d1 - d3) * d2, 1e-12
    )
    cos_p = (d1 * d3 - d2 * d2) / jnp.clip((d1 - d3) * d2, 1e-12)
    for e1, e3, sp_sign in ((1, 1, 1.0), (1, -1, -1.0), (-1, 1, -1.0), (-1, -1, 1.0)):
        sp = sp_sign * sin_p
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(cos_p).at[2, 2].set(-cos_p)
        Rp = Rp.at[0, 2].set(sp).at[2, 0].set(sp)
        tp = jnp.array([e1 * aux1, 0.0, e3 * aux3]) * (d1 + d3)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    t8 = t8 / jnp.clip(jnp.linalg.norm(t8, axis=-1, keepdims=True), 1e-12)
    return R8, t8


@partial(jax.jit, static_argnames=("n_hypotheses", "min_triangulated"))
def initialize_two_view(
    key,
    p1,
    p2,
    valid,
    K,
    sigma: float = 1.0,
    n_hypotheses: int = 200,
    min_triangulated: int = 50,
    min_parallax_deg: float = 1.0,
):
    """Full two-view bootstrap from matched undistorted pixels.

    p1, p2 [N,2]: matched keypoints in frames 1/2; valid [N].
    Returns dict with: success (bool), R [3,3], t [3] (cam2 pose: x2 = R x1 + t),
    X [N,3] triangulated points (cam1 frame), good [N] triangulation mask,
    used_h (bool diagnostic).
    """
    N = p1.shape[0]
    kf, kh = jax.random.split(key)
    logits = jnp.log(valid.astype(jnp.float32) + 1e-12)
    idx_f = jax.random.categorical(kf, logits, shape=(n_hypotheses, 8))
    idx_h = jax.random.categorical(kh, logits, shape=(n_hypotheses, 4))

    pn1, T1 = _normalize(p1, valid)
    pn2, T2 = _normalize(p2, valid)

    # --- Fundamental hypotheses ---
    Fn = jax.vmap(_dlt_f)(pn1[idx_f], pn2[idx_f])  # [B,3,3]
    F = jnp.einsum("ij,bjk,kl->bil", T2.T, Fn, T1)  # denormalize: x2^T F x1
    sF, inlF = jax.vmap(lambda f: _score_f(f, p1, p2, valid, sigma))(F)
    bF = jnp.argmax(sF)
    score_f_best = sF[bF]
    F_best = F[bF]
    inl_f = inlF[bF]

    # --- Homography hypotheses ---
    Hn = jax.vmap(_dlt_h)(pn1[idx_h], pn2[idx_h])
    Hh = jnp.einsum("ij,bjk,kl->bil", jnp.linalg.inv(T2), Hn, T1)
    sH, inlH = jax.vmap(lambda h: _score_h(h, p1, p2, valid, sigma))(Hh)
    bH = jnp.argmax(sH)
    score_h_best = sH[bH]
    H_best = Hh[bH]
    inl_h = inlH[bH]

    use_h = score_h_best / jnp.clip(score_h_best + score_f_best, 1e-12) > 0.40

    # --- motion candidates: 4 from E, 8 from H; evaluate all 12, pick by gate ---
    E = K.T @ F_best @ K
    R1, R2, tE = _decompose_e(E)
    RF = jnp.stack([R1, R1, R2, R2])
    tF = jnp.stack([tE, -tE, tE, -tE])
    RH, tH = _decompose_h(H_best, K)

    R_all = jnp.concatenate([RF, RH])  # [12,3,3]
    t_all = jnp.concatenate([tF, tH])
    from_h = jnp.arange(12) >= 4
    cand_valid = jnp.where(use_h, from_h, ~from_h)
    inl = jnp.where(use_h, inl_h, inl_f)

    n_good, good_mask, Xs, par = jax.vmap(
        lambda R, t: _check_rt(R, t, p1, p2, inl, K, sigma * sigma)
    )(R_all, t_all)
    n_good = jnp.where(cand_valid, n_good, -1)
    best = jnp.argmax(n_good)
    max_good = n_good[best]

    n_inl = jnp.sum(inl)
    n_min_good = jnp.maximum(jnp.int32(0.9 * n_inl), min_triangulated)
    # ambiguity: another candidate with a comparable count is only a genuine
    # competing RECONSTRUCTION if it also exhibits observable parallax — a
    # rotation-only interpretation (points at quasi-infinity, parallax ~0)
    # must not veto a well-conditioned best candidate
    n_similar = jnp.sum((n_good > 0.7 * max_good) & (par > min_parallax_deg))
    success = (
        (max_good >= n_min_good) & (n_similar == 1) & (par[best] > min_parallax_deg)
    )

    return {
        "success": success,
        "R": R_all[best],
        "t": t_all[best],
        "X": Xs[best],
        "good": good_mask[best],
        "n_good": max_good,
        "used_h": use_h,
        "score_h": score_h_best,
        "score_f": score_f_best,
    }
