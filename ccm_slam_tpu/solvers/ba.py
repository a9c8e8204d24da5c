"""Bundle adjustment with Schur-complement landmark marginalization.

TPU-native replacement for g2o's ``BlockSolver_6_3`` + LM pipeline used by
``Optimizer::BundleAdjustmentClient`` (cslam/src/Optimizer.cpp:40-212),
``Optimizer::LocalBundleAdjustmentClient`` (:349-644) and the core of
``Optimizer::MapFusionGBA`` (:646-859).

Design (idiomatic TPU, not a port):
* Observations live in a fixed-shape per-landmark table ``[P, K]`` (landmark p
  is seen by at most K cameras) — no sparse graph structure, just masks.
* The reduced camera system is assembled as dense matmuls on the MXU:
  the camera-point coupling ``W`` is scattered once into a dense
  ``[6C, 3P]`` operator, and ``S = U + lam*diag - W V^-1 W^T`` becomes two
  batched matmuls.  For the local-BA problem sizes of the reference
  (<=70 cameras, a few thousand points) this is far below one MXU's
  capacity; the sharded GBA variant in ``parallel/dist_ba.py`` partitions
  the landmark dimension instead.
* Fixed cameras (the local-BA frontier, Optimizer.cpp:420-437) simply get
  zeroed pose Jacobians: they still constrain landmarks through V and g_p
  but receive no update — no special graph surgery.
* LM with multiplicative damping; every iteration computes the trial cost
  and accepts/rejects functionally, so the whole solve is one jitted scan
  (interruption = stopping between outer iterations; see ``ba_solve``'s
  ``chunk`` return contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.lie import orthonormalize, se3_exp
from . import reproj


@struct.dataclass
class BAProblem:
    """Fixed-shape BA problem instance.

    C cameras, P landmarks, K observation slots per landmark.
    """

    R: jnp.ndarray          # [C,3,3] world->cam rotations
    t: jnp.ndarray          # [C,3]
    X: jnp.ndarray          # [P,3] world points
    cam_idx: jnp.ndarray    # [P,K] int32 camera index per obs (any value ok when invalid)
    uv: jnp.ndarray         # [P,K,2] undistorted pixel measurements
    sigma2: jnp.ndarray     # [P,K] detection variance per obs
    obs_valid: jnp.ndarray  # [P,K] bool
    cam_fixed: jnp.ndarray  # [C] bool: frontier cameras (and gauge anchor)
    point_valid: jnp.ndarray  # [P] bool
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def _residuals_and_weights(prob: BAProblem, R, t, X, huber_delta, use_huber=True,
                           cam_bcast=None):
    """Per-obs residuals r [P,K,2], robust*info weights w [P,K], chi2 [P,K],
    and the per-obs camera rotation Rc (reused for Jacobians).

    ``cam_bcast`` (from ``_pcg_transitions``) replaces the per-observation
    pose gathers ``R[ci]``/``t[ci]`` with the factored one-hot broadcast —
    exact f32 (one-hot entries are 0/1), measured ~9x faster at stress scale
    where tiny-row TPU gathers dominate."""
    ci = jnp.clip(prob.cam_idx, 0, prob.R.shape[0] - 1)
    if cam_bcast is not None:
        C = R.shape[0]
        Rt = cam_bcast(jnp.concatenate([R.reshape(C, 9), t], axis=-1), exact=True)
        Rc = Rt[:, :9].reshape(*ci.shape, 3, 3)
        tc = Rt[:, 9:].reshape(*ci.shape, 3)
    else:
        Rc = R[ci]  # [P,K,3,3]
        tc = t[ci]  # [P,K,3]
    r, Xc, z = reproj.project_residual(
        Rc, tc, X[:, None, :], prob.uv, prob.fx, prob.fy, prob.cx, prob.cy
    )
    valid = prob.obs_valid & prob.point_valid[:, None] & (z > 1e-6)
    w_conf = jnp.where(valid, 1.0 / prob.sigma2, 0.0)
    chi2 = w_conf * jnp.sum(r * r, axis=-1)
    w_rob = reproj.huber_weight(chi2, huber_delta) if use_huber else 1.0
    return r, Xc, w_conf * w_rob, chi2, valid, Rc


def _cost(prob, R, t, X, huber_delta, use_huber=True, cam_bcast=None):
    _, _, _, chi2, _, _ = _residuals_and_weights(
        prob, R, t, X, huber_delta, use_huber, cam_bcast=cam_bcast
    )
    return jnp.sum(reproj.huber_rho(chi2, huber_delta) if use_huber else chi2)


def _pcg_transitions(cam_idx, C: int, G: int = 16):
    """Factored one-hot camera<->observation transitions for the PCG path.

    The two irregular ops of the Schur matvec — broadcast ``v[cam(e)]`` and
    the transposed reduce ``sum_{e: cam(e)=c} y[e]`` — dominate large-C GBA
    when done as gathers: TPU gathers of 24-byte rows run ~30x below HBM
    bandwidth (measured 3.1 + 5.8 ms/step at C=1024, E=1M vs 0.7 ms for the
    actual matvec FLOPs).  Factoring c = hi*G + lo turns both into two staged
    MXU contractions with small one-hot operands (oh_hi [E, C/G], oh_lo
    [E, G]) — measured 2.7x faster per CG step.  Entries are exactly 0/1 and
    all math stays f32, so results are bit-identical to the gather forms.

    Built ONCE per solve (cam_idx is constant across LM/CG iterations); must
    be constructed inside the jit so the one-hots are generated on device
    rather than shipped as multi-hundred-MB compile-time constants.
    """
    ci = jnp.clip(cam_idx.reshape(-1), 0, C - 1)
    Cp = -(-C // G) * G
    H = Cp // G
    oh_hi = jax.nn.one_hot(ci // G, H, dtype=jnp.float32)  # [E,H]
    oh_lo = jax.nn.one_hot(ci % G, G, dtype=jnp.float32)   # [E,G]

    def broadcast(v, exact: bool = False):
        """v [C,F] -> per-observation rows [E,F] (== v[ci]).

        TPU f32 matmuls default to bf16 multiplies on the MXU; the 0/1
        one-hot entries are bf16-exact but the VALUES get rounded.  That is
        fine for CG work vectors (LM gates steps by exact cost) but NOT for
        the residual path — a bf16-rounded pose is a ~2 px reprojection bias.
        ``exact=True`` forces full-f32 multiplies (== v[ci] bitwise)."""
        F = v.shape[-1]
        prec = jax.lax.Precision.HIGHEST if exact else None
        vp = jnp.zeros((Cp, F), v.dtype).at[:C].set(v)
        Z = jnp.matmul(oh_hi, vp.reshape(H, G * F), precision=prec)  # [E,G*F]
        return jnp.einsum("eg,egf->ef", oh_lo, Z.reshape(-1, G, F), precision=prec)

    def reduce(y, exact: bool = False):
        """y [E,F] -> per-camera sums [C,F] (segment-sum by ci; bf16-multiply
        rounding on the payload, f32 accumulation — used for normal-equation
        blocks and CG reductions where LM's exact-cost gate absorbs it).
        `exact` is accepted for interface parity with the Pallas operators
        (the staged-einsum form has no cheap exact mode)."""
        z = oh_lo[:, :, None] * y[:, None, :]          # [E,G,F]
        out = jnp.einsum("eh,egf->hgf", oh_hi, z)      # [H,G,F] (MXU)
        return out.reshape(Cp, -1)[:C]

    return broadcast, reduce


def _pcg_transitions_pallas(cam_idx, C: int):
    """Pallas-backed transition operators: the one-hot is generated in VMEM
    from an iota==cam_idx compare (ops/pallas_kernels.cam_broadcast/_reduce),
    so each call streams only the payload from HBM (~13x less traffic than
    the factored-one-hot XLA path at stress scale)."""
    from ..ops import pallas_kernels as pk

    ci = jnp.clip(cam_idx.reshape(-1).astype(jnp.int32), 0, C - 1)

    def broadcast(v, exact: bool = False):
        return pk.cam_broadcast(v, ci, C, exact=exact)

    def reduce(y, exact: bool = False):
        # exact (multi-pass f32) only where it matters (normal-equation
        # assembly); CG work vectors tolerate bf16-payload rounding exactly
        # as on the XLA path (LM's exact cost gate absorbs it)
        return pk.cam_reduce(y, ci, C, exact=exact)

    return broadcast, reduce


def _resolve_pcg_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    import os

    import jax as _jax

    on_tpu = _jax.default_backend() not in ("cpu",)
    if not on_tpu:
        return "xla"
    # hardware-verified kernels; CCM_PCG_PALLAS=0 forces the XLA path
    return "xla" if os.environ.get("CCM_PCG_PALLAS", "1") == "0" else "pallas"


def _build_normal_blocks(prob: BAProblem, R, t, X, huber_delta, trans=None):
    """U [C,6,6], V [P,3,3], W blocks [P,K,6,3], gradients g_c [C,6], g_p [P,3].

    ``trans`` — the (broadcast, reduce) pair from ``_pcg_transitions`` —
    selects the factored staged reduction for U / g_c and the factored pose
    broadcast; without it a [P,K,C] one-hot contraction and direct gathers
    are used (faster for small problems: local BA, per-shard in dist_ba)."""
    cam_bcast, cam_reduce = trans if trans is not None else (None, None)
    ci = jnp.clip(prob.cam_idx, 0, prob.R.shape[0] - 1)
    r, Xc, w, chi2, valid, Rc = _residuals_and_weights(
        prob, R, t, X, huber_delta, cam_bcast=cam_bcast
    )
    Jc, Jp = reproj.pose_point_jacobians(Rc, Xc, prob.fx, prob.fy)  # [P,K,2,6], [P,K,2,3]
    # fixed cameras contribute no pose Jacobian but still constrain the point
    cam_var = ~prob.cam_fixed
    if cam_bcast is not None:
        cam_var_e = cam_bcast(cam_var[:, None].astype(r.dtype)).reshape(*ci.shape, 1, 1)
    else:
        cam_var_e = cam_var[ci][..., None, None].astype(r.dtype)
    Jc = Jc * (w[..., None, None] > 0) * cam_var_e
    Jp = Jp * (w[..., None, None] > 0)

    wJc = Jc * w[..., None, None]
    wJp = Jp * w[..., None, None]

    C = prob.R.shape[0]
    V = jnp.einsum("pkij,pkil->pjl", wJp, Jp)  # [P,3,3]
    W = jnp.einsum("pkij,pkil->pkjl", wJc, Jp)  # [P,K,6,3]
    g_p = -jnp.einsum("pkij,pki->pj", wJp, r)  # [P,3]

    U_blk = jnp.einsum("pkij,pkil->pkjl", wJc, Jc)  # [P,K,6,6]
    g_blk = -jnp.einsum("pkij,pki->pkj", wJc, r)  # [P,K,6]
    E = ci.size
    if cam_reduce is not None:
        red = cam_reduce(
            jnp.concatenate([U_blk.reshape(E, 36), g_blk.reshape(E, 6)], axis=-1),
            exact=True,
        )  # [C,42]
        U = red[:, :36].reshape(C, 6, 6)
        g_c = red[:, 36:]
    else:
        # camera-indexed reductions as one-hot matmuls: XLA scatter on TPU is
        # serial-ish and dominates the iteration; a [P*K, C] one-hot
        # contraction runs on the MXU instead
        onehot = jax.nn.one_hot(ci, C, dtype=r.dtype)  # [P,K,C]
        U = jnp.einsum("pkc,pkjl->cjl", onehot, U_blk)
        g_c = jnp.einsum("pkc,pkj->cj", onehot, g_blk)
    return U, V, W, g_c, g_p, ci


def inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate / determinant): much faster
    on TPU than the general batched LU in jnp.linalg.inv."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def inv6x6_spd(A):
    """Closed-form batched 6x6 SPD inverse via 3x3 block Schur complement:
    batched LU in jnp.linalg.inv is serial-ish on TPU; this stays on the VPU.

        A = [[P, Q], [Q^T, S]];  Pi = P^-1;  T = (S - Q^T Pi Q)^-1
        A^-1 = [[Pi + Pi Q T Q^T Pi, -Pi Q T], [-T Q^T Pi, T]]
    """
    Pb = A[..., :3, :3]
    Qb = A[..., :3, 3:]
    Sb = A[..., 3:, 3:]
    Pi = inv3x3(Pb)
    PiQ = Pi @ Qb
    T = inv3x3(Sb - jnp.swapaxes(Qb, -1, -2) @ PiQ)
    TQtPi = T @ jnp.swapaxes(PiQ, -1, -2)
    top = jnp.concatenate([Pi + PiQ @ TQtPi, -PiQ @ T], axis=-1)
    bot = jnp.concatenate([-TQtPi, T], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _solve_schur(prob: BAProblem, U, V, W, g_c, g_p, ci, lam):
    """One damped Schur solve: returns (delta_c [C,6], delta_p [P,3])."""
    C = U.shape[0]
    P = V.shape[0]

    # damping (multiplicative on diagonals, additive floor for empty blocks)
    U_d = U + (lam * jnp.diagonal(U, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(6)
    V_d = V + (lam * jnp.diagonal(V, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(3)
    Vinv = inv3x3(V_d)  # [P,3,3]

    # dense coupling operator [C,P,6,3] built by one-hot matmul (not scatter)
    onehot = jax.nn.one_hot(ci, C, dtype=U.dtype)  # [P,K,C]
    Wfull = jnp.einsum("pkc,pkij->cpij", onehot, W)

    # S = U_d - W V^-1 W^T via two MXU matmuls
    WV = jnp.einsum("cpij,pjk->cpik", Wfull, Vinv)  # [C,P,6,3]
    S_off = jnp.einsum("cpik,dpjk->cidj", WV, Wfull)  # [C,6,C,6]
    S = -S_off
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(U_d)
    S = S.reshape(C * 6, C * 6)
    # inactive cameras (fixed or unobserved): identity rows so the solve is well-posed
    diag_mag = jnp.diagonal(S)
    inactive = jnp.repeat(prob.cam_fixed, 6) | (diag_mag <= 1e-7)
    S = jnp.where(jnp.diag(inactive), jnp.eye(C * 6), S)
    S = S + 1e-8 * jnp.eye(C * 6)

    b = g_c - jnp.einsum("cpik,pk->ci", WV, g_p)  # [C,6]
    b = jnp.where(inactive.reshape(C, 6), 0.0, b)

    # S is symmetric positive definite after damping: Cholesky beats LU on TPU
    L = jnp.linalg.cholesky(S)
    delta_c = jax.scipy.linalg.cho_solve((L, True), b.reshape(-1)).reshape(C, 6)
    delta_c = jnp.where(prob.cam_fixed[:, None], 0.0, delta_c)

    # back-substitute landmarks: delta_p = Vinv (g_p - sum_k W^T delta_c[cam])
    Wt_dc = jnp.einsum("pkij,pki->pj", W, delta_c[ci])  # [P,3]
    delta_p = jnp.einsum("pij,pj->pi", Vinv, g_p - Wt_dc)
    delta_p = jnp.where(prob.point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p


def _solve_schur_pcg(prob: BAProblem, U, V, W, g_c, g_p, ci, lam,
                     cam_bcast, cam_reduce, cg_iters: int = 60,
                     fused_matvec: bool = False, WT=None, x0=None,
                     cg_rel_tol: float = 1e-2):
    """Matrix-free Schur solve for LARGE camera counts.

    The dense reduced system costs O(C^2 P) to assemble — prohibitive at
    server/stress scale (C ~ 1000).  Here S v is applied per-observation:

        (S v)_c = U_c v_c + lam diag - sum_{p,k2} 1[ci_pk2=c] W_pk2 V_p^-1
                  sum_k1 W_pk1^T v_{ci_pk1}

    Both camera<->observation transitions use the factored one-hot operators
    from ``_pcg_transitions`` (built once per solve) — exact f32, all-MXU.
    Block-Jacobi preconditioning with U^-1.
    """
    C = U.shape[0]
    E = ci.size
    U_d = U + (lam * jnp.diagonal(U, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(6)
    V_d = V + (lam * jnp.diagonal(V, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(3)
    Vinv = inv3x3(V_d)

    active = ~prob.cam_fixed & (jnp.diagonal(U_d, axis1=-2, axis2=-1).sum(-1) > 1e-6)

    if fused_matvec:
        # one Pallas kernel per CG step: payload-only HBM traffic; the same
        # shared k-major W packing also serves the rhs and back-substitution
        # stages, so W [P,K,6,3] is never materialized on this path
        from ..ops import pallas_kernels as pk

        off_mv, rhs_op, wtv_op = pk.make_schur_ops(
            Vinv, prob.cam_idx, C, WT=WT, WT_kmajor=True
        )

        def S_mv(v):
            v = jnp.where(active[:, None], v, 0.0)
            out = jnp.einsum("cij,cj->ci", U_d, v) - off_mv(v)
            return jnp.where(active[:, None], out, v)

        b = g_c - rhs_op(jnp.einsum("pij,pj->pi", Vinv, g_p))

        def wt_delta(delta_c):
            return wtv_op(delta_c)
    else:
        def S_mv(v):  # v [C,6]
            v = jnp.where(active[:, None], v, 0.0)
            vk = cam_bcast(v).reshape(*ci.shape, 6)  # [P,K,6]
            y1 = jnp.einsum("pkij,pki->pkj", W, vk)  # W^T v per obs -> [P,K,3]
            y2 = jnp.einsum("pij,pj->pi", Vinv, jnp.sum(y1, axis=1))  # [P,3]
            y3 = jnp.einsum("pkij,pj->pki", W, y2)  # [P,K,6]
            off = cam_reduce(y3.reshape(E, 6))
            out = jnp.einsum("cij,cj->ci", U_d, v) - off
            return jnp.where(active[:, None], out, v)

        b = g_c - cam_reduce(
            jnp.einsum("pkij,pj->pki", W, jnp.einsum("pij,pj->pi", Vinv, g_p)).reshape(E, 6)
        )

        def wt_delta(delta_c):
            return jnp.einsum(
                "pkij,pki->pj", W, cam_bcast(delta_c).reshape(*ci.shape, 6)
            )
    b = jnp.where(active[:, None], b, 0.0)

    Uinv = inv6x6_spd(U_d + 1e-6 * jnp.eye(6))

    def M_inv(r):
        return jnp.where(active[:, None], jnp.einsum("cij,cj->ci", Uinv, r), r)

    # warm start from the previous LM iteration's step (the Schur system
    # changes slowly across iterations); inexact-Newton stop: LM only needs
    # the step direction to ~cg_rel_tol residual — the exact-cost accept
    # gate absorbs the truncation.
    if x0 is None:
        x0 = jnp.zeros_like(b)
    else:
        x0 = jnp.where(active[:, None], x0, 0.0)
    r0 = b - S_mv(x0)
    z0 = M_inv(r0)
    stop2 = (cg_rel_tol * cg_rel_tol) * jnp.sum(b * b) + 1e-30

    def cg_cond(carry):
        x, r, z, p, rz, it = carry
        return (it < cg_iters) & (jnp.sum(r * r) > stop2)

    def cg_body(carry):
        x, r, z, p, rz, it = carry
        Ap = S_mv(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    delta_c, _, _, _, _, _ = jax.lax.while_loop(
        cg_cond, cg_body, (x0, r0, z0, z0, jnp.sum(r0 * z0), jnp.int32(0))
    )
    delta_c = jnp.where(prob.cam_fixed[:, None], 0.0, delta_c)

    delta_p = jnp.einsum("pij,pj->pi", Vinv, g_p - wt_delta(delta_c))
    delta_p = jnp.where(prob.point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p


@partial(jax.jit, static_argnames=("iters", "huber_delta", "cg_iters",
                                   "pcg_backend", "with_stats", "return_state"))
def ba_solve(prob: BAProblem, iters: int = 20, huber_delta: float = 2.447651936,
             cg_iters: int = 16, pcg_backend: str = "auto",
             with_stats: bool = True, state=None, return_state: bool = False):
    """Run `iters` LM iterations. Returns (R, t, X, final_cost, n_good_obs),
    plus the LM carry state when ``return_state=True``.

    Interruptibility contract (the reference's INTERRUPTBA / stop-flag,
    cslam/src/Optimizer.cpp:686-687): call with a small `iters` chunk and
    ``return_state=True``, check for fresh data on the host, and re-invoke
    passing the returned ``state`` — lam, the CG warm start and the entry
    cost carry over, so a chunked solve follows the same LM trajectory as a
    monolithic one.  ``state`` must be discarded whenever the problem
    changes between chunks (the carried cost would be stale).

    ``cg_iters`` caps the inner PCG solve: LM with truncated (inexact-Newton)
    steps converges identically here because every step is accept/reject
    gated on the exact cost — measured at stress scale (C=1024, 1M obs),
    caps {8, 16, 32} reach the same optimum to 0.02% while 16 is 1.35x
    faster per LM iteration than 32; warm-starting from the previous step
    keeps late iterations cheap.
    """

    # shape-static solver selection: the dense reduced system is O(C^2 P) to
    # assemble — use it for local-BA-sized problems, matrix-free PCG beyond.
    # Crossover measured on-chip: at C=128/262k obs PCG converges identically
    # (cost within 0.006%) at 1.4x the dense path's speed; local-BA sizes
    # (C<~70) keep the dense solve.  CCM_PCG_MIN_C overrides for tuning.
    import os

    C = prob.R.shape[0]
    P, K = prob.cam_idx.shape
    use_pcg = C > int(os.environ.get("CCM_PCG_MIN_C", "96"))
    # the fused assembly/cost kernels pay off for ANY solver once the
    # problem has real volume (the dense path otherwise materializes a
    # [P,K,C] one-hot for the U reduction); their VMEM block layout caps the
    # per-landmark observation-slot count at 16 (ops/pallas_kernels
    # _obs_block_size) — wider tables fall back to the XLA path
    use_pallas = (
        _resolve_pcg_backend(pcg_backend) == "pallas" and P * K >= 8192
        and K <= 16
    )
    if use_pcg:
        # transition operators, once per solve (cam_idx is constant across
        # LM iterations); Pallas in-VMEM one-hot on TPU, factored XLA one-hot
        # elsewhere
        if not use_pallas:
            trans = _pcg_transitions(prob.cam_idx, C)
            cam_bcast, cam_reduce = trans
        else:
            trans = None
            cam_bcast = cam_reduce = None
    else:
        trans = None
        cam_bcast = cam_reduce = None

    if use_pallas:
        from ..ops import pallas_kernels as pk

        def build_blocks(R, t, X):
            # one-pass fused assembly (residuals -> Jacobians -> blocks);
            # the PCG path emits WT directly in the Schur kernels' k-major
            # layout (zero repack per iteration), the dense path unpacks W
            U, V, WT, g_c, g_p, _ = pk.fused_normal_blocks(
                R, t, X, prob.point_valid, prob.cam_idx, prob.uv, prob.sigma2,
                prob.obs_valid, prob.cam_fixed, C,
                prob.fx, prob.fy, prob.cx, prob.cy, huber_delta,
                kmajor=use_pcg,
            )
            ci = jnp.clip(prob.cam_idx, 0, C - 1)
            W = None if use_pcg else pk.unpack_WT(WT, P, K)
            return U, V, W, g_c, g_p, ci, WT

        def cost_fn(R, t, X):
            return pk.fused_reproj_cost(
                R, t, X, prob.point_valid, prob.cam_idx, prob.uv, prob.sigma2,
                prob.obs_valid, C, prob.fx, prob.fy, prob.cx, prob.cy, huber_delta,
            )
    else:
        def build_blocks(R, t, X):
            return (*_build_normal_blocks(prob, R, t, X, huber_delta, trans=trans), None)

        def cost_fn(R, t, X):
            return _cost(prob, R, t, X, huber_delta, cam_bcast=cam_bcast)

    def lm_iter(carry, _):
        R, t, X, lam, cost, dc_prev = carry  # cost of the CURRENT state
        U, V, W, g_c, g_p, ci, WT = build_blocks(R, t, X)
        if use_pcg:
            delta_c, delta_p = _solve_schur_pcg(
                prob, U, V, W, g_c, g_p, ci, lam, cam_bcast, cam_reduce,
                cg_iters=cg_iters, fused_matvec=use_pallas, WT=WT, x0=dc_prev,
            )
        else:
            delta_c, delta_p = _solve_schur(prob, U, V, W, g_c, g_p, ci, lam)

        dR, dt = se3_exp(delta_c)
        R_new = orthonormalize(dR @ R)  # keep the iterate on SO(3)
        t_new = (dR @ t[..., None])[..., 0] + dt
        X_new = X + delta_p

        cost_new = cost_fn(R_new, t_new, X_new)
        finite = (
            jnp.all(jnp.isfinite(delta_c)) & jnp.all(jnp.isfinite(delta_p)) & jnp.isfinite(cost_new)
        )
        accept = (cost_new < cost) & finite
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        X = jnp.where(accept, X_new, X)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), jnp.minimum(lam * 5.0, 1e8))
        dc_prev = jnp.where(finite, delta_c, jnp.zeros_like(delta_c))
        return (R, t, X, lam, cost, dc_prev), cost_new

    if state is None:
        lam0 = jnp.float32(1e-4)
        dc0 = jnp.zeros((C, 6), jnp.float32)
        cost0 = cost_fn(prob.R, prob.t, prob.X)
    else:
        lam0, dc0, cost_in = state
        cost0 = jnp.where(
            jnp.isfinite(cost_in), cost_in, cost_fn(prob.R, prob.t, prob.X)
        )
    (R, t, X, lam_f, final_cost, dc_f), costs = jax.lax.scan(
        lm_iter, (prob.R, prob.t, prob.X, lam0, cost0, dc0), None,
        length=iters,
    )
    # the carried cost IS the exact cost of the accepted final state — no
    # recomputation; inlier statistics optionally skipped for interruptible
    # chunks (only the last chunk needs them)
    if with_stats:
        fin_bcast = (
            _pcg_transitions_pallas(prob.cam_idx, C)[0] if use_pallas else cam_bcast
        )
        _, _, _, chi2, valid, _ = _residuals_and_weights(
            prob, R, t, X, huber_delta, cam_bcast=fin_bcast
        )
        n_good = jnp.sum((chi2 <= reproj.CHI2_MONO) & valid)
    else:
        n_good = jnp.int32(-1)
    if return_state:
        return R, t, X, final_cost, n_good, (lam_f, dc_f, final_cost)
    return R, t, X, final_cost, n_good


def classify_outliers(prob: BAProblem, R, t, X, chi2_thres: float = reproj.CHI2_MONO):
    """Post-solve chi2 gate per observation (LocalBundleAdjustment's final
    outlier erase pass, cslam/src/Optimizer.cpp:560-599)."""
    _, _, _, chi2, valid, _ = _residuals_and_weights(
        prob, R, t, X, huber_delta=1.0, use_huber=False
    )
    return valid & (chi2 <= chi2_thres)
