"""Distributed global bundle adjustment over a device mesh.

TPU-native replacement for the server's multithreaded g2o GBA
(``Optimizer::MapFusionGBA``, cslam/src/Optimizer.cpp:646-859, OpenMP via
``initMultiThreading``): the landmark dimension is sharded across the mesh,
each device assembles the normal-equation blocks (U, V, W, gradients) from
its own observations, and the reduced camera system is combined over ICI.

Two Schur backends, chosen by camera count exactly like the single-device
solver (``solvers/ba.py``):

* dense (C <= CCM_PCG_MIN_C): each shard builds its partial ``[6C,6C]``
  reduced system, ``psum`` combines, Cholesky solves replicated;
* matrix-free PCG (large C): the reduced system is never materialized —
  each CG step applies ``S v`` as local per-observation work plus ONE psum
  of a ``[C,6]`` vector, so per-step ICI traffic is 48C bytes regardless of
  the landmark count.  CG vectors are replicated; landmark back-substitution
  stays local to each shard.

    S v    = (U + lam diag) v - sum_p W_p V_p^-1 W_p^T v    (psum over shards)
    b      = g_c - sum_p W_p V_p^-1 g_p                     (psum over shards)
    dp_p   = V_p^-1 (g_p - W_p^T dc)                        (local)

Interruptibility (INTERRUPTBA semantics): run in small `iters` chunks from
the host scheduler; ``state`` carries (lam, warm-start dc, cost) across
chunks so a chunked solve follows the same LM trajectory as a monolithic
one — see runtime/server.py for the preemption policy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import ba as ba_mod
from ..solvers import reproj
from ..utils.lie import orthonormalize, se3_exp


def make_mesh(devices=None, axis: str = "mp"):
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_problem(prob: ba_mod.BAProblem, mesh: Mesh, axis: str = "mp") -> ba_mod.BAProblem:
    """Place landmark-major arrays on the mesh (sharded dim 0); camera arrays
    and scalars replicated.  Landmark count must divide the mesh size."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return ba_mod.BAProblem(
        R=jax.device_put(prob.R, repl),
        t=jax.device_put(prob.t, repl),
        X=jax.device_put(prob.X, shard),
        cam_idx=jax.device_put(prob.cam_idx, shard),
        uv=jax.device_put(prob.uv, shard),
        sigma2=jax.device_put(prob.sigma2, shard),
        obs_valid=jax.device_put(prob.obs_valid, shard),
        cam_fixed=jax.device_put(prob.cam_fixed, repl),
        point_valid=jax.device_put(prob.point_valid, shard),
        fx=jax.device_put(prob.fx, repl),
        fy=jax.device_put(prob.fy, repl),
        cx=jax.device_put(prob.cx, repl),
        cy=jax.device_put(prob.cy, repl),
    )


def _local_schur_terms(prob_shard: ba_mod.BAProblem, R, t, X_local, lam, huber_delta):
    """Per-shard normal blocks and partial DENSE Schur contributions (small-C
    backend).

    Returns (S_partial [6C,6C], b_partial [6C], Vinv [Pl,3,3], W [Pl,K,6,3],
    g_p [Pl,3], ci [Pl,K], cost_partial)."""
    local = prob_shard.replace(R=R, t=t, X=X_local)
    U, V, W, g_c, g_p, ci = ba_mod._build_normal_blocks(local, R, t, X_local, huber_delta)
    C = R.shape[0]
    Pl = X_local.shape[0]

    U_d = U + (lam * jnp.diagonal(U, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(6)
    V_d = V + (lam * jnp.diagonal(V, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(3)
    Vinv = ba_mod.inv3x3(V_d)

    onehot = jax.nn.one_hot(ci, C, dtype=U.dtype)  # [Pl,K,C]
    Wfull = jnp.einsum("pkc,pkij->cpij", onehot, W)
    WV = jnp.einsum("cpij,pjk->cpik", Wfull, Vinv)
    S_off = jnp.einsum("cpik,dpjk->cidj", WV, Wfull)
    S_partial = -S_off
    S_partial = S_partial.at[jnp.arange(C), :, jnp.arange(C), :].add(U_d)
    b_partial = g_c - jnp.einsum("cpik,pk->ci", WV, g_p)
    cost_partial = ba_mod._cost(local, R, t, X_local, huber_delta)
    return (
        S_partial.reshape(C * 6, C * 6),
        b_partial.reshape(-1),
        Vinv,
        W,
        g_p,
        ci,
        cost_partial,
    )


def solver_state(C: int):
    """Fresh LM carry state for a chunked solve: (lam, warm-start dc, cost).
    cost = +inf means 'unknown, compute on entry'."""
    return (
        jnp.float32(1e-4),
        jnp.zeros((C, 6), jnp.float32),
        jnp.float32(jnp.inf),
    )


@partial(jax.jit, static_argnames=("iters", "axis", "mesh", "cg_iters", "return_state"))
def dist_ba_solve(
    prob: ba_mod.BAProblem,
    mesh: Mesh,
    iters: int = 20,
    huber_delta: float = 2.447651936,
    axis: str = "mp",
    cg_iters: int = 16,
    state=None,
    return_state: bool = False,
):
    """LM with landmark-sharded Schur assembly.  `prob` must be pre-sharded
    with `shard_problem`.  Returns (R, t, X, cost) or, with
    ``return_state=True``, (R, t, X, cost, state) where ``state`` feeds the
    next chunk of an interruptible solve (lam + CG warm start carry over, so
    chunked == monolithic convergence)."""
    import os

    C = prob.R.shape[0]
    use_pcg = C > int(os.environ.get("CCM_PCG_MIN_C", "96"))
    if state is None:
        state = solver_state(C)
    lam0, dc0, cost0_in = state

    def spmd(prob_shard, lam0, dc0, cost0_in):
        cam_fixed = prob_shard.cam_fixed
        # factored one-hot camera<->obs transitions, built once per solve on
        # each shard over ITS observations (same operators as solvers/ba.py)
        trans = (
            ba_mod._pcg_transitions(prob_shard.cam_idx, C) if use_pcg else None
        )
        cam_bcast, cam_reduce = trans if trans is not None else (None, None)

        def cost_at(R, t, X):
            local = prob_shard.replace(R=R, t=t, X=X)
            return jax.lax.psum(
                ba_mod._cost(local, R, t, X, huber_delta, cam_bcast=cam_bcast), axis
            )

        def lm_iter_pcg(carry, _):
            R, t, X, lam, cost, dc_prev = carry
            local = prob_shard.replace(R=R, t=t, X=X)
            U_p, V, W, g_c_p, g_p, ci = ba_mod._build_normal_blocks(
                local, R, t, X, huber_delta, trans=trans
            )
            # the camera system sees every shard's observations
            U = jax.lax.psum(U_p, axis)
            g_c = jax.lax.psum(g_c_p, axis)

            U_d = U + (lam * jnp.diagonal(U, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(6)
            V_d = V + (lam * jnp.diagonal(V, axis1=-2, axis2=-1) + 1e-8)[..., :, None] * jnp.eye(3)
            Vinv = ba_mod.inv3x3(V_d)
            active = ~cam_fixed & (jnp.diagonal(U_d, axis1=-2, axis2=-1).sum(-1) > 1e-6)
            E = ci.size

            def S_mv(v):  # v [C,6] replicated -> S v [C,6] replicated
                v = jnp.where(active[:, None], v, 0.0)
                vk = cam_bcast(v).reshape(*ci.shape, 6)
                y1 = jnp.einsum("pkij,pki->pkj", W, vk)
                y2 = jnp.einsum("pij,pj->pi", Vinv, jnp.sum(y1, axis=1))
                y3 = jnp.einsum("pkij,pj->pki", W, y2)
                off = jax.lax.psum(cam_reduce(y3.reshape(E, 6)), axis)
                out = jnp.einsum("cij,cj->ci", U_d, v) - off
                return jnp.where(active[:, None], out, v)

            b = g_c - jax.lax.psum(
                cam_reduce(
                    jnp.einsum(
                        "pkij,pj->pki", W, jnp.einsum("pij,pj->pi", Vinv, g_p)
                    ).reshape(E, 6)
                ),
                axis,
            )
            b = jnp.where(active[:, None], b, 0.0)
            Uinv = ba_mod.inv6x6_spd(U_d + 1e-6 * jnp.eye(6))

            def M_inv(r):
                return jnp.where(active[:, None], jnp.einsum("cij,cj->ci", Uinv, r), r)

            x0 = jnp.where(active[:, None], dc_prev, 0.0)
            r0 = b - S_mv(x0)
            z0 = M_inv(r0)
            stop2 = 1e-4 * jnp.sum(b * b) + 1e-30

            def cg_cond(c):
                x, r, z, p, rz, it = c
                return (it < cg_iters) & (jnp.sum(r * r) > stop2)

            def cg_body(c):
                x, r, z, p, rz, it = c
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
            delta_c = jnp.where(cam_fixed[:, None], 0.0, delta_c)
            wt_dc = jnp.einsum(
                "pkij,pki->pj", W, cam_bcast(delta_c).reshape(*ci.shape, 6)
            )
            delta_p = jnp.einsum("pij,pj->pi", Vinv, g_p - wt_dc)
            delta_p = jnp.where(prob_shard.point_valid[:, None], delta_p, 0.0)

            dR, dt = se3_exp(delta_c)
            R_new = orthonormalize(dR @ R)  # keep the iterate on SO(3)
            t_new = (dR @ t[..., None])[..., 0] + dt
            X_new = X + delta_p
            cost_new = cost_at(R_new, t_new, X_new)
            # delta_p is shard-local (varying): reduce its finiteness across
            # the mesh so the accept decision stays replicated
            bad_p = jax.lax.psum(
                (~jnp.all(jnp.isfinite(delta_p))).astype(jnp.int32), axis
            )
            finite = (
                jnp.all(jnp.isfinite(delta_c)) & (bad_p == 0) & jnp.isfinite(cost_new)
            )
            accept = (cost_new < cost) & finite
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            X = jnp.where(accept, X_new, X)
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), jnp.minimum(lam * 5.0, 1e8))
            dc_prev = jnp.where(finite, delta_c, jnp.zeros_like(delta_c))
            return (R, t, X, lam, cost, dc_prev), cost

        def lm_iter_dense(carry, _):
            R, t, X, lam, cost, dc_prev = carry
            S_p, b_p, Vinv, W, g_p, ci, cost_p = _local_schur_terms(
                prob_shard, R, t, X, lam, huber_delta
            )
            S = jax.lax.psum(S_p, axis)
            b = jax.lax.psum(b_p, axis)

            diag = jnp.diagonal(S)
            inactive = jnp.repeat(cam_fixed, 6) | (diag <= 1e-7)
            S = jnp.where(inactive[:, None] | inactive[None, :], 0.0, S)
            S = S + jnp.diag(inactive.astype(S.dtype)) + 1e-8 * jnp.eye(C * 6)
            b = jnp.where(inactive, 0.0, b)
            L = jnp.linalg.cholesky(S)
            delta_c = jax.scipy.linalg.cho_solve((L, True), b).reshape(C, 6)
            delta_c = jnp.where(cam_fixed[:, None], 0.0, delta_c)

            Wt_dc = jnp.einsum("pkij,pki->pj", W, delta_c[ci])
            delta_p = jnp.einsum("pij,pj->pi", Vinv, g_p - Wt_dc)
            delta_p = jnp.where(prob_shard.point_valid[:, None], delta_p, 0.0)

            dR, dt = se3_exp(delta_c)
            R_new = orthonormalize(dR @ R)  # keep the iterate on SO(3)
            t_new = (dR @ t[..., None])[..., 0] + dt
            X_new = X + delta_p
            cost_new = cost_at(R_new, t_new, X_new)
            finite = jnp.isfinite(cost_new) & jnp.all(jnp.isfinite(delta_c))
            accept = (cost_new < cost) & finite
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            X = jnp.where(accept, X_new, X)
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), jnp.minimum(lam * 5.0, 1e8))
            return (R, t, X, lam, cost, dc_prev), cost

        cost_entry = jnp.where(
            jnp.isfinite(cost0_in),
            cost0_in,
            cost_at(prob_shard.R, prob_shard.t, prob_shard.X),
        )
        lm_iter = lm_iter_pcg if use_pcg else lm_iter_dense
        (R, t, X, lam, cost, dc), costs = jax.lax.scan(
            lm_iter,
            (prob_shard.R, prob_shard.t, prob_shard.X, lam0, cost_entry, dc0),
            None,
            length=iters,
        )
        return R, t, X, cost, lam, dc

    from jax import shard_map

    pspec = ba_mod.BAProblem(
        R=P(), t=P(), X=P(axis), cam_idx=P(axis), uv=P(axis), sigma2=P(axis),
        obs_valid=P(axis), cam_fixed=P(), point_valid=P(axis),
        fx=P(), fy=P(), cx=P(), cy=P(),
    )
    f = shard_map(
        spmd, mesh=mesh,
        in_specs=(pspec, P(), P(), P()),
        out_specs=(P(), P(), P(axis), P(), P(), P()),
    )
    R, t, X, cost, lam, dc = f(prob, lam0, dc0, cost0_in)
    if return_state:
        return R, t, X, cost, (lam, dc, cost)
    return R, t, X, cost
