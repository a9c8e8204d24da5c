"""Distributed global bundle adjustment over a device mesh.

TPU-native replacement for the server's multithreaded g2o GBA
(``Optimizer::MapFusionGBA``, cslam/src/Optimizer.cpp:646-859, OpenMP via
``initMultiThreading``): the landmark dimension is sharded across the mesh,
each device assembles the normal-equation blocks (U, V, W, gradients) and its
partial reduced camera system, the Schur system is ``psum``-ed over ICI and
solved replicated, and landmark back-substitution stays local to each shard.

    S      = U + lam diag - sum_p W_p V_p^-1 W_p^T     (psum over shards)
    b      = g_c - sum_p W_p V_p^-1 g_p               (psum over shards)
    dc     = solve(S, b)                              (replicated)
    dp_p   = V_p^-1 (g_p - W_p^T dc)                  (local)

Interruptibility (INTERRUPTBA semantics): run in small `iters` chunks from
the host scheduler; state between chunks is just (R, t, X) — see
runtime/server.py for the preemption policy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import ba as ba_mod
from ..solvers import reproj
from ..utils.lie import se3_exp


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
    """Per-shard normal blocks and partial Schur contributions.

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


@partial(jax.jit, static_argnames=("iters", "axis", "mesh"))
def dist_ba_solve(
    prob: ba_mod.BAProblem,
    mesh: Mesh,
    iters: int = 20,
    huber_delta: float = 2.447651936,
    axis: str = "mp",
):
    """LM with landmark-sharded Schur assembly.  `prob` must be pre-sharded
    with `shard_problem`.  Returns (R, t, X, cost)."""
    C = prob.R.shape[0]

    def spmd(prob_shard):
        def lm_iter(carry, _):
            R, t, X, lam = carry
            S_p, b_p, Vinv, W, g_p, ci, cost_p = _local_schur_terms(
                prob_shard, R, t, X, lam, huber_delta
            )
            S = jax.lax.psum(S_p, axis)
            b = jax.lax.psum(b_p, axis)
            cost = jax.lax.psum(cost_p, axis)

            diag = jnp.diagonal(S)
            inactive = jnp.repeat(prob_shard.cam_fixed, 6) | (diag <= 1e-7)
            S = jnp.where(inactive[:, None] | inactive[None, :], 0.0, S)
            S = S + jnp.diag(inactive.astype(S.dtype)) + 1e-8 * jnp.eye(C * 6)
            b = jnp.where(inactive, 0.0, b)
            L = jnp.linalg.cholesky(S)
            delta_c = jax.scipy.linalg.cho_solve((L, True), b).reshape(C, 6)
            delta_c = jnp.where(prob_shard.cam_fixed[:, None], 0.0, delta_c)

            Wt_dc = jnp.einsum("pkij,pki->pj", W, delta_c[ci])
            delta_p = jnp.einsum("pij,pj->pi", Vinv, g_p - Wt_dc)
            delta_p = jnp.where(prob_shard.point_valid[:, None], delta_p, 0.0)

            dR, dt = se3_exp(delta_c)
            R_new = dR @ R
            t_new = (dR @ t[..., None])[..., 0] + dt
            X_new = X + delta_p
            cost_new = jax.lax.psum(
                ba_mod._cost(
                    prob_shard.replace(R=R_new, t=t_new, X=X_new),
                    R_new, t_new, X_new, huber_delta,
                ),
                axis,
            )
            finite = jnp.isfinite(cost_new) & jnp.all(jnp.isfinite(delta_c))
            accept = (cost_new < cost) & finite
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            X = jnp.where(accept, X_new, X)
            lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), jnp.minimum(lam * 5.0, 1e8))
            return (R, t, X, lam), cost_new

        (R, t, X, _), costs = jax.lax.scan(
            lm_iter, (prob_shard.R, prob_shard.t, prob_shard.X, jnp.float32(1e-4)),
            None, length=iters,
        )
        return R, t, X, costs[-1]

    from jax import shard_map

    pspec = ba_mod.BAProblem(
        R=P(), t=P(), X=P(axis), cam_idx=P(axis), uv=P(axis), sigma2=P(axis),
        obs_valid=P(axis), cam_fixed=P(), point_valid=P(axis),
        fx=P(), fy=P(), cx=P(), cy=P(),
    )
    f = shard_map(
        spmd, mesh=mesh,
        in_specs=(pspec,),
        out_specs=(P(), P(), P(axis), P()),
    )
    return f(prob)
