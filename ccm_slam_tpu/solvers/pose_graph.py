"""Sim(3) pose-graph (essential graph) optimization.

TPU-native counterpart of ``Optimizer::OptimizeEssentialGraphLoopClosure``
(cslam/src/Optimizer.cpp:1058-1331) and ``OptimizeEssentialGraphMapFusion``
(:1333-...): vertices are keyframe poses as Sim(3) world->cam, edges are
relative Sim3 constraints from the spanning tree, covisibility (weight >=
100), and loop/merge closures; loop-corrected vertices are fed in already
transformed and (optionally) held fixed.

The reference builds a g2o sparse graph; here the whole graph is dense
fixed-shape arrays and the LM normal matrix [7V, 7V] is assembled by
scatter-adding per-edge 7x7 blocks — V is at most a few thousand keyframes,
so the dense solve is tiny by TPU standards.  Edge Jacobians come from
autodiff through the Sim3 exp/log chain (exact, batched with vmap), replacing
g2o's hand-derived Jacobians.

Error convention (matches g2o EdgeSim3): e_ij = log( S_ij * S_jw * S_iw^-1 )
where S_ij is the measured relative transform from vertex j to vertex i.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.lie import Sim3, orthonormalize


@struct.dataclass
class PoseGraphProblem:
    # vertices
    S_w: Sim3          # batched [V]: world->cam Sim3 per keyframe
    fixed: jnp.ndarray  # [V] bool (e.g. the loop KF / map-origin KF)
    vert_valid: jnp.ndarray  # [V] bool
    # edges
    i_idx: jnp.ndarray  # [E] int32 (edge from j to i)
    j_idx: jnp.ndarray  # [E] int32
    S_meas: Sim3        # batched [E]: measured S_ij
    edge_valid: jnp.ndarray  # [E] bool
    weight: jnp.ndarray  # [E] float (1.0 in the reference; kept for generality)


def _edge_error(xi_i, xi_j, S_iw: Sim3, S_jw: Sim3, S_ij: Sim3):
    """log(S_ij * exp(xi_j) S_jw * (exp(xi_i) S_iw)^-1) -> [7]."""
    Si = Sim3.exp(xi_i).compose(S_iw)
    Sj = Sim3.exp(xi_j).compose(S_jw)
    return S_ij.compose(Sj).compose(Si.inverse()).log()


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20):
    """Run `iters` LM iterations; returns (S_w_opt: Sim3 [V], final_cost)."""
    V = prob.fixed.shape[0]
    zeros7 = jnp.zeros(7)

    def build_system(S_cur: Sim3):
        def edge_blocks(e):
            S_iw = jax.tree.map(lambda x: x[prob.i_idx[e]], S_cur)
            S_jw = jax.tree.map(lambda x: x[prob.j_idx[e]], S_cur)
            S_ij = jax.tree.map(lambda x: x[e], prob.S_meas)
            err = _edge_error(zeros7, zeros7, S_iw, S_jw, S_ij)
            Ji = jax.jacobian(lambda xi: _edge_error(xi, zeros7, S_iw, S_jw, S_ij))(zeros7)
            Jj = jax.jacobian(lambda xj: _edge_error(zeros7, xj, S_iw, S_jw, S_ij))(zeros7)
            return err, Ji, Jj

        errs, Jis, Jjs = jax.vmap(edge_blocks)(jnp.arange(prob.i_idx.shape[0]))
        w = (prob.edge_valid * prob.weight).astype(errs.dtype)  # [E]
        Jis = Jis * w[:, None, None]
        Jjs = Jjs * w[:, None, None]
        # assemble H [V,7,V,7] and b [V,7]
        H = jnp.zeros((V, 7, V, 7), errs.dtype)
        ii, jj = prob.i_idx, prob.j_idx
        # note Jis/Jjs already carry one factor of w; use unweighted transpose side
        Ji_raw = Jis / jnp.clip(w[:, None, None], 1e-12)
        Jj_raw = Jjs / jnp.clip(w[:, None, None], 1e-12)
        H = H.at[ii, :, ii, :].add(jnp.einsum("eij,eik->ejk", Jis, Ji_raw))
        H = H.at[jj, :, jj, :].add(jnp.einsum("eij,eik->ejk", Jjs, Jj_raw))
        H = H.at[ii, :, jj, :].add(jnp.einsum("eij,eik->ejk", Jis, Jj_raw))
        H = H.at[jj, :, ii, :].add(jnp.einsum("eij,eik->ejk", Jjs, Ji_raw))
        b = jnp.zeros((V, 7), errs.dtype)
        b = b.at[ii].add(-jnp.einsum("eij,ei->ej", Jis, errs))
        b = b.at[jj].add(-jnp.einsum("eij,ei->ej", Jjs, errs))
        cost = jnp.sum(w * jnp.sum(errs * errs, axis=-1))
        return H.reshape(V * 7, V * 7), b.reshape(-1), cost

    def apply_delta(S_cur: Sim3, dx):
        dS = Sim3.exp(dx.reshape(V, 7))
        S = dS.compose(S_cur)
        # iterated composes drift off SO(3) in float32; project back so the
        # optimized poses written into the map stay true rotations
        return Sim3(s=S.s, R=orthonormalize(S.R), t=S.t)

    def cost_of(S_cur: Sim3):
        def edge_cost(e):
            S_iw = jax.tree.map(lambda x: x[prob.i_idx[e]], S_cur)
            S_jw = jax.tree.map(lambda x: x[prob.j_idx[e]], S_cur)
            S_ij = jax.tree.map(lambda x: x[e], prob.S_meas)
            err = _edge_error(zeros7, zeros7, S_iw, S_jw, S_ij)
            return jnp.sum(err * err)

        ec = jax.vmap(edge_cost)(jnp.arange(prob.i_idx.shape[0]))
        return jnp.sum(ec * prob.edge_valid * prob.weight)

    frozen = jnp.repeat(prob.fixed | ~prob.vert_valid, 7)

    def lm_iter(carry, _):
        S_cur, lam = carry
        H, b, cost = build_system(S_cur)
        # freeze fixed/invalid vertices: identity rows
        H = jnp.where(frozen[:, None] | frozen[None, :], 0.0, H)
        H = H + jnp.diag(frozen.astype(H.dtype))
        b = jnp.where(frozen, 0.0, b)
        H = H + lam * jnp.diag(jnp.clip(jnp.diag(H), 1e-8, None))
        dx = jnp.linalg.solve(H, b)
        S_new = apply_delta(S_cur, dx)
        accept = (cost_of(S_new) < cost) & jnp.all(jnp.isfinite(dx))
        S_cur = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(accept, (1,) * old.ndim), new, old
            ),
            S_new,
            S_cur,
        )
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10), jnp.minimum(lam * 4.0, 1e8))
        return (S_cur, lam), cost

    (S_out, _), costs = jax.lax.scan(
        lm_iter, (prob.S_w, jnp.float32(1e-6)), None, length=iters
    )
    return S_out, cost_of(S_out)


def relative_sim3(S_iw: Sim3, S_jw: Sim3) -> Sim3:
    """Measured S_ij such that the edge error at the current estimate is 0."""
    return S_iw.compose(S_jw.inverse())
