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


# vertex-count threshold above which the dense [7V,7V] assembly + LU solve
# is replaced by the matrix-free block-Jacobi PCG (the dense path is O(V^3)
# per LM iteration and 7V x 7V of HBM; PCG is O(E) per CG step)
DENSE_MAX_VERTS = 384


@partial(jax.jit, static_argnames=("iters", "solver", "cg_iters"))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                        solver: str = "auto", cg_iters: int = 48):
    """Run `iters` LM iterations; returns (S_w_opt: Sim3 [V], final_cost).

    ``solver``: "dense" (LU on the assembled [7V,7V] normal matrix — exact,
    best for CI-size graphs), "pcg" (matrix-free conjugate gradients over the
    edge list with a block-diagonal 7x7 Jacobi preconditioner — the
    server-scale path, same shape as the GBA Schur PCG), or "auto" (pick by
    vertex count at trace time)."""
    V = prob.fixed.shape[0]
    if solver == "auto":
        solver = "dense" if V <= DENSE_MAX_VERTS else "pcg"
    zeros7 = jnp.zeros(7)
    ii, jj = prob.i_idx, prob.j_idx

    def edge_system(S_cur: Sim3):
        """Per-edge errors + Jacobians (autodiff through the Sim3 chain)."""
        def edge_blocks(e):
            S_iw = jax.tree.map(lambda x: x[ii[e]], S_cur)
            S_jw = jax.tree.map(lambda x: x[jj[e]], S_cur)
            S_ij = jax.tree.map(lambda x: x[e], prob.S_meas)
            err = _edge_error(zeros7, zeros7, S_iw, S_jw, S_ij)
            Ji = jax.jacobian(lambda xi: _edge_error(xi, zeros7, S_iw, S_jw, S_ij))(zeros7)
            Jj = jax.jacobian(lambda xj: _edge_error(zeros7, xj, S_iw, S_jw, S_ij))(zeros7)
            return err, Ji, Jj

        errs, Jis, Jjs = jax.vmap(edge_blocks)(jnp.arange(ii.shape[0]))
        w = (prob.edge_valid * prob.weight).astype(errs.dtype)  # [E]
        cost = jnp.sum(w * jnp.sum(errs * errs, axis=-1))
        b = jnp.zeros((V, 7), errs.dtype)
        b = b.at[ii].add(-jnp.einsum("eij,ei->ej", Jis * w[:, None, None], errs))
        b = b.at[jj].add(-jnp.einsum("eij,ei->ej", Jjs * w[:, None, None], errs))
        return errs, Jis, Jjs, w, b, cost

    frozen_v = prob.fixed | ~prob.vert_valid  # [V]
    frozen = jnp.repeat(frozen_v, 7)

    def dense_solve(Jis, Jjs, w, b, lam):
        Jis_w = Jis * w[:, None, None]
        Jjs_w = Jjs * w[:, None, None]
        H = jnp.zeros((V, 7, V, 7), b.dtype)
        H = H.at[ii, :, ii, :].add(jnp.einsum("eij,eik->ejk", Jis_w, Jis))
        H = H.at[jj, :, jj, :].add(jnp.einsum("eij,eik->ejk", Jjs_w, Jjs))
        H = H.at[ii, :, jj, :].add(jnp.einsum("eij,eik->ejk", Jis_w, Jjs))
        H = H.at[jj, :, ii, :].add(jnp.einsum("eij,eik->ejk", Jjs_w, Jis))
        H = H.reshape(V * 7, V * 7)
        bf = b.reshape(-1)
        # freeze fixed/invalid vertices: identity rows
        H = jnp.where(frozen[:, None] | frozen[None, :], 0.0, H)
        H = H + jnp.diag(frozen.astype(H.dtype))
        bf = jnp.where(frozen, 0.0, bf)
        H = H + lam * jnp.diag(jnp.clip(jnp.diag(H), 1e-8, None))
        return jnp.linalg.solve(H, bf).reshape(V, 7)

    def pcg_solve(Jis, Jjs, w, b, lam):
        """Matrix-free normal-equation CG: Hx per step is two [E,7,7]x[E,7]
        batched matmuls + two segment scatters — never forms [7V,7V]."""
        Jis_w = Jis * w[:, None, None]
        Jjs_w = Jjs * w[:, None, None]
        free = ~frozen_v

        # block-diagonal of H for damping + Jacobi preconditioner
        Hd = jnp.zeros((V, 7, 7), b.dtype)
        Hd = Hd.at[ii].add(jnp.einsum("eij,eik->ejk", Jis_w, Jis))
        Hd = Hd.at[jj].add(jnp.einsum("eij,eik->ejk", Jjs_w, Jjs))
        dclip = jnp.clip(jnp.diagonal(Hd, axis1=1, axis2=2), 1e-8, None)
        lam_d = lam * dclip
        Hd_damped = Hd + jax.vmap(jnp.diag)(lam_d)
        # regularize + invert the 7x7 blocks (frozen blocks -> identity)
        eye7 = jnp.eye(7, dtype=b.dtype)
        Hd_damped = jnp.where(free[:, None, None], Hd_damped, eye7)
        Minv = jnp.linalg.inv(Hd_damped + 1e-8 * eye7)

        def Hx(x):  # x [V,7]
            x = jnp.where(free[:, None], x, 0.0)
            y = (jnp.einsum("eij,ej->ei", Jis, x[ii])
                 + jnp.einsum("eij,ej->ei", Jjs, x[jj]))  # [E,7] err-space
            out = jnp.zeros((V, 7), x.dtype)
            out = out.at[ii].add(jnp.einsum("eij,ei->ej", Jis_w, y))
            out = out.at[jj].add(jnp.einsum("eij,ei->ej", Jjs_w, y))
            out = out + lam_d * x  # LM damping on the block diagonal
            return jnp.where(free[:, None], out, 0.0)

        b0 = jnp.where(free[:, None], b, 0.0)
        x = jnp.zeros_like(b0)
        r = b0
        z = jnp.einsum("vij,vj->vi", Minv, r)
        p = z
        rz = jnp.sum(r * z)

        def cg_step(carry, _):
            x, r, p, rz = carry
            Ap = Hx(p)
            denom = jnp.sum(p * Ap)
            alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("vij,vj->vi", Minv, r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(cg_step, (x, r, p, rz), None,
                                       length=cg_iters)
        return x

    def apply_delta(S_cur: Sim3, dx):
        dS = Sim3.exp(dx.reshape(V, 7))
        S = dS.compose(S_cur)
        # iterated composes drift off SO(3) in float32; project back so the
        # optimized poses written into the map stay true rotations
        return Sim3(s=S.s, R=orthonormalize(S.R), t=S.t)

    def cost_of(S_cur: Sim3):
        def edge_cost(e):
            S_iw = jax.tree.map(lambda x: x[ii[e]], S_cur)
            S_jw = jax.tree.map(lambda x: x[jj[e]], S_cur)
            S_ij = jax.tree.map(lambda x: x[e], prob.S_meas)
            err = _edge_error(zeros7, zeros7, S_iw, S_jw, S_ij)
            return jnp.sum(err * err)

        ec = jax.vmap(edge_cost)(jnp.arange(ii.shape[0]))
        return jnp.sum(ec * prob.edge_valid * prob.weight)

    def lm_iter(carry, _):
        S_cur, lam = carry
        _, Jis, Jjs, w, b, cost = edge_system(S_cur)
        if solver == "dense":
            dx = dense_solve(Jis, Jjs, w, b, lam)
        else:
            dx = pcg_solve(Jis, Jjs, w, b, lam)
        dx = jnp.where(frozen_v[:, None], 0.0, dx)
        S_new = apply_delta(S_cur, dx.reshape(-1))
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
