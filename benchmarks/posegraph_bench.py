"""Essential-graph optimization at server scale (VERDICT r04 #8).

The reference runs its essential graph with 20 LM iterations at full map
scale (Optimizer::OptimizeEssentialGraphLoopClosure, cslam/src/
Optimizer.cpp:1058-1331, iters :1277) — a g2o sparse solve on the server
CPU.  This benchmark times our two solver paths on a K=1024-keyframe graph
(the stress-config map size): the dense [7V,7V] LU and the matrix-free
block-Jacobi PCG (`solvers/pose_graph.py`), including compile time.

Graph shape mirrors `correct_loop`'s edge lists: a spanning chain, ~4K
strong-covisibility edges, and per-lap loop edges.

Usage:  python benchmarks/posegraph_bench.py [--verts 1024] [--cpu]
Prints one JSON line per solver.
"""

import argparse
import json
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem(V: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from ccm_slam_tpu.solvers import pose_graph as pg
    from ccm_slam_tpu.utils import lie

    rng = np.random.RandomState(seed)
    # ground truth: a long multi-lap loop trajectory (4 laps around a circle)
    laps = 4
    ang = np.linspace(0, 2 * np.pi * laps, V, endpoint=False)
    xs = np.stack([np.cos(ang) * 12, np.sin(ang) * 12, 0.02 * rng.randn(V)], -1)
    xi_gt = np.concatenate([xs, np.zeros((V, 3))], -1).astype(np.float32)
    S_gt = lie.SE3.exp(jnp.asarray(xi_gt)).to_sim3()

    # drifted estimates: integrate exact odometry + per-step noise
    est_s = np.zeros(V, np.float32)
    est = [np.asarray(xi_gt[0])]
    drift = 0.4 / V
    S_gt_np_t = np.asarray(S_gt.t)
    # propagate noise in tangent space (cheap host loop, one-off setup)
    noise = rng.randn(V, 7).astype(np.float32) * drift
    noise[0] = 0

    def compose_chain():
        import jax

        S_prev = jax.tree.map(lambda x: x[0], S_gt)
        out = [S_prev]
        for k in range(1, V):
            Sk = jax.tree.map(lambda x: x[k], S_gt)
            Skm = jax.tree.map(lambda x: x[k - 1], S_gt)
            S_rel = Sk.compose(Skm.inverse())
            n = lie.Sim3.exp(jnp.asarray(noise[k]))
            out.append(n.compose(S_rel).compose(out[-1]))
        return lie.Sim3(
            s=jnp.stack([e.s for e in out]),
            R=jnp.stack([e.R for e in out]),
            t=jnp.stack([e.t for e in out]),
        )

    S_est = compose_chain()

    # edges: chain + covisibility (k, k+2..k+5 same lap) + loop edges between
    # laps (every V//laps apart, one per ~8 kfs)
    ii, jj = [], []
    for d in (1, 2, 3, 4):
        ii.append(np.arange(d, V))
        jj.append(np.arange(0, V - d))
    per_lap = V // laps
    li = np.arange(per_lap, V, 8)
    ii.append(li)
    jj.append(li - per_lap)
    ii = np.concatenate(ii).astype(np.int32)
    jj = np.concatenate(jj).astype(np.int32)
    S_meas = pg.relative_sim3(
        jax.tree.map(lambda x: x[jnp.asarray(ii)], S_gt),
        jax.tree.map(lambda x: x[jnp.asarray(jj)], S_gt),
    )
    E = ii.shape[0]
    prob = pg.PoseGraphProblem(
        S_w=S_est,
        fixed=jnp.arange(V) == 0,
        vert_valid=jnp.ones(V, bool),
        i_idx=jnp.asarray(ii),
        j_idx=jnp.asarray(jj),
        S_meas=S_meas,
        edge_valid=jnp.ones(E, bool),
        weight=jnp.ones(E, jnp.float32),
    )
    return prob, S_gt, E


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verts", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--solvers", nargs="*", default=["pcg"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ccm_slam_tpu.solvers import pose_graph as pg

    prob, S_gt, E = build_problem(args.verts)
    for solver in args.solvers:
        t0 = time.time()
        S_opt, cost = pg.optimize_pose_graph(prob, iters=args.iters, solver=solver)
        cost = float(cost)  # forces the value through the tunnel
        t_first = time.time() - t0
        t0 = time.time()
        S_opt, cost = pg.optimize_pose_graph(prob, iters=args.iters, solver=solver)
        cost = float(cost)
        t_steady = time.time() - t0
        err_t = float(
            np.max(np.linalg.norm(np.asarray(S_opt.t) - np.asarray(S_gt.t), axis=-1))
        )
        err_s = float(np.max(np.abs(np.asarray(S_opt.s) - 1.0)))
        print(json.dumps({
            "solver": solver, "verts": args.verts, "edges": int(E),
            "iters": args.iters, "compile_plus_run_s": round(t_first, 3),
            "steady_s": round(t_steady, 3),
            "iters_per_s": round(args.iters / t_steady, 2),
            "final_cost": cost, "max_t_err": round(err_t, 4),
            "max_s_err": round(err_s, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
