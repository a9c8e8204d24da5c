"""Per-component timing of one stress-scale GBA LM iteration on hardware.

Each component is repeated inside ONE jit via lax.scan with a perturbed
input each round (prevents CSE), so remote-tunnel dispatch overhead is
amortized out: per-round time = (t(N) - t(1)) / (N - 1).

  timeout 580 python scripts/profile_gba.py [--backend pallas|xla]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.stress import make_stress_problem
    from ccm_slam_tpu.solvers import ba

    prob = make_stress_problem()
    C = prob.R.shape[0]
    huber = 2.447651936

    def get_trans():
        if args.backend == "pallas":
            return ba._pcg_transitions_pallas(prob.cam_idx, C)
        return ba._pcg_transitions(prob.cam_idx, C)

    def scan_time(step, init, n):
        """Time n scan rounds of `step` inside one jit; returns seconds/round
        net of dispatch overhead."""

        @partial(jax.jit, static_argnames=("rounds",))
        def run(x0, rounds):
            out, _ = jax.lax.scan(step, x0, None, length=rounds)
            return out

        def once(rounds):
            out = run(init, rounds)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(jnp.ravel(leaf))[0])

        once(1)
        once(n)  # compile both
        t0 = time.perf_counter(); once(1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); once(n); tn = time.perf_counter() - t0
        return (tn - t1) / (n - 1)

    trans = get_trans()
    cam_bcast, cam_reduce = trans

    def blocks_step(carry, _):
        R, t, X = carry
        if args.backend == "pallas":
            from ccm_slam_tpu.ops import pallas_kernels as pk

            U, V, WT, g_c, g_p, _ = pk.fused_normal_blocks(
                R, t, X, prob.point_valid, prob.cam_idx, prob.uv, prob.sigma2,
                prob.obs_valid, prob.cam_fixed, C,
                prob.fx, prob.fy, prob.cx, prob.cy, huber, kmajor=True)
        else:
            U, V, W, g_c, g_p, ci = ba._build_normal_blocks(prob, R, t, X, huber, trans=trans)
        return (R + U[0, 0, 0] * 1e-20, t, X + g_p * 1e-20), None

    def cost_step(carry, _):
        R, t, X = carry
        if args.backend == "pallas":
            from ccm_slam_tpu.ops import pallas_kernels as pk

            c = pk.fused_reproj_cost(
                R, t, X, prob.point_valid, prob.cam_idx, prob.uv, prob.sigma2,
                prob.obs_valid, C, prob.fx, prob.fy, prob.cx, prob.cy, huber)
        else:
            c = ba._cost(prob, R, t, X, huber, cam_bcast=cam_bcast)
        return (R, t, X + c * 1e-20, ), None

    res = {}
    init = (prob.R, prob.t, prob.X)
    res["build_normal_blocks"] = scan_time(blocks_step, init, N)
    res["cost_eval"] = scan_time(cost_step, init, N)

    U, V, W, g_c, g_p, ci = jax.jit(
        lambda R, t, X: ba._build_normal_blocks(prob, R, t, X, huber, trans=trans)
    )(prob.R, prob.t, prob.X)

    def cg_like_step(carry, _):
        v = carry  # [C,6]
        vk = cam_bcast(v).reshape(*ci.shape, 6)
        y1 = jnp.einsum("pkij,pki->pkj", W, vk)
        y2 = jnp.sum(y1, axis=1)
        y3 = jnp.einsum("pkij,pj->pki", W, y2)
        off = cam_reduce(y3.reshape(ci.size, 6))
        return v + off * 1e-20, None

    res["schur_matvec"] = scan_time(cg_like_step, g_c, 3 * N)

    def bcast_step(v, _):
        vk = cam_bcast(v)
        return v + vk[:C] * 1e-20, None

    def reduce_step(y, _):
        s = cam_reduce(y)
        E = ci.size
        return y + jnp.tile(s, (E // C, 1)) * 1e-20, None

    res["cam_broadcast_f6"] = scan_time(bcast_step, g_c, 3 * N)
    res["cam_reduce_f6"] = scan_time(
        reduce_step, jnp.zeros((ci.size, 6), jnp.float32), 3 * N
    )

    def lm_step(carry, _):
        R, t, X = carry
        R, t, X, c, _ = ba.ba_solve(
            prob.replace(R=R, t=t, X=X), iters=1, pcg_backend=args.backend
        )
        return (R, t, X), None

    res["lm_iter_full"] = scan_time(lm_step, init, 4)

    for k, v in res.items():
        print(json.dumps({"component": k, "ms": round(v * 1e3, 2),
                          "backend": args.backend}))


if __name__ == "__main__":
    main()
