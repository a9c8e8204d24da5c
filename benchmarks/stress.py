"""BASELINE config 5: 8-agent / 100k+-landmark stress with async
interruptible GBA.

Builds a fused-map-scale synthetic problem (8 agents x 128 keyframes, 131k
landmarks, 8 observations each ~ >1M reprojection terms), then:

1. measures full-GBA LM iterations/s (single chip or device mesh);
2. exercises the interruptible schedule: GBA advances in small chunks,
   "fresh agent data" preempts it mid-solve, the resumed solve must reach
   the same optimum (the INTERRUPTBA contract as a measurable property).

Usage:
  python benchmarks/stress.py            # real chip
  python benchmarks/stress.py --cpu8     # 8-device virtual CPU mesh
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_stress_problem(n_agents=8, kf_per_agent=128, n_landmarks=131072, K=8, seed=0):
    import jax.numpy as jnp

    from ccm_slam_tpu.solvers import ba

    rs = np.random.RandomState(seed)
    C = n_agents * kf_per_agent
    P = n_landmarks
    # agents sweep parallel corridors over a shared landmark field
    t = np.zeros((C, 3), np.float32)
    for a in range(n_agents):
        base = np.array([0.0, a * 3.0, 0.0], np.float32)
        walk = np.cumsum(rs.randn(kf_per_agent, 3).astype(np.float32) * 0.15, axis=0)
        t[a * kf_per_agent : (a + 1) * kf_per_agent] = base + walk
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    X = rs.uniform(-30, 30, (P, 3)).astype(np.float32)
    X[:, 1] = rs.uniform(-2, n_agents * 3.0, P)
    X[:, 2] += 40.0
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    cam_idx = np.sort(rs.randint(0, C, (P, K)).astype(np.int32), axis=1)
    Xc = np.einsum("pkij,pj->pki", R[cam_idx], X) + t[cam_idx]
    z = np.maximum(Xc[..., 2], 1.0)
    uv = np.stack([fx * Xc[..., 0] / z + cx, fy * Xc[..., 1] / z + cy], -1).astype(np.float32)
    uv += rs.randn(P, K, 2).astype(np.float32) * 0.5
    return ba.BAProblem(
        R=jnp.asarray(R),
        t=jnp.asarray(t + rs.randn(C, 3).astype(np.float32) * 0.03),
        X=jnp.asarray(X + rs.randn(P, 3).astype(np.float32) * 0.08),
        cam_idx=jnp.asarray(cam_idx),
        uv=jnp.asarray(uv),
        sigma2=jnp.ones((P, K), np.float32),
        obs_valid=jnp.asarray(Xc[..., 2] > 1.0),
        cam_fixed=jnp.asarray(np.arange(C) < 2),
        point_valid=jnp.ones(P, bool),
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        cx=jnp.float32(cx),
        cy=jnp.float32(cy),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu8", action="store_true", help="8-device virtual CPU mesh")
    ap.add_argument("--landmarks", type=int, default=131072)
    ap.add_argument("--agents", type=int, default=8)
    args = ap.parse_args()

    if args.cpu8:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu8:
        jax.config.update("jax_platforms", "cpu")

    from ccm_slam_tpu.parallel import dist_ba
    from ccm_slam_tpu.solvers import ba

    prob = make_stress_problem(n_agents=args.agents, n_landmarks=args.landmarks)
    n_obs = int(np.asarray(prob.obs_valid).sum())
    use_mesh = args.cpu8 or len(jax.devices()) > 1

    def solve(p, iters, with_stats=True):
        if use_mesh:
            mesh = dist_ba.make_mesh()
            ps = dist_ba.shard_problem(p, mesh)
            R, t, X, cost = dist_ba.dist_ba_solve(ps, mesh, iters=iters)
            return R, t, X, float(cost)
        R, t, X, cost, _ = ba.ba_solve(p, iters=iters, with_stats=with_stats)
        return R, t, X, float(cost)

    iters = 20
    # warmup/compile — MUST use the same static `iters` as the timed run
    # (iters is a static jit arg: a different value is a different compile,
    # and remote-tunnel compiles are ~20 s — previously inflated this metric)
    _, _, _, c_warm = solve(prob, iters)
    _, _, _, _ = solve(prob, 5, with_stats=False)  # compile the chunk variant
    _, _, _, _ = solve(prob, 5)
    t0 = time.perf_counter()
    R, t, X, cost_full = solve(prob, iters)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "stress_gba_iters_per_s",
                "value": round(iters / dt, 2),
                "unit": "iters/s",
                "n_cams": int(prob.R.shape[0]),
                "n_landmarks": args.landmarks,
                "n_obs": n_obs,
                "devices": len(jax.devices()) if use_mesh else 1,
            }
        )
    )

    # interruptible schedule: 4 chunks of 5 with a simulated preemption —
    # state is just (R, t, X), so resume == re-invoke with the checkpoint
    t0 = time.perf_counter()
    p = prob
    cost_chunked = None
    done = 0
    while done < iters:
        chunk = min(5, iters - done)
        last = done + chunk >= iters
        R, t, X, cost_chunked = solve(p, chunk, with_stats=last)
        p = p.replace(R=R, t=t, X=X)
        done += chunk
        # <- a fresh-data preemption would simply stop here; the map keeps
        #    the last chunk's state (nothing to roll back)
    dt_chunk = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "stress_gba_interruptible_overhead",
                "value": round(dt_chunk / dt, 3),
                "unit": "x_full_solve",
                "cost_full": round(cost_full, 1),
                "cost_chunked": round(cost_chunked, 1),
                "converged_equally": bool(
                    abs(cost_chunked - cost_full) < 0.05 * abs(cost_full) + 1.0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
