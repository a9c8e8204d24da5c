"""Client front-end throughput: frames/s per chip, single and multi-agent.

BASELINE config 4 asks for "linear frames/s scaling at 1 chip / 1 host /
N hosts".  On one chip the scaling mechanism is BATCHING: the ORB front-end
(pyramid + FAST + quadtree budget + IC-angle + BRIEF) is a fixed-shape jit,
so N agents' camera streams run as ONE vmapped dispatch — the MXU/VPU see a
batch instead of N serialized frames.  Across hosts, each host runs its
agents' batch on its own chip (process parallelism, reference readme 172-177).

Measures, per batch size B:
  * ORB extraction frames/s (aggregate and per-agent)
  * tracking pose-optimization frames/s (vmapped 4x10 LM, 300 pts/frame)

  python benchmarks/client_throughput.py [--cpu]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=24, help="timed frames per config")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ccm_slam_tpu.ops import orb
    from ccm_slam_tpu.solvers.pose_opt import optimize_pose

    H, W = 480, 752  # EuRoC cam0
    rs = np.random.RandomState(0)
    base = rs.rand(H, W).astype(np.float32) * 255.0

    def ex(img):
        return orb.extract(img, n_features=1000, n_levels=8, capacity=1024)

    for B in (1, 4, 8):
        fn = jax.jit(jax.vmap(ex)) if B > 1 else jax.jit(ex)
        # distinct frames each step (prevents CSE); data built host-side
        frames = [
            jnp.asarray(np.stack([base + i * 0.1 + a for a in range(B)]))
            if B > 1 else jnp.asarray(base + i * 0.1)
            for i in range(args.frames)
        ]
        out = fn(frames[0])
        jax.block_until_ready(out.xy)
        # best-of-2 passes: the remote-dispatch tunnel has latency spikes
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for f in frames:
                out = fn(f)
            float(np.asarray(out.xy).ravel()[0])
            dt = min(dt, (time.perf_counter() - t0) / args.frames)
        print(json.dumps({
            "metric": "orb_frames_per_s",
            "batch_agents": B,
            "value": round(B / dt, 1),
            "per_agent_fps": round(1.0 / dt, 1),
            "unit": "frames/s",
        }), flush=True)

    # pose-only optimization (the tracking hot loop's other half)
    N = 300
    X = rs.uniform(-10, 10, (N, 3)).astype(np.float32)
    X[:, 2] += 15.0
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    uv = np.stack([fx * X[:, 0] / X[:, 2] + cx, fy * X[:, 1] / X[:, 2] + cy], -1)
    uv = (uv + rs.randn(N, 2) * 0.5).astype(np.float32)

    def one(key):
        d = jax.random.normal(key, (3,)) * 0.05
        R0 = jnp.eye(3)
        t0_ = d
        Rr, tr, _, n_in = optimize_pose(
            R0, t0_, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones((N,), bool), jnp.ones((N,), jnp.float32),
            fx, fy, cx, cy,
        )
        return tr

    for B in (1, 8):
        fn = jax.jit(jax.vmap(one)) if B > 1 else jax.jit(one)
        keys = [
            jax.random.split(jax.random.PRNGKey(i), B) if B > 1 else jax.random.PRNGKey(i)
            for i in range(args.frames)
        ]
        out = fn(keys[0]); jax.block_until_ready(out)
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for k in keys:
                out = fn(k)
            float(np.asarray(out).ravel()[0])
            dt = min(dt, (time.perf_counter() - t0) / args.frames)
        print(json.dumps({
            "metric": "pose_opt_frames_per_s",
            "batch_agents": B,
            "value": round(B / dt, 1),
            "per_agent_fps": round(1.0 / dt, 1),
            "unit": "frames/s",
        }), flush=True)


if __name__ == "__main__":
    main()
