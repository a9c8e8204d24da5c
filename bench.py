"""Benchmark: bundle-adjustment LM iterations/s per chip on a server-scale map.

Prints ONE JSON line:
  {"metric": "ba_iters_per_s", "value": N, "unit": "iters/s", "vs_baseline": R}

Problem size mirrors a single-agent EuRoC server map at full scale
(~hundreds of keyframes, tens of thousands of landmarks).  The baseline
denominator is the reference's GBA envelope: g2o MapFusionGBA runs 20 LM
iterations multithreaded on a server CPU in roughly 2 s on an MH_01-scale
map (~10 iters/s; the repo publishes no numbers — BASELINE.md §"GBA budget"
— so this is the documented operating-envelope estimate).
"""

import json
import time

import numpy as np


def make_problem(C=128, P=32768, K=8, seed=0):
    import jax.numpy as jnp

    from ccm_slam_tpu.solvers import ba

    rs = np.random.RandomState(seed)
    X = rs.uniform(-20, 20, (P, 3)).astype(np.float32)
    X[:, 2] += 30.0
    # cameras along a trajectory
    t = np.cumsum(rs.randn(C, 3).astype(np.float32) * 0.2, axis=0)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    cam_idx = np.sort(rs.randint(0, C, (P, K)).astype(np.int32), axis=1)
    Xc = np.einsum("pkij,pj->pki", R[cam_idx], X) + t[cam_idx]
    z = np.maximum(Xc[..., 2], 1.0)
    uv = np.stack([fx * Xc[..., 0] / z + cx, fy * Xc[..., 1] / z + cy], -1).astype(
        np.float32
    )
    uv += rs.randn(P, K, 2).astype(np.float32) * 0.5
    return ba.BAProblem(
        R=jnp.asarray(R),
        t=jnp.asarray(t + rs.randn(C, 3).astype(np.float32) * 0.02),
        X=jnp.asarray(X + rs.randn(P, 3).astype(np.float32) * 0.05),
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
    import jax

    from ccm_slam_tpu.solvers import ba

    prob = make_problem()
    iters = 20  # the reference's GBA budget (Opt.GBAIterations)

    # compile + warmup
    out = ba.ba_solve(prob, iters=iters)
    float(out[3])

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = ba.ba_solve(prob, iters=iters)
        float(out[3])  # value fetch: forces execution through remote backends
    dt = (time.perf_counter() - t0) / n_rep

    iters_per_s = iters / dt
    baseline_iters_per_s = 10.0  # reference envelope estimate (see module docstring)

    # secondary contract metric: batched message-ingest throughput at the
    # reference comm budget (40 KFs + 2500 MPs per message); the reference's
    # per-entity CPU loops run at roughly wire rate (~200 KF/s envelope)
    extra = {}
    try:
        import sys

        sys.path.insert(0, "benchmarks")
        from ingest_bench import measure as ingest_measure

        extra = ingest_measure(n_msgs=8)
    except Exception as e:  # never break the contract line
        extra = {"ingest_error": str(e)[:120]}

    print(
        json.dumps(
            {
                "metric": "ba_iters_per_s",
                "value": round(iters_per_s, 2),
                "unit": "iters/s",
                "vs_baseline": round(iters_per_s / baseline_iters_per_s, 2),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
