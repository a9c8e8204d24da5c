"""Worker for the process-spanning distributed-GBA test (BASELINE config 4
machinery beyond a single process).

Each worker owns 4 virtual CPU devices; ``jax.distributed.initialize`` joins
them into one 8-device mesh spanning both OS processes, and
``parallel/dist_ba.dist_ba_solve`` runs the landmark-sharded Schur LM across
it — collectives crossing the process boundary.  Worker 0 also runs the
single-device reference solve and prints a parity line.

Usage (launched twice by tests/test_dist_multiprocess.py):
  python scripts/dist_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes 2 --process-id {0,1} [--devices-per-proc 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem(C=64, Pn=4096, K=4, seed=0):
    import numpy as np
    import jax.numpy as jnp

    from ccm_slam_tpu.solvers import ba

    rs = np.random.RandomState(seed)
    X = rs.uniform(-6, 6, (Pn, 3)).astype(np.float32)
    X[:, 2] += 12.0
    ang = np.linspace(0, 0.4, C).astype(np.float32)
    R = np.stack([
        np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
        for a in ang
    ])
    t = np.stack([np.array([0.02 * i, 0.005 * i, 0.0], np.float32)
                  for i in range(C)])
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    cam_idx = rs.randint(0, C, (Pn, K)).astype(np.int32)
    Xc = np.einsum("pkij,pj->pki", R[cam_idx], X) + t[cam_idx]
    uv = np.stack([fx * Xc[..., 0] / Xc[..., 2] + cx,
                   fy * Xc[..., 1] / Xc[..., 2] + cy], -1).astype(np.float32)
    uv += rs.randn(Pn, K, 2).astype(np.float32) * 0.3
    valid = Xc[..., 2] > 0.1
    t_noisy = t + rs.randn(C, 3).astype(np.float32) * 0.01
    t_noisy[:2] = t[:2]
    return ba.BAProblem(
        R=jnp.asarray(R), t=jnp.asarray(t_noisy),
        X=jnp.asarray(X + rs.randn(Pn, 3).astype(np.float32) * 0.02),
        cam_idx=jnp.asarray(cam_idx), uv=jnp.asarray(uv),
        sigma2=jnp.ones((Pn, K), jnp.float32),
        obs_valid=jnp.asarray(valid),
        cam_fixed=jnp.asarray(np.arange(C) < 2),
        point_valid=jnp.ones(Pn, bool),
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        cx=jnp.float32(cx), cy=jnp.float32(cy),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.num_processes * args.devices_per_proc, (
        n_global, n_local
    )

    import numpy as np

    from ccm_slam_tpu.parallel import dist_ba
    from ccm_slam_tpu.solvers import ba

    prob = build_problem()
    mesh = dist_ba.make_mesh(jax.devices())
    probs = dist_ba.shard_problem(prob, mesh)
    # 2 chunks with state carry: the interruptible path, across processes
    state = None
    for _ in range(2):
        R, t, X, cost, state = dist_ba.dist_ba_solve(
            probs, mesh, iters=args.iters // 2, state=state, return_state=True
        )
        probs = probs.replace(R=R, t=t, X=X)
    cost = float(cost)  # replicated: addressable from every process

    out = {"event": "dist_done", "process": args.process_id,
           "global_devices": n_global, "local_devices": n_local,
           "processes": args.num_processes, "cost": cost}
    if args.process_id == 0:
        # single-device parity reference
        R_s, t_s, X_s, cost_s, _ = ba.ba_solve(prob, iters=args.iters)
        out["cost_single"] = float(cost_s)
        ctr_d = -np.einsum("cji,cj->ci", np.asarray(R), np.asarray(t))
        ctr_s = -np.einsum("cji,cj->ci", np.asarray(R_s), np.asarray(t_s))
        out["max_center_err"] = float(
            np.linalg.norm(ctr_d - ctr_s, axis=-1).max()
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
