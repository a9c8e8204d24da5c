"""Hardware verification for the Pallas PCG camera-transition kernels.

Run on the real TPU (serializes with other chip users):

  timeout 580 python scripts/verify_pallas_hw.py [--stress]

Stage 1 golden-checks cam_reduce / cam_broadcast against XLA references on
hardware (small shapes, fast compile).  Stage 2 (--stress) runs the full
stress-scale ba_solve with pcg_backend="pallas" vs "xla" and reports cost
parity + per-iteration timing.  Each stage prints one JSON line.
"""

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage1():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ccm_slam_tpu.ops import pallas_kernels as pk

    rs = np.random.RandomState(0)
    E, C, F = 8192, 260, 6
    y = jnp.asarray(rs.randn(E, F).astype(np.float32))
    v = jnp.asarray(rs.randn(C, F).astype(np.float32))
    ci = jnp.asarray(rs.randint(0, C, E).astype(np.int32))

    red = np.asarray(pk.cam_reduce(y, ci, C, exact=True))
    red_ref = np.asarray(pk.cam_reduce_reference(y, ci, C))
    bro = np.asarray(pk.cam_broadcast(v, ci, C, exact=True))
    bro_ref = np.asarray(pk.cam_broadcast_reference(v, ci, C))
    err_r = float(np.abs(red - red_ref).max())
    err_b = float(np.abs(bro - bro_ref).max())
    ok = err_r < 1e-3 and err_b < 1e-5
    print(json.dumps({"stage": "golden_hw", "ok": ok,
                      "max_err_reduce": err_r, "max_err_broadcast": err_b}))
    return ok


def stage2():
    import jax

    from benchmarks.stress import make_stress_problem
    from ccm_slam_tpu.solvers import ba

    prob = make_stress_problem()
    iters = 20
    results = {}
    for backend in ("pallas", "xla"):
        c = ba.ba_solve(prob, iters=iters, pcg_backend=backend)[3]
        float(c)  # warm/compile
        t0 = time.perf_counter()
        c = ba.ba_solve(prob, iters=iters, pcg_backend=backend)[3]
        cost = float(c)
        dt = time.perf_counter() - t0
        results[backend] = {"iters_per_s": round(iters / dt, 3), "cost": cost}
        print(json.dumps({"stage": "stress", "backend": backend, **results[backend]}))
    rel = abs(results["pallas"]["cost"] - results["xla"]["cost"]) / (
        abs(results["xla"]["cost"]) + 1.0
    )
    print(json.dumps({
        "stage": "summary",
        "speedup": round(results["pallas"]["iters_per_s"] / results["xla"]["iters_per_s"], 2),
        "cost_rel_diff": rel,
        "converged_equally": rel < 0.05,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", action="store_true")
    args = ap.parse_args()
    ok = stage1()
    if args.stress and ok:
        stage2()
