"""Config-5-scale SERVER PIPELINE stress: loop closure + essential graph at
K=1024 keyframes / M=131k landmarks — proves the graph machinery (not just
the BA solver, which benchmarks/stress.py covers) survives stress scale:

  * chunked covisibility derivation (no [M,K] one-hot intermediate),
  * spanning tree,
  * Sim3 estimation + guided projection on a real synthetic revisit,
  * correct_loop: neighborhood Sim3 correction + landmark fusion +
    the full Sim(3) essential-graph optimization over ~1k vertices.

Builds a drifted figure-eight trajectory whose tail revisits its start, so
the loop stages run on genuine geometry.  Prints one JSON line per stage.

Run: ``python benchmarks/stress_pipeline.py [cpu] [small]``
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stress_map(K=1024, M=131072, N=256, O=16, obs_per_kf=192, seed=0):
    """Synthetic server map: K keyframes along a long loop, landmarks spread
    along the path, dual-indexed obs tables filled consistently (numpy on
    host, one device transfer at the end)."""
    import jax.numpy as jnp

    from ccm_slam_tpu.models import map_store as ms

    rs = np.random.RandomState(seed)
    # loop trajectory: circle of circumference ~K*0.3 m with a revisit tail
    n_main = K - 64
    theta = np.linspace(0, 2 * np.pi, n_main, endpoint=False)
    Rr = n_main * 0.3 / (2 * np.pi)
    centers = np.stack([Rr * np.sin(theta), 0.02 * np.sin(7 * theta), Rr * (1 - np.cos(theta))], -1)
    # tail re-drives the start with a drift offset (the loop to close)
    tail = centers[: 64].copy() + np.array([0.8, 0.05, 0.4])
    centers = np.concatenate([centers, tail], 0).astype(np.float32)
    yaw = np.concatenate([theta, theta[:64]]).astype(np.float32)

    # landmarks: near the path, several per keyframe region
    own = rs.randint(0, K, M)
    lat = rs.uniform(2.0, 8.0, M).astype(np.float32)
    ang = rs.uniform(0, 2 * np.pi, M).astype(np.float32)
    pts = centers[own] + np.stack(
        [np.sin(ang) * lat, rs.uniform(-2, 2, M).astype(np.float32), np.cos(ang) * lat], -1
    )

    m = ms.empty_map(K, M, N, O)
    kfs, mps = m.kfs, m.mps
    R_wc = np.zeros((K, 3, 3), np.float32)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R_wc[:, 0, 0] = cy; R_wc[:, 0, 2] = sy
    R_wc[:, 1, 1] = 1.0
    R_wc[:, 2, 0] = -sy; R_wc[:, 2, 2] = cy
    R_cw = np.swapaxes(R_wc, 1, 2)
    t_cw = -np.einsum("kij,kj->ki", R_cw, centers)

    # observations: each landmark is seen by its owner kf and the next few
    obs_kf = np.full((M, O), -1, np.int32)
    obs_feat = np.zeros((M, O), np.int32)
    n_obs = np.minimum(rs.randint(2, 6, M), O)
    feat_cursor = np.zeros(K, np.int64)
    mp_idx = np.full((K, N), -1, np.int32)
    for j in range(int(n_obs.max())):
        sel = np.where(n_obs > j)[0]
        kf = (own[sel] + j) % K
        # assign sequential feature slots per kf (wrap at N)
        slots = feat_cursor[kf] % N
        feat_cursor[kf] += 1
        obs_kf[sel, j] = kf
        obs_feat[sel, j] = slots
        mp_idx[kf, slots] = sel
    # make the tail observe the START's landmarks too (the loop evidence)
    start_lms = np.where(own < 48)[0][:8000]
    kf_tail = K - 64 + (own[start_lms] % 48)
    slot_tail = feat_cursor[kf_tail] % N
    feat_cursor[kf_tail] += 1
    j_free = n_obs[start_lms]
    ok = j_free < O
    obs_kf[start_lms[ok], j_free[ok]] = kf_tail[ok]
    obs_feat[start_lms[ok], j_free[ok]] = slot_tail[ok]
    n_obs[start_lms[ok]] += 1
    mp_idx[kf_tail[ok], slot_tail[ok]] = start_lms[ok]

    desc = rs.randint(0, 256, (M, 32), dtype=np.uint8)
    kf_desc = np.zeros((K, N, 32), np.uint8)
    # features carry their landmark's descriptor (so Sim3 matching works)
    kk, ff = np.where(mp_idx >= 0)
    kf_desc[kk, ff] = desc[mp_idx[kk, ff]]
    # projected pixel positions for the features
    kf_xy = rs.uniform(20, 700, (K, N, 2)).astype(np.float32)
    Xc = np.einsum("kij,kfj->kfi", R_cw, pts[np.clip(mp_idx, 0, M - 1)]) + t_cw[:, None, :]
    z = np.clip(Xc[..., 2], 1.0, None)
    kf_xy = np.where(
        (mp_idx >= 0)[..., None],
        np.stack([458.654 * Xc[..., 0] / z + 367.215,
                  457.296 * Xc[..., 1] / z + 248.375], -1).astype(np.float32),
        kf_xy,
    )

    kfs = kfs.replace(
        kf_id=jnp.asarray(np.arange(K, dtype=np.int32)),
        client_id=jnp.zeros((K,), jnp.int32),
        timestamp=jnp.asarray(np.arange(K, dtype=np.float32) * 0.05),
        valid=jnp.ones((K,), bool),
        insert_order=jnp.asarray(np.arange(K, dtype=np.int32)),
        R_cw=jnp.asarray(R_cw), t_cw=jnp.asarray(t_cw),
        xy=jnp.asarray(kf_xy), desc=jnp.asarray(kf_desc),
        feat_valid=jnp.asarray(mp_idx >= 0),
        mp_idx=jnp.asarray(mp_idx),
    )
    mps = mps.replace(
        mp_id=jnp.asarray(np.arange(M, dtype=np.int32)),
        valid=jnp.ones((M,), bool),
        pos=jnp.asarray(pts),
        desc=jnp.asarray(desc),
        normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (M, 1)),
        min_dist=jnp.zeros((M,), jnp.float32),
        max_dist=jnp.full((M,), np.inf, jnp.float32),
        ref_kf=jnp.asarray(own.astype(np.int32)),
        obs_kf=jnp.asarray(obs_kf), obs_feat=jnp.asarray(obs_feat),
        obs_n=jnp.asarray(n_obs.astype(np.int32)),
    )
    return m.replace(kfs=kfs, mps=mps, next_kf=jnp.int32(K), next_mp=jnp.int32(M),
                     insert_counter=jnp.int32(K))


def main():
    if "cpu" in sys.argv[1:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
    small = "small" in sys.argv[1:]
    import jax
    import jax.numpy as jnp

    from ccm_slam_tpu.config import CameraConfig, SystemConfig, CapacityConfig
    from ccm_slam_tpu.models import map_store as ms
    from ccm_slam_tpu.runtime import loop_closing as lc
    from ccm_slam_tpu.utils.camera import Camera

    K, M = (128, 8192) if small else (1024, 131072)
    cfg = SystemConfig(capacity=CapacityConfig(
        max_keypoints=256, server_max_kfs=K, server_max_mps=M, max_obs_per_mp=16))
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    t0 = time.time()
    m = build_stress_map(K=K, M=M)
    jax.block_until_ready(m.kfs.R_cw)
    print(json.dumps({"stage": "build", "K": K, "M": M, "s": round(time.time() - t0, 1)}), flush=True)

    def timed(stage, fn, n=1):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn()
            jax.block_until_ready(jax.tree.leaves(out)[0])
        print(json.dumps({"stage": stage, "ms": round(1000 * (time.time() - t0) / n, 1)}), flush=True)
        return out

    W = timed("covisibility_matrix", lambda: ms.covisibility_matrix(m), n=2)
    timed("covis_row", lambda: ms.covis_row(m, jnp.int32(K - 1)), n=3)
    timed("spanning_tree", lambda: ms.spanning_tree(m, W), n=2)

    kf_q, kf_c = K - 32, 16  # tail keyframe vs its true revisit partner
    key = jax.random.PRNGKey(0)
    est = timed("estimate_sim3", lambda: lc.estimate_sim3(
        key, m, jnp.int32(kf_q), jnp.int32(kf_c), cam, cfg))
    print(json.dumps({"stage": "sim3_result", "success": bool(est["success"]),
                      "n_matches": int(est["n_matches"]),
                      "n_inliers": int(est["n_inliers"])}), flush=True)
    gp = timed("guided_projection", lambda: lc.guided_projection_count(
        m, jnp.int32(kf_q), jnp.int32(kf_c), est["S_qc"], cam, cfg, W))
    print(json.dumps({"stage": "guided_total", "n": int(gp[0])}), flush=True)
    out = timed("correct_loop_plus_essential_graph", lambda: lc.correct_loop(
        m, jnp.int32(kf_q), jnp.int32(kf_c), est["S_qc"], cam, cfg,
        loop_mask=gp[1], gp_t_idx=gp[2], gp_okm=gp[3]))
    m2, cost, cl_info = out
    errs = ms.check_structure(m2)
    print(json.dumps({"stage": "done", "ess_cost": float(cost),
                      "covis_edges": int(cl_info["covis_edges"]),
                      "covis_edges_dropped": int(cl_info["covis_edges_dropped"]),
                      "structure_errors": len(errs)}), flush=True)


if __name__ == "__main__":
    main()
