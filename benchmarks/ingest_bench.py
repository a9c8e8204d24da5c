"""Server message-ingest throughput: keyframes/s + landmarks/s per chip.

Replays a synthetic client stream at the reference's per-message budget
(40 KFs + 2500 MPs per Map msg, cslam/conf/config.yaml:88-95; per-cycle
server bound 400 KFs + 12k MPs, :99-100) through ``Server.ingest`` — the
batched jitted path (ccm_slam_tpu/runtime/ingest.py).  The reference
processes these loops per-entity on a CPU thread at roughly wire rate
(5 Hz x 40 KFs = 200 KF/s envelope); here a whole message is one compiled
call.

Run: ``python benchmarks/ingest_bench.py [cpu]``
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stream(n_msgs=10, kfs_per_msg=40, mps_per_msg=2500, n_feat=512, obs_slots=8):
    """Synthetic chained client stream (numpy on host; device-put at the end)."""
    import jax.numpy as jnp

    from ccm_slam_tpu.runtime.communicator import KFMsgBatch, MapMsg, MPMsgBatch

    rs = np.random.RandomState(0)
    msgs = []
    mp_counter = 0
    for mi in range(n_msgs):
        ids = np.arange(mi * kfs_per_msg, (mi + 1) * kfs_per_msg, dtype=np.int32)
        pred = ids - 1  # chain; -1 for the very first keyframe
        # relative poses: small forward motion per keyframe
        R = np.tile(np.eye(3, dtype=np.float32), (kfs_per_msg, 1, 1))
        t = np.tile(np.array([0.05, 0.0, 0.01], np.float32), (kfs_per_msg, 1))
        t[ids == 0] = 0.0
        xy = rs.uniform(20, 700, (kfs_per_msg, n_feat, 2)).astype(np.float32)
        desc = rs.randint(0, 256, (kfs_per_msg, n_feat, 32), dtype=np.uint8)

        # landmarks owned by this message's keyframes, one feature slot each
        mp_ids = np.arange(mp_counter, mp_counter + mps_per_msg, dtype=np.int32)
        mp_counter += mps_per_msg
        own_kf = ids[rs.randint(0, kfs_per_msg, mps_per_msg)]
        feat = np.zeros(mps_per_msg, np.int32)
        # unique (kf, feat) pairs: enumerate features per owner keyframe
        for k in ids:
            sel = np.where(own_kf == k)[0]
            feat[sel] = np.arange(len(sel)) % n_feat
        assoc_id = np.full((kfs_per_msg, n_feat), -1, np.int32)
        assoc_id[own_kf - mi * kfs_per_msg, feat] = mp_ids

        obs_kf_id = np.full((mps_per_msg, obs_slots), -1, np.int32)
        obs_feat = np.zeros((mps_per_msg, obs_slots), np.int32)
        obs_valid = np.zeros((mps_per_msg, obs_slots), bool)
        obs_kf_id[:, 0] = own_kf
        obs_feat[:, 0] = feat
        obs_valid[:, 0] = True

        kfb = KFMsgBatch(
            valid=jnp.ones(kfs_per_msg, bool),
            full=jnp.ones(kfs_per_msg, bool),
            kf_id=jnp.asarray(ids),
            client_id=jnp.zeros(kfs_per_msg, jnp.int32),
            timestamp=jnp.asarray(ids.astype(np.float32) * 0.05),
            R_cpred=jnp.asarray(R),
            t_cpred=jnp.asarray(t),
            pred_kf_id=jnp.asarray(pred),
            R_cpar=jnp.asarray(R),
            t_cpar=jnp.asarray(t),
            par_kf_id=jnp.full(kfs_per_msg, -1, jnp.int32),
            xy=jnp.asarray(xy),
            desc=jnp.asarray(desc),
            octave=jnp.zeros((kfs_per_msg, n_feat), jnp.int32),
            angle=jnp.zeros((kfs_per_msg, n_feat), jnp.float32),
            feat_valid=jnp.ones((kfs_per_msg, n_feat), bool),
            mp_assoc_id=jnp.asarray(assoc_id),
        )
        mpb = MPMsgBatch(
            valid=jnp.ones(mps_per_msg, bool),
            full=jnp.ones(mps_per_msg, bool),
            mp_id=jnp.asarray(mp_ids),
            client_id=jnp.zeros(mps_per_msg, jnp.int32),
            pos_ref=jnp.asarray(
                rs.uniform(-3, 3, (mps_per_msg, 3)).astype(np.float32) + [0, 0, 6]
            ),
            ref_kf_id=jnp.asarray(own_kf),
            ref_client_id=jnp.zeros(mps_per_msg, jnp.int32),
            desc=jnp.asarray(rs.randint(0, 256, (mps_per_msg, 32), dtype=np.uint8)),
            normal_ref=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (mps_per_msg, 1)),
            min_dist=jnp.ones(mps_per_msg, jnp.float32),
            max_dist=jnp.full(mps_per_msg, 60.0, jnp.float32),
            obs_kf_id=jnp.asarray(obs_kf_id),
            obs_feat=jnp.asarray(obs_feat),
            obs_valid=jnp.asarray(obs_valid),
        )
        msgs.append(
            MapMsg(
                kfs=kfb, mps=mpb,
                ack_kf_ids=np.zeros(0, np.int64), ack_mp_ids=np.zeros(0, np.int64),
            )
        )
    return msgs


def measure(n_msgs=10, kfs_per_msg=40, mps_per_msg=2500, n_feat=512):
    """Returns a dict with kf/s, mp/s, ms/msg (steady-state, post-compile)."""
    import jax
    import jax.numpy as jnp

    from ccm_slam_tpu.config import CapacityConfig, ExtractorConfig, SystemConfig
    from ccm_slam_tpu.models import map_store as ms
    from ccm_slam_tpu.ops import bow
    from ccm_slam_tpu.runtime.server import Server
    from ccm_slam_tpu.utils.camera import Camera
    from ccm_slam_tpu.config import CameraConfig

    total_kfs = n_msgs * kfs_per_msg
    total_mps = n_msgs * mps_per_msg
    cfg = SystemConfig(
        n_agents=1,
        extractor=ExtractorConfig(n_features=n_feat),
        capacity=CapacityConfig(
            max_keypoints=n_feat,
            server_max_kfs=2 * total_kfs,
            server_max_mps=2 * total_mps,
            max_obs_per_mp=16,
        ),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    rs = np.random.RandomState(1)
    vocab = bow.train_vocabulary(
        jax.random.PRNGKey(0),
        jnp.asarray(rs.randint(0, 256, (4096, 32), dtype=np.uint8)),
        jnp.ones(4096, bool), n_words=512, iters=2,
    )
    server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=1)
    # pre-grow so no re-allocation (and no shape recompiles) mid-timing
    server.maps[0] = ms.grow_map(server.maps[0], total_kfs + kfs_per_msg, 2 * total_mps)
    from ccm_slam_tpu.models import keyframe_db as kdb

    server.finders[0].db = kdb.grow(server.finders[0].db, total_kfs + kfs_per_msg)
    server.matcher.grow(total_kfs + kfs_per_msg)

    msgs = build_stream(n_msgs, kfs_per_msg, mps_per_msg, n_feat)
    # messages land on device up front: in deployment the wire buffers DMA in
    # while the previous message is being processed, so steady-state ingest
    # should be measured without the host->device copy on the critical path
    msgs = [jax.device_put(m) for m in msgs]
    jax.block_until_ready(msgs[-1].kfs.desc)
    # compile + warm up: message 0 compiles the no-pending shapes, message 1
    # the steady-state (pending buffer concatenated) shapes
    for msg in msgs[:2]:
        ack = server.ingest(0, msg)
        assert len(ack.ack_kf_ids) == kfs_per_msg, len(ack.ack_kf_ids)
    t0 = time.perf_counter()
    for msg in msgs[2:]:
        ack = server.ingest(0, msg)
        assert len(ack.ack_kf_ids) == kfs_per_msg
        assert len(ack.ack_mp_ids) == mps_per_msg
    jax.block_until_ready(server.maps[0].kfs.R_cw)
    n_kf_ingested = int(server.maps[0].next_kf)
    dt = time.perf_counter() - t0
    n = n_msgs - 2
    assert n_kf_ingested == total_kfs, n_kf_ingested
    return {
        "ingest_kfs_per_s": round(n * kfs_per_msg / dt, 1),
        "ingest_mps_per_s": round(n * mps_per_msg / dt, 1),
        "ingest_ms_per_msg": round(1000.0 * dt / n, 2),
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(measure())
