"""Wire-envelope parity measurement (VERDICT r04 #9).

Builds a client map at the reference communication budget (40 full KFs +
2500 full MPs per message, conf/config.yaml:88-95), publishes one MapMsg,
and reports three sizes:

  * raw pickled pytree (what NativeChannel shipped before the codec);
  * `runtime/wire.py` packed bytes (quantized, padding-free);
  * the reference ROS envelope computed from the cslam_msgs schemas
    (KF.msg: 47 B/keypoint+descriptor + 7 B association + ~230 B fixed;
     MP.msg: ~90 B + 5 B/observation).

Usage: python benchmarks/wire_bench.py [--n-feat 1000]
Prints one JSON line.
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_envelope_bytes(n_kfs, feats_per_kf, n_mps, obs_per_mp):
    """Per-message bytes of the reference's ccmslam_msgs::Map at the same
    payload, from the .msg field widths (cslam_msgs/msg/*.msg)."""
    # CvKeyPoint.msg: 2*f32 + u8 + f32 + u8 + i8 = 15 B; Descriptor: 32 B
    kp = 15 + 32
    # KF.msg fixed part: ids/stamps/calib/poses/scale arrays/bounds/refs
    kf_fixed = (1 + 2 + 1 + 4 + 8 + 1 + 2 * 2 + 2 * 4 + 6 * 4 + 2
                + 16 * 4 * 3 + 1 + 1 + 1 + 4 + 4 + 3 * 8 * 4 + 4 * 2 + 9 * 4
                + 2 + 1 + 2 + 1 + 1)
    kf = kf_fixed + feats_per_kf * (kp + 4 + 1 + 2)  # + assoc id/client/vect
    # MP.msg: fixed ~ 1+4+1+4+2+1+1 + 3*4*2 +1+1 + 3*4 +1 + 32 + (2+1)*2 + 1 + 4*2 + 1
    mp_fixed = (1 + 4 + 1 + 4 + 2 + 1 + 1 + 24 + 1 + 1 + 12 + 1 + 32
                + 6 + 1 + 8 + 1)
    mp = mp_fixed + obs_per_mp * (2 + 1 + 2)
    return n_kfs * kf + n_mps * mp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-feat", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ccm_slam_tpu.io.synthetic import build_agent_map, make_world
    from ccm_slam_tpu.runtime import communicator as comm
    from ccm_slam_tpu.runtime import wire

    # a 40-KF corridor with the reference feature budget; MPs capped at 2500
    world, wdesc = make_world(np.random.RandomState(0), n=3000)
    xs = np.linspace(0.0, 12.0, 40).tolist()
    from ccm_slam_tpu.utils.lie import Sim3

    m = build_agent_map(world, wdesc, xs, Sim3.identity(), kf_id_base=0,
                        client_id=0, n_feat=args.n_feat,
                        kf_cap=48, mp_cap=4096)
    st = comm.ClientCommState.create(m.kfs.capacity, m.mps.capacity)
    msg, st = comm.publish_client(m, st, 0, max_kfs=40, max_mps=2500,
                                  current_kf_id=39)

    np_tree = jax.tree.map(lambda x: np.asarray(x), msg)
    raw = pickle.dumps(np_tree, protocol=pickle.HIGHEST_PROTOCOL)
    t0 = time.time()
    packed = wire.pack_map_msg(msg)
    t_pack = time.time() - t0
    t0 = time.time()
    out = wire.unpack_map_msg(packed)
    t_unpack = time.time() - t0

    kv = np.asarray(msg.kfs.valid)
    n_kfs = int(kv.sum())
    feats = int(np.asarray(msg.kfs.feat_valid)[kv].sum())
    mv = np.asarray(msg.mps.valid)
    n_mps = int(mv.sum())
    n_obs = int(np.asarray(msg.mps.obs_valid)[mv].sum())
    ref = reference_envelope_bytes(
        n_kfs, feats / max(n_kfs, 1), n_mps, n_obs / max(n_mps, 1)
    )
    print(json.dumps({
        "n_kfs": n_kfs, "feats_per_kf": round(feats / max(n_kfs, 1), 1),
        "n_mps": n_mps, "obs_per_mp": round(n_obs / max(n_mps, 1), 2),
        "pickled_bytes": len(raw),
        "packed_bytes": len(packed),
        "reference_envelope_bytes": int(ref),
        "packed_vs_reference": round(len(packed) / ref, 3),
        "packed_vs_pickle": round(len(packed) / len(raw), 3),
        "pack_ms": round(t_pack * 1e3, 1),
        "unpack_ms": round(t_unpack * 1e3, 1),
        "bandwidth_at_5hz_mbps": round(len(packed) * 5 * 8 / 1e6, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
