"""Wire codec round-trip + envelope parity (cslam_msgs byte-level schema).

The reference ships quantized messages (cslam_msgs/msg/KF.msg — u16 ids,
u8-quantized keypoint fields, 32-byte descriptors).  `runtime/wire.py` must
(a) round-trip MapMsg content losslessly up to its documented quantization,
and (b) land at-or-below the reference envelope for the same payload."""

import numpy as np
import jax.numpy as jnp
import pytest

from ccm_slam_tpu.io.synthetic import (
    agent_corridor, agent_gauge, build_agent_map, make_world,
)
from ccm_slam_tpu.runtime import communicator as comm
from ccm_slam_tpu.runtime import wire


@pytest.fixture(scope="module")
def full_msg():
    world, wdesc = make_world(np.random.RandomState(3), n=260)
    m = build_agent_map(world, wdesc, agent_corridor(0, n_kfs=4),
                        agent_gauge(0), kf_id_base=0, client_id=0)
    st = comm.ClientCommState.create(m.kfs.capacity, m.mps.capacity)
    msg, st = comm.publish_client(m, st, 0, max_kfs=4, max_mps=400,
                                  current_kf_id=3)
    msg.ack_kf_ids = np.array([7, 9], np.int64)
    msg.weak_ack_mp_id = 123
    return msg


class TestRoundTrip:
    def test_kf_fields(self, full_msg):
        data = wire.pack_map_msg(full_msg)
        out = wire.unpack_map_msg(data)
        a, b = full_msg.kfs, out.kfs
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.kf_id), np.asarray(b.kf_id))
        sel = np.where(np.asarray(a.valid))[0]
        # quaternion round trip: rotations equal to float precision
        for f in ("R_cpred", "R_cpar"):
            err = np.abs(np.asarray(getattr(a, f))[sel]
                         - np.asarray(getattr(b, f))[sel]).max()
            assert err < 1e-5, (f, err)
        np.testing.assert_allclose(
            np.asarray(a.t_cpred)[sel], np.asarray(b.t_cpred)[sel], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(a.pred_kf_id)[sel], np.asarray(b.pred_kf_id)[sel]
        )
        fv = np.asarray(a.feat_valid)[sel]
        np.testing.assert_array_equal(fv, np.asarray(b.feat_valid)[sel])
        np.testing.assert_array_equal(
            np.asarray(a.desc)[sel][fv], np.asarray(b.desc)[sel][fv]
        )
        np.testing.assert_allclose(
            np.asarray(a.xy)[sel][fv], np.asarray(b.xy)[sel][fv], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(a.mp_assoc_id)[sel][fv],
            np.asarray(b.mp_assoc_id)[sel][fv],
        )
        # angle quantization: u8 -> 2pi/256 resolution
        da = np.abs((np.asarray(a.angle)[sel][fv] - np.asarray(b.angle)[sel][fv]
                     + np.pi) % (2 * np.pi) - np.pi)
        assert da.max() <= (2 * np.pi / 256) * 0.51 + 1e-6

    def test_mp_fields(self, full_msg):
        out = wire.unpack_map_msg(wire.pack_map_msg(full_msg))
        a, b = full_msg.mps, out.mps
        sel = np.where(np.asarray(a.valid))[0]
        assert len(sel) > 0
        np.testing.assert_array_equal(np.asarray(a.mp_id), np.asarray(b.mp_id))
        np.testing.assert_allclose(
            np.asarray(a.pos_ref)[sel], np.asarray(b.pos_ref)[sel], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(a.desc)[sel], np.asarray(b.desc)[sel]
        )
        # normals quantized to i8 unit vectors: < 1 degree
        na = np.asarray(a.normal_ref)[sel]
        na = na / np.clip(np.linalg.norm(na, axis=-1, keepdims=True), 1e-9, None)
        nb = np.asarray(b.normal_ref)[sel]
        dots = np.clip(np.sum(na * nb, -1), -1, 1)
        assert np.degrees(np.arccos(dots)).max() < 1.0
        ov = np.asarray(a.obs_valid)[sel]
        np.testing.assert_array_equal(
            np.asarray(a.obs_kf_id)[sel][ov], np.asarray(b.obs_kf_id)[sel][ov]
        )
        np.testing.assert_array_equal(
            np.asarray(a.obs_feat)[sel][ov], np.asarray(b.obs_feat)[sel][ov]
        )

    def test_scalars(self, full_msg):
        out = wire.unpack_map_msg(wire.pack_map_msg(full_msg))
        assert out.closest_kf_id == full_msg.closest_kf_id
        assert out.weak_ack_mp_id == 123
        np.testing.assert_array_equal(out.ack_kf_ids, full_msg.ack_kf_ids)

    def test_smaller_than_pickle(self, full_msg):
        import pickle
        import jax

        packed = wire.pack_map_msg(full_msg)
        np_tree = jax.tree.map(lambda x: np.asarray(x), full_msg)
        raw = pickle.dumps(np_tree, protocol=pickle.HIGHEST_PROTOCOL)
        assert len(packed) < 0.6 * len(raw), (len(packed), len(raw))

    def test_ingest_accepts_unpacked(self, full_msg):
        """The jitted server ingest must accept a codec round-tripped
        message exactly like the original (same shapes, same ids)."""
        from ccm_slam_tpu.config import SystemConfig, CapacityConfig
        from ccm_slam_tpu.ops import bow
        from ccm_slam_tpu.runtime.server import Server
        from ccm_slam_tpu.utils.camera import Camera
        from ccm_slam_tpu.config import CameraConfig
        import jax

        out = wire.unpack_map_msg(wire.pack_map_msg(full_msg))
        cfg = SystemConfig(capacity=CapacityConfig(
            max_keypoints=int(np.asarray(full_msg.kfs.xy).shape[1]),
            client_max_kfs=16, client_max_mps=1024,
            server_max_kfs=64, server_max_mps=4096, max_obs_per_mp=8,
        ))
        cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
        world, wdesc = make_world(np.random.RandomState(3), n=260)
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(0), jnp.asarray(wdesc),
            jnp.ones(len(wdesc), bool), n_words=64, iters=3,
        )
        server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=1)
        ack = server.ingest(0, out)
        assert len(server.agents[0].kf_table) == 4
        assert len(np.asarray(ack.ack_kf_ids)) == 4
