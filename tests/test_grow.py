"""Server arena growth: the reference's server map is unbounded (std::map);
fixed TPU arenas must re-allocate near the high-water mark WITHOUT
invalidating any arena index held elsewhere (agent id tables, finder db,
the shared cross-map matcher db)."""

import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.config import CameraConfig, CapacityConfig, PlaceRecConfig, SystemConfig
from ccm_slam_tpu.models import keyframe_db as kdb
from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.ops import bow
from ccm_slam_tpu.runtime import communicator as comm
from ccm_slam_tpu.runtime.server import Server
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import Sim3
from ccm_slam_tpu.io.synthetic import N_FEAT, build_agent_map, make_world


class TestGrowMap:
    def test_grow_preserves_content_and_indices(self):
        rng = np.random.RandomState(0)
        world, wdesc = make_world(rng, n=120)
        m = build_agent_map(world, wdesc, [0.0, 1.0], Sim3.identity())
        K0, M0 = m.kfs.capacity, m.mps.capacity
        g = ms.grow_map(m, K0 * 2, M0 * 2)
        assert g.kfs.capacity == 2 * K0 and g.mps.capacity == 2 * M0
        for name in ("kf_id", "valid", "t_cw", "mp_idx"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g.kfs, name))[:K0], np.asarray(getattr(m.kfs, name))
            )
        for name in ("mp_id", "pos", "obs_kf", "valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g.mps, name))[:M0], np.asarray(getattr(m.mps, name))
            )
        # new rows look like empty_map rows
        assert not bool(jnp.any(g.kfs.valid[K0:]))
        assert bool(jnp.all(g.mps.obs_kf[M0:] == ms.NO_KF))
        assert int(g.next_kf) == int(m.next_kf)
        # covisibility unchanged on the old block
        W_old = np.asarray(ms.covisibility_matrix(m))
        W_new = np.asarray(ms.covisibility_matrix(g))
        np.testing.assert_array_equal(W_new[:K0, :K0], W_old)
        assert W_new[K0:].sum() == 0

    def test_db_grow_and_regrid(self):
        db = kdb.empty_db(8, 16)
        v = jnp.ones(16) / 16.0
        db = kdb.add(db, 3, v, 1)
        g = kdb.grow(db, 16)
        assert g.capacity == 16 and bool(g.valid[3]) and int(g.map_id[3]) == 1
        # regrid: 2 slots, stride 8 -> 20
        db2 = kdb.empty_db(16, 16)
        db2 = kdb.add(db2, 3, v, 0)        # slot 0, idx 3
        db2 = kdb.add(db2, 8 + 5, v, 1)    # slot 1, idx 5
        r = kdb.regrid(db2, 8, 20, 2)
        assert r.capacity == 40
        assert bool(r.valid[3]) and int(r.map_id[3]) == 0
        assert bool(r.valid[20 + 5]) and int(r.map_id[25]) == 1
        assert int(r.valid.sum()) == 2


class TestServerAutoGrow:
    def test_ingest_beyond_initial_capacity(self):
        """Stream 12 keyframes into a server whose arena starts at 8: the
        server must auto-grow and ingest everything, with loop/matcher
        bookkeeping still consistent."""
        rng = np.random.RandomState(2)
        world, wdesc = make_world(rng, n=300)
        cfg = SystemConfig(
            capacity=CapacityConfig(
                max_keypoints=N_FEAT,
                client_max_kfs=16, client_max_mps=1024,
                server_max_kfs=8, server_max_mps=512,
                max_obs_per_mp=8,
            ),
            placerec=PlaceRecConfig(start_map_matching_after_kf=10**9),
        )
        cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
            n_words=64, iters=4,
        )
        xs = [0.1 * i for i in range(12)]
        m_cl = build_agent_map(world, wdesc, xs, Sim3.identity(), client_id=0)
        server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=1)
        st = comm.ClientCommState.create(16, m_cl.mps.capacity)
        for _ in range(10):
            msg, st = comm.publish_client(m_cl, st, 0, max_kfs=3, max_mps=300)
            if msg.empty:
                break
            ack = server.ingest(0, msg)
            st = comm.apply_server_acks(st, m_cl, ack)
        ag = server.agents[0]
        m_srv = server.maps[ag.map_slot]
        assert m_srv.kfs.capacity >= 16            # grew past 8
        assert set(ag.kf_table.keys()) == set(range(12))
        alive = np.asarray(m_srv.kfs.valid & ~m_srv.kfs.bad)
        assert alive.sum() == 12
        # arena indices in the table still point at the right keyframes
        ids = np.asarray(m_srv.kfs.kf_id)
        for kf_id, arena in ag.kf_table.items():
            assert ids[arena] == kf_id
        # finder db rows align with arena indices
        dbv = np.asarray(server.finders[ag.map_slot].db.valid)
        for arena in ag.kf_table.values():
            assert dbv[arena]
        # matcher stride regridded consistently
        assert server.matcher.kf_capacity == m_srv.kfs.capacity
        assert int(np.asarray(server.matcher.db.valid).sum()) == 12
