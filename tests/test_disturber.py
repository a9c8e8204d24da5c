"""Communication under network degradation: the reference's Disturber harness
(cslam/launch/Server.launch:8-10) made real — the 2-agent centralized run is
driven through seeded lossy channels (drop + delay/reorder + duplicate, both
directions) and must converge to the same synchronized state as the clean
run, via the ack / weak-ack / resend machinery (SURVEY §5.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import CameraConfig, CapacityConfig, PlaceRecConfig, SystemConfig
from ccm_slam_tpu.ops import bow
from ccm_slam_tpu.runtime import communicator as comm
from ccm_slam_tpu.runtime.disturber import DisturbedChannel, make_duplex
from ccm_slam_tpu.runtime.server import Server
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import Sim3, so3_exp
from tests.test_map_matching import N_FEAT, build_agent_map, make_world


def _setup(seed=2):
    rng = np.random.RandomState(seed)
    world, wdesc = make_world(rng, n=300)
    cfg = SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=N_FEAT,
            client_max_kfs=16,
            client_max_mps=1024,
            server_max_kfs=32,
            server_max_mps=2048,
            max_obs_per_mp=8,
        ),
        placerec=PlaceRecConfig(start_map_matching_after_kf=0),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    vocab = bow.train_vocabulary(
        jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
        n_words=256, iters=6,
    )
    gauge1 = Sim3(
        s=jnp.float32(1.4), R=so3_exp(jnp.array([0.0, 0.0, -0.04])),
        t=jnp.array([0.3, 0.1, -0.2]),
    )
    m0 = build_agent_map(world, wdesc, [0.0, 1.0, 2.0, 3.0], Sim3.identity(),
                         kf_id_base=0, client_id=0)
    m1 = build_agent_map(world, wdesc, [5.0, 4.0, 3.0, 2.0], gauge1,
                         kf_id_base=0, client_id=1)
    server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=2)
    return server, [m0, m1]


def _run_through_channels(server, maps, channels, n_cycles, max_kfs=2, max_mps=400):
    """Drive both agents through (uplink, downlink) channel pairs.

    Each cycle: publish -> uplink; drain uplink -> ingest -> ack -> downlink;
    drain downlink -> apply acks.  Returns the final comm states."""
    states = [comm.ClientCommState.create(16, 1024) for _ in maps]
    merged = False
    for _ in range(n_cycles):
        for agent, m_cl in enumerate(maps):
            up, down = channels[agent]
            msg, states[agent] = comm.publish_client(
                m_cl, states[agent], agent, max_kfs=max_kfs, max_mps=max_mps
            )
            if not msg.empty:
                up.send(msg)
            for rx in up.deliver():
                new_ids = [
                    int(i) for i, v in zip(np.asarray(rx.kfs.kf_id), np.asarray(rx.kfs.valid)) if v
                ]
                ack = server.ingest(agent, rx)
                down.send(ack)
                ag = server.agents[agent]
                for kf_id in new_ids:
                    if kf_id in ag.kf_table:
                        _, did_merge = server.mapping_step(agent, ag.kf_table[kf_id])
                        merged = merged or did_merge
            for rx in down.deliver():
                states[agent] = comm.apply_server_acks(states[agent], m_cl, rx)
        server.idle_step()
    return states, merged


def _assert_synchronized(server, maps, states):
    """Server holds every alive client entity exactly once; client send state
    has everything sent+acked (=> trimmable)."""
    for agent, m_cl in enumerate(maps):
        ag = server.agents[agent]
        m_srv = server.maps[ag.map_slot]
        alive = np.asarray(m_cl.kfs.valid & ~m_cl.kfs.bad)
        own_ids = set(np.asarray(m_cl.kfs.kf_id)[alive].tolist())
        assert own_ids <= set(ag.kf_table.keys()), (agent, own_ids, ag.kf_table)
        # no duplicate arena entries (idempotent receive)
        srv_ids = np.asarray(m_srv.kfs.kf_id)
        srv_alive = np.asarray(m_srv.kfs.valid & ~m_srv.kfs.bad)
        srv_clients = np.asarray(m_srv.kfs.client_id)
        for kf_id in own_ids:
            hits = np.where(srv_alive & (srv_clients == agent) & (srv_ids == kf_id))[0]
            assert len(hits) == 1, (agent, kf_id, hits)
        st = states[agent]
        kf_rows = np.where(alive)[0]
        assert st.kf_acked[kf_rows].all(), (agent, st.kf_acked[kf_rows])
        assert np.asarray(comm.trimmable_mask(m_cl, st))[kf_rows].all()
        # landmarks: every alive own landmark acked
        mp_alive = np.where(np.asarray(m_cl.mps.valid & ~m_cl.mps.bad))[0]
        assert st.mp_acked[mp_alive].all(), (agent, int((~st.mp_acked[mp_alive]).sum()))


class TestLossyUplink:
    def test_drops_recovered_by_resend(self):
        """30% uplink drop: resend-after-timeout must deliver everything."""
        server, maps = _setup()
        channels = [make_duplex(seed=10 + a, p_drop=0.3) for a in range(2)]
        states, merged = _run_through_channels(server, maps, channels, n_cycles=10)
        for up, _ in channels:
            up.heal()
        states2, merged2 = _run_through_channels(server, maps, channels, n_cycles=14)
        # NOTE: fresh states in the second run re-send everything; idempotent
        # ingest must absorb that. Faults were active in run 1 only.
        _assert_synchronized(server, maps, states2)
        assert merged or merged2
        assert sum(up.stats.dropped for up, _ in channels) > 0

    def test_single_run_with_faults_then_heal(self):
        """One continuous run where the network heals midway (no state reset):
        the SAME comm state machine must finish the sync."""
        server, maps = _setup(seed=3)
        channels = [make_duplex(seed=20 + a, p_drop=0.35, max_delay=2) for a in range(2)]
        states = [comm.ClientCommState.create(16, 1024) for _ in maps]
        merged = False
        for cycle in range(26):
            if cycle == 12:
                for up, down in channels:
                    up.heal()
                    down.heal()
            for agent, m_cl in enumerate(maps):
                up, down = channels[agent]
                msg, states[agent] = comm.publish_client(
                    m_cl, states[agent], agent, max_kfs=2, max_mps=400
                )
                if not msg.empty:
                    up.send(msg)
                for rx in up.deliver():
                    new_ids = [
                        int(i) for i, v in zip(np.asarray(rx.kfs.kf_id), np.asarray(rx.kfs.valid)) if v
                    ]
                    ack = server.ingest(agent, rx)
                    down.send(ack)
                    ag = server.agents[agent]
                    for kf_id in new_ids:
                        if kf_id in ag.kf_table:
                            _, dm = server.mapping_step(agent, ag.kf_table[kf_id])
                            merged = merged or dm
                for rx in down.deliver():
                    states[agent] = comm.apply_server_acks(states[agent], m_cl, rx)
            server.idle_step()
        _assert_synchronized(server, maps, states)
        assert merged


class TestReorderDuplicate:
    def test_delay_reorder_and_duplicates(self):
        """Delayed (reordered) and duplicated messages: pending-predecessor
        buffering + idempotent receive keep the server map exact."""
        server, maps = _setup(seed=4)
        channels = [
            make_duplex(seed=30 + a, p_drop=0.1, p_dup=0.3, max_delay=3)
            for a in range(2)
        ]
        states, merged = _run_through_channels(server, maps, channels, n_cycles=12)
        for up, down in channels:
            up.heal(); down.heal()
        states, merged2 = _run_through_channels(server, maps, channels, n_cycles=14)
        _assert_synchronized(server, maps, states)
        assert sum(up.stats.duplicated for up, _ in channels) > 0

    def test_out_of_order_predecessor_buffered(self):
        """Force KF k to arrive before its predecessor k-1: the server must
        buffer it (pending), weak-ack, and integrate it once k-1 lands —
        with the correct chained absolute pose."""
        server, maps = _setup(seed=5)
        m0 = maps[0]
        st = comm.ClientCommState.create(16, 1024)
        # publish all 4 KFs in one message, then split and deliver reversed
        msg, st = comm.publish_client(m0, st, 0, max_kfs=4, max_mps=0)
        items = [jax.tree.map(lambda x: x[i : i + 1], msg.kfs) for i in range(4)]
        import dataclasses

        def one(i):
            return dataclasses.replace(msg, kfs=items[i])

        acks = [server.ingest(0, one(i)) for i in (2, 3)]  # preds 1,2 missing
        assert all(a.weak_ack_kf_id >= -1 for a in acks)
        ag = server.agents[0]
        assert int(jnp.sum(ag.pending_kfb.valid)) == 2
        assert 2 not in ag.kf_table and 3 not in ag.kf_table
        server.ingest(0, one(0))   # absolute root
        server.ingest(0, one(1))   # chain resolves pending 2 and 3 in order
        assert set(ag.kf_table.keys()) == {0, 1, 2, 3}
        m_srv = server.maps[ag.map_slot]
        centers = np.asarray(m_srv.kfs.center())
        for kf_id, x in zip(range(4), [0.0, 1.0, 2.0, 3.0]):
            c = centers[ag.kf_table[kf_id]]
            assert np.allclose(c, [x, 0.0, 0.0], atol=1e-3), (kf_id, c)


class TestParentFallback:
    def test_predecessor_never_arrives_parent_resolves(self):
        """The wire's parent-reference alternative (KF.msg:32 mTcpar,
        chain-walk KeyFrame.cpp:1857-1948): when a keyframe's predecessor is
        dropped PERMANENTLY, the server must still integrate it through the
        spanning-tree parent reference instead of buffering it forever."""
        import dataclasses

        server, maps = _setup(seed=7)
        m0 = maps[0]
        st = comm.ClientCommState.create(16, 1024)
        msg, st = comm.publish_client(m0, st, 0, max_kfs=4, max_mps=0)
        items = [jax.tree.map(lambda x: x[i : i + 1], msg.kfs) for i in range(4)]

        def one(i, par_override=None):
            kfb = items[i]
            if par_override is not None:
                # force the parent reference (relative pose recomputed)
                from ccm_slam_tpu.utils.lie import SE3
                k = int(np.where(np.asarray(m0.kfs.kf_id) == i)[0][0])
                p = int(np.where(np.asarray(m0.kfs.kf_id) == par_override)[0][0])
                T_k = SE3(R=m0.kfs.R_cw[k], t=m0.kfs.t_cw[k])
                T_p = SE3(R=m0.kfs.R_cw[p], t=m0.kfs.t_cw[p])
                T_rel = T_k.compose(T_p.inverse())
                kfb = kfb.replace(
                    par_kf_id=jnp.asarray([par_override], jnp.int32),
                    R_cpar=T_rel.R[None], t_cpar=T_rel.t[None],
                )
            return dataclasses.replace(msg, kfs=kfb)

        server.ingest(0, one(0))            # root arrives
        # KF 1 is LOST FOREVER; KF 2 arrives with pred=1 (missing) but
        # parent=0 (present): must integrate through the parent
        ack = server.ingest(0, one(2, par_override=0))
        ag = server.agents[0]
        assert 2 in ag.kf_table, "parent fallback did not integrate KF 2"
        assert 2 in set(int(a) for a in ack.ack_kf_ids)
        # KF 3 chains through KF 2 by predecessor as usual
        server.ingest(0, one(3))
        assert 3 in ag.kf_table
        m_srv = server.maps[ag.map_slot]
        centers = np.asarray(m_srv.kfs.center())
        for kf_id, x in [(0, 0.0), (2, 2.0), (3, 3.0)]:
            c = centers[ag.kf_table[kf_id]]
            assert np.allclose(c, [x, 0.0, 0.0], atol=1e-3), (kf_id, c)


class TestAckLoss:
    def test_ack_loss_triggers_full_resend_and_reack(self):
        """Downlink (ack) loss: the client re-sends full, the server re-acks
        (duplicate receive is idempotent: same arena row, pose updated)."""
        server, maps = _setup(seed=6)
        m0 = maps[0]
        st = comm.ClientCommState.create(16, 1024)
        st.resend_after = 2
        # cycle 1: send everything, ack LOST
        msg, st = comm.publish_client(m0, st, 0, max_kfs=4, max_mps=1024)
        server.ingest(0, msg)
        rows_before = dict(server.agents[0].kf_table)
        # cycles 2..: client notices no ack and re-sends full after timeout
        resent = False
        for _ in range(4):
            msg, st = comm.publish_client(m0, st, 0, max_kfs=4, max_mps=1024)
            if bool(np.asarray(msg.kfs.valid).any()):
                assert bool(np.asarray(msg.kfs.full)[np.asarray(msg.kfs.valid)].all())
                resent = True
                ack = server.ingest(0, msg)  # this ack gets through
                st = comm.apply_server_acks(st, m0, ack)
        assert resent
        assert server.agents[0].kf_table == rows_before  # no duplicates
        alive = np.where(np.asarray(m0.kfs.valid & ~m0.kfs.bad))[0]
        assert st.kf_acked[alive].all()


class TestChannelUnit:
    def test_deterministic_given_seed(self):
        a = DisturbedChannel(rng=np.random.RandomState(7), p_drop=0.5, max_delay=2)
        b = DisturbedChannel(rng=np.random.RandomState(7), p_drop=0.5, max_delay=2)
        got_a, got_b = [], []
        for i in range(40):
            a.send(i); b.send(i)
            got_a += a.deliver(); got_b += b.deliver()
        got_a += [m for _ in range(3) for m in a.deliver()]
        got_b += [m for _ in range(3) for m in b.deliver()]
        assert got_a == got_b
        assert a.stats.dropped == b.stats.dropped > 0

    def test_drop_rate_and_reorder(self):
        ch = DisturbedChannel(rng=np.random.RandomState(8), p_drop=0.25, max_delay=3)
        out = []
        for i in range(400):
            ch.send(i)
            out += ch.deliver()
        for _ in range(4):
            out += ch.deliver()
        assert ch.pending == 0
        assert 0.15 < ch.stats.dropped / ch.stats.sent < 0.35
        assert out != sorted(out)          # reordering happened
        assert len(set(out)) == len(out)   # no unintended duplicates
        assert len(out) == 400 - ch.stats.dropped
