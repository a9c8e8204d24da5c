"""Two-agent centralized run: clients stream keyframes/landmarks through the
delta/ack communicator, the server ingests into per-agent maps, detects the
cross-map overlap, merges, and runs GBA — BASELINE config 3 in miniature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import CameraConfig, CapacityConfig, PlaceRecConfig, SystemConfig
from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.ops import bow
from ccm_slam_tpu.runtime import communicator as comm
from ccm_slam_tpu.runtime.server import Server
from ccm_slam_tpu.utils.camera import Camera
from ccm_slam_tpu.utils.lie import SE3, Sim3, so3_exp
from tests.test_map_matching import FX, FY, CX, CY, N_FEAT, build_agent_map, make_world


@pytest.fixture(scope="module")
def collab_run():
    rng = np.random.RandomState(2)
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

    # client maps in different monocular gauges
    gauge0 = Sim3.identity()
    gauge1 = Sim3(
        s=jnp.float32(1.4), R=so3_exp(jnp.array([0.0, 0.0, -0.04])), t=jnp.array([0.3, 0.1, -0.2])
    )
    xs0 = [0.0, 1.0, 2.0, 3.0]
    xs1 = [5.0, 4.0, 3.0, 2.0]
    m0 = build_agent_map(world, wdesc, xs0, gauge0, kf_id_base=0, client_id=0)
    m1 = build_agent_map(world, wdesc, xs1, gauge1, kf_id_base=0, client_id=1)

    server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=2)
    st0 = comm.ClientCommState.create(16, 1024)
    st1 = comm.ClientCommState.create(16, 1024)

    merged = False
    events = []
    # clients stream in lockstep: small per-cycle budgets force several rounds
    for cycle in range(8):
        for agent, (m_cl, st) in enumerate([(m0, st0), (m1, st1)]):
            msg, st = comm.publish_client(m_cl, st, agent, max_kfs=2, max_mps=400)
            if agent == 0:
                st0 = st
            else:
                st1 = st
            if msg.empty:
                continue
            new_ids = [int(i) for i, v in zip(np.asarray(msg.kfs.kf_id), np.asarray(msg.kfs.valid)) if v]
            ack = server.ingest(agent, msg)
            st = comm.apply_server_acks(st, m_cl, ack)
            if agent == 0:
                st0 = st
            else:
                st1 = st
            # server mapping step per newly added keyframe
            ag = server.agents[agent]
            for kf_id in new_ids:
                if kf_id in ag.kf_table:
                    closed, did_merge = server.mapping_step(agent, ag.kf_table[kf_id])
                    merged = merged or did_merge
                    if did_merge:
                        events.append(("merge", cycle, agent, kf_id))
        server.idle_step()
    # quiescence: drive idle steps to trigger the final GBA
    for _ in range(server.quiescence_steps + 2):
        server.idle_step()
    return server, merged, st0, st1, world, events


class TestCollaborative:
    def test_maps_merged(self, collab_run):
        server, merged, *_ = collab_run
        assert merged
        assert len(server.maps) == 1

    def test_agents_share_map(self, collab_run):
        server, *_ = collab_run
        slots = {ag.map_slot for ag in server.agents.values()}
        assert len(slots) == 1

    def test_acks_flow(self, collab_run):
        server, merged, st0, st1, *_ = collab_run
        assert st0.kf_acked[:4].all()
        assert st1.kf_acked[:4].all()
        assert (st0.mp_sent >= 0).sum() > 50

    def test_merged_trajectory_accuracy(self, collab_run):
        server, merged, st0, st1, world, events = collab_run
        # both agents' keyframes in one gauge: compare to true positions
        xs_true = {0: [0.0, 1.0, 2.0, 3.0], 1: [5.0, 4.0, 3.0, 2.0]}
        slot = server.agents[0].map_slot
        m = server.maps[slot]
        centers = np.asarray(m.kfs.center())
        ids = np.asarray(m.kfs.kf_id)
        clients = np.asarray(m.kfs.client_id)
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        # the merged gauge equals agent-?'s target-map gauge; both agents'
        # keyframes must be mutually consistent: check pairwise distances of
        # co-located keyframes (agent0 kf at x=2,3 vs agent1 kf at x=2,3)
        def center_of(client, kf_id):
            hit = np.where(alive & (clients == client) & (ids == kf_id))[0]
            assert len(hit) == 1, (client, kf_id, hit)
            return centers[hit[0]]

        a0_x2 = center_of(0, 2)
        a1_x2 = center_of(1, 3)  # agent1's 4th KF is at x=2
        a0_x3 = center_of(0, 3)
        a1_x3 = center_of(1, 2)  # agent1's 3rd KF is at x=3
        assert np.linalg.norm(a0_x2 - a1_x2) < 0.15, (a0_x2, a1_x2)
        assert np.linalg.norm(a0_x3 - a1_x3) < 0.15, (a0_x3, a1_x3)

    def test_gauge_bookkeeping(self, collab_run):
        """S_map_client of the absorbed agent reflects the merge Sim3."""
        server, *_ = collab_run
        s0 = float(server.agents[0].S_map_client.s)
        s1 = float(server.agents[1].S_map_client.s)
        # exactly one agent kept the identity gauge
        assert (abs(s0 - 1.0) < 1e-5) != (abs(s1 - 1.0) < 1e-5)


class TestVicinityFeedback:
    def test_pack_and_ingest(self, collab_run):
        """Server->client vicinity: foreign keyframes/landmarks enter the
        client map in the client's gauge and are never re-sent."""
        import copy

        from ccm_slam_tpu.runtime import communicator as comm

        server, merged, st0, st1, world, events = collab_run
        msg = server.pack_vicinity(0, max_kfs=3, max_mps=200)
        assert msg.kfs is not None and bool(jnp.any(msg.kfs.valid))
        # fresh client map for agent 0 to ingest into
        from tests.test_map_matching import build_agent_map
        rng2 = np.random.RandomState(5)
        from tests.test_map_matching import make_world as mw
        w2, d2 = mw(rng2, n=50)
        m_cl = build_agent_map(w2, d2, [0.0], Sim3.identity(), kf_id_base=90, client_id=0)
        fk, fm = {}, {}
        n_kf_before = int(jnp.sum(m_cl.kfs.valid))
        m_cl2 = comm.ingest_server_map(m_cl, msg, own_client_id=0, foreign_kf_table=fk, foreign_mp_table=fm)
        n_kf_after = int(jnp.sum(m_cl2.kfs.valid))
        assert n_kf_after > n_kf_before
        assert len(fk) >= 1
        # publish from the client must NOT include foreign entities
        st = comm.ClientCommState.create(16, 1024)
        out, st = comm.publish_client(m_cl2, st, 0, max_kfs=16, max_mps=100)
        sent_ids = set(
            int(i) for i, v in zip(np.asarray(out.kfs.kf_id), np.asarray(out.kfs.valid)) if v
        )
        foreign_ids = {kf_id for (_, kf_id) in fk}
        own_sent = {90}
        assert own_sent <= sent_ids
        # any overlap with foreign ids must come from own entities only
        clients = np.asarray(m_cl2.kfs.client_id)
        for i, v in zip(range(len(np.asarray(out.kfs.valid))), np.asarray(out.kfs.valid)):
            if v:
                pass  # ids alone can collide; the client filter is on client_id
        # direct check: selection mask never picked foreign rows
        own_rows = np.where((np.asarray(m_cl2.kfs.valid)) & (clients == 0))[0]
        assert len(sent_ids) == len(own_rows)

    def test_disabled_by_default(self, collab_run):
        server, *_ = collab_run
        msg = server.pack_vicinity(0)  # KfsToClient defaults to 0
        assert msg.kfs is None


class TestServerKfCulling:
    def test_redundant_kf_culled(self):
        """A keyframe whose landmarks are all seen 3+ times elsewhere gets
        culled; non-redundant ones survive."""
        from ccm_slam_tpu.runtime import mapping as mapping_mod
        from tests.test_map_store import add_kf, add_mps, fresh

        cfg = SystemConfig()
        m = fresh()
        m, _ = add_mps(m, 6)
        a = jnp.full((16,), -1, jnp.int32)
        # 5 keyframes all observing the same 4 landmarks -> middle ones redundant
        for i in range(5):
            m, _ = add_kf(m, i, mp_assoc=a.at[0].set(0).at[1].set(1).at[2].set(2).at[3].set(3))
        ratio = mapping_mod.keyframe_redundancy(m, cfg)
        # every KF's landmarks are observed by 4 others -> ratio 1.0
        np.testing.assert_allclose(np.asarray(ratio[:5]), np.ones(5), atol=1e-6)
        m2, n = mapping_mod.cull_redundant_keyframes(m, cfg, protect_recent=2)
        # 2 newest protected + 2 oldest anchors -> exactly 1 culled
        assert int(n) == 1


class TestMapStructure:
    def test_final_merged_map_structure(self, collab_run):
        """Deep structural validation of the end-state fused map — the
        reference's Map::CheckStructure (DEBUGGING2) as a test gate."""
        server, *_ = collab_run
        slot = server.agents[0].map_slot
        errs = ms.check_structure(server.maps[slot])
        assert errs == [], errs[:10]
