"""Four-agent centralized run (BASELINE config 4 in miniature): four corridor
segments with pairwise overlaps must chain-merge into a single map with every
agent's gauge resolved."""

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
from ccm_slam_tpu.utils.lie import Sim3, so3_exp
from tests.test_map_matching import N_FEAT, build_agent_map, make_world


@pytest.fixture(scope="module")
def four_agent_run():
    rng = np.random.RandomState(4)
    world, wdesc = make_world(rng, n=420)
    # stretch the corridor: landmarks over x in [-2, 10]
    world[:, 0] = rng.uniform(-2, 10, len(world))
    cfg = SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=N_FEAT, client_max_kfs=16, client_max_mps=1024,
            server_max_kfs=64, server_max_mps=4096, max_obs_per_mp=8,
        ),
        placerec=PlaceRecConfig(start_map_matching_after_kf=0),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    vocab = bow.train_vocabulary(
        jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
        n_words=384, iters=6,
    )

    # 4 agents, overlapping segments, distinct gauges
    gauges = [
        Sim3.identity(),
        Sim3(s=jnp.float32(1.3), R=so3_exp(jnp.array([0.0, 0.0, 0.03])), t=jnp.array([0.2, 0.0, -0.1])),
        Sim3(s=jnp.float32(0.8), R=so3_exp(jnp.array([0.0, 0.0, -0.05])), t=jnp.array([-0.3, 0.1, 0.2])),
        Sim3(s=jnp.float32(1.15), R=so3_exp(jnp.array([0.0, 0.0, 0.02])), t=jnp.array([0.1, -0.2, 0.0])),
    ]
    segments = [
        [0.0, 1.0, 2.0],
        [2.0, 3.0, 4.0],
        [4.0, 5.0, 6.0],
        [6.0, 7.0, 8.0],
    ]
    client_maps = [
        build_agent_map(world, wdesc, seg, g, kf_id_base=0, client_id=i)
        for i, (seg, g) in enumerate(zip(segments, gauges))
    ]

    server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=4)
    states = [comm.ClientCommState.create(16, 1024) for _ in range(4)]
    n_merges = 0
    for cycle in range(10):
        for agent in range(4):
            msg, states[agent] = comm.publish_client(
                client_maps[agent], states[agent], agent, max_kfs=1, max_mps=400
            )
            if msg.empty:
                continue
            new_ids = [
                int(k) for k, v in zip(np.asarray(msg.kfs.kf_id), np.asarray(msg.kfs.valid)) if v
            ]
            ack = server.ingest(agent, msg)
            states[agent] = comm.apply_server_acks(states[agent], client_maps[agent], ack)
            ag = server.agents[agent]
            for kf_id in new_ids:
                if kf_id in ag.kf_table:
                    _, merged = server.mapping_step(agent, ag.kf_table[kf_id])
                    n_merges += int(merged)
        server.idle_step()
    return server, n_merges


class TestFourAgents:
    def test_all_merged_to_one(self, four_agent_run):
        server, n_merges = four_agent_run
        assert n_merges == 3, n_merges
        assert len(server.maps) == 1
        slots = {ag.map_slot for ag in server.agents.values()}
        assert len(slots) == 1

    def test_chained_gauges_consistent(self, four_agent_run):
        """Every agent's keyframes must land near their true world positions
        (one shared gauge after chained merges)."""
        server, _ = four_agent_run
        slot = next(iter(server.maps))
        m = server.maps[slot]
        centers = np.asarray(m.kfs.center())
        ids = np.asarray(m.kfs.kf_id)
        clients = np.asarray(m.kfs.client_id)
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        segments = [[0.0, 1.0, 2.0], [2.0, 3.0, 4.0], [4.0, 5.0, 6.0], [6.0, 7.0, 8.0]]
        # the final gauge equals one surviving agent's; express all positions
        # relative to agent 0's first two keyframes to fix scale
        ref = centers[np.where(alive & (clients == 0) & (ids == 0))[0][0]]
        ref2 = centers[np.where(alive & (clients == 0) & (ids == 1))[0][0]]
        unit = np.linalg.norm(ref2 - ref)  # = 1.0 world units in final gauge
        assert unit > 1e-3
        for c, seg in enumerate(segments):
            for kf_id, x_true in enumerate(seg):
                hit = np.where(alive & (clients == c) & (ids == kf_id))[0]
                assert len(hit) == 1, (c, kf_id)
                got = np.linalg.norm(centers[hit[0]] - ref) / unit
                assert abs(got - x_true) < 0.25, (c, kf_id, got, x_true)

    def test_trajectories_exported_per_agent(self, four_agent_run):
        server, _ = four_agent_run
        for a in range(4):
            ts, R, t = server.trajectory(a)
            assert len(ts) == 3
