"""Eight-agent centralized run — BASELINE config 5's agent count end-to-end
(the stress bench covers the solver at this scale; this covers the RUNTIME:
8 delta/ack streams, 7 chained cross-map merges, gauge resolution for every
agent, interruptible+final GBA scheduling, arena auto-growth)."""

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
from ccm_slam_tpu.io.synthetic import N_FEAT, build_agent_map, make_world

N_AGENTS = 8


@pytest.fixture(scope="module")
def eight_agent_run():
    rng = np.random.RandomState(8)
    world, wdesc = make_world(rng, n=900)
    world[:, 0] = rng.uniform(-2, 18, len(world))  # corridor x in [-2, 18]
    cfg = SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=N_FEAT, client_max_kfs=16, client_max_mps=1024,
            server_max_kfs=256, server_max_mps=16384, max_obs_per_mp=8,
        ),
        placerec=PlaceRecConfig(start_map_matching_after_kf=0),
    )
    cam = Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))
    vocab = bow.train_vocabulary(
        jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
        n_words=384, iters=6,
    )

    rs = np.random.RandomState(100)
    gauges = [Sim3.identity()]
    for a in range(1, N_AGENTS):
        gauges.append(Sim3(
            s=jnp.float32(float(rs.uniform(0.8, 1.35))),
            R=so3_exp(jnp.asarray(rs.uniform(-0.04, 0.04, 3).astype(np.float32))),
            t=jnp.asarray(rs.uniform(-0.25, 0.25, 3).astype(np.float32)),
        ))
    # overlapping segments: agent a covers x = 2a .. 2a+2 (shared endpoint)
    segments = [[2.0 * a, 2.0 * a + 1.0, 2.0 * a + 2.0] for a in range(N_AGENTS)]
    client_maps = [
        build_agent_map(world, wdesc, seg, g, kf_id_base=0, client_id=i)
        for i, (seg, g) in enumerate(zip(segments, gauges))
    ]

    server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=N_AGENTS)
    states = [comm.ClientCommState.create(16, 1024) for _ in range(N_AGENTS)]
    n_merges = 0
    for cycle in range(10):
        for agent in range(N_AGENTS):
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


class TestEightAgents:
    def test_all_chained_into_one_map(self, eight_agent_run):
        server, n_merges = eight_agent_run
        assert n_merges >= N_AGENTS - 1
        assert len(server.maps) == 1
        assert len({a.map_slot for a in server.agents.values()}) == 1

    def test_every_agent_fully_ingested(self, eight_agent_run):
        server, _ = eight_agent_run
        for a in range(N_AGENTS):
            assert set(server.agents[a].kf_table.keys()) == {0, 1, 2}, a

    def test_global_gauge_consistency(self, eight_agent_run):
        """Every surviving keyframe must land on ONE global line at its true
        corridor coordinate (x = 2*agent + kf_id, up to the fused gauge's
        similarity) — this verifies all 7 chained gauge resolutions at once
        and tolerates redundancy-culled keyframes (co-located endpoint pairs
        legitimately lose one member to KeyFrameCullingV3)."""
        server, _ = eight_agent_run
        slot = server.agents[0].map_slot
        m = server.maps[slot]
        centers = np.asarray(m.kfs.center())
        ids = np.asarray(m.kfs.kf_id)
        clients = np.asarray(m.kfs.client_id)
        alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
        rows = np.where(alive)[0]
        x_true = 2.0 * clients[rows] + ids[rows]        # world corridor coord
        C3 = centers[rows]
        assert len(rows) >= 12
        # survivors must cover most agents (merges kept everyone represented)
        assert len(set(clients[rows].tolist())) >= N_AGENTS - 1
        # least-squares line fit: C ~ c0 + x * d
        X = np.stack([np.ones_like(x_true), x_true], 1)
        coef, *_ = np.linalg.lstsq(X, C3, rcond=None)
        resid = C3 - X @ coef
        unit = np.linalg.norm(coef[1]) + 1e-9           # fused-gauge meter
        worst = np.linalg.norm(resid, axis=1).max()
        assert worst < 0.25 * unit, (worst, unit)

    def test_fused_map_structure(self, eight_agent_run):
        server, _ = eight_agent_run
        slot = server.agents[0].map_slot
        errs = ms.check_structure(server.maps[slot])
        assert errs == [], errs[:10]

    def test_final_gba_scheduled(self, eight_agent_run):
        server, _ = eight_agent_run
        for _ in range(server.quiescence_steps + 2):
            server.idle_step()
        slot = server.agents[0].map_slot
        assert server.final_gba_done[slot]
