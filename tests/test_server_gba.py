"""Server GBA scheduler: the interruptible chunked schedule must land on the
monolithic optimum (INTERRUPTBA semantics, cslam/src/Optimizer.cpp:646-859 +
Communicator.cpp:444-453).  tests/test_dist_ba.py proves the state-carry
property for the solver library; THIS file proves it for the scheduler that
uses it (Server.idle_step chunks with per-slot LM state)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import CameraConfig, CapacityConfig, SystemConfig
from ccm_slam_tpu.models import map_store as ms
from ccm_slam_tpu.ops import bow
from ccm_slam_tpu.runtime.server import Server
from ccm_slam_tpu.utils import lie
from ccm_slam_tpu.utils.camera import Camera

C_KF, N_PTS, N_FEAT = 6, 120, 128


def small_cfg():
    return SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=N_FEAT,
            client_max_kfs=16,
            client_max_mps=512,
            server_max_kfs=16,
            server_max_mps=512,
            max_obs_per_mp=8,
        )
    )


def build_map(cam, noise_scale=0.05):
    """MapState with C_KF keyframes all observing N_PTS landmarks, poses and
    points perturbed away from the exact geometry (so GBA has real work)."""
    key = jax.random.PRNGKey(0)
    kp, kc, kn, kd = jax.random.split(key, 4)
    X = jax.random.uniform(kp, (N_PTS, 3), minval=-4.0, maxval=4.0).at[:, 2].add(10.0)
    xi = jax.random.normal(kc, (C_KF, 6)) * jnp.array([0.5, 0.5, 0.3, 0.02, 0.02, 0.02])
    T = lie.SE3.exp(xi)

    # perturb all but the two gauge anchors (oldest two KFs stay exact)
    dxi = jax.random.normal(kn, (C_KF, 6)) * noise_scale * jnp.array([1, 1, 1, 0.3, 0.3, 0.3])
    dxi = dxi.at[:2].set(0.0)
    dT = lie.SE3.exp(dxi)
    R0 = dT.R @ T.R
    t0 = (dT.R @ T.t[..., None])[..., 0] + dT.t
    X0 = X + jax.random.normal(kd, X.shape) * noise_scale

    m = ms.empty_map(16, 512, N_FEAT, 8)
    m, mp_idx = ms.add_mappoints(
        m,
        n_new=jnp.int32(N_PTS),
        pos=jnp.pad(X0, ((0, N_FEAT - N_PTS), (0, 0))),
        desc=jnp.zeros((N_FEAT, 32), jnp.uint8),
        normal=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (N_FEAT, 1)),
        min_dist=jnp.zeros(N_FEAT),
        max_dist=jnp.full(N_FEAT, jnp.inf),
        ref_kf=jnp.zeros(N_FEAT, jnp.int32),
        mp_ids=jnp.arange(N_FEAT, dtype=jnp.int32),
        client_id=jnp.zeros(N_FEAT, jnp.int32),
        new_valid=jnp.arange(N_FEAT) < N_PTS,
    )
    assoc = jnp.where(jnp.arange(N_FEAT) < N_PTS, mp_idx, ms.NO_MP)
    for c in range(C_KF):
        Xc = (T.R[c] @ X.T).T + T.t[c]
        uv = jnp.stack(
            [cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx, cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy],
            -1,
        )
        uv = jnp.pad(uv, ((0, N_FEAT - N_PTS), (0, 0)))
        m, _ = ms.add_keyframe(
            m, jnp.int32(c), jnp.int32(0), jnp.float32(c * 0.05),
            R0[c], t0[c], uv,
            jnp.zeros((N_FEAT, 32), jnp.uint8),
            jnp.zeros((N_FEAT,), jnp.int32),
            jnp.zeros((N_FEAT,)),
            jnp.ones((N_FEAT,), bool),
            assoc,
        )
    return m


def make_server(cfg, cam, mesh=None):
    key = jax.random.PRNGKey(1)
    descs = jax.random.randint(key, (256, 32), 0, 256, dtype=jnp.uint8)
    vocab = bow.train_vocabulary(key, descs, jnp.ones(256, bool), n_words=16, iters=2)
    srv = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=1, mesh=mesh)
    srv.maps[0] = build_map(cam)
    srv.agents[0].last_data_step = 0
    srv.gba_dirty[0] = True
    srv.gba_chunk_iters = 4
    srv.gba_total_iters = 12
    return srv


@pytest.fixture(scope="module")
def cam():
    return Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))


class TestServerChunkedGBA:
    def _run(self, mesh, cam):
        cfg = small_cfg()
        chunked = make_server(cfg, cam, mesh=mesh)
        for _ in range(3):
            chunked.idle_step()
        assert not chunked.gba_dirty[0]

        mono = make_server(cfg, cam, mesh=mesh)
        mono._run_gba(0, iters=12)

        mc, mm = chunked.maps[0], mono.maps[0]
        np.testing.assert_allclose(
            np.asarray(mc.kfs.t_cw[:C_KF]), np.asarray(mm.kfs.t_cw[:C_KF]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(mc.mps.pos[:N_PTS]), np.asarray(mm.mps.pos[:N_PTS]), atol=1e-5
        )

    def test_chunked_equals_monolithic_single_device(self, cam):
        self._run(None, cam)

    def test_async_chunks_overlap_ingest(self, cam):
        """idle_step dispatches GBA chunks WITHOUT a host sync (the
        reference's GBA-thread/ingest-thread overlap): interleaving host-side
        work between chunks must not change the result, and the pending cost
        future is only synchronized on demand (gba_cost)."""
        import time

        cfg = small_cfg()
        async_srv = make_server(cfg, cam)
        t_host = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            async_srv.idle_step()
            t_host += time.perf_counter() - t0
            # host-side work happens here while the chunk runs on-device;
            # reading the cost future later must give the converged value
        assert not async_srv.gba_dirty[0]
        assert async_srv.gba_cost(0) is not None  # sync-on-demand works

        blocking = make_server(cfg, cam)
        for _ in range(3):
            blocking.idle_step()
            blocking.gba_cost(0)  # force the sync after every chunk
        np.testing.assert_allclose(
            np.asarray(async_srv.maps[0].kfs.t_cw[:C_KF]),
            np.asarray(blocking.maps[0].kfs.t_cw[:C_KF]), atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(async_srv.maps[0].mps.pos[:N_PTS]),
            np.asarray(blocking.maps[0].mps.pos[:N_PTS]), atol=0,
        )

    def test_chunked_equals_monolithic_on_mesh(self, cam):
        from ccm_slam_tpu.parallel import dist_ba

        self._run(dist_ba.make_mesh(), cam)

    def test_carry_state_present_between_chunks(self, cam):
        """idle_step records the LM carry for the slot after each chunk and
        clears it when the schedule completes or a fresh solve runs."""
        cfg = small_cfg()
        srv = make_server(cfg, cam)
        srv.idle_step()
        assert 0 in srv.gba_state  # mid-schedule: carry held
        srv._run_gba(0, iters=2)   # non-chunked solve drops it
        assert 0 not in srv.gba_state
