"""Split from test_rendered_ate so pytest-xdist (--dist loadfile) runs the
three rendered accuracy gates on separate workers (each is CI-minutes)."""

from tests.test_rendered_ate import (  # shared helpers (classes NOT imported
    CACHE, FACTOR, _drive, _gt_lookup, _kf_trajectory,  # -> no double collection)
)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import rendered_ci_config
from ccm_slam_tpu.io.rendered import RenderedSequence
from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers
from ccm_slam_tpu.runtime.tracker import LOST, Tracker
from ccm_slam_tpu.utils.camera import Camera

import os


@pytest.mark.rendered
class TestTwoAgentMergeRendered:
    """BASELINE config 3: two agents over overlapping corridor spans; the
    server must recognize the overlap, merge the maps, and the fused
    trajectory must match ground truth."""

    def test_two_agents_merge_and_ate(self):
        from ccm_slam_tpu.ops import bow, orb
        from ccm_slam_tpu.runtime import communicator as comm
        from ccm_slam_tpu.runtime.server import Server

        import dataclasses

        cfg = rendered_ci_config(factor=FACTOR)
        cfg = cfg.replace(
            n_agents=2,
            placerec=dataclasses.replace(cfg.placerec, start_map_matching_after_kf=5),
        )
        cam = Camera.from_config(cfg.camera)
        n = 120
        spans = [(0.0, 0.16), (0.08, 0.24)]   # overlap 0.08-0.16
        seqs = [
            RenderedSequence(world="corridor", seed=0, n_frames=n, span=sp,
                             cam=cfg.camera, cache_dir=CACHE)
            for sp in spans
        ]
        vocab_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ccm_slam_tpu", "data", "vocab32k.npz",
        )
        if os.path.exists(vocab_path):
            vocab = bow.load_vocabulary(vocab_path)
        else:
            f0 = next(seqs[0].frames(limit=1))
            feats = orb.extract(jnp.asarray(f0.image))
            vocab = bow.train_vocabulary(
                jax.random.PRNGKey(0), feats.desc, feats.valid,
                n_words=1024, iters=6,
            )
        server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=2)
        trackers = [Tracker(cfg=cfg, cam=cam, client_id=i) for i in range(2)]
        states = [
            comm.ClientCommState.create(cfg.capacity.client_max_kfs,
                                        cfg.capacity.client_max_mps)
            for _ in range(2)
        ]
        iters = [s.frames() for s in seqs]
        merged = False
        for step in range(n):
            for i in (0, 1):
                try:
                    fr = next(iters[i])
                except StopIteration:
                    continue
                trackers[i].process_image(jnp.asarray(fr.image), fr.timestamp)
                if trackers[i].map is None or step % 4 != 3:
                    continue
                msg, states[i] = comm.publish_client(
                    trackers[i].map, states[i], i,
                    max_kfs=cfg.comm.client_pub_max_kfs,
                    max_mps=cfg.comm.client_pub_max_mps,
                )
                if msg.empty:
                    continue
                new_ids = [
                    int(k) for k, v in zip(np.asarray(msg.kfs.kf_id),
                                           np.asarray(msg.kfs.valid)) if v
                ]
                ack = server.ingest(i, msg)
                states[i] = comm.apply_server_acks(states[i], trackers[i].map, ack)
                ag = server.agents[i]
                for kf_id in new_ids:
                    if kf_id in ag.kf_table:
                        _, dm = server.mapping_step(i, ag.kf_table[kf_id])
                        merged = merged or dm
            server.idle_step()
        assert merged, "maps did not merge"
        slot = server.agents[0].map_slot
        assert server.agents[1].map_slot == slot
        for _ in range(server.quiescence_steps + 2):
            server.idle_step()
        for i in (0, 1):
            ts, R, t = server.trajectory(i)
            est = np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))
            gt = _gt_lookup(seqs[i], np.asarray(ts))
            rmse, _ = ate_rmse(est, gt, align="sim3")
            span = np.linalg.norm(gt.max(0) - gt.min(0))
            assert rmse < 0.02 * span + 0.05, (i, rmse, span)
