"""Deterministic synthetic worlds for testing and deployment smoke runs.

The reference's de-facto test vehicle is a real EuRoC rosbag (SURVEY §4); for
hermetic tests and multi-process deployment validation this module provides
the equivalent in miniature: a shared 3-D landmark field with random binary
descriptors, and per-agent keyframe maps built along straight corridors in
arbitrary monocular gauges (scale/rotation/offset per agent — the Sim(3)
ambiguity every client map carries, CentralControl's mg2oS_wcurmap_wclientmap).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import map_store as ms
from ..utils.lie import SE3, Sim3

N_FEAT = 96
FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375


def make_world(rng: np.random.RandomState, n: int = 260):
    """Landmark field in front of the corridor plane: positions [n,3] and
    random 256-bit descriptors [n,32]."""
    lx = rng.uniform(-2, 6, n)
    ly = rng.uniform(-1.5, 1.5, n)
    lz = rng.uniform(5.5, 7.0, n)
    return np.stack([lx, ly, lz], 1).astype(np.float32), rng.randint(
        0, 256, (n, 32), dtype=np.uint8
    )


def build_agent_map(world, wdesc, xs, gauge: Sim3, kf_id_base: int = 0,
                    client_id: int = 0, n_feat: int = N_FEAT,
                    kf_cap: int = 16, mp_cap: int = 1024):
    """Client map with keyframes at world x positions ``xs`` looking +z; the
    map is stored in ``gauge``'s frame (world' = gauge(world)) — exactly the
    state a monocular client would have after drift/scale ambiguity."""
    m = ms.empty_map(kf_cap, mp_cap, n_feat, 8)
    lm_arena = {}
    lx = world[:, 0]
    for k, xt in enumerate(xs):
        T_true = SE3(R=jnp.eye(3), t=-jnp.array([xt, 0.0, 0.0]))
        vis = np.where(np.abs(lx - xt) < 1.6)[0][:n_feat]
        Xc = np.asarray(T_true.apply(jnp.asarray(world[vis])))
        uv = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX, FY * Xc[:, 1] / Xc[:, 2] + CY], 1)
        n = len(vis)
        new = [wi for wi in vis if wi not in lm_arena]
        if new:
            B = len(new)
            pos = np.asarray(gauge.apply(jnp.asarray(world[new])))
            pad = max(0, n_feat - B)
            m, idxs = ms.add_mappoints(
                m,
                n_new=jnp.int32(B),
                pos=jnp.asarray(np.pad(pos, ((0, pad), (0, 0)))[:n_feat]),
                desc=jnp.asarray(
                    np.pad(np.stack([wdesc[w] for w in new]), ((0, pad), (0, 0)))[:n_feat]
                ),
                normal=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n_feat, 1)),
                min_dist=jnp.full(n_feat, 0.01),
                max_dist=jnp.full(n_feat, 100.0),
                ref_kf=jnp.full(n_feat, k, jnp.int32),
                mp_ids=jnp.arange(n_feat, dtype=jnp.int32) + k * n_feat,
                client_id=jnp.full(n_feat, client_id, jnp.int32),
                new_valid=jnp.arange(n_feat) < B,
            )
            for bi, wi in enumerate(new):
                lm_arena[wi] = int(idxs[bi])
        assoc = np.full(n_feat, -1, np.int32)
        for j, wi in enumerate(vis):
            assoc[j] = lm_arena[wi]
        # pose in the gauge frame: T'_cw = se3( T_cw o gauge^-1 )
        Tg = T_true.to_sim3().compose(gauge.inverse())
        T_est = Tg.to_se3_scaled()
        xy = np.zeros((n_feat, 2), np.float32)
        xy[:n] = uv
        desc = np.zeros((n_feat, 32), np.uint8)
        desc[:n] = wdesc[vis]
        valid = np.zeros(n_feat, bool)
        valid[:n] = True
        m, _ = ms.add_keyframe(
            m, jnp.int32(kf_id_base + k), jnp.int32(client_id), jnp.float32(k * 0.5),
            T_est.R, T_est.t,
            jnp.asarray(xy), jnp.asarray(desc), jnp.zeros(n_feat, jnp.int32),
            jnp.zeros(n_feat), jnp.asarray(valid), jnp.asarray(assoc),
        )
    return m


def agent_corridor(agent_id: int, n_kfs: int = 4):
    """Standard per-agent corridor: staggered, overlapping x ranges so any
    two consecutive agents share enough landmarks to map-match."""
    x0 = 0.0 + 1.0 * agent_id
    step = 1.0 if agent_id % 2 == 0 else -1.0
    xs = [x0 + step * k for k in range(n_kfs)]
    if step < 0:
        xs = [x + n_kfs - 1 for x in xs]
    return xs


def agent_gauge(agent_id: int) -> Sim3:
    """Deterministic per-agent monocular gauge (agent 0 = identity)."""
    from ..utils.lie import so3_exp

    if agent_id == 0:
        return Sim3.identity()
    rs = np.random.RandomState(1000 + agent_id)
    return Sim3(
        s=jnp.float32(1.0 + 0.25 * agent_id),
        R=so3_exp(jnp.asarray(rs.uniform(-0.05, 0.05, 3).astype(np.float32))),
        t=jnp.asarray(rs.uniform(-0.3, 0.3, 3).astype(np.float32)),
    )
