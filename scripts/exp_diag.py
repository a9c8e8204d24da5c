"""Diagnose rendered-pipeline tracking decay: per-frame motion vs GT, and
landmark survival stats."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ccm_slam_tpu.config import rendered_ci_config
from ccm_slam_tpu.io.rendered import RenderedSequence
from ccm_slam_tpu.runtime.tracker import Tracker
from ccm_slam_tpu.utils.camera import Camera

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150
SPAN = float(sys.argv[2]) if len(sys.argv) > 2 else 0.22
WORLD = sys.argv[3] if len(sys.argv) > 3 else "loop"

cfg = rendered_ci_config(factor=float(os.environ.get("CI_FACTOR", "0.5")))
if os.environ.get("MIN_FRAMES"):
    import dataclasses
    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, min_frames=int(os.environ["MIN_FRAMES"])))
cam = Camera.from_config(cfg.camera)
seq = RenderedSequence(world=WORLD, seed=0, n_frames=N, span=(float(os.environ.get("SPAN0","0.0")), SPAN),
                       cam=cfg.camera, cache_dir="/tmp/rendered_cache")
tr = Tracker(cfg=cfg, cam=cam, client_id=0,
             enable_trimming=os.environ.get("TRIM", "1") == "1")
if os.environ.get("FROZEN"):
    tr.enable_mapping = False
    # also suppress new keyframes entirely: track against the init map only
    tr._create_keyframe = lambda frame: None

if os.environ.get("NO_BA"):
    from ccm_slam_tpu.runtime import mapping as _mp
    _mp.local_ba = lambda m, k, cam, cfg, iters=15: (m, jnp.float32(0.0), jnp.int32(0))
if os.environ.get("NO_FUSE"):
    from ccm_slam_tpu.runtime import mapping as _mp2
    _mp2.fuse_neighbors = lambda m, k, cam, cfg, n_neighbors=10: (
        m, jnp.int32(0), jnp.int32(0),
        jnp.arange(m.mps.capacity, dtype=jnp.int32))

prev_c = None
prev_gt = None
for i, fr in enumerate(seq.frames()):
    out = tr.process_image(jnp.asarray(fr.image), fr.timestamp)
    _, gt_o, gt_R = seq.gt_pose(i)
    line = f"f{i:03d} st={tr.state}"
    if out is not None:
        R = np.asarray(out.R_cw); t = np.asarray(out.t_cw)
        c = -R.T @ t  # camera center (est gauge)
        if prev_c is not None:
            d_est = c - prev_c
            d_gt = gt_o - prev_gt
            n_e, n_g = np.linalg.norm(d_est), np.linalg.norm(d_gt)
            # est frame differs from GT by the init gauge: compare via the
            # camera frame (rotate both motions into their own camera frames)
            d_est_c = R @ d_est
            Rgt_cw = gt_R.T
            d_gt_c = Rgt_cw @ d_gt
            cosang = float(np.dot(d_est_c, d_gt_c) / (n_e * n_g + 1e-12))
            line += f" |est|/|gt|={n_e/max(n_g,1e-9):7.3f} dir_cos={cosang:6.3f}"
        prev_c, prev_gt = c, gt_o
        s = tr.stats
        line += (f" path={str(s.get('path')):10s} mm={s.get('mm_n_match')}/{s.get('mm_n_in')}"
                 f" lmA={s.get('lm_n_in_a')} inl={s.get('last_inliers')}")
        if os.environ.get("DEPTHS") and tr.map is not None:
            mm_ = tr.map
            f_ = tr.last_frame
            mp = np.asarray(f_.mp)
            okm = mp >= 0
            if okm.sum() > 3:
                P = np.asarray(mm_.mps.pos)[mp[okm]]
                Rc = np.asarray(f_.R_cw); tc = np.asarray(f_.t_cw)
                zc = (P @ Rc.T + tc)[:, 2]
                born = np.asarray(mm_.mps.first_kf_id)[mp[okm]]
                oct_ = np.asarray(f_.octave)[okm]
                line += (f" | z q=[{np.percentile(zc,10):.2f},{np.median(zc):.2f},"
                         f"{np.percentile(zc,90):.2f}] born_med={np.median(born):.0f}"
                         f" oct_med={np.median(oct_):.0f} oct90={np.percentile(oct_,90):.0f}")
        m = tr.map
        if m is not None and i % 5 == 0:
            ob = np.asarray(m.mps.obs_n)
            al = np.asarray(m.mps.valid & ~m.mps.bad)
            line += (f" | live={al.sum()} obs>=3={int(((ob>=3)&al).sum())}"
                     f" obs==2={int(((ob==2)&al).sum())}"
                     f" inl={tr.stats.get('last_inliers')}")
    print(line, flush=True)
    if tr.state == 2:
        break
