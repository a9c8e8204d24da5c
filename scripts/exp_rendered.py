"""Quick experiment: rendered corridor -> Tracker, ATE. CPU backend."""
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
from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers
from ccm_slam_tpu.runtime.tracker import Tracker
from ccm_slam_tpu.utils.camera import Camera

N = int(sys.argv[1]) if len(sys.argv) > 1 else 240
SPAN = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
WORLD = sys.argv[3] if len(sys.argv) > 3 else "corridor"

cfg = rendered_ci_config(factor=float(os.environ.get("CI_FACTOR", "0.5")))
cam = Camera.from_config(cfg.camera)
seq = RenderedSequence(world=WORLD, seed=0, n_frames=N, span=(0.0, SPAN),
                       cam=cfg.camera, cache_dir="/tmp/rendered_cache")
tr = Tracker(cfg=cfg, cam=cam, client_id=0)

import faulthandler
faulthandler.dump_traceback_later(120, repeat=True)

t0 = time.time()
n = 0
for i, fr in enumerate(seq.frames()):
    tf = time.time()
    img = jnp.asarray(fr.image)
    tr.process_image(img, fr.timestamp)
    n += 1
    print(f"frame {i}: state={tr.state} dt={time.time()-tf:.2f}s t={time.time()-t0:.1f}s "
          f"inl={tr.stats.get('last_inliers')} ref_n={tr.stats.get('last_ref_n')} "
          f"kfs={tr.stats['kf_created']} mps={tr.stats['mp_created']}",
          flush=True)
    if tr.state == 2:
        break
print(f"{n} frames in {time.time()-t0:.1f}s  ({(time.time()-t0)/n*1000:.0f} ms/frame avg)")
print("final state:", tr.state)

m = tr.map
if m is None:
    print("NO MAP")
    sys.exit(1)
alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
idxs = np.where(alive)[0]
idxs = idxs[np.argsort(np.asarray(m.kfs.kf_id)[idxs])]
ts = np.asarray(m.kfs.timestamp)[idxs]
R = np.asarray(m.kfs.R_cw)[idxs]
t = np.asarray(m.kfs.t_cw)[idxs]
est = np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))

gt_ts, gt_pos, _ = seq.ground_truth()
gi = np.searchsorted(gt_ts, ts)
gi = np.clip(gi, 0, len(gt_ts) - 1)
rmse, _ = ate_rmse(est, gt_pos[gi])
print(f"KFs={len(ts)}  ATE RMSE (Sim3) = {rmse:.4f} m  over span {SPAN*88:.0f} m")
