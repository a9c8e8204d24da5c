"""Profile where _create_keyframe time goes on the rendered pipeline (CPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

import numpy as np
import jax.numpy as jnp

from ccm_slam_tpu.config import DEFAULT_CONFIG
from ccm_slam_tpu.io.rendered import RenderedSequence
from ccm_slam_tpu.runtime.tracker import Tracker
from ccm_slam_tpu.runtime import mapping, tracking
from ccm_slam_tpu.utils.camera import Camera

# wrap the mapping stages with timers
for modname, mod in (("mapping", mapping), ("tracking", tracking)):
    for fn_name in ("cull_mappoints", "triangulate_new_points", "fuse_neighbors",
                    "local_ba", "trim_keyframes", "create_keyframe",
                    "track_with_motion_model", "track_reference_kf",
                    "track_local_map"):
        if not hasattr(mod, fn_name):
            continue
        fn = getattr(mod, fn_name)

        def wrap(fn=fn, name=f"{modname}.{fn_name}"):
            def inner(*a, **k):
                t0 = time.time()
                out = fn(*a, **k)
                out = jax.block_until_ready(out)
                print(f"    {name}: {time.time()-t0:.2f}s", flush=True)
                return out
            return inner

        setattr(mod, fn_name, wrap())

cfg = DEFAULT_CONFIG
cam = Camera.from_config(cfg.camera)
seq = RenderedSequence(world="corridor", seed=0, n_frames=240, span=(0.0, 0.25),
                       cam=cfg.camera, cache_dir="/tmp/rendered_cache")
tr = Tracker(cfg=cfg, cam=cam, client_id=0)

t0 = time.time()
for i, fr in enumerate(seq.frames(limit=8)):
    tf = time.time()
    tr.process_image(jnp.asarray(fr.image), fr.timestamp)
    print(f"frame {i}: state={tr.state} dt={time.time()-tf:.2f}s", flush=True)
print(f"total {time.time()-t0:.1f}s")
