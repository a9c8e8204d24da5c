"""Live streaming viewer (io/live_viewer.py) — the reference Viewer's
continuous surface (cslam/src/Viewer.cpp) as an embedded HTTP streamer:
scene long-polling, versioning, and the annotated-frame PNG endpoint."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.io.live_viewer import LiveViewer
from tests.test_map_store import add_kf, add_mps, fresh


def _map():
    m = fresh()
    m, _ = add_mps(m, 6)
    a = jnp.full((16,), -1, jnp.int32)
    for i in range(4):
        m, _ = add_kf(m, i, mp_assoc=a.at[0].set(i % 6).at[1].set((i + 1) % 6))
    return m


def _get(url, timeout=10):
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:  # 4xx still carries a response
        return e.code, e.headers.get("Content-Type", ""), e.read()


class TestLiveViewer:
    def test_scene_stream_and_page(self):
        v = LiveViewer(port=0)
        try:
            base = v.url
            code, ctype, body = _get(base)
            assert code == 200 and "text/html" in ctype
            assert b"canvas" in body

            # no scene yet: a non-blocking poll 204s
            code, _, body = _get(base + "scene?since=-1&timeout=0.05")
            assert code == 204

            ver = v.publish_map(_map(), covis_min_weight=1)
            assert ver == 1
            code, ctype, body = _get(base + "scene?since=-1")
            assert code == 200 and "json" in ctype
            j = json.loads(body)
            assert j["version"] == 1
            sc = j["scene"]
            assert sc["n_keyframes"] == 4 and sc["n_landmarks"] == 6
            assert len(sc["landmarks"]["pos"]) == 6
            assert len(sc["covisibility_edges"]) >= 1

            # long-poll: a request waiting for version > 1 unblocks on publish
            out = {}

            def poll():
                out["resp"] = _get(base + "scene?since=1&timeout=8")

            th = threading.Thread(target=poll)
            th.start()
            v.publish_map(_map(), covis_min_weight=1)
            th.join(timeout=10)
            assert not th.is_alive()
            code, _, body = out["resp"]
            assert code == 200 and json.loads(body)["version"] == 2
        finally:
            v.close()

    def test_frame_png(self):
        from ccm_slam_tpu.runtime.frame import Frame
        from ccm_slam_tpu.solvers.reproj import level_sigma2

        v = LiveViewer(port=0)
        try:
            code, _, _ = _get(v.url + "frame.png")
            assert code == 404

            N = 4
            f = Frame(
                timestamp=jnp.float32(0),
                xy=jnp.asarray(np.array([[10, 10], [40, 30], [0, 0], [0, 0]], np.float32)),
                desc=jnp.zeros((N, 32), jnp.uint8), octave=jnp.zeros(N, jnp.int32),
                angle=jnp.zeros(N), sigma2=level_sigma2(jnp.zeros(N, jnp.int32)),
                valid=jnp.asarray([True, True, False, False]),
                R_cw=jnp.eye(3), t_cw=jnp.zeros(3),
                mp=jnp.asarray(np.array([3, -1, -1, -1], np.int32)),
            )
            v.publish_frame(np.full((60, 80), 90.0, np.float32), f)
            code, ctype, body = _get(v.url + "frame.png")
            assert code == 200 and ctype == "image/png"
            assert body[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            v.close()

    def test_landmark_subsample_cap(self):
        m = fresh()
        m, _ = add_mps(m, 6)
        m, _ = add_kf(m, 0, mp_assoc=jnp.full((16,), -1, jnp.int32).at[0].set(0))
        v = LiveViewer(port=0)
        try:
            v.publish_map(m, covis_min_weight=1, max_landmarks=3)
            _, _, body = _get(v.url + "scene?since=-1")
            sc = json.loads(body)["scene"]
            assert len(sc["landmarks"]["pos"]) <= 3
            assert sc["n_landmarks"] == 6  # counters report the true total
        finally:
            v.close()
