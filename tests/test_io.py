import json
import os

import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.io import euroc, export
from ccm_slam_tpu.io.trajectory import ate_rmse, write_tum
from tests.test_map_store import add_kf, add_mps, fresh


class TestEurocLoader:
    def _make_fake_seq(self, tmp_path):
        from PIL import Image

        cam = tmp_path / "mav0" / "cam0"
        (cam / "data").mkdir(parents=True)
        rows = ["#timestamp [ns],filename"]
        rng = np.random.RandomState(0)
        for i in range(5):
            ts = 1403636579763555584 + i * 50_000_000
            fn = f"{ts}.png"
            Image.fromarray(rng.randint(0, 255, (48, 64), dtype=np.uint8)).save(
                str(cam / "data" / fn)
            )
            rows.append(f"{ts},{fn}")
        (cam / "data.csv").write_text("\n".join(rows))
        gt = tmp_path / "mav0" / "state_groundtruth_estimate0"
        gt.mkdir(parents=True)
        gt_rows = ["#ts,px,py,pz,qw,qx,qy,qz,..."]
        for i in range(10):
            ts = 1403636579763555584 + i * 25_000_000
            gt_rows.append(f"{ts},{i*0.1},0.0,1.0,1.0,0.0,0.0,0.0")
        (gt / "data.csv").write_text("\n".join(gt_rows))
        return str(tmp_path)

    def test_frames_and_gt(self, tmp_path):
        root = self._make_fake_seq(tmp_path)
        seq = euroc.EurocSequence(root=root)
        frames = list(seq.frames())
        assert len(frames) == 5
        assert frames[0].image.shape == (48, 64)
        assert abs(frames[1].timestamp - frames[0].timestamp - 0.05) < 1e-6
        ts, pos, quat = seq.ground_truth()
        assert len(ts) == 10 and pos.shape == (10, 3)

    def test_staggered_start_and_limit(self, tmp_path):
        root = self._make_fake_seq(tmp_path)
        seq = euroc.EurocSequence(root=root)
        frames = list(seq.frames(start=0.1, limit=2))
        assert len(frames) == 2

    def test_gt_association(self, tmp_path):
        root = self._make_fake_seq(tmp_path)
        seq = euroc.EurocSequence(root=root)
        ts_gt, pos, _ = seq.ground_truth()
        est_ts = ts_gt[[0, 4]] + 0.001
        mask, matched = euroc.associate_gt(est_ts, ts_gt, pos)
        assert mask.all()
        np.testing.assert_allclose(matched, pos[[0, 4]], atol=1e-6)


class TestExport:
    def _map(self):
        m = fresh()
        m, _ = add_mps(m, 6)
        a = jnp.full((16,), -1, jnp.int32)
        for i in range(4):
            m, _ = add_kf(m, i, mp_assoc=a.at[0].set(i % 6).at[1].set((i + 1) % 6))
        return m

    def test_ply(self, tmp_path):
        m = self._map()
        path = str(tmp_path / "cloud.ply")
        n = export.export_pointcloud_ply(path, m)
        assert n == 6
        lines = open(path).read().splitlines()
        assert lines[0] == "ply"
        assert f"element vertex {n}" in "\n".join(lines[:6])
        assert len(lines) > 10

    def test_scene_json(self, tmp_path):
        m = self._map()
        path = str(tmp_path / "scene.json")
        scene = export.export_scene_json(path, m, covis_min_weight=1)
        on_disk = json.load(open(path))
        assert on_disk["n_keyframes"] == 4
        assert on_disk["n_landmarks"] == 6
        assert "0" in on_disk["trajectories"]
        assert len(on_disk["trajectories"]["0"]["keyframes"]) == 4
        assert len(on_disk["covisibility_edges"]) >= 1


class TestTum:
    def test_write_format(self, tmp_path):
        path = str(tmp_path / "traj.tum")
        R = jnp.stack([jnp.eye(3)] * 3)
        t = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32))
        write_tum(path, np.array([0.0, 0.05, 0.1]), R, t)
        lines = open(path).read().splitlines()
        assert len(lines) == 3
        parts = lines[1].split()
        assert len(parts) == 8
        np.testing.assert_allclose(float(parts[1]), -1.0, atol=1e-5)  # center = -R^T t


class TestTelemetry:
    def test_stage_timer_and_counters(self):
        import time

        from ccm_slam_tpu.runtime.telemetry import Counters, StageTimer, Watchdog

        t = StageTimer()
        with t.stage("tracking"):
            time.sleep(0.01)
        with t.stage("tracking"):
            time.sleep(0.01)
        s = t.summary()
        assert s["tracking"]["count"] == 2
        assert s["tracking"]["total_s"] >= 0.02

        c = Counters()
        c.bump("kf_created")
        c.bump("kf_created", 2)
        assert c.get("kf_created") == 3

        w = Watchdog(threshold_s=0.005)
        w.beat("mapping")
        time.sleep(0.02)
        stalled = w.stalled()
        assert stalled and stalled[0][0] == "mapping"


class TestAnnotateAndLoad:
    def test_annotate_frame(self):
        import jax.numpy as jnp

        from ccm_slam_tpu.io.export import annotate_frame
        from ccm_slam_tpu.models.map_store import NO_MP
        from ccm_slam_tpu.runtime.frame import Frame
        from ccm_slam_tpu.solvers.reproj import level_sigma2

        img = np.full((60, 80), 100.0, np.float32)
        N = 8
        xy = np.array([[10, 10], [40, 30], [70, 50], [5, 5]] + [[0, 0]] * 4, np.float32)
        mp = np.array([3, -1, 7, -1] + [-1] * 4, np.int32)
        valid = np.array([True] * 4 + [False] * 4)
        f = Frame(
            timestamp=jnp.float32(0), xy=jnp.asarray(xy),
            desc=jnp.zeros((N, 32), jnp.uint8), octave=jnp.zeros(N, jnp.int32),
            angle=jnp.zeros(N), sigma2=level_sigma2(jnp.zeros(N, jnp.int32)),
            valid=jnp.asarray(valid), R_cw=jnp.eye(3), t_cw=jnp.zeros(3),
            mp=jnp.asarray(mp),
        )
        out = annotate_frame(img, f)
        assert out.shape == (60, 80, 3)
        assert tuple(out[10, 10]) == (0, 220, 0)       # matched -> filled green
        assert tuple(out[30, 40]) != (0, 220, 0)       # unmatched center not filled
        assert (out[30 - 3, 40] == (220, 160, 0)).all()  # ring pixel

    def test_server_save_load_map(self, tmp_path):
        import jax.numpy as jnp

        from ccm_slam_tpu.config import CapacityConfig, SystemConfig
        from ccm_slam_tpu.ops import bow
        from ccm_slam_tpu.runtime.server import Server
        from ccm_slam_tpu.utils.camera import Camera
        from ccm_slam_tpu.config import CameraConfig
        from tests.test_map_store import add_kf, add_mps, fresh
        import jax

        cfg = SystemConfig(
            capacity=CapacityConfig(
                max_keypoints=16, client_max_kfs=8, client_max_mps=64,
                server_max_kfs=8, server_max_mps=64, max_obs_per_mp=4,
            )
        )
        cam = Camera.from_config(CameraConfig())
        d = jax.random.randint(jax.random.PRNGKey(0), (64, 32), 0, 256, dtype=jnp.uint8)
        vocab = bow.train_vocabulary(jax.random.PRNGKey(1), d, jnp.ones(64, bool), n_words=16, iters=2)
        m = fresh()
        m, _ = add_mps(m, 3)
        a = jnp.full((16,), -1, jnp.int32).at[0].set(0)
        m, _ = add_kf(m, 5, mp_assoc=a)
        path = str(tmp_path / "srv_map.npz")
        server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=2)
        server.maps[0] = m
        server.save_map(0, path)
        server2 = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=2)
        m2 = server2.load_map(0, path)
        # loaded ids remapped to client 0, dense
        assert int(m2.kfs.kf_id[0]) == 0
        assert server2.agents[0].kf_table == {0: 0}
        assert 0 in server2.agents[0].mp_table


class TestKittiLoader:
    def _make_seq(self, tmp_path, n=5):
        from PIL import Image

        seq_dir = tmp_path / "sequences" / "07"
        (seq_dir / "image_0").mkdir(parents=True)
        (tmp_path / "poses").mkdir()
        rng = np.random.RandomState(0)
        for i in range(n):
            img = rng.randint(0, 255, (60, 200), dtype=np.uint8)
            Image.fromarray(img).save(seq_dir / "image_0" / f"{i:06d}.png")
        (seq_dir / "times.txt").write_text("".join(f"{i*0.1:.6e}\n" for i in range(n)))
        (seq_dir / "calib.txt").write_text(
            "P0: 718.856 0.0 607.1928 0.0 0.0 718.856 185.2157 0.0 0.0 0.0 1.0 0.0\n"
            "P1: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        )
        poses = []
        for i in range(n):
            M = np.hstack([np.eye(3), [[i * 0.5], [0.0], [0.0]]])
            poses.append(" ".join(f"{x:.6e}" for x in M.reshape(-1)))
        (tmp_path / "poses" / "07.txt").write_text("\n".join(poses) + "\n")
        return tmp_path

    def test_frames_calib_gt(self, tmp_path):
        from ccm_slam_tpu.io.kitti import KittiSequence

        root = self._make_seq(tmp_path)
        seq = KittiSequence(root=str(root), seq="07")
        fx, fy, cx, cy = seq.calibration()
        assert abs(fx - 718.856) < 1e-6 and abs(cy - 185.2157) < 1e-6
        frames = list(seq.frames())
        assert len(frames) == 5
        assert frames[0].image.shape == (60, 200)
        assert abs(frames[3].timestamp - 0.3) < 1e-9
        ts, pos, R = seq.ground_truth()
        assert pos.shape == (5, 3) and abs(pos[4, 0] - 2.0) < 1e-6
        assert np.allclose(R[0], np.eye(3))
        # start/limit windows
        assert len(list(seq.frames(start=0.15))) == 3
        assert len(list(seq.frames(limit=2))) == 2

    def test_kitti_camera_preset(self):
        from ccm_slam_tpu.config import KITTI_CAMERA
        from ccm_slam_tpu.utils.camera import Camera

        cam = Camera.from_config(KITTI_CAMERA)
        # rectified: undistortion is identity
        import jax.numpy as jnp
        pts = jnp.asarray(np.array([[100.0, 50.0], [600.0, 300.0]], np.float32))
        und = cam.undistort_pixels(pts)
        assert np.allclose(np.asarray(und), np.asarray(pts), atol=1e-3)


class TestEurocTrajectoryFormat:
    def test_roundtrip_consistent_with_tum(self, tmp_path):
        from ccm_slam_tpu.io.trajectory import write_euroc, write_tum

        rng = np.random.RandomState(0)
        n = 5
        ts = np.arange(n) * 0.05 + 100.0
        import jax.numpy as jnp
        from ccm_slam_tpu.utils.lie import so3_exp
        R = np.stack([np.asarray(so3_exp(jnp.asarray(rng.randn(3) * 0.1))) for _ in range(n)])
        t = rng.randn(n, 3).astype(np.float32)
        p_tum = tmp_path / "t.txt"
        p_eur = tmp_path / "e.csv"
        write_tum(str(p_tum), ts, R, t)
        write_euroc(str(p_eur), ts, R, t)
        tum = np.loadtxt(p_tum)
        eur = np.loadtxt(p_eur, delimiter=",")
        assert eur.shape == (n, 17)
        np.testing.assert_allclose(eur[:, 0] * 1e-9, tum[:, 0], atol=1e-6)
        np.testing.assert_allclose(eur[:, 1:4], tum[:, 1:4], atol=1e-6)  # positions
        # quaternion order: euroc wxyz vs tum xyzw
        np.testing.assert_allclose(eur[:, 4], tum[:, 7], atol=1e-6)      # w
        np.testing.assert_allclose(eur[:, 5:8], tum[:, 4:7], atol=1e-6)  # xyz
        assert np.allclose(eur[:, 8:], 0.0)                               # v/bg/ba
