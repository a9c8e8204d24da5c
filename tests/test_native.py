import threading

import numpy as np
import pytest

from ccm_slam_tpu import native


@pytest.fixture(scope="module")
def built():
    native._load()
    return True


class TestNativeLoader:
    def test_decodes_in_order(self, built, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(0)
        paths, truth = [], []
        for i in range(12):
            img = rng.randint(0, 255, (48, 64), dtype=np.uint8)
            p = str(tmp_path / f"f{i:03d}.png")
            Image.fromarray(img).save(p)
            paths.append(p)
            truth.append(img)
        loader = native.NativeImageLoader(paths, n_threads=3, queue_depth=4)
        out = list(loader)
        loader.close()
        assert len(out) == 12
        for got, want in zip(out, truth):
            assert got.shape == (48, 64)
            np.testing.assert_array_equal(got.astype(np.uint8), want)

    def test_rgb_to_gray(self, built, tmp_path):
        from PIL import Image

        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[..., 0] = 200  # pure red
        p = str(tmp_path / "rgb.png")
        Image.fromarray(rgb).save(p)
        loader = native.NativeImageLoader([p])
        (img,) = list(loader)
        loader.close()
        assert img.shape == (8, 8)
        assert 30 < img[0, 0] < 90  # luminance of pure red ~ 0.3*200


class TestNativeChannel:
    def test_pytree_roundtrip(self, built):
        import jax.numpy as jnp

        port = 47731
        lfd = native.NativeChannel.listener(port)
        got = {}

        def server():
            ch = native.NativeChannel.accept(lfd)
            got["msg"] = ch.recv()
            ch.send({"ack": np.array([1, 2, 3])})
            ch.close()

        th = threading.Thread(target=server)
        th.start()
        cl = native.NativeChannel.connect("127.0.0.1", port)
        payload = {
            "kfs": jnp.arange(10, dtype=jnp.int32),
            "desc": np.zeros((4, 32), np.uint8),
            "nested": {"t": jnp.ones(3)},
        }
        cl.send(payload)
        reply = cl.recv()
        th.join()
        cl.close()
        np.testing.assert_array_equal(got["msg"]["kfs"], np.arange(10))
        assert got["msg"]["desc"].shape == (4, 32)
        np.testing.assert_array_equal(reply["ack"], [1, 2, 3])

    def test_mapmsg_over_channel(self, built):
        """A real MapMsg batch survives the wire."""
        import jax
        import jax.numpy as jnp

        from ccm_slam_tpu.runtime import communicator as comm
        from tests.test_map_store import add_kf, add_mps, fresh

        m = fresh()
        m, _ = add_mps(m, 4)
        a = jnp.full((16,), -1, jnp.int32).at[0].set(0)
        m, _ = add_kf(m, 0, mp_assoc=a)
        st = comm.ClientCommState.create(8, 64)
        msg, st = comm.publish_client(m, st, 0, max_kfs=2, max_mps=8)

        port = 47732
        lfd = native.NativeChannel.listener(port)
        got = {}

        def server():
            ch = native.NativeChannel.accept(lfd)
            got["msg"] = ch.recv()
            ch.close()

        th = threading.Thread(target=server)
        th.start()
        cl = native.NativeChannel.connect("127.0.0.1", port)
        cl.send({"kfs": msg.kfs, "mps": msg.mps, "msg_id": msg.msg_id})
        th.join()
        cl.close()
        wire = got["msg"]
        np.testing.assert_array_equal(
            np.asarray(wire["kfs"].kf_id), np.asarray(msg.kfs.kf_id)
        )
        assert int(np.asarray(wire["kfs"].valid).sum()) == 1
