import os

import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.io import checkpoint as ckpt
from ccm_slam_tpu.ops import bow
from tests.test_map_store import add_kf, add_mps, fresh


class TestCheckpoint:
    def test_map_roundtrip(self, tmp_path):
        m = fresh()
        m, _ = add_mps(m, 5)
        a = jnp.full((16,), -1, jnp.int32).at[0].set(0).at[1].set(3)
        m, _ = add_kf(m, 0, mp_assoc=a)
        m, _ = add_kf(m, 1, mp_assoc=a)
        path = str(tmp_path / "map.npz")
        ckpt.save_map(path, m)
        m2 = ckpt.load_map(path)
        for f in ("kf_id", "R_cw", "t_cw", "mp_idx", "valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(m.kfs, f)), np.asarray(getattr(m2.kfs, f)), err_msg=f
            )
        for f in ("mp_id", "pos", "obs_kf", "obs_n"):
            np.testing.assert_array_equal(
                np.asarray(getattr(m.mps, f)), np.asarray(getattr(m2.mps, f)), err_msg=f
            )
        assert int(m2.next_kf) == 2 and int(m2.next_mp) == 5

    def test_vocab_roundtrip(self, tmp_path):
        key = jax.random.PRNGKey(0)
        d = jax.random.randint(key, (64, 32), 0, 256, dtype=jnp.uint8)
        v = bow.train_vocabulary(key, d, jnp.ones(64, bool), n_words=16, iters=2)
        path = str(tmp_path / "voc.npz")
        ckpt.save_vocabulary(path, v)
        v2 = ckpt.load_vocabulary(path)
        np.testing.assert_array_equal(np.asarray(v.words), np.asarray(v2.words))
        np.testing.assert_allclose(np.asarray(v.idf), np.asarray(v2.idf))

    def test_remap_to_client(self):
        m = fresh()
        m, _ = add_mps(m, 3)
        a = jnp.full((16,), -1, jnp.int32).at[0].set(1)
        m, _ = add_kf(m, 7, mp_assoc=a)  # arbitrary original id
        m2 = ckpt.remap_to_client(m, client_id=0)
        assert int(m2.kfs.kf_id[0]) == 0
        assert int(m2.kfs.client_id[0]) == 0
        assert int(m2.mps.mp_id[0]) == 0
        # structure preserved
        assert int(m2.kfs.mp_idx[0, 0]) >= 0
