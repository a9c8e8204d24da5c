import jax
import jax.numpy as jnp
import numpy as np

from ccm_slam_tpu.ops import bow, hamming


def make_clustered_descs(key, n_clusters=16, per_cluster=32, flip=12):
    """Descriptors drawn around cluster prototypes (flip bits of noise)."""
    kc, kf = jax.random.split(key)
    protos = jax.random.randint(kc, (n_clusters, 32), 0, 256, dtype=jnp.uint8)
    descs = jnp.repeat(protos, per_cluster, axis=0)
    bits = hamming.unpack_bits(descs)
    n = bits.shape[0]
    flip_idx = jax.random.randint(kf, (n, flip), 0, 256)
    mask = jnp.zeros((n, 256), jnp.uint8).at[jnp.arange(n)[:, None], flip_idx].set(1)
    return hamming.pack_bits(jnp.bitwise_xor(bits, mask)), protos


class TestVocabulary:
    def test_train_recovers_clusters(self):
        key = jax.random.PRNGKey(0)
        descs, protos = make_clustered_descs(key)
        n = descs.shape[0]
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(1), descs, jnp.ones(n, bool), n_words=16, iters=10
        )
        # every descriptor should be within ~flip distance of its word
        d = hamming.hamming_cross(descs, vocab.words)
        best = jnp.min(d, axis=1)
        assert float(jnp.mean(best)) < 20, float(jnp.mean(best))

    def test_transform_same_scene_scores_high(self):
        key = jax.random.PRNGKey(2)
        descs, _ = make_clustered_descs(key, n_clusters=64, per_cluster=8)
        n = descs.shape[0]
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(3), descs, jnp.ones(n, bool), n_words=128, iters=6
        )
        # two "views" of the same scene: same descriptors, few flipped bits
        half = n // 2
        v1, w1 = bow.transform(vocab, descs[:half], jnp.ones(half, bool))
        v1b, _ = bow.transform(vocab, descs[:half], jnp.ones(half, bool))
        v2, _ = bow.transform(vocab, descs[half:], jnp.ones(half, bool))
        s_same = float(bow.l1_score(v1, v1b))
        s_diff = float(bow.l1_score(v1, v2))
        assert s_same > 0.999
        assert s_same > s_diff + 0.1, (s_same, s_diff)

    def test_score_range_and_db(self):
        key = jax.random.PRNGKey(4)
        descs, _ = make_clustered_descs(key)
        n = descs.shape[0]
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(5), descs, jnp.ones(n, bool), n_words=32, iters=4
        )
        v, _ = bow.transform(vocab, descs[:64], jnp.ones(64, bool))
        db = jnp.stack([v, v * 0.0])
        scores = bow.score_against_database(v, db, jnp.array([True, False]))
        assert 0.999 < float(scores[0]) <= 1.0
        assert float(scores[1]) == -1.0

    def test_word_ids_stable(self):
        key = jax.random.PRNGKey(6)
        descs, _ = make_clustered_descs(key)
        n = descs.shape[0]
        vocab = bow.train_vocabulary(
            jax.random.PRNGKey(7), descs, jnp.ones(n, bool), n_words=16, iters=4
        )
        _, w1 = bow.transform(vocab, descs, jnp.ones(n, bool))
        _, w2 = bow.transform(vocab, descs, jnp.ones(n, bool))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        # invalid slots get -1
        _, w3 = bow.transform(vocab, descs, jnp.zeros(n, bool))
        assert np.all(np.asarray(w3) == -1)
