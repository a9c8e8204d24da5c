"""Place-recognition recall with the production 32k-word vocabulary.

The reference ships a ~1M-leaf DBoW2 tree (ORBvoc.txt) and relies on it for
loop/map-match candidate quality; this gate measures the checked-in 32k flat
codebook (ccm_slam_tpu/data/vocab32k.npz, trained by scripts/train_vocab.py
on rendered-pixel ORB descriptors) the same way the system uses it: BoW
scores over real rendered images from UNSEEN worlds.

Protocol: for each held-out world texture seed, render a corridor pass at
half resolution, extract ORB, and build a database from the even frames;
the odd frames (different positions + different sensor noise) are queries.
A query "hits" if its best-scoring database frame is a spatial neighbor.
Cross-world queries (different texture) must score clearly below same-place
hits — the zero-false-closure margin."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.config import CameraConfig, scaled_camera
from ccm_slam_tpu.io.rendered import RenderedSequence
from ccm_slam_tpu.ops import bow, orb

VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ccm_slam_tpu", "data", "vocab32k.npz",
)
WORLD_SEEDS = (10, 11)           # never seen by scripts/train_vocab.py
N_FRAMES = 48


@pytest.fixture(scope="module")
def vocab():
    if not os.path.exists(VOCAB_PATH):
        pytest.skip("vocab artifact missing (run scripts/train_vocab.py)")
    return bow.load_vocabulary(VOCAB_PATH)


@pytest.fixture(scope="module")
def world_vecs(vocab):
    cam = scaled_camera(CameraConfig(), factor=0.5)
    cache = os.environ.get("CCM_RENDER_CACHE", "/tmp/ccm_render_cache")
    out = {}
    for seed in WORLD_SEEDS:
        for world in ("corridor", "loop"):
            seq = RenderedSequence(world=world, seed=seed, n_frames=N_FRAMES,
                                   cam=cam, cache_dir=cache)
            vecs = []
            for i in range(N_FRAMES):
                img = seq.render_frame(i)
                feats = orb.extract(jnp.asarray(img), n_features=800, n_levels=8,
                                    capacity=1024)
                v, _ = bow.transform(vocab, feats.desc, feats.valid)
                vecs.append(np.asarray(v))
            out[(world, seed)] = np.stack(vecs)
    return out


def _scores(q, db):
    """L1 BoW scores [len(db)] (DBoW2 L1 scoring)."""
    return np.asarray(
        bow.l1_score(jnp.asarray(q)[None, :], jnp.asarray(db))
    ).reshape(-1)


class TestVocabRecall:
    def test_same_place_recall(self, world_vecs):
        """>= 90% of queries (odd frames) rank a spatial neighbor (adjacent
        even frame) first, over >= 20 trials across unseen worlds."""
        hits, total = 0, 0
        for seed, vecs in world_vecs.items():
            db = vecs[0::2]
            for j, q in enumerate(vecs[1::2]):
                s = _scores(q, db)
                best = int(np.argmax(s))
                if best in (j, j + 1):   # even frames j*2 and j*2+2 flank query
                    hits += 1
                total += 1
        assert total >= 20
        assert hits / total >= 0.9, (hits, total)

    def test_cross_world_margin(self, world_vecs):
        """False-closure resistance at the vocabulary level: a query scored
        against a DIFFERENT world's database must score below its own-place
        hit in >= 90% of cases with a clearly positive median margin.  (BoW
        retrieval alone never guarantees zero false positives — the Sim3
        geometric verification stage is the hard gate, asserted by the merge
        and loop-closing tests; this bounds how often it gets exercised.)"""
        seeds = list(world_vecs)
        margins = []
        for a in seeds:
            vecs = world_vecs[a]
            db_own = vecs[0::2]
            for b in seeds:
                if b == a:
                    continue
                db_other = world_vecs[b][0::2]
                for j, q in enumerate(vecs[1::2]):
                    own = _scores(q, db_own)
                    own_hit = max(own[j], own[min(j + 1, len(db_own) - 1)])
                    cross = _scores(q, db_other).max()
                    margins.append(own_hit - cross)
        margins = np.array(margins)
        assert (margins > 0).mean() >= 0.9, (margins > 0).mean()
        assert np.median(margins) > 0.01, np.median(margins)

    def test_word_coverage(self, vocab):
        """The codebook must actually spread mass: no single word may own a
        large fraction of a frame's features (degenerate clustering)."""
        words = np.asarray(vocab.words)
        assert words.shape == (32768, 32)
        # words must be distinct (no collapsed clusters dominating)
        uniq = len(np.unique(words, axis=0))
        assert uniq > 30000, uniq
