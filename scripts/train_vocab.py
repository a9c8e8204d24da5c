"""Train the production BoW codebook from rendered-pixel ORB descriptors.

The reference ships ORBvoc.txt (~1M-leaf DBoW2 tree trained on outdoor
imagery, readme.md:102-106); this trains the flat-codebook analogue at 32k
words on descriptors extracted by OUR ORB pipeline from OUR rendered worlds
(corridor + loop, several texture seeds) — matching descriptor statistics
between training and deployment, which is what matters for word stability.

Run (TPU, ~minutes):  python scripts/train_vocab.py
Artifact: ccm_slam_tpu/data/vocab32k.npz (checked in; ~1 MB compressed).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_descriptors(n_per_seq=48, n_feat=600, cpu=False):
    import jax
    import jax.numpy as jnp

    from ccm_slam_tpu.config import CameraConfig, scaled_camera
    from ccm_slam_tpu.io.rendered import RenderedSequence
    from ccm_slam_tpu.ops import orb

    cam = scaled_camera(CameraConfig(), factor=1.0)
    cache = os.path.join("/tmp", "ccm_render_cache")
    all_desc = []
    for world in ("corridor", "loop"):
        for seed in (0, 1, 2):
            seq = RenderedSequence(world=world, seed=seed, n_frames=n_per_seq,
                                   cam=cam, cache_dir=cache)
            t0 = time.time()
            for i in range(n_per_seq):
                img = seq.render_frame(i)
                feats = orb.extract(jnp.asarray(img), n_features=n_feat,
                                    n_levels=8, capacity=1024)
                d = np.asarray(feats.desc)[np.asarray(feats.valid)]
                all_desc.append(d)
            print(f"{world}/{seed}: {n_per_seq} frames, "
                  f"{sum(len(a) for a in all_desc)} descs so far "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return np.concatenate(all_desc, 0)


def main():
    if "cpu" in sys.argv[1:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ccm_slam_tpu.ops import bow

    descs = collect_descriptors()
    print("total descriptors:", len(descs), flush=True)
    rs = np.random.RandomState(0)
    if len(descs) > 250_000:
        descs = descs[rs.choice(len(descs), 250_000, replace=False)]
    t0 = time.time()
    vocab = bow.train_vocabulary_large(
        jax.random.PRNGKey(1), jnp.asarray(descs), n_words=32768, iters=6
    )
    jax.block_until_ready(vocab.words)
    print(f"trained 32768 words in {time.time()-t0:.0f}s", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ccm_slam_tpu", "data", "vocab32k.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    bow.save_vocabulary(out, vocab)
    print("saved", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
