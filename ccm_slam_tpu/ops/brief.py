"""Steered-BRIEF descriptor sampling pattern and bit computation.

Functional counterpart of the rotated-BRIEF stage of
``ORBextractor::operator()`` (cslam/src/ORBextractor.cpp:1105-1214).  The
reference uses the learned 256-pair pattern from the ORB paper; this
framework generates its own deterministic Gaussian pattern (original BRIEF
recipe: pairs ~ N(0, (patch/5)^2), seeded) — descriptors only ever need to be
consistent *within* the framework (matcher, vocabulary, and database all
operate on these descriptors), so bit-compatibility with OpenCV is a non-goal.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

PATCH_HALF = 15  # sample coordinates stay inside the 31x31 patch
N_BITS = 256


def make_pattern(seed: int = 20260817) -> np.ndarray:
    """[256, 4] int8 array of (x1, y1, x2, y2) sample offsets."""
    rng = np.random.RandomState(seed)
    sigma = (2 * PATCH_HALF + 1) / 5.0
    pts = rng.randn(N_BITS, 4) * sigma
    pts = np.clip(np.round(pts), -(PATCH_HALF - 2), PATCH_HALF - 2)
    return pts.astype(np.int8)


PATTERN = make_pattern()


def steered_coords(angle_rad):
    """Rotate the pattern by per-keypoint angles.

    angle_rad: [K] -> (p1 [K,256,2], p2 [K,256,2]) float32 (x, y) offsets.
    """
    pat = jnp.asarray(PATTERN, jnp.float32)  # [256,4]
    ca = jnp.cos(angle_rad)[:, None]
    sa = jnp.sin(angle_rad)[:, None]
    x1, y1, x2, y2 = pat[:, 0][None], pat[:, 1][None], pat[:, 2][None], pat[:, 3][None]
    r1 = jnp.stack([x1 * ca - y1 * sa, x1 * sa + y1 * ca], axis=-1)
    r2 = jnp.stack([x2 * ca - y2 * sa, x2 * sa + y2 * ca], axis=-1)
    return r1, r2


def descriptor_bits(img, kp_xy, angle_rad):
    """Sample steered-BRIEF bits with nearest-neighbor lookups.

    img: [H, W] (should be pre-blurred); kp_xy: [K, 2] (x, y) float;
    angle_rad: [K].  Returns uint8 [K, 32].
    """
    from .hamming import pack_bits

    H, W = img.shape
    p1, p2 = steered_coords(angle_rad)  # [K,256,2]
    base = kp_xy[:, None, :]  # [K,1,2]

    def sample(p):
        x = jnp.clip(jnp.round(base[..., 0] + p[..., 0]).astype(jnp.int32), 0, W - 1)
        y = jnp.clip(jnp.round(base[..., 1] + p[..., 1]).astype(jnp.int32), 0, H - 1)
        return img[y, x]  # [K,256]

    bits = (sample(p1) < sample(p2)).astype(jnp.uint8)
    return pack_bits(bits)
