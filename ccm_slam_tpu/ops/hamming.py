"""Batched 256-bit Hamming distance for ORB descriptors.

TPU-native replacement for the scalar popcount loop in the reference
(``ORBmatcher::DescriptorDistance``, cslam/src/ORBmatcher.cpp:1653-1670): all
matching strategies reduce to dense [Q, D] distance matrices computed in one
fused op, instead of per-pair popcounts inside nested loops.

Descriptors are stored as ``uint8 [N, 32]`` (256 bits).  The fast path
bit-unpacks to ``{0,1}`` int8/bf16 planes and uses the MXU:

    popcount(a XOR b) = |a| + |b| - 2 a.b     (for bit vectors a, b)

so a full cross-distance is a single [Q,256]x[256,D] matmul — exactly the
shape TPUs are built for.  A `jnp.bitwise_count` path is kept as reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID_DIST = jnp.int32(256)  # > max Hamming distance; used to mask invalid slots
TH_LOW = 50   # reference ORBmatcher.cpp:63
TH_HIGH = 100  # reference ORBmatcher.cpp:64


def unpack_bits(desc_u8):
    """uint8 [..., 32] -> bit planes [..., 256] (uint8 in {0,1}).

    Bit order is LSB-first per byte; consistent across the framework so it
    never needs to match any external layout.
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*desc_u8.shape[:-1], desc_u8.shape[-1] * 8)


def pack_bits(bits):
    """[..., 256] {0,1} -> uint8 [..., 32]. Inverse of unpack_bits."""
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8).astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint8)


def hamming_cross(query_u8, db_u8):
    """Dense cross Hamming distance via MXU matmul.

    query_u8: [Q, 32] uint8, db_u8: [D, 32] uint8 -> [Q, D] int32 in [0, 256].
    """
    qb = unpack_bits(query_u8).astype(jnp.bfloat16)  # [Q, 256]
    db = unpack_bits(db_u8).astype(jnp.bfloat16)  # [D, 256]
    # bf16 has enough mantissa for exact integer dot products up to 256.
    dots = jax.lax.dot_general(
        qb,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, D]
    qn = jnp.sum(qb.astype(jnp.float32), axis=-1)  # [Q]
    dn = jnp.sum(db.astype(jnp.float32), axis=-1)  # [D]
    dist = qn[:, None] + dn[None, :] - 2.0 * dots
    return jnp.round(dist).astype(jnp.int32)


def hamming_cross_popcount(query_u8, db_u8):
    """Reference implementation via bitwise_count (no MXU); for golden tests."""
    x = jnp.bitwise_xor(query_u8[:, None, :], db_u8[None, :, :])
    return jnp.sum(jnp.bitwise_count(x).astype(jnp.int32), axis=-1)


def hamming_pairwise(a_u8, b_u8):
    """Elementwise-paired distance: [..., 32] x [..., 32] -> [...] int32."""
    x = jnp.bitwise_xor(a_u8, b_u8)
    return jnp.sum(jnp.bitwise_count(x).astype(jnp.int32), axis=-1)


def masked_hamming_cross(query_u8, query_valid, db_u8, db_valid):
    """Cross distance with invalid slots pushed to INVALID_DIST."""
    d = hamming_cross(query_u8, db_u8)
    mask = query_valid[:, None] & db_valid[None, :]
    return jnp.where(mask, d, INVALID_DIST)


def best_match(dist, axis=-1):
    """(best_idx, best_dist, second_dist) along `axis` of a distance matrix.

    Mirrors the bestDist/bestDist2 pattern used throughout ORBmatcher for the
    Lowe-style ratio test (e.g. cslam/src/ORBmatcher.cpp:497-540).
    """
    neg = -dist  # top_k gives largest
    top2, idx2 = jax.lax.top_k(jnp.moveaxis(neg, axis, -1), 2)
    best_idx = idx2[..., 0]
    best = -top2[..., 0]
    second = -top2[..., 1]
    return best_idx, best, second


def mutual_best(dist):
    """Mutual nearest-neighbor test on a [Q, D] distance matrix.

    Returns (match_idx [Q], valid [Q]) where valid marks rows whose best
    column also has that row as its best (the reference's
    SearchBySim3/CheckAgreement mutual pattern)."""
    row_best = jnp.argmin(dist, axis=1)  # [Q]
    col_best = jnp.argmin(dist, axis=0)  # [D]
    mutual = col_best[row_best] == jnp.arange(dist.shape[0])
    return row_best, mutual


def rotation_histogram_filter(angle_q, angle_t, match_valid, n_bins: int = 30, keep: int = 3):
    """Rotation-consistency filter (ORBmatcher HISTO_LENGTH=30 /
    ComputeThreeMaxima semantics, cslam/src/ORBmatcher.cpp:1607-1646).

    angle_q/angle_t: per-match keypoint angles in degrees, [N].
    Keeps matches whose angle difference falls in the `keep` most populated
    histogram bins (bin 2/3 additionally require >=10% of bin 1's count).
    Returns filtered validity mask [N].
    """
    rot = angle_q - angle_t
    rot = jnp.where(rot < 0.0, rot + 360.0, rot)
    factor = n_bins / 360.0
    bins = jnp.round(rot * factor).astype(jnp.int32)
    bins = jnp.where(bins == n_bins, 0, bins)
    bins = jnp.clip(bins, 0, n_bins - 1)
    counts = jnp.zeros(n_bins, jnp.int32).at[bins].add(match_valid.astype(jnp.int32))
    top_counts, top_idx = jax.lax.top_k(counts, keep)
    # bins 2..keep only kept if count >= 0.1 * max (reference :1636-1643)
    keep_mask = top_counts >= jnp.maximum(
        1, (0.1 * top_counts[0]).astype(jnp.int32) * jnp.arange(keep).clip(0, 1)
    )
    in_top = jnp.any((bins[:, None] == top_idx[None, :]) & keep_mask[None, :], axis=1)
    return match_valid & in_top
