"""Pallas TPU kernels for the matching hot path.

``hamming_top2``: fused masked 256-bit Hamming matching — for every query
descriptor, the best and second-best target (distance + index) in ONE pass:
the [Q, T] distance matrix is produced tile-by-tile on the MXU and reduced
in VMEM, never touching HBM.  The XLA path (ops/hamming.py + top_k)
materializes the full matrix; at tracking scale (16k landmarks x 1k
features per frame, every frame) the fused kernel removes that round-trip.

Interface matches ``matching._masked_best2`` semantics; a jnp fallback runs
on CPU / in tests (also used to golden-check the kernel in interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import hamming

BIG = 1e9  # plain float: jnp scalars would be captured tracers inside kernels


def _top2_merge(b1, i1, s1, b2, i2, s2):
    """Merge two (best, idx, second) triples elementwise."""
    take2 = b2 < b1
    new_best = jnp.where(take2, b2, b1)
    new_bidx = jnp.where(take2, i2, i1)
    cand_second = jnp.where(take2, b1, b2)
    other_second = jnp.where(take2, s2, s1)
    new_second = jnp.minimum(cand_second, other_second)
    return new_best, new_bidx, new_second


def _tile_top2(dist, col0):
    """Per-row best/second + best index within one [TQ, TT] tile."""
    TT = dist.shape[1]
    m1 = jnp.min(dist, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx1 = jnp.min(jnp.where(dist == m1[:, None], cols, TT), axis=1)
    dist2 = jnp.where(cols == idx1[:, None], BIG, dist)
    m2 = jnp.min(dist2, axis=1)
    return m1, (idx1 + col0).astype(jnp.int32), m2


def _kernel(qb_ref, qn_ref, tb_ref, tn_ref, tmask_ref, best_ref, idx_ref, sec_ref):
    """Grid: (n_q_tiles,).  Target axis streamed with an inner loop."""
    TQ = qb_ref.shape[0]
    TT = 256
    n_t = tb_ref.shape[0] // TT

    qb = qb_ref[:]          # [TQ, 256] bf16 bit planes
    qn = qn_ref[:]          # [TQ, 1] f32 popcounts

    def body(tt, carry):
        best, bidx, sec = carry
        tb = tb_ref[pl_ds(tt * TT, TT), :]      # [TT, 256]
        tn = tn_ref[pl_ds(tt * TT, TT), :]      # [TT, 1]
        msk = tmask_ref[pl_ds(tt * TT, TT), :]  # [TT, 1] f32 0/1
        dots = jax.lax.dot_general(
            qb, tb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, TT]
        dist = qn[:, 0][:, None] + tn[:, 0][None, :] - 2.0 * dots
        dist = jnp.where(msk[:, 0][None, :] > 0.5, dist, BIG)
        m1, i1, m2 = _tile_top2(dist, tt * TT)
        return _top2_merge(best, bidx, sec, m1, i1, m2)

    init = (
        jnp.full((TQ,), BIG, jnp.float32),
        jnp.zeros((TQ,), jnp.int32),
        jnp.full((TQ,), BIG, jnp.float32),
    )
    best, bidx, sec = jax.lax.fori_loop(0, n_t, body, init)
    # outputs in native 128-lane layout (a [TQ, 1] output would pad every
    # row to 128 lanes and blow the VMEM budget)
    best_ref[:] = best.reshape(TQ // 128, 128)
    idx_ref[:] = bidx.reshape(TQ // 128, 128)
    sec_ref[:] = sec.reshape(TQ // 128, 128)


def pl_ds(start, size):
    from jax.experimental import pallas as pl

    return pl.ds(start, size)


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(q_desc, q_valid, t_desc, t_valid, interpret: bool = False):
    """(idx [Q], best [Q], second [Q]) — masked Hamming best-2 per query.

    q_desc [Q,32] uint8, t_desc [T,32] uint8.  Invalid queries return BIG
    distances; invalid targets never win.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, T = q_desc.shape[0], t_desc.shape[0]
    TQ, TT = 1024, 256  # TQ//128 = 8 rows: the minimal (8,128)-aligned output block
    Qp = -(-Q // TQ) * TQ
    Tp = -(-T // TT) * TT

    qb = hamming.unpack_bits(q_desc).astype(jnp.bfloat16)
    tb = hamming.unpack_bits(t_desc).astype(jnp.bfloat16)
    qn = jnp.sum(qb.astype(jnp.float32), axis=1, keepdims=True)
    tn = jnp.sum(tb.astype(jnp.float32), axis=1, keepdims=True)
    qb = _pad_to(qb, Qp)
    qn = _pad_to(qn, Qp)
    tb = _pad_to(tb, Tp)
    tn = _pad_to(tn, Tp)
    tmask = _pad_to(t_valid.astype(jnp.float32)[:, None], Tp)

    grid = (Qp // TQ,)
    best, idx, sec = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TQ // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((Qp // 128, 128), jnp.float32),
        ),
        interpret=interpret,
    )(qb, qn, tb, tn, tmask)

    best = best.reshape(-1)[:Q]
    idx = idx.reshape(-1)[:Q]
    sec = sec.reshape(-1)[:Q]
    inval = ~q_valid
    best = jnp.where(inval, BIG, jnp.round(best))
    sec = jnp.where(inval, BIG, jnp.round(sec))
    return idx, best.astype(jnp.int32).clip(0, 2**30), sec.astype(jnp.int32).clip(0, 2**30)


def hamming_top2_reference(q_desc, q_valid, t_desc, t_valid):
    """jnp fallback with identical semantics (and the golden for tests)."""
    d = hamming.masked_hamming_cross(q_desc, q_valid, t_desc, t_valid)
    d = jnp.where(q_valid[:, None], d, 2**30)
    d = jnp.where(t_valid[None, :], d, 2**30)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    return idx2[:, 0], -neg2[:, 0], -neg2[:, 1]
