"""Pallas TPU kernels for the matching hot path.

``hamming_top2``: fused masked 256-bit Hamming matching — for every query
descriptor, the best and second-best target (distance + index) in ONE pass:
the [Q, T] distance matrix is produced tile-by-tile on the MXU and reduced
in VMEM, never touching HBM.  The XLA path (ops/hamming.py + top_k)
materializes the full matrix; at tracking scale (16k landmarks x 1k
features per frame, every frame) the fused kernel removes that round-trip.

Design notes (learned on hardware):
* the reduction state lives in the OUTPUT blocks, which are revisited
  across the target-tile grid axis (TPU grids iterate sequentially, last
  axis innermost) — fori_loop carries of 1-D vectors spilled registers;
* outputs are [Q, 128] with the value broadcast across lanes: width-1
  outputs lane-pad anyway, and (8,128)-divisible blocks are mandatory.

Interface matches ``matching._masked_best2`` semantics; a jnp fallback runs
on CPU / in tests (also used to golden-check the kernel in interpret mode).

Status: semantics golden-verified in interpret mode; on the current
remote-compile toolchain the hardware build of this kernel stalls in the
Mosaic scheduler, so production matching stays on the XLA matmul path
(ops/hamming.py) until the toolchain settles — swap in via
``matching.match_brute(..., backend="pallas")`` once it does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import hamming

BIG = 1e9  # plain float: jnp scalars would be captured tracers inside kernels
TQ = 1024  # queries per grid row; packs into one (8,128) output block
TT = 512


def _tile_top2(dist, col0):
    """Per-row best/second + best index within one [TQ, TT] tile."""
    n_cols = dist.shape[1]
    m1 = jnp.min(dist, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx1 = jnp.min(jnp.where(dist == m1[:, None], cols, n_cols), axis=1)
    dist2 = jnp.where(cols == idx1[:, None], BIG, dist)
    m2 = jnp.min(dist2, axis=1)
    return m1, (idx1 + col0).astype(jnp.int32), m2


def _kernel(qb_ref, qn_ref, tb_ref, tn_ref, tmask_ref, best_ref, idx_ref, sec_ref):
    """Grid: (n_q_tiles, n_t_tiles); outputs revisited along axis 1."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full(best_ref.shape, BIG, jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)
        sec_ref[:] = jnp.full(sec_ref.shape, BIG, jnp.float32)

    dots = jax.lax.dot_general(
        qb_ref[:], tb_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, TT]
    dist = qn_ref[:, 0][:, None] + tn_ref[:, 0][None, :] - 2.0 * dots
    dist = jnp.where(tmask_ref[:, 0][None, :] > 0.5, dist, BIG)
    m1, i1, m2 = _tile_top2(dist, j * TT)

    # reduction state packed as (8,128) blocks: 1024 queries per grid row
    cur_b = best_ref[:].reshape(-1)
    cur_i = idx_ref[:].reshape(-1)
    cur_s = sec_ref[:].reshape(-1)
    take = m1 < cur_b
    new_b = jnp.where(take, m1, cur_b)
    new_i = jnp.where(take, i1, cur_i)
    new_s = jnp.minimum(jnp.where(take, cur_b, m1), jnp.where(take, m2, cur_s))
    best_ref[:] = new_b.reshape(best_ref.shape)
    idx_ref[:] = new_i.reshape(idx_ref.shape)
    sec_ref[:] = new_s.reshape(sec_ref.shape)


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

    grid = (Qp // TQ, Tp // TT)
    best, idx, sec = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, 256), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TQ // 128, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ // 128, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ // 128, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
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
