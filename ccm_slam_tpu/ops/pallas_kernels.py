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
Mosaic scheduler (re-confirmed after the PCG kernel family compiled and
shipped — the stall is specific to this kernel's shape, not Pallas use in
general), so production matching stays on the XLA matmul path
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


# ---------------------------------------------------------------------------
# Camera<->observation transition kernels for the matrix-free PCG GBA path.
#
# The Schur matvec needs, per CG step, a broadcast v[cam(e)] (camera rows to
# observation rows) and its transpose, a segment-sum of observation rows by
# camera.  The XLA path (solvers/ba._pcg_transitions) factors the one-hot as
# two staged MXU contractions — exact, but it streams the [E,H]/[E,G] one-hot
# operands plus an [E,G*F] intermediate from HBM every call (~2 GB per CG
# step at stress scale C=1024, E=1M).  Here the one-hot tile is generated
# IN VMEM from an iota==cam_idx compare — zero HBM traffic for it — and both
# transitions become a single MXU contraction each, leaving payload-only
# traffic (~25 MB per call).  Entries are exactly 0/1 so results match the
# gather forms (precision: bf16 passes on the payload values; the `exact`
# paths use 3-pass f32 dots).
#
# Replaces the irregular-access core of g2o's sparse block ops in
# Optimizer::MapFusionGBA (cslam/src/Optimizer.cpp:646-859).
#
# The one-hot is FACTORED in-kernel (c = hi*G + lo, mirroring the XLA path's
# staging) so generation costs E*(Cp/G + G) VPU elements instead of E*Cp,
# VMEM per block stays small enough for fat blocks (few grid steps), and
# the [E, G*F] intermediate lives only in VMEM.
# ---------------------------------------------------------------------------

G_FACTOR = 16


def _eb_for(F8: int) -> int:
    """Observation rows per grid step: bound the [G, F8, EB] VMEM scratch.
    Must stay a multiple of 128 (lane tiling)."""
    return max(512, min(4096, ((4096 * 8) // F8 // 512) * 512))


def _cam_reduce_kernel(Cp: int, exact: bool):
    G = G_FACTOR
    H = Cp // G

    def kernel(yT_ref, ci_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

        ci = ci_ref[:]  # [1, EB] int32
        EB = ci.shape[1]
        F8 = yT_ref.shape[0]
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)  # [G, EB]
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)  # [H, EB]
        # z[g, f, e] = oh_lo[g, e] * y[f, e]   (VPU, VMEM-only)
        z = oh_lo[:, None, :] * yT_ref[:][None, :, :]  # [G, F8, EB]
        out_ref[:] += jax.lax.dot_general(
            oh_hi, z.reshape(G * F8, EB),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if exact else None,
        )  # [H, G*F8]

    return kernel


def _cam_broadcast_kernel(Cp: int, exact: bool):
    G = G_FACTOR
    H = Cp // G

    def kernel(vg_ref, ci_ref, out_ref):
        ci = ci_ref[:]  # [1, EB]
        EB = ci.shape[1]
        GF8 = vg_ref.shape[0]
        F8 = GF8 // G
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)
        # Z[(g,f), e] = sum_h v[(g,f), h] * oh_hi[h, e]   (MXU)
        Z = jax.lax.dot_general(
            vg_ref[:], oh_hi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if exact else None,
        )  # [G*F8, EB]
        # out[f, e] = sum_g oh_lo[g, e] * Z[(g,f), e]    (VPU, exact f32)
        out_ref[:] = jnp.sum(Z.reshape(G, F8, EB) * oh_lo[:, None, :], axis=0)

    return kernel


def _pad_axis(x, mult, axis, value=0):
    n = x.shape[axis]
    return _pad_to(x, -(-n // mult) * mult, axis=axis, value=value)


@partial(jax.jit, static_argnames=("C", "exact", "interpret"))
def cam_reduce(y, cam_idx, C: int, exact: bool = False, interpret: bool = False):
    """Segment-sum observation rows by camera: out[c] = sum_{e: ci[e]=c} y[e].

    y [E, F] f32, cam_idx [E] int32 (entries outside [0, C) are dropped).
    Returns [C, F] f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = G_FACTOR
    E, F = y.shape
    F8 = -(-F // 8) * 8
    Cp = -(-C // 128) * 128
    H = Cp // G
    EB = _eb_for(F8)
    yT = _pad_axis(_pad_axis(y, 8, 1).T, EB, 1)  # [F8, Ep]
    # padded slots get camera id Cp (hi = Cp//G >= H: matches no iota row)
    ci = _pad_axis(cam_idx.astype(jnp.int32)[None, :], EB, 1, value=Cp)  # [1, Ep]
    ci = jnp.where((ci < 0) | (ci >= C), Cp, ci)
    Ep = yT.shape[1]

    out = pl.pallas_call(
        _cam_reduce_kernel(Cp, exact),
        grid=(Ep // EB,),
        in_specs=[
            pl.BlockSpec((F8, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, G * F8), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, G * F8), jnp.float32),
        interpret=interpret,
    )(yT, ci)
    # out[h, (g, f)] -> [Cp, F8]: row c = hi*G + lo
    return out.reshape(H, G, F8).reshape(Cp, F8)[:C, :F]


@partial(jax.jit, static_argnames=("C", "exact", "interpret"))
def cam_broadcast(v, cam_idx, C: int, exact: bool = False, interpret: bool = False):
    """Broadcast camera rows to observation rows: out[e] = v[ci[e]].

    v [C, F] f32, cam_idx [E] int32 (out-of-range rows return zeros).
    Returns [E, F] f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = G_FACTOR
    E = cam_idx.shape[0]
    Cv, F = v.shape
    assert Cv == C
    F8 = -(-F // 8) * 8
    Cp = -(-C // 128) * 128
    H = Cp // G
    EB = _eb_for(F8)
    # v [C, F] -> [(g, f), h] so stage 1 is one matmul against oh_hi [H, EB]
    vp = _pad_axis(_pad_axis(v, 8, 1), Cp, 0)  # [Cp, F8]
    vg = jnp.transpose(vp.reshape(H, G, F8), (1, 2, 0)).reshape(G * F8, H)
    ci = _pad_axis(cam_idx.astype(jnp.int32)[None, :], EB, 1, value=Cp)  # [1, Ep]
    ci = jnp.where((ci < 0) | (ci >= C), Cp, ci)
    Ep = ci.shape[1]

    out = pl.pallas_call(
        _cam_broadcast_kernel(Cp, exact),
        grid=(Ep // EB,),
        in_specs=[
            pl.BlockSpec((G * F8, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F8, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F8, Ep), jnp.float32),
        interpret=interpret,
    )(vg, ci)
    return out[:F, :E].T


# ---------------------------------------------------------------------------
# Fused Schur off-diagonal matvec: the whole CG hot loop in ONE kernel.
#
#   off(v)_c = sum_{e: ci[e]=c} W_e ( V_{p(e)}^-1 sum_{e' in p(e)} W_{e'}^T v_{ci[e']} )
#
# Observations are repacked ONCE per LM iteration into block-local k-major
# blocks (lane = k*PB + p within each EB block): the point-side gather and
# segment-sum degenerate to contiguous lane slices / lane tiling — zero
# scratch, zero matmuls — and only the camera-side transitions need the
# factored hi/lo one-hots.  Per matvec the only HBM traffic is W (18
# f32/obs), Vinv (9 f32/landmark), cam_idx and v — ~84 MB at stress scale vs
# ~2 GB for the staged-XLA form; fat 4k blocks keep the grid short.
# ---------------------------------------------------------------------------


def _pad_rows(x, rows: int):
    """Pad sublane dim with zero rows (kernel-internal, static shapes)."""
    need = rows - x.shape[0]
    return jnp.concatenate([x, jnp.zeros((need, *x.shape[1:]), x.dtype)], axis=0) \
        if need > 0 else x


def _matvec_eb(K: int) -> int:
    """Observation rows per matvec grid step.  Lane tiling needs EB a
    multiple of K*128; VMEM (Z [G*8, EB] + U-reduce scratch [G, 8, EB])
    allows fat ~4k blocks — fewer grid steps, less per-step overhead."""
    base = K * 128
    return base * max(1, 4096 // base)


def _kmajor_cols(x, K: int, EB: int, pad_value=0):
    """Re-order obs-major columns (e = p*K + k) into block-local k-major
    blocks: within each EB-column block, lane l = k*PB + p_local.  Point
    sums/broadcasts then become contiguous lane slices in-kernel — no
    block-diagonal one-hot matmuls, no [EB, PB] scratch.

    x: [R, E] (or [E] -> treated as [1, E]).  Returns [R, Ep]."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    R, E = x.shape
    PB = EB // K
    P = E // K
    Pp = -(-P // PB) * PB
    x = _pad_axis(x, Pp * K, 1, value=pad_value)
    NB = Pp // PB
    x = x.reshape(R, NB, PB, K).transpose(0, 1, 3, 2).reshape(R, NB * EB)
    return x[0] if squeeze else x


def _schur_matvec_kernel(Cp: int, K: int, exact: bool):
    G = G_FACTOR
    H = Cp // G

    def kernel(vg_ref, WT_ref, VinvT_ref, ci_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

        prec = jax.lax.Precision.HIGHEST if exact else None
        ci = ci_ref[:]  # [1, EB] (block-local k-major: lane = k*PB + p)
        EB = ci.shape[1]
        PB = EB // K
        GF8 = vg_ref.shape[0]
        F8 = GF8 // G
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)

        # 1) vk[f, e] = v[ci[e], f]   (camera -> observation broadcast)
        Z = jax.lax.dot_general(
            vg_ref[:], oh_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [GF8, EB]
        vkT = jnp.sum(Z.reshape(G, F8, EB) * oh_lo[:, None, :], axis=0)  # [F8, EB]

        # 2) y1[j, e] = sum_i W[e, i, j] * vk[i, e]
        W3 = WT_ref[:][:18].reshape(6, 3, EB)
        y1 = jnp.sum(W3 * vkT[:6][:, None, :], axis=0)  # [3, EB]

        # 3) y2[j, p] = sum_k y1[j, k*PB + p]  (contiguous lane slices)
        y2 = y1[:, 0:PB]
        for k in range(1, K):
            y2 = y2 + y1[:, k * PB : (k + 1) * PB]  # [3, PB]

        # 4) y2b[i, p] = sum_j Vinv[p, i, j] * y2[j, p]
        V9 = VinvT_ref[:][:9].reshape(3, 3, PB)
        y2b = jnp.sum(V9 * y2[None, :, :], axis=1)  # [3, PB]

        # 5) back to observations: lane-tile across the K slots
        y2e = jnp.concatenate([y2b] * K, axis=1)  # [3, EB]

        # 6) y3[i, e] = sum_j W[e, i, j] * y2e[j, e]
        y3 = jnp.sum(W3 * y2e[None, :, :], axis=1)  # [6, EB]

        # 7) camera reduce of y3
        z = oh_lo[:, None, :] * _pad_rows(y3, F8)[None, :, :]  # [G, F8, EB]
        out_ref[:] += jax.lax.dot_general(
            oh_hi, z.reshape(G * F8, EB), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [H, G*F8]

    return kernel


def make_schur_matvec(W, Vinv, cam_idx, C: int, exact: bool = False,
                      interpret: bool = False, WT=None):
    """Prepare the fused off-diagonal Schur matvec.

    W [P, K, 6, 3] f32, Vinv [P, 3, 3] f32 (damped inverse), cam_idx [P, K]
    int32.  Returns ``off(v [C,6]) -> [C,6]`` computing
    ``sum_e onehot(ci) W_e Vinv_{p} sum_{e' in p} W_{e'}^T v[ci']``.
    Invalid observations must carry zero W rows (they do: the Jacobians are
    masked in _build_normal_blocks).

    ``WT`` — the [24, Ep'] obs-major packing from ``fused_normal_blocks`` —
    skips the packing transpose (W is then ignored and may be None).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = G_FACTOR
    P, K = cam_idx.shape
    E = P * K
    F8 = 8
    Cp = -(-C // 128) * 128
    H = Cp // G
    EB = _matvec_eb(K)
    PB = EB // K
    Pp = -(-P // PB) * PB
    Ep = Pp * K

    if WT is None:
        WT = _pad_axis(_pad_axis(W.reshape(E, 18), 8, 1).T, E, 1)[:24]  # [24, E]
        WT = _pad_rows(WT, 24) if WT.shape[0] < 24 else WT
    else:
        WT = WT[:, :E]
    # one-time repack into block-local k-major layout (amortized over all CG
    # steps of one LM iteration)
    WT = _kmajor_cols(WT, K, EB)
    VinvT = _pad_axis(_pad_axis(Vinv.reshape(P, 9), 16, 1).T, Pp, 1)[:16]
    ci = jnp.clip(cam_idx.reshape(-1).astype(jnp.int32), 0, C - 1)
    ci = _kmajor_cols(ci, K, EB, pad_value=Cp)[None, :]  # [1, Ep]

    grid = (Ep // EB,)
    kernel = _schur_matvec_kernel(Cp, K, exact)

    @jax.jit
    def off(v):
        vp = _pad_axis(_pad_axis(v, 8, 1), Cp, 0)  # [Cp, F8]
        vg = jnp.transpose(vp.reshape(H, G, F8), (1, 2, 0)).reshape(G * F8, H)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((G * F8, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((24, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, EB // K), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((H, G * F8), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, G * F8), jnp.float32),
            interpret=interpret,
        )(vg, WT, VinvT, ci)
        return out.reshape(H, G, F8).reshape(Cp, F8)[:C, :6]

    return off


def _schur_rhs_kernel(Cp: int, K: int, exact: bool):
    """Camera sums of W·q (q per landmark): steps 5-7 of the matvec —
    used for the reduced-system right-hand side b = g_c - rhs(Vinv g_p)."""
    G = G_FACTOR
    H = Cp // G

    def kernel(qT_ref, WT_ref, ci_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

        prec = jax.lax.Precision.HIGHEST if exact else None
        ci = ci_ref[:]
        EB = ci.shape[1]
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)
        W3 = WT_ref[:][:18].reshape(6, 3, EB)
        qe = jnp.concatenate([qT_ref[:]] * K, axis=1)[:3]  # [3, EB]
        y3 = jnp.sum(W3 * qe[None, :, :], axis=1)  # [6, EB]
        z = oh_lo[:, None, :] * _pad_rows(y3, 8)[None, :, :]
        out_ref[:] += jax.lax.dot_general(
            oh_hi, z.reshape(G * 8, EB), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    return kernel


def _schur_wtv_kernel(Cp: int, K: int, exact: bool):
    """Per-landmark sums of W^T v (v per camera): steps 1-3 of the matvec —
    used for the landmark back-substitution."""
    G = G_FACTOR
    H = Cp // G

    def kernel(vg_ref, WT_ref, ci_ref, out_ref):
        prec = jax.lax.Precision.HIGHEST if exact else None
        ci = ci_ref[:]
        EB = ci.shape[1]
        PB = EB // K
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)
        Z = jax.lax.dot_general(
            vg_ref[:], oh_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        vkT = jnp.sum(Z.reshape(G, 8, EB) * oh_lo[:, None, :], axis=0)
        W3 = WT_ref[:][:18].reshape(6, 3, EB)
        y1 = jnp.sum(W3 * vkT[:6][:, None, :], axis=0)  # [3, EB]
        y2 = y1[:, 0:PB]
        for k in range(1, K):
            y2 = y2 + y1[:, k * PB : (k + 1) * PB]
        out_ref[:] = _pad_rows(y2, 8)

    return kernel


def make_schur_ops(Vinv, cam_idx, C: int, WT, exact: bool = False,
                   interpret: bool = False, WT_kmajor: bool = False):
    """The three Schur-stage operators over one shared k-major W packing:

      off(v [C,6]) -> [C,6]   full off-diagonal matvec (the CG hot loop)
      rhs(q [P,3]) -> [C,6]   camera sums of W q   (right-hand-side assembly)
      wtv(v [C,6]) -> [P,3]   landmark sums of W^T v  (back-substitution)

    ``WT`` is the [24, >=E] obs-major packing from ``fused_normal_blocks``
    (or pack W [P,K,6,3] via its ``.reshape(E,18).T``).  The k-major repack
    happens ONCE here and is shared by every call — the Pallas PCG path
    never materializes W [P,K,6,3].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = G_FACTOR
    P, K = cam_idx.shape
    E = P * K
    Cp = -(-C // 128) * 128
    H = Cp // G
    EB = _matvec_eb(K)
    PB = EB // K
    Pp = -(-P // PB) * PB
    Ep = Pp * K
    grid = (Ep // EB,)

    if WT_kmajor:
        assert WT.shape[1] == Ep, (WT.shape, Ep)
        WTk = WT
    else:
        WTk = _kmajor_cols(WT[:, :E], K, EB)
    VinvT = _pad_axis(_pad_axis(Vinv.reshape(P, 9), 16, 1).T, Pp, 1)[:16]
    ci = jnp.clip(cam_idx.reshape(-1).astype(jnp.int32), 0, C - 1)
    ci = _kmajor_cols(ci, K, EB, pad_value=Cp)[None, :]

    def pack_v(v):
        vp = _pad_axis(_pad_axis(v, 8, 1), Cp, 0)
        return jnp.transpose(vp.reshape(H, G, 8), (1, 2, 0)).reshape(G * 8, H)

    mv_kernel = _schur_matvec_kernel(Cp, K, exact)
    rhs_kernel = _schur_rhs_kernel(Cp, K, exact)
    wtv_kernel = _schur_wtv_kernel(Cp, K, exact)

    cam_out_spec = pl.BlockSpec((H, G * 8), lambda j: (0, 0), memory_space=pltpu.VMEM)
    WT_spec = pl.BlockSpec((24, EB), lambda j: (0, j), memory_space=pltpu.VMEM)
    ci_spec = pl.BlockSpec((1, EB), lambda j: (0, j), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((G * 8, H), lambda j: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def off(v):
        out = pl.pallas_call(
            mv_kernel, grid=grid,
            in_specs=[v_spec, WT_spec,
                      pl.BlockSpec((16, PB), lambda j: (0, j), memory_space=pltpu.VMEM),
                      ci_spec],
            out_specs=cam_out_spec,
            out_shape=jax.ShapeDtypeStruct((H, G * 8), jnp.float32),
            interpret=interpret,
        )(pack_v(v), WTk, VinvT, ci)
        return out.reshape(H, G, 8).reshape(Cp, 8)[:C, :6]

    @jax.jit
    def rhs(q):
        qT = _pad_axis(_pad_axis(q, 8, 1).T, Pp, 1)  # [8, Pp]
        out = pl.pallas_call(
            rhs_kernel, grid=grid,
            in_specs=[pl.BlockSpec((8, PB), lambda j: (0, j), memory_space=pltpu.VMEM),
                      WT_spec, ci_spec],
            out_specs=cam_out_spec,
            out_shape=jax.ShapeDtypeStruct((H, G * 8), jnp.float32),
            interpret=interpret,
        )(qT, WTk, ci)
        return out.reshape(H, G, 8).reshape(Cp, 8)[:C, :6]

    @jax.jit
    def wtv(v):
        out = pl.pallas_call(
            wtv_kernel, grid=grid,
            in_specs=[v_spec, WT_spec, ci_spec],
            out_specs=pl.BlockSpec((8, PB), lambda j: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, Pp), jnp.float32),
            interpret=interpret,
        )(pack_v(v), WTk, ci)
        return out[:3, :P].T

    return off, rhs, wtv


def schur_rhs_reference(W, cam_idx, C: int):
    """jnp golden: rhs(q)[c] = sum_{e: ci=c} W_e q_{p(e)}."""

    def rhs(q):
        ci = jnp.clip(cam_idx, 0, C - 1)
        y3 = jnp.einsum("pkij,pj->pki", W, q)
        onehot = jax.nn.one_hot(ci, C, dtype=jnp.float32)
        return jnp.einsum("pkc,pki->ci", onehot, y3)

    return rhs


def schur_wtv_reference(W, cam_idx, C: int):
    """jnp golden: wtv(v)[p] = sum_k W_{pk}^T v[ci_{pk}]."""

    def wtv(v):
        ci = jnp.clip(cam_idx, 0, C - 1)
        return jnp.einsum("pkij,pki->pj", W, v[ci])

    return wtv


# ---------------------------------------------------------------------------
# Fused normal-equation assembly: residuals -> Jacobians -> U/V/W/g/cost in
# ONE pass over the observations.
#
# The XLA path (solvers/ba._build_normal_blocks) materializes every
# intermediate in HBM: Rc [E,9], Jc [E,12] (+weighted copy), U_blk [E,36],
# W [E,18], plus 3-pass exact reductions — measured 60 ms/LM-iter at stress
# scale (C=1024, E=1M) against ~2 ms of unavoidable traffic.  Here each
# observation block is processed entirely in VMEM: camera poses arrive via
# the factored in-VMEM one-hot broadcast, landmark positions via the
# block-diagonal point one-hot, all Jacobian/residual algebra is straight-
# line VPU math, and only the final products leave the chip:
#   WT   [24, Ep]   per-obs camera-point coupling (the CG matvec's layout)
#   Vg   [16, Pp]   per-landmark V (9) + g_p (3)
#   Ug   [H, G*48]  per-camera U (36) + g_c (6), factored-one-hot reduced
#   cost [8, 128]   partial sums of the Huber cost of the CURRENT state
#
# Semantics match _build_normal_blocks + _cost exactly (f32, HIGHEST-precision
# dots where payload values ride a one-hot).
# ---------------------------------------------------------------------------


def _seg_onehot(EB: int, K: int):
    """Block-diagonal point<->observation one-hot [EB, PB] (obs e belongs to
    landmark e // K; landmarks are contiguous runs of K slots)."""
    import jax.lax as lax

    PB = EB // K
    return (
        lax.broadcasted_iota(jnp.int32, (EB, PB), 0) // K
        == lax.broadcasted_iota(jnp.int32, (EB, PB), 1)
    ).astype(jnp.float32)


def _normal_blocks_kernel(Cp: int, K: int, delta: float, kmajor: bool = False):
    from jax.experimental import pallas as pl

    G = G_FACTOR
    H = Cp // G
    HI = jax.lax.Precision.HIGHEST
    d2 = delta * delta
    UCHUNK = 8  # payload rows per U-reduce pass (bounds the zz VMEM scratch)

    def kernel(vg_ref, XT_ref, obs_ref, ci_ref, intr_ref, WT_ref, Vg_ref, Ug_ref, cost_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            Ug_ref[:] = jnp.zeros(Ug_ref.shape, jnp.float32)
            cost_ref[:] = jnp.zeros(cost_ref.shape, jnp.float32)

        fx, fy, cx, cy = intr_ref[0, 0], intr_ref[0, 1], intr_ref[0, 2], intr_ref[0, 3]
        ci = ci_ref[:]  # [1, EB]
        EB = ci.shape[1]
        PB = EB // K
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)

        # camera fields -> observation lanes (rows: R 0..8, t 9..11, var 12)
        Z = jax.lax.dot_general(
            vg_ref[:], oh_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [G*16, EB]
        cam = jnp.sum(Z.reshape(G, 16, EB) * oh_lo[:, None, :], axis=0)  # [16, EB]
        R3 = cam[0:9].reshape(3, 3, EB)
        tc = cam[9:12]
        var_e = cam[12]

        # landmark fields -> observation lanes (rows: X 0..2, valid 3)
        if kmajor:
            # block-local k-major (lane = k*PB + p): point fields lane-tile
            Xl = jnp.concatenate([XT_ref[:]] * K, axis=1)  # [8, EB]
        else:
            seg = _seg_onehot(EB, K)  # [EB, PB]
            Xl = jax.lax.dot_general(
                XT_ref[:], seg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )  # [8, EB]
        Xe = Xl[0:3]
        pvalid = Xl[3]

        u_m, v_m, sigma2, ovalid = obs_ref[0], obs_ref[1], obs_ref[2], obs_ref[3]

        # residual (reproj.project_residual)
        Xc = jnp.sum(R3 * Xe[None, :, :], axis=1) + tc  # [3, EB]
        x, y, z = Xc[0], Xc[1], Xc[2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / z_safe
        r0 = fx * x * iz + cx - u_m
        r1 = fy * y * iz + cy - v_m

        valid = (ovalid > 0.5) & (pvalid > 0.5) & (z > 1e-6)
        w_conf = jnp.where(valid, 1.0 / jnp.where(sigma2 > 0, sigma2, 1.0), 0.0)
        chi2 = w_conf * (r0 * r0 + r1 * r1)
        sq = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
        w_rob = jnp.where(chi2 <= d2, 1.0, delta / sq)
        w = w_conf * w_rob
        rho = jnp.where(chi2 <= d2, chi2, 2.0 * delta * jnp.sqrt(jnp.clip(chi2, 0.0, None)) - d2)

        # Jacobians (reproj.pose_point_jacobians, left-mult [rho, phi])
        a = fx * iz
        b = -fx * x * iz * iz
        c = fy * iz
        d = -fy * y * iz * iz
        zero = jnp.zeros_like(a)
        Jc0 = [a, zero, b, b * y, a * z - b * x, -a * y]
        Jc1 = [zero, c, d, -c * z + d * y, -d * x, c * x]
        Jp0 = [a * R3[0, i] + b * R3[2, i] for i in range(3)]
        Jp1 = [c * R3[1, i] + d * R3[2, i] for i in range(3)]
        gate = jnp.where(w > 0, 1.0, 0.0)
        gc_gate = gate * var_e  # fixed cameras: no pose Jacobian
        Jc0 = [e * gc_gate for e in Jc0]
        Jc1 = [e * gc_gate for e in Jc1]
        Jp0 = [e * gate for e in Jp0]
        Jp1 = [e * gate for e in Jp1]

        # W = w Jc^T Jp  [18, EB] (+6 zero pad rows)
        W_rows = [
            w * (Jc0[i] * Jp0[jj] + Jc1[i] * Jp1[jj])
            for i in range(6)
            for jj in range(3)
        ]
        WT_ref[:] = jnp.stack(W_rows + [zero] * 6, axis=0)

        # V = w Jp^T Jp (9), g_p = -w Jp^T r (3) -> segment-reduce to points
        V_rows = [
            w * (Jp0[i] * Jp0[jj] + Jp1[i] * Jp1[jj])
            for i in range(3)
            for jj in range(3)
        ]
        gp_rows = [-w * (Jp0[i] * r0 + Jp1[i] * r1) for i in range(3)]
        Vg = jnp.stack(V_rows + gp_rows + [zero] * 4, axis=0)  # [16, EB]
        if kmajor:
            acc = Vg[:, 0:PB]
            for k in range(1, K):
                acc = acc + Vg[:, k * PB : (k + 1) * PB]
            Vg_ref[:] = acc
        else:
            Vg_ref[:] = jax.lax.dot_general(
                Vg, seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )  # [16, PB]

        # U = w Jc^T Jc (36), g_c = -w Jc^T r (6) -> camera reduce
        U_rows = [
            w * (Jc0[i] * Jc0[jj] + Jc1[i] * Jc1[jj])
            for i in range(6)
            for jj in range(6)
        ]
        gc_rows = [-w * (Jc0[i] * r0 + Jc1[i] * r1) for i in range(6)]
        Ug = jnp.stack(U_rows + gc_rows + [zero] * 6, axis=0)  # [48, EB]
        if kmajor:
            # chunked reduce bounds the zz scratch (fat k-major blocks);
            # output layout [H, 48*G]: column = payload_row * G + lo
            for c0 in range(0, 48, UCHUNK):
                zz = Ug[c0 : c0 + UCHUNK][:, None, :] * oh_lo[None, :, :]
                Ug_ref[:, c0 * G : (c0 + UCHUNK) * G] += jax.lax.dot_general(
                    oh_hi, zz.reshape(UCHUNK * G, EB), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )  # [H, UCHUNK*G]
        else:
            # single-pass reduce; output layout [H, G*48]: column = lo*48 + row
            zz = oh_lo[:, None, :] * Ug[None, :, :]  # [G, 48, EB]
            Ug_ref[:] += jax.lax.dot_general(
                oh_hi, zz.reshape(G * 48, EB), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )  # [H, G*48]

        # Huber cost partial sums (invalid lanes have chi2 = 0 -> rho = 0)
        rows = EB // 128
        rho2 = rho.reshape(rows, 128)
        pad = (-rows) % 8
        rho2 = _pad_rows(rho2, rows + pad)
        cost_ref[:] += jnp.sum(rho2.reshape(-1, 8, 128), axis=0)

    return kernel


def _obs_block_size(K: int) -> int:
    EB = K * 128
    while EB < 1024:
        EB *= 2
    if EB > 2048:
        raise ValueError(f"K={K} too large for the fused normal-blocks kernel")
    return EB


def _pack_problem(R, t, X, point_valid, cam_idx, uv, sigma2, obs_valid, C: int,
                  kmajor: bool = False):
    """Host-side packing shared by the fused kernels.

    ``kmajor`` packs observations into the matvec's block-local k-major
    layout (and its fat block size), so the WT the assembly kernel writes is
    DIRECTLY consumable by make_schur_ops — no per-LM-iteration repack."""
    G = G_FACTOR
    P, K = cam_idx.shape
    E = P * K
    EB = _matvec_eb(K) if kmajor else _obs_block_size(K)
    PB = EB // K
    if kmajor:
        Pp = -(-P // PB) * PB
        Ep = Pp * K
    else:
        Ep = -(-E // EB) * EB
        Pp = Ep // K
    Cp = -(-C // 128) * 128
    H = Cp // G

    XT = jnp.concatenate(
        [X.T.astype(jnp.float32), point_valid[None].astype(jnp.float32),
         jnp.zeros((4, P), jnp.float32)], axis=0,
    )  # [8, P]
    XT = _pad_axis(XT, Pp, 1)

    obs = jnp.stack(
        [uv[..., 0].reshape(-1), uv[..., 1].reshape(-1),
         sigma2.reshape(-1), obs_valid.reshape(-1).astype(jnp.float32)], axis=0,
    ).astype(jnp.float32)  # [4, E]
    ci = jnp.clip(cam_idx.reshape(-1).astype(jnp.int32), 0, C - 1)
    if kmajor:
        obs = _kmajor_cols(obs, K, EB)
        obs = jnp.concatenate([obs, jnp.zeros_like(obs[:4])])
        ci = _kmajor_cols(ci, K, EB, pad_value=Cp)[None, :]
    else:
        obs = _pad_axis(jnp.concatenate([obs, jnp.zeros((4, E), jnp.float32)]), EB, 1)
        ci = _pad_axis(ci[None, :], EB, 1, value=Cp)

    return EB, Ep, PB, Pp, Cp, H, XT, obs, ci


def _pack_cameras(R, t, cam_fixed, C: int, Cp: int):
    """[Cp, 16] camera rows (R 9, t 3, var 1) -> vg [G*16, H]."""
    G = G_FACTOR
    H = Cp // G
    var = (~cam_fixed).astype(jnp.float32)
    rows = jnp.concatenate(
        [R.reshape(C, 9), t, var[:, None], jnp.zeros((C, 3), jnp.float32)], axis=-1
    )
    rows = _pad_axis(rows, Cp, 0)  # [Cp, 16]
    return jnp.transpose(rows.reshape(H, G, 16), (1, 2, 0)).reshape(G * 16, H)


@partial(jax.jit, static_argnames=("C", "huber_delta", "interpret", "kmajor"))
def fused_normal_blocks(R, t, X, point_valid, cam_idx, uv, sigma2, obs_valid,
                        cam_fixed, C: int, fx, fy, cx, cy,
                        huber_delta: float, interpret: bool = False,
                        kmajor: bool = False):
    """One-pass normal-equation assembly on TPU.

    Returns (U [C,6,6], V [P,3,3], WT [24, Ep], g_c [C,6], g_p [P,3],
    cost_current scalar).  WT is the padded transpose of W: obs-major by
    default (recover W [P,K,6,3] with ``unpack_WT``); with ``kmajor=True``
    it comes out in the matvec kernels' block-local k-major layout, ready
    for ``make_schur_ops(..., WT_kmajor=True)`` with zero repack.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = G_FACTOR
    P, K = cam_idx.shape
    EB, Ep, PB, Pp, Cp, H, XT, obs, ci = _pack_problem(
        R, t, X, point_valid, cam_idx, uv, sigma2, obs_valid, C, kmajor=kmajor
    )
    vg = _pack_cameras(R, t, cam_fixed, C, Cp)

    grid = (Ep // EB,)
    intr = jnp.zeros((1, 128), jnp.float32)
    intr = intr.at[0, 0].set(fx).at[0, 1].set(fy).at[0, 2].set(cx).at[0, 3].set(cy)
    kernel = _normal_blocks_kernel(Cp, K, float(huber_delta), kmajor=kmajor)
    WT, Vg, Ug, cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G * 16, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((24, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, PB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G * 48), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((24, Ep), jnp.float32),
            jax.ShapeDtypeStruct((16, Pp), jnp.float32),
            jax.ShapeDtypeStruct((H, G * 48), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(vg, XT, obs, ci, intr)

    if kmajor:
        # [H, 48*G] (column = row*G + lo): c = hi*G + lo -> [hi, :, lo]
        UgC = jnp.transpose(Ug.reshape(H, 48, G), (0, 2, 1)).reshape(Cp, 48)[:C]
    else:
        UgC = Ug.reshape(H, G, 48).reshape(Cp, 48)[:C]
    U = UgC[:, :36].reshape(C, 6, 6)
    g_c = UgC[:, 36:42]
    VgP = Vg[:, :P].T
    V = VgP[:, :9].reshape(P, 3, 3)
    g_p = VgP[:, 9:12]
    return U, V, WT, g_c, g_p, jnp.sum(cost)


def unpack_WT(WT, P: int, K: int, kmajor: bool = False):
    """WT [24, Ep] -> W [P, K, 6, 3] (either column layout)."""
    E = P * K
    if not kmajor:
        return WT[:18, :E].T.reshape(P, K, 6, 3)
    EB = _matvec_eb(K)
    PB = EB // K
    NB = WT.shape[1] // EB
    w = WT[:18].reshape(18, NB, K, PB).transpose(0, 1, 3, 2).reshape(18, -1)
    return w[:, :E].T.reshape(P, K, 6, 3)


def _reproj_cost_kernel(Cp: int, K: int, delta: float):
    from jax.experimental import pallas as pl

    G = G_FACTOR
    H = Cp // G
    HI = jax.lax.Precision.HIGHEST
    d2 = delta * delta

    def kernel(vg_ref, XT_ref, obs_ref, ci_ref, intr_ref, cost_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            cost_ref[:] = jnp.zeros(cost_ref.shape, jnp.float32)

        fx, fy, cx, cy = intr_ref[0, 0], intr_ref[0, 1], intr_ref[0, 2], intr_ref[0, 3]
        ci = ci_ref[:]
        EB = ci.shape[1]
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (G, EB), 0) == ci % G
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, EB), 0) == ci // G
        ).astype(jnp.float32)
        seg = _seg_onehot(EB, K)

        Z = jax.lax.dot_general(
            vg_ref[:], oh_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        cam = jnp.sum(Z.reshape(G, 16, EB) * oh_lo[:, None, :], axis=0)
        R3 = cam[0:9].reshape(3, 3, EB)
        tc = cam[9:12]
        Xl = jax.lax.dot_general(
            XT_ref[:], seg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        Xe = Xl[0:3]
        pvalid = Xl[3]
        u_m, v_m, sigma2, ovalid = obs_ref[0], obs_ref[1], obs_ref[2], obs_ref[3]

        Xc = jnp.sum(R3 * Xe[None, :, :], axis=1) + tc
        z = Xc[2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / z_safe
        r0 = fx * Xc[0] * iz + cx - u_m
        r1 = fy * Xc[1] * iz + cy - v_m
        valid = (ovalid > 0.5) & (pvalid > 0.5) & (z > 1e-6)
        w_conf = jnp.where(valid, 1.0 / jnp.where(sigma2 > 0, sigma2, 1.0), 0.0)
        chi2 = w_conf * (r0 * r0 + r1 * r1)
        rho = jnp.where(
            chi2 <= d2, chi2, 2.0 * delta * jnp.sqrt(jnp.clip(chi2, 0.0, None)) - d2
        )
        rows = EB // 128
        rho2 = rho.reshape(rows, 128)
        pad = (-rows) % 8
        rho2 = _pad_rows(rho2, rows + pad)
        cost_ref[:] += jnp.sum(rho2.reshape(-1, 8, 128), axis=0)

    return kernel


@partial(jax.jit, static_argnames=("C", "huber_delta", "interpret"))
def fused_reproj_cost(R, t, X, point_valid, cam_idx, uv, sigma2, obs_valid,
                      C: int, fx, fy, cx, cy, huber_delta: float,
                      interpret: bool = False):
    """Huber reprojection cost in one payload-only pass (== solvers.ba._cost)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = G_FACTOR
    P, K = cam_idx.shape
    EB, Ep, PB, Pp, Cp, H, XT, obs, ci = _pack_problem(
        R, t, X, point_valid, cam_idx, uv, sigma2, obs_valid, C
    )
    vg = _pack_cameras(R, t, jnp.zeros((C,), bool), C, Cp)

    intr = jnp.zeros((1, 128), jnp.float32)
    intr = intr.at[0, 0].set(fx).at[0, 1].set(fy).at[0, 2].set(cx).at[0, 3].set(cy)
    kernel = _reproj_cost_kernel(Cp, K, float(huber_delta))
    cost = pl.pallas_call(
        kernel,
        grid=(Ep // EB,),
        in_specs=[
            pl.BlockSpec((G * 16, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(vg, XT, obs, ci, intr)
    return jnp.sum(cost)


def schur_matvec_reference(W, Vinv, cam_idx, C: int):
    """jnp golden for make_schur_matvec."""

    def off(v):
        ci = jnp.clip(cam_idx, 0, C - 1)
        vk = v[ci]  # [P,K,6]
        y1 = jnp.einsum("pkij,pki->pkj", W, vk)
        y2 = jnp.einsum("pij,pj->pi", Vinv, jnp.sum(y1, axis=1))
        y3 = jnp.einsum("pkij,pj->pki", W, y2)
        onehot = jax.nn.one_hot(ci, C, dtype=jnp.float32)
        return jnp.einsum("pkc,pki->ci", onehot, y3)

    return off


def cam_reduce_reference(y, cam_idx, C: int):
    """jnp golden: segment-sum with out-of-range drop."""
    ok = (cam_idx >= 0) & (cam_idx < C)
    ci = jnp.where(ok, cam_idx, 0)
    return jax.ops.segment_sum(
        jnp.where(ok[:, None], y, 0.0), ci, num_segments=C
    )


def cam_broadcast_reference(v, cam_idx, C: int):
    ok = (cam_idx >= 0) & (cam_idx < C)
    return jnp.where(ok[:, None], v[jnp.clip(cam_idx, 0, C - 1)], 0.0)
