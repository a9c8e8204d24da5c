"""FAST-9/16 corner detection as dense tensor ops.

TPU-native counterpart of the per-cell cv::FAST calls in
``ORBextractor::ComputeKeyPointsOctTree`` (cslam/src/ORBextractor.cpp:933-1130).
Instead of looping over 30px cells and retrying with a lower threshold, the
whole level is evaluated at BOTH thresholds in one vectorized pass and the
reference's fallback semantics are reproduced with a per-cell mask:

    keypoint valid  <=>  corner@iniTh  OR  (corner@minTh AND cell has no corner@iniTh)

All ops are shifts/compares/reductions on the full image — VPU-friendly, no
gather, no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

# Bresenham circle of radius 3 (dy, dx), the standard FAST-16 ring, in ring order.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9  # FAST-9: at least 9 contiguous ring pixels


def _ring_shifts(img):
    """[16, H, W]: ring pixel value at offset k for every center."""
    return jnp.stack([jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE])


def fast_response(img, threshold: float):
    """(is_corner [H,W] bool, score [H,W] float32).

    Score = sum of |ring - center| - threshold over ring pixels beyond the
    threshold, max of the bright/dark arcs (cv::FAST's sum-of-absolute-
    differences score variant).
    """
    img = img.astype(jnp.float32)
    ring = _ring_shifts(img)  # [16,H,W]
    center = img[None]
    brighter = ring > center + threshold
    darker = ring < center - threshold

    def has_arc(mask):
        # wraparound contiguous run >= ARC_LEN: OR over all 16 start positions
        ext = jnp.concatenate([mask, mask[: ARC_LEN - 1]], axis=0)  # [24,H,W]
        out = jnp.zeros_like(mask[0])
        for s in range(16):
            run = jnp.all(ext[s : s + ARC_LEN], axis=0)
            out = out | run
        return out

    corner = has_arc(brighter) | has_arc(darker)
    diff = jnp.abs(ring - center) - threshold
    score_b = jnp.sum(jnp.where(brighter, diff, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(darker, diff, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)

    # kill the 3px border where the ring wraps around the image
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return corner & interior, jnp.where(corner & interior, score, 0.0)


def nms3x3(score):
    """3x3 non-maximum suppression; ties broken toward the top-left pixel."""
    H, W = score.shape
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh.append(jnp.roll(score, (-dy, -dx), axis=(0, 1)))
    neigh = jnp.stack(neigh)
    strictly_ge = score[None] >= neigh
    # for the 4 lexicographically-earlier neighbors require strict >
    earlier = [(-1, -1), (-1, 0), (-1, 1), (0, -1)]
    idx = 0
    keep = jnp.ones_like(score, bool)
    for i, (dy, dx) in enumerate([(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]):
        if (dy, dx) in earlier:
            keep = keep & (score > neigh[i])
        else:
            keep = keep & (score >= neigh[i])
    return keep & (score > 0)


def cell_fallback_mask(corner_hi, corner_lo, cell: int = 30):
    """Reference threshold-fallback semantics per `cell`-px grid cell."""
    H, W = corner_hi.shape
    ph = (-H) % cell
    pw = (-W) % cell
    hi_p = jnp.pad(corner_hi, ((0, ph), (0, pw)))
    gh, gw = hi_p.shape[0] // cell, hi_p.shape[1] // cell
    cell_has_hi = jnp.any(hi_p.reshape(gh, cell, gw, cell), axis=(1, 3))  # [gh,gw]
    cell_has_hi_full = jnp.repeat(jnp.repeat(cell_has_hi, cell, 0), cell, 1)[:H, :W]
    return corner_hi | (corner_lo & ~cell_has_hi_full)


def detect(img, ini_th: float = 20.0, min_th: float = 7.0, cell: int = 30):
    """Full FAST stage for one pyramid level.

    Returns (valid [H,W] bool, score [H,W] float32) after threshold fallback
    and 3x3 NMS.
    """
    c_hi, s_hi = fast_response(img, ini_th)
    c_lo, s_lo = fast_response(img, min_th)
    valid = cell_fallback_mask(c_hi, c_lo, cell)
    score = jnp.where(valid, s_lo, 0.0)  # low-threshold score is defined for both
    keep = nms3x3(score)
    return keep & valid, jnp.where(keep & valid, score, 0.0)
