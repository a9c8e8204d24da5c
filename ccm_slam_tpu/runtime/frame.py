"""Per-frame measurement container (the reference's ``Frame``,
cslam/src/Frame.cpp): undistorted keypoints + descriptors + per-slot landmark
associations, as a fixed-shape pytree."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..models.map_store import NO_MP
from ..ops.orb import FrameFeatures
from ..solvers.reproj import level_sigma2


@struct.dataclass
class Frame:
    timestamp: jnp.ndarray   # scalar f32
    xy: jnp.ndarray          # [N,2] undistorted level-0 pixels
    desc: jnp.ndarray        # [N,32] uint8
    octave: jnp.ndarray      # [N] int32
    angle: jnp.ndarray       # [N] f32 radians
    sigma2: jnp.ndarray      # [N] detection variance (1.2^(2*octave))
    valid: jnp.ndarray       # [N] bool
    # tracking state
    R_cw: jnp.ndarray        # [3,3]
    t_cw: jnp.ndarray        # [3]
    mp: jnp.ndarray          # [N] int32 landmark arena idx or NO_MP

    @property
    def n_feat(self):
        return self.xy.shape[0]

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def build_frame(feats: FrameFeatures, cam, timestamp, scale_factor: float = 1.2) -> Frame:
    """Undistort raw detections and wrap them as a Frame."""
    xy_und = cam.undistort_pixels(feats.xy)
    return Frame(
        timestamp=jnp.float32(timestamp),
        xy=xy_und,
        desc=feats.desc,
        octave=feats.octave,
        angle=feats.angle,
        sigma2=level_sigma2(feats.octave, scale_factor),
        valid=feats.valid,
        R_cw=jnp.eye(3),
        t_cw=jnp.zeros(3),
        mp=jnp.full((feats.xy.shape[0],), NO_MP, jnp.int32),
    )
