"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's use of cv::undistortPoints / cv::projectPoints
(``cslam/src/Frame.cpp`` UndistortKeyPoints / ComputeImageBounds).  The
pipeline operates on *undistorted* keypoints throughout (as the reference
does); distortion enters only once, when raw detections are undistorted.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Camera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    # undistorted image bounds [min_x, max_x, min_y, max_y]
    bounds: jnp.ndarray

    @classmethod
    def from_config(cls, cfg) -> "Camera":
        cam = cls(
            fx=jnp.float32(cfg.fx),
            fy=jnp.float32(cfg.fy),
            cx=jnp.float32(cfg.cx),
            cy=jnp.float32(cfg.cy),
            k1=jnp.float32(cfg.k1),
            k2=jnp.float32(cfg.k2),
            p1=jnp.float32(cfg.p1),
            p2=jnp.float32(cfg.p2),
            k3=jnp.float32(cfg.k3),
            bounds=jnp.zeros(4, jnp.float32),
        )
        return cam.replace(bounds=cam.compute_bounds(cfg.width, cfg.height))

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    # -- projection (no distortion: operates in the undistorted pixel frame) --

    def project(self, xc):
        """Camera-frame points [..., 3] -> undistorted pixels [..., 2].
        No validity handling; pair with ``in_front`` / depth checks."""
        z = xc[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * xc[..., 0] / z_safe + self.cx
        v = self.fy * xc[..., 1] / z_safe + self.cy
        return jnp.stack([u, v], axis=-1)

    def backproject(self, uv, depth=None):
        """Undistorted pixels [..., 2] -> unit-depth rays (or scaled by depth)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        if depth is not None:
            ray = ray * depth[..., None]
        return ray

    # -- distortion ---------------------------------------------------------

    def distort_normalized(self, xy):
        """Apply radtan to normalized coords [..., 2]."""
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort_pixels(self, uv, iters: int = 8):
        """Distorted pixels -> undistorted pixels (fixed-point iteration, the
        same scheme cv::undistortPoints uses)."""
        xd = jnp.stack(
            [(uv[..., 0] - self.cx) / self.fx, (uv[..., 1] - self.cy) / self.fy], axis=-1
        )
        x = xd
        for _ in range(iters):
            d = self.distort_normalized(x) - x  # distortion delta at current estimate
            # clamp to a generous normalized-coordinate range: the fixed point
            # diverges (-> NaN) far outside the distortion model's domain
            x = jnp.clip(xd - d, -8.0, 8.0)
        return jnp.stack(
            [x[..., 0] * self.fx + self.cx, x[..., 1] * self.fy + self.cy], axis=-1
        )

    def compute_bounds(self, width: int, height: int):
        """Undistort the 4 image corners (reference Frame::ComputeImageBounds)."""
        corners = jnp.array(
            [[0.0, 0.0], [width, 0.0], [0.0, height], [width, height]], jnp.float32
        )
        und = self.undistort_pixels(corners)
        min_x = jnp.minimum(und[0, 0], und[2, 0])
        max_x = jnp.maximum(und[1, 0], und[3, 0])
        min_y = jnp.minimum(und[0, 1], und[1, 1])
        max_y = jnp.maximum(und[2, 1], und[3, 1])
        return jnp.stack([min_x, max_x, min_y, max_y])

    def in_bounds(self, uv):
        b = self.bounds
        return (
            (uv[..., 0] >= b[0]) & (uv[..., 0] < b[1]) & (uv[..., 1] >= b[2]) & (uv[..., 1] < b[3])
        )
