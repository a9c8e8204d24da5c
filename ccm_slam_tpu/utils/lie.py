"""Batched SO(3) / SE(3) / Sim(3) Lie-group operations.

TPU-native replacement for the reference's g2o ``SE3Quat``/``Sim3`` types
(``cslam/thirdparty/g2o/g2o/types/{se3quat.h,sim3.h}``) — everything is a
broadcastable jnp function so whole keyframe arenas transform in one fused op,
and LM solvers differentiate through ``*_exp`` for tangent-space updates.

Conventions:
* Rotations are 3x3 matrices; quaternions are (w, x, y, z), Hamilton.
* SE(3) tangent is ``[rho(3), phi(3)]`` (translation first, like g2o).
* Sim(3) tangent is ``[rho(3), phi(3), sigma(1)]``; ``exp`` gives
  ``(s, R, t) = (e^sigma, exp(phi), W(phi, sigma) rho)`` where W is the
  closed-form integral  W = C I + (alpha/theta) K + ((C - beta)/theta^2) K^2
  with C = (s-1)/sigma,  alpha = int_0^1 e^{su} sin(u theta) du,
  beta = int_0^1 e^{su} cos(u theta) du  (Taylor-guarded for small angles).

A Sim(3) with s=1 is an SE(3); helpers accept either.  All functions
broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_EPS = 1e-8


def hat(v):
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """[..., 3, 3] skew matrix -> [..., 3]."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x with Taylor guard."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def orthonormalize(R):
    """Project [..., 3, 3] matrices back onto SO(3) (nearest rotation).

    Two Newton-polar iterations ``R <- R (3I - R^T R) / 2``: each maps a
    singular-value defect e to ~1.5 e^2, so near-orthogonal inputs (defect
    <= ~0.1) land at float-precision orthogonality.  MUST be applied after
    every chain of multiplicative rotation updates (``dR @ R`` in solvers,
    velocity composition in tracking): transpose-as-inverse plus iterated
    products otherwise AMPLIFY float32 defects geometrically — measured
    ~2.4x/frame through the tracker's constant-velocity feedback loop,
    warping the map via BA against non-orthogonal camera poses."""
    eye3 = 3.0 * jnp.eye(3, dtype=R.dtype)
    for _ in range(2):
        R = 0.5 * (R @ (eye3 - jnp.swapaxes(R, -1, -2) @ R))
    return R


def so3_exp(phi):
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)  # safe; exact at 0 via Taylor branch
    small = theta2 < 1e-8
    k = hat(phi)
    k2 = k @ k
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(1e-16))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def so3_log(R):
    """[..., 3, 3] -> [..., 3].  Handles angles up to pi (pi-neighborhood via
    the diagonal-dominant axis extraction)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    # sin from the skew part (well-conditioned near pi, unlike sqrt(1-cos^2))
    sin_theta = jnp.linalg.norm(w, axis=-1)
    theta = jnp.arctan2(sin_theta, cos_theta)

    # Generic branch: phi = theta / sin(theta) * w  (theta/sin -> 1 at 0)
    small = sin_theta < 1e-6
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.clip(sin_theta, 1e-12))
    phi_generic = scale[..., None] * w

    # Near pi: axis from the largest diagonal of (R + I)/2 = aa^T (+cos terms)
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5 - cos_theta[..., None, None] * jnp.eye(
        3, dtype=R.dtype
    )
    # columns of B are (1-cos)*a*a_i ; pick the largest-norm column
    col_norms = jnp.linalg.norm(B, axis=-2)
    j = jnp.argmax(col_norms, axis=-1)
    axis_raw = jnp.take_along_axis(B, j[..., None, None], axis=-1)[..., 0]
    axis = axis_raw / jnp.clip(jnp.linalg.norm(axis_raw, axis=-1, keepdims=True), 1e-12)
    # fix sign so that it agrees with the skew part (w = sin(theta) a ~ 0 at pi,
    # use the off-diagonal signs of R instead: a_i a_j signs)
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    phi_pi = theta[..., None] * axis * sign

    # The generic branch's relative error blows up as sin(theta) -> 0 with
    # cos(theta) < 0 (w entries are O(sin) with O(eps) absolute noise), so
    # switch to the diagonal-based axis well before sin underflows.
    near_pi = (sin_theta < 1e-3) & (cos_theta < 0.0)
    phi = jnp.where(near_pi[..., None], phi_pi, phi_generic)
    return phi


def _se3_V_coeffs(theta2, dtype):
    """Coefficients (b, c) of V = I + b K + c K^2 for SE(3) exp."""
    theta = jnp.sqrt(theta2.clip(1e-16))
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(1e-16))
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta).clip(1e-16)
    )
    return b, c


def se3_exp(xi):
    """[..., 6] (rho, phi) -> (R [...,3,3], t [...,3])."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    k = hat(phi)
    k2 = k @ k
    b, c = _se3_V_coeffs(theta2, xi.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    V = eye + b[..., None, None] * k + c[..., None, None] * k2
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """(R, t) -> [..., 6]."""
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    k = hat(phi)
    k2 = k @ k
    b, c = _se3_V_coeffs(theta2, phi.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    V = eye + b[..., None, None] * k + c[..., None, None] * k2
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def _sim3_W(phi, sigma):
    """W(phi, sigma): [...,3] x [...] -> [...,3,3] such that t = W rho."""
    dtype = phi.dtype
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2.clip(1e-16))
    s = jnp.exp(sigma)
    k = hat(phi)
    k2 = k @ k
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-8
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    th_safe = jnp.where(th_small, 1.0, theta)
    denom = sigma * sigma + theta2
    denom_safe = jnp.where(denom < 1e-12, 1.0, denom)

    # C = (s - 1)/sigma  (-> 1 + sigma/2 as sigma -> 0)
    C = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig_safe)

    # alpha = int e^{sigma u} sin(u theta) du; A = alpha/theta
    alpha = (s * (sigma * jnp.sin(theta) - theta * jnp.cos(theta)) + theta) / denom_safe
    A_generic = alpha / th_safe
    # theta->0: A -> int u e^{sigma u} du = (s(sigma-1)+1)/sigma^2 -> 1/2 + sigma/3
    A_th0 = jnp.where(
        sig_small,
        0.5 + sigma / 3.0 + sigma * sigma / 8.0,
        (s * (sigma - 1.0) + 1.0) / (sig_safe * sig_safe),
    )
    A = jnp.where(th_small, A_th0, A_generic)

    # beta = int e^{sigma u} cos(u theta) du; B = (C - beta)/theta^2
    beta = (s * (sigma * jnp.cos(theta) + theta * jnp.sin(theta)) - sigma) / denom_safe
    B_generic = (C - beta) / jnp.where(th_small, 1.0, theta2)
    # theta->0: B -> 1/2 int u^2 e^{sigma u} du = (s(sigma^2-2sigma+2)-2)/(2 sigma^3)
    B_th0 = jnp.where(
        sig_small,
        1.0 / 6.0 + sigma / 8.0 + sigma * sigma / 20.0,
        (s * (sigma * sigma - 2.0 * sigma + 2.0) - 2.0) / (2.0 * sig_safe**3),
    )
    B = jnp.where(th_small, B_th0, B_generic)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), k.shape)
    return C[..., None, None] * eye + A[..., None, None] * k + B[..., None, None] * k2


def sim3_exp(xi):
    """[..., 7] (rho, phi, sigma) -> (s [...], R [...,3,3], t [...,3])."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = (W @ rho[..., None])[..., 0]
    return s, R, t


def sim3_log(s, R, t):
    """(s, R, t) -> [..., 7]."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_to_rot(q):
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Shepperd's method, branch-free via where-select of 4 candidates."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick the numerically best one.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) * 0.5
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 0.5
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) * 0.5
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) * 0.5
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


# ---------------------------------------------------------------------------
# Transform dataclasses (pytrees; batched over leading dims)
# ---------------------------------------------------------------------------


def _broadcast_apply(R, t, x):
    """Apply [batch..., 3,3] rotation + translation to points
    [batch..., extra..., 3]: extra point axes beyond the transform's batch are
    broadcast (e.g. a [H] batch of transforms on [H, N, 3] or [N, 3] points)."""
    extra = (x.ndim - 1) - (R.ndim - 2)
    if extra < 0:
        # transform batch broadcasts over plain points instead
        return (R @ x[..., None])[..., 0] + t
    Rb = R.reshape(R.shape[:-2] + (1,) * extra + (3, 3))
    tb = t.reshape(t.shape[:-1] + (1,) * extra + (3,))
    return (Rb @ x[..., None])[..., 0] + tb


@struct.dataclass
class SE3:
    """Rigid transform x' = R x + t.  Fields broadcast over leading dims."""

    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32):
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return cls(R=R, t=t)

    @classmethod
    def exp(cls, xi):
        R, t = se3_exp(xi)
        return cls(R=R, t=t)

    def log(self):
        return se3_log(self.R, self.t)

    def apply(self, x):
        return _broadcast_apply(self.R, self.t, x)

    def compose(self, other: "SE3") -> "SE3":
        return SE3(R=self.R @ other.R, t=(self.R @ other.t[..., None])[..., 0] + self.t)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(R=Rt, t=-(Rt @ self.t[..., None])[..., 0])

    def matrix(self):
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), (*self.t.shape[:-1], 1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @classmethod
    def from_matrix(cls, T):
        return cls(R=T[..., :3, :3], t=T[..., :3, 3])

    def to_sim3(self) -> "Sim3":
        return Sim3(s=jnp.ones(self.t.shape[:-1], self.t.dtype), R=self.R, t=self.t)


@struct.dataclass
class Sim3:
    """Similarity transform x' = s R x + t."""

    s: jnp.ndarray  # [...]
    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32):
        return cls(
            s=jnp.ones(batch_shape, dtype=dtype),
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
            t=jnp.zeros((*batch_shape, 3), dtype=dtype),
        )

    @classmethod
    def exp(cls, xi):
        s, R, t = sim3_exp(xi)
        return cls(s=s, R=R, t=t)

    def log(self):
        return sim3_log(self.s, self.R, self.t)

    def apply(self, x):
        sR = self.s[..., None, None] * self.R
        return _broadcast_apply(sR, self.t, x)

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            s=self.s * other.s,
            R=self.R @ other.R,
            t=self.s[..., None] * (self.R @ other.t[..., None])[..., 0] + self.t,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(s=s_inv, R=Rt, t=-s_inv[..., None] * (Rt @ self.t[..., None])[..., 0])

    def to_se3_scaled(self) -> SE3:
        """[R, t/s] conversion used when projecting a Sim3 back to a rigid pose
        (reference pattern ``Converter::toCvSE3(R, t/s)``, e.g.
        cslam/src/LoopFinder.cpp:599-608)."""
        return SE3(R=self.R, t=self.t / self.s[..., None])


def se3_relative(T_a: SE3, T_b: SE3) -> SE3:
    """T_ab = T_a * T_b^{-1}: pose of b's frame expressed in a's."""
    return T_a.compose(T_b.inverse())
