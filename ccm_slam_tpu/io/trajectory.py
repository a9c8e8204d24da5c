"""Trajectory output and ATE evaluation.

Covers the reference's ``Map::WriteStateToCsv`` (cslam/src/Map.cpp:1610-1670;
TUM and EuRoC formats, optional body-frame via T_SC) and the external `evo`
ATE protocol (readme.md:185-194: Sim(3) alignment then RMSE of translation).
"""

from __future__ import annotations

import numpy as np

from ..solvers.sim3 import umeyama_alignment


def camera_centers(R_cw, t_cw):
    """World positions of the camera: O_w = -R^T t. [...,3]"""
    import jax.numpy as jnp

    return -jnp.einsum("...ij,...i->...j", R_cw, t_cw)


def rot_cw_to_quat_wc(R_cw):
    """World->cam rotation array -> cam->world quaternion (w,x,y,z)."""
    from ..utils.lie import rot_to_quat
    import jax.numpy as jnp

    return rot_to_quat(jnp.swapaxes(R_cw, -1, -2))


def write_tum(path, timestamps, R_cw, t_cw, t_sc=None):
    """TUM format: `stamp tx ty tz qx qy qz qw` (Twc; optional body frame
    through T_SC as in the reference's trajectory writer)."""
    import jax.numpy as jnp

    R_wc = np.asarray(jnp.swapaxes(jnp.asarray(R_cw), -1, -2))
    centers = np.asarray(camera_centers(jnp.asarray(R_cw), jnp.asarray(t_cw)))
    if t_sc is not None:
        # T_SC maps camera-frame points to body(sensor)-frame points, so the
        # body pose is T_WS = T_WC o T_SC^-1
        T_sc = np.asarray(t_sc)
        R_sc, p_sc = T_sc[:3, :3], T_sc[:3, 3]
        # T_SC^-1 = (R_sc^T, -R_sc^T p_sc)
        centers = centers - np.einsum("nij,j->ni", R_wc @ R_sc.T, p_sc)
        R_wc = R_wc @ R_sc.T
    quats = np.asarray(rot_cw_to_quat_wc(jnp.asarray(np.swapaxes(R_wc, -1, -2))))
    with open(path, "w") as f:
        for ts, c, q in zip(np.asarray(timestamps), centers, quats):
            f.write(
                f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def write_euroc(path, timestamps, R_cw, t_cw, t_sc=None):
    """EuRoC state-estimate csv: ``ts_ns,px,py,pz,qw,qx,qy,qz,v*,bg*,ba*``
    with zero velocity/bias columns — the reference's trajectory format 0
    (cslam/src/Map.cpp:1652-1658; TUM is format 1)."""
    import jax.numpy as jnp

    R_wc = np.asarray(jnp.swapaxes(jnp.asarray(R_cw), -1, -2))
    centers = np.asarray(camera_centers(jnp.asarray(R_cw), jnp.asarray(t_cw)))
    if t_sc is not None:
        T_sc = np.asarray(t_sc)
        R_sc, p_sc = T_sc[:3, :3], T_sc[:3, 3]
        centers = centers - np.einsum("nij,j->ni", R_wc @ R_sc.T, p_sc)
        R_wc = R_wc @ R_sc.T
    quats = np.asarray(rot_cw_to_quat_wc(jnp.asarray(np.swapaxes(R_wc, -1, -2))))
    zeros = "0.0,0.0,0.0"
    with open(path, "w") as f:
        for ts, c, q in zip(np.asarray(timestamps), centers, quats):
            f.write(
                f"{float(ts) * 1e9:.0f},{c[0]:.7f},{c[1]:.7f},{c[2]:.7f},"
                f"{q[0]:.7f},{q[1]:.7f},{q[2]:.7f},{q[3]:.7f},"
                f"{zeros},{zeros},{zeros}\n"
            )


def ate_rmse(est_pos, gt_pos, align: str = "sim3"):
    """Absolute trajectory error after alignment (evo_ape ... -vas protocol).

    est_pos, gt_pos: [N,3] matched positions.  align: 'sim3' | 'se3' | 'none'.
    Returns (rmse, aligned_est).
    """
    import jax.numpy as jnp

    est = jnp.asarray(est_pos, jnp.float32)
    gt = jnp.asarray(gt_pos, jnp.float32)
    if align != "none":
        S = umeyama_alignment(gt[None], est[None], fix_scale=(align == "se3"))
        est = S.apply(est[None])[0]
    err = jnp.linalg.norm(est - gt, axis=-1)
    return float(jnp.sqrt(jnp.mean(err**2))), np.asarray(est)
