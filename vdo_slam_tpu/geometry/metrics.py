"""Error metrics replicating the reference's evaluation exactly.

The clamped-trace rotation angle and the relative-pose error composition are
bit-for-bit the formulas in Tracking::GetMetricError (Tracking.cc:3250-3295),
the per-frame camera RPE print (Tracking.cc:715-736), the object body-frame
RPE (Tracking.cc:3316-3351), and the speed estimate (Tracking.cc:952-964).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3

_RAD2DEG = 180.0 / 3.1415926  # reference uses this literal, not numpy pi


def clamped_trace_angle_deg(T: jax.Array) -> jax.Array:
    """Rotation magnitude of (...,4,4) — the reference's metric
    (Tracking.cc:3268-3276: clamped trace, angle = acos((tr-1)/2)), computed
    with a numerically stable extraction.

    acos((tr-1)/2) is QUADRATIC near theta=0 (trace deficit ~ theta^2), so
    fp32 rounding of the matrix entries (~6e-8 per diagonal element) reads
    as a sqrt(2*eps) ~ 0.03 deg phantom angle — measured: on identical f32
    pose chains the trace form reports 0.015-0.04 deg where the true
    relative rotation error is ~2e-4 deg (DESIGN.md).  The skew-norm atan2
    form below is algebraically identical on exact rotation matrices
    (|diag| <= 1 there, so the reference's per-element clamping is inert)
    but propagates input rounding linearly, eliminating the floor.
    """
    s_vec = jnp.stack([
        T[..., 2, 1] - T[..., 1, 2],
        T[..., 0, 2] - T[..., 2, 0],
        T[..., 1, 0] - T[..., 0, 1],
    ], axis=-1)
    sin_t = 0.5 * jnp.linalg.norm(s_vec, axis=-1)
    diag = jnp.stack([T[..., 0, 0], T[..., 1, 1], T[..., 2, 2]], axis=-1)
    clamped = jnp.where(diag > 1.0, 2.0 - diag, diag)
    trace = jnp.sum(clamped, axis=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arctan2(sin_t, cos_t) * _RAD2DEG


def translation_norm(T: jax.Array) -> jax.Array:
    return jnp.linalg.norm(T[..., :3, 3], axis=-1)


def camera_rpe(T_cw_cur, T_cw_last, T_cw_gt_cur, T_cw_gt_last):
    """Per-frame camera relative pose error (Tracking.cc:715-736).

    err = (Tcw_cur · Twc_last) · (Tcw_gt_last · Twc_gt_cur)
    Returns (t_err, r_err_deg).
    """
    T_lc_inv = T_cw_cur @ se3.inv(T_cw_last)
    T_lc_gt = T_cw_gt_last @ se3.inv(T_cw_gt_cur)
    err = T_lc_inv @ T_lc_gt
    return translation_norm(err), clamped_trace_angle_deg(err)


def camera_rpe_from_world_poses(T_wc: jax.Array, T_wc_gt: jax.Array):
    """Sequence camera error as in GetMetricError (Tracking.cc:3250-3295).

    Inputs are stacked camera poses in world frame (F,4,4) — the reference's
    vmCameraPose / vmCameraPose_GT.  Returns per-pair (t_err, r_err_deg) of
    shape (F-1,).
    """
    T_lc_inv = T_wc[1:] @ se3.inv(T_wc[:-1])
    T_lc_gt = T_wc_gt[:-1] @ se3.inv(T_wc_gt[1:])
    err = T_lc_inv @ T_lc_gt
    return translation_norm(err), clamped_trace_angle_deg(err)


def object_rpe_body(H: jax.Array, H_gt_body: jax.Array, L_w_prev: jax.Array):
    """Object motion error in body frame (Tracking.cc:3316-3351).

    RigMotBody = L_prev^-1 · H · L_prev ; err = RigMotBody^-1 · H_gt_body.
    Returns (t_err, r_err_deg).
    """
    Linv = se3.inv(L_w_prev)
    H_body = Linv @ H @ L_w_prev
    err = se3.inv(H_body) @ H_gt_body
    return translation_norm(err), clamped_trace_angle_deg(err)


def object_speed(H: jax.Array, centroid_prev: jax.Array) -> jax.Array:
    """Speed estimate ||t_H - (I - R_H) c|| * 36 in km/h (Tracking.cc:952-964)."""
    R = H[..., :3, :3]
    t = H[..., :3, 3]
    eye = jnp.eye(3, dtype=H.dtype)
    v = t - jnp.einsum("...ij,...j->...i", eye - R, centroid_prev)
    return jnp.linalg.norm(v, axis=-1) * 36.0


def average(values: jax.Array, valid: jax.Array | None = None, rms: bool = False):
    """Mean or RMS over valid entries (GetMetricError uses bRMSError=false)."""
    if valid is None:
        valid = jnp.ones_like(values, dtype=bool)
    count = jnp.maximum(jnp.sum(valid), 1)
    if rms:
        return jnp.sqrt(jnp.sum(jnp.where(valid, values * values, 0.0)) / count)
    return jnp.sum(jnp.where(valid, values, 0.0)) / count
