"""Pinhole camera projection / unprojection, batched.

Replaces the per-point loops of the reference:
  * Frame::UnprojectStereo*        (reference src/Frame.cc:467-615)
  * Optimizer::Get3DinCamera/World (reference src/Optimizer.cc:2974-3013)
  * cam_project in the g2o edges   (types_six_dof_expmap.cpp)

Intrinsics are a (4,) array (fx, fy, cx, cy).  All ops broadcast over leading
batch dims and are jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def intrinsics(fx: float, fy: float, cx: float, cy: float) -> jax.Array:
    return jnp.asarray([fx, fy, cx, cy], dtype=jnp.float32)


def unproject(uv: jax.Array, z: jax.Array, K: jax.Array) -> jax.Array:
    """Back-project pixels (..., 2) with depth (...,) to camera-frame (..., 3).

    x = (u-cx) z / fx ; y = (v-cy) z / fy  (Frame.cc:475-477).
    """
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    x = (uv[..., 0] - cx) * z / fx
    y = (uv[..., 1] - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def project(X_cam: jax.Array, K: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Project camera-frame points (..., 3) to pixels (..., 2)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    z = X_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    u = fx * X_cam[..., 0] * inv_z + cx
    v = fy * X_cam[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


def unproject_to_world(uv: jax.Array, z: jax.Array, K: jax.Array, T_wc: jax.Array) -> jax.Array:
    """Pixel+depth -> world point through camera pose T_wc (camera->world).

    Mirrors Optimizer::Get3DinWorld (Optimizer.cc:2974-2994), where the
    reference passes Converter::toInvMatrix(mTcw) as CameraPose.
    """
    return se3.apply(T_wc, unproject(uv, z, K))


def project_from_world(X_w: jax.Array, K: jax.Array, T_cw: jax.Array) -> jax.Array:
    """World point -> pixel through world->camera pose T_cw."""
    return project(se3.apply(T_cw, X_w), K)


def in_bounds(uv: jax.Array, width: int, height: int, margin: float = 0.0) -> jax.Array:
    """Boundary predicate matching the reference's strict checks
    (Frame.cc:121,159,214; Tracking.cc:277)."""
    u, v = uv[..., 0], uv[..., 1]
    return (u > margin) & (u < width - 1 - margin) & (v > margin) & (v < height - 1 - margin)
