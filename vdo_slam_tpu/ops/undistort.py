"""Radial/tangential keypoint undistortion.

Replaces cv::undistortPoints as used by Frame::UndistortKeyPoints and
ComputeImageBounds (Frame.cc:381-441): iterative inversion of the Brown-
Conrady model (k1, k2, p1, p2[, k3]) with re-projection through K.  All demo
configs ship zero distortion, matching the reference's early-out
(Frame.cc:383-387); this exists for calibrated-sensor parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def distort_normalized(xy: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply the Brown-Conrady model to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_points(uv: jax.Array, K: jax.Array, dist: jax.Array) -> jax.Array:
    """Forward Brown-Conrady distortion of PINHOLE pixel coords (..., 2):
    the exact inverse direction of undistort_points.  Used to convert
    pinhole-space keypoints back to raw image coordinates for gathers into
    the (distorted-space) depth/flow/segmentation maps."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    xn = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    xd = distort_normalized(xn, dist)
    return jnp.stack([xd[..., 0] * fx + cx, xd[..., 1] * fy + cy], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def undistort_points(uv: jax.Array, K: jax.Array, dist: jax.Array,
                     iters: int = 8) -> jax.Array:
    """Undistort pixel coords (..., 2) by fixed-point iteration, then
    re-project through K (cv::undistortPoints(..., P=K) semantics)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    def body(_, xu):
        d = distort_normalized(xu, dist) - xu
        return xd - d

    xu = jax.lax.fori_loop(0, iters, body, xd)
    return jnp.stack([xu[..., 0] * fx + cx, xu[..., 1] * fy + cy], axis=-1)


def undistorted_image_bounds(width: int, height: int, K: jax.Array,
                             dist: jax.Array):
    """Min/max bounds of the undistorted image corners
    (Frame::ComputeImageBounds, Frame.cc:413-441)."""
    corners = jnp.asarray(
        [[0.0, 0.0], [width, 0.0], [0.0, height], [width, height]],
        jnp.float32,
    )
    und = undistort_points(corners, K, dist)
    min_x = jnp.minimum(und[0, 0], und[2, 0])
    max_x = jnp.maximum(und[1, 0], und[3, 0])
    min_y = jnp.minimum(und[0, 1], und[1, 1])
    max_y = jnp.maximum(und[2, 1], und[3, 1])
    return min_x, max_x, min_y, max_y
