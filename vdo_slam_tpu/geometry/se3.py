"""SE(3) algebra on batched 4x4 float32 matrices.

TPU-native replacement for the reference's pose plumbing:
  * analytic inverse          -> reference Converter::toInvMatrix (Converter.cc:151-166)
  * exp/log maps              -> g2o SE3Quat::exp / VertexSE3 oplus updates
                                 (dependencies/g2o/g2o/types/se3quat.h)
  * composition / application -> scattered cv::Mat products all over Tracking.cc

All functions are shape-polymorphic over leading batch dimensions and safe
under jit/vmap/grad.  Tangent-vector convention: xi = (omega, upsilon) with
rotation first, matching g2o SE3Quat::exp (se3quat.h:205-235).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [omega]_x of (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Numerically-stable (A, B, C) coefficients of the exp map.

    A = sin(t)/t, B = (1-cos t)/t^2, C = (1-A)/t^2, with Taylor fallbacks.
    The untaken branch uses a safe denominator (double-where) so jvp/vjp
    through these coefficients never produce NaN at theta -> 0.
    """
    # fp32: 1-cos and 1-sinc cancel catastrophically well above 1e-8; use a
    # wide Taylor window plus the half-angle identity 1-cos = 2 sin^2(t/2)
    small = theta2 < 1e-4
    t2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2_safe)
    half_sin = jnp.sin(0.5 * theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, 2.0 * half_sin * half_sin / t2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / t2_safe)
    return A, B, C


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map of (..., 3, 3) rotations -> (..., 3) axis-angle.

    Uses the clamped-trace angle (the same quantity the reference uses for its
    rotation metric, Tracking.cc:3268-3276) and a stable axis extraction.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_raw = (trace - 1.0) * 0.5
    skew = vee(R - jnp.swapaxes(R, -1, -2))   # = 2 sin(theta) * axis
    s2 = jnp.sum(skew * skew, axis=-1)         # = 4 sin^2(theta)
    # near identity: omega = skew * (0.5 + theta^2/12 + ...), theta^2 ~ s2/4;
    # everything flows through `skew`, so jvp/vjp stay finite (the arccos
    # branch is masked AND its inputs are clamped away from the singularity)
    small = cos_raw > 1.0 - 1e-4   # theta < ~0.014 (fp32 acos noise zone)
    cos_t = jnp.clip(jnp.where(small, 0.5, cos_raw), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    # theta/(2 sin t) = 0.5 (1 + t^2/6 + 7 t^4/360 + ...), t^2 = s2/4 (+O(t^4))
    t2 = s2 * 0.25
    taylor = 0.5 + t2 / 12.0 + 7.0 * t2 * t2 / 720.0
    scale = jnp.where(small, taylor, theta / (2.0 * sin_t))
    return skew * scale[..., None]


def exp(xi: jax.Array) -> jax.Array:
    """se(3) exp: (..., 6) tangent (omega, upsilon) -> (..., 4, 4)."""
    omega, ups = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = hat(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return from_Rt(R, t)


def log(T: jax.Array) -> jax.Array:
    """se(3) log: (..., 4, 4) -> (..., 6) tangent (omega, upsilon)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    theta2 = jnp.sum(omega * omega, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(omega)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2  (safe denominator;
    # wide Taylor window for fp32 — A/(2B) cancels near identity)
    small = theta2 < 1e-4
    t2_safe = jnp.where(small, 1.0, theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / t2_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    ups = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([omega, ups], axis=-1)


def from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 4, 4) from (..., 3, 3) and (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def inv(T: jax.Array) -> jax.Array:
    """Analytic SE(3) inverse [R^T, -R^T t] (reference Converter.cc:151-166)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_Rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def apply(T: jax.Array, X: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) transform to (..., 3) points."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], X) + T[..., :3, 3]


def compose(*Ts: jax.Array) -> jax.Array:
    """Chain matrix products T1 @ T2 @ ... (broadcasting over batches)."""
    out = Ts[0]
    for T in Ts[1:]:
        out = out @ T
    return out


def identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative update exp(xi) @ T — the g2o VertexSE3Expmap oplus
    (types_six_dof_expmap.h:79-83)."""
    return exp(xi) @ T


def orthonormalize(T: jax.Array) -> jax.Array:
    """Project the rotation block back onto SO(3) (fp32 drift control).

    Gram-Schmidt on the rows — branch-free arithmetic only (TPU small-matrix
    SVDs are iterative and slow).  Composing hundreds of fp32 SE(3) products
    without this lets diag(R) drift ~1e-4 below 1, which the clamped-trace
    rotation metric (Tracking.cc:3268-3276) misreads as ~1 degree of error.
    """
    R = T[..., :3, :3]
    r0 = R[..., 0, :]
    r0 = r0 / (jnp.linalg.norm(r0, axis=-1, keepdims=True) + 1e-12)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r1 * r0, axis=-1, keepdims=True) * r0
    r1 = r1 / (jnp.linalg.norm(r1, axis=-1, keepdims=True) + 1e-12)
    r2 = jnp.cross(r0, r1)
    R_fixed = jnp.stack([r0, r1, r2], axis=-2)
    return from_Rt(R_fixed, T[..., :3, 3])
