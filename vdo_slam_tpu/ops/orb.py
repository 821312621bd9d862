"""ORB orientation + binary descriptors (optional front-end extras).

The reference's ORBextractor computes intensity-centroid orientations
(IC_Angle, ORBextractor.cc:66-93) and carries the rBRIEF machinery
(computeOrbDescriptor, 97-137) but SHIPS WITH DESCRIPTORS DISABLED
(ORBextractor.cc:1091; kitti yaml: "only FAST corners are used") — matching
is optical-flow based.  These ops exist for capability parity and for
descriptor-based matching extensions:

  * orientation: vectorized intensity-centroid angle over a 31x31 patch
    with the circular row-extent mask (umax), computed for ALL keypoints at
    once via gather + masked moments;
  * descriptor: 256-bit steered binary tests.  The test pattern is a
    deterministic pseudo-random Gaussian pattern (NOT OpenCV's learned
    table) — self-matching works; cross-compatibility with OpenCV
    descriptors is a non-goal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 15  # half patch size (31x31), ORBextractor HALF_PATCH_SIZE


def _circle_umax(radius: int = PATCH_R) -> np.ndarray:
    """Row extents of the circular patch (ORBextractor ctor umax table)."""
    umax = np.zeros(radius + 1, np.int32)
    for v in range(radius + 1):
        umax[v] = int(np.floor(np.sqrt(radius * radius - v * v) + 0.5))
    return umax


_UMAX = _circle_umax()


def _patch_mask() -> np.ndarray:
    ys, xs = np.meshgrid(np.arange(-PATCH_R, PATCH_R + 1),
                         np.arange(-PATCH_R, PATCH_R + 1), indexing="ij")
    m = np.abs(xs) <= _UMAX[np.minimum(np.abs(ys), PATCH_R)]
    return m.astype(np.float32)


_MASK = jnp.asarray(_patch_mask())
_DY, _DX = np.meshgrid(np.arange(-PATCH_R, PATCH_R + 1),
                       np.arange(-PATCH_R, PATCH_R + 1), indexing="ij")
_DYJ = jnp.asarray(_DY.astype(np.float32))
_DXJ = jnp.asarray(_DX.astype(np.float32))


def _gather_patches(gray: jax.Array, xy: jax.Array) -> jax.Array:
    """(N, 31, 31) intensity patches at integer keypoint locations."""
    H, W = gray.shape
    cx = xy[:, 0].astype(jnp.int32)[:, None, None]
    cy = xy[:, 1].astype(jnp.int32)[:, None, None]
    px = jnp.clip(cx + _DXJ.astype(jnp.int32)[None], 0, W - 1)
    py = jnp.clip(cy + _DYJ.astype(jnp.int32)[None], 0, H - 1)
    return gray[py, px]


@jax.jit
def orientations(gray: jax.Array, xy: jax.Array) -> jax.Array:
    """Intensity-centroid angle (radians) per keypoint — IC_Angle
    vectorized: m01 = sum y*I, m10 = sum x*I over the circular patch."""
    patches = _gather_patches(gray, xy) * _MASK[None]
    m10 = jnp.sum(patches * _DXJ[None], axis=(1, 2))
    m01 = jnp.sum(patches * _DYJ[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _brief_pattern(seed: int = 1234, n_bits: int = 256) -> np.ndarray:
    """Deterministic Gaussian test pattern (n_bits, 4) = (x1, y1, x2, y2),
    clipped to the patch."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH_R / 2.5, size=(n_bits, 4))
    return np.clip(np.round(pts), -PATCH_R + 1, PATCH_R - 1).astype(np.float32)


_PATTERN = jnp.asarray(_brief_pattern())


@jax.jit
def descriptors(gray: jax.Array, xy: jax.Array,
                angle: jax.Array | None = None) -> jax.Array:
    """256-bit steered binary descriptors, packed to (N, 32) uint8.

    Tests are rotated by each keypoint's orientation (rBRIEF steering,
    computeOrbDescriptor's a=cos, b=sin rotation of the pattern).
    """
    H, W = gray.shape
    if angle is None:
        angle = orientations(gray, xy)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    p = _PATTERN  # (256, 4)

    def rot(px, py):
        # (N, 256) rotated offsets
        rx = ca[:, None] * px[None] - sa[:, None] * py[None]
        ry = sa[:, None] * px[None] + ca[:, None] * py[None]
        return rx, ry

    x1, y1 = rot(p[:, 0], p[:, 1])
    x2, y2 = rot(p[:, 2], p[:, 3])

    def sample(dx, dy):
        gx = jnp.clip((xy[:, 0:1] + dx).astype(jnp.int32), 0, W - 1)
        gy = jnp.clip((xy[:, 1:2] + dy).astype(jnp.int32), 0, H - 1)
        return gray[gy, gx]

    bits = (sample(x1, y1) < sample(x2, y2)).astype(jnp.uint8)  # (N, 256)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits.reshape(-1, 32, 8) * weights[None, None], axis=-1,
                   dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k",))
def match_hamming(desc_a: jax.Array, desc_b: jax.Array, valid_a, valid_b,
                  k: int = 1):
    """Brute-force Hamming matching (N_a,) -> best index in b + distance."""
    # popcount via uint8 lookup
    lut = jnp.asarray([bin(i).count("1") for i in range(256)], jnp.int32)
    diff = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    dist = jnp.sum(lut[diff], axis=-1)  # (N_a, N_b)
    dist = jnp.where(valid_b[None, :], dist, 10 ** 6)
    best = jnp.argmin(dist, axis=-1)
    bd = jnp.take_along_axis(dist, best[:, None], axis=-1)[:, 0]
    return best.astype(jnp.int32), jnp.where(valid_a, bd, 10 ** 6)
