"""Image-plane tensor ops: depth preprocessing and pixel gathers.

Device-side replacements for the reference's per-pixel CPU loops:
  * disparity -> metric depth (Tracking.cc:180-204)
  * integer-pixel map lookups (depth/mask/flow at keypoints, e.g.
    Tracking.cc:256-268, 277-300, Frame.cc:183-194)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import KITTI, OMD, VIRTUAL_KITTI


def preprocess_depth(depth_raw: jax.Array, dataset: int, bf: float,
                     depth_map_factor: float) -> jax.Array:
    """Disparity/scaled-depth -> metric depth, negatives zeroed.

    KITTI & OMD demos store stereo disparity: depth = bf / (raw / factor)
    (Tracking.cc:188-201).  VirtualKITTI stores scaled depth: raw / factor.
    """
    raw = jnp.maximum(depth_raw, 0.0)
    if dataset in (OMD, KITTI):
        denom = raw / depth_map_factor
        depth = jnp.where(denom > 0, bf / jnp.maximum(denom, 1e-9), 0.0)
    elif dataset == VIRTUAL_KITTI:
        depth = raw / depth_map_factor
    else:
        depth = raw
    return jnp.where(depth_raw < 0, 0.0, depth).astype(jnp.float32)


def gather_int(img: jax.Array, uv: jax.Array, fill=0.0):
    """Lookup img[(int)v, (int)u] with out-of-bounds -> fill.

    Matches the reference's int-truncation indexing (e.g. `const int u =
    kp.pt.x` then `imDepth.at<float>(v,u)`).  img: (H, W) or (H, W, C);
    uv: (..., 2) float.  Returns (...,) or (..., C).
    """
    H, W = img.shape[0], img.shape[1]
    u = uv[..., 0].astype(jnp.int32)
    v = uv[..., 1].astype(jnp.int32)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    uc = jnp.clip(u, 0, W - 1)
    vc = jnp.clip(v, 0, H - 1)
    vals = img[vc, uc]
    if img.ndim == 3:
        return jnp.where(inb[..., None], vals, fill)
    return jnp.where(inb, vals, fill)


def gather_bilinear(img: jax.Array, uv: jax.Array, fill=0.0):
    """Bilinear sampling of (H, W) or (H, W, C) at float uv coords."""
    H, W = img.shape[0], img.shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None] if img.ndim == 3 else (u - u0)
    dv = (v - v0)[..., None] if img.ndim == 3 else (v - v0)

    def at(vi, ui):
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        vals = img[jnp.clip(vi, 0, H - 1).astype(jnp.int32),
                   jnp.clip(ui, 0, W - 1).astype(jnp.int32)]
        if img.ndim == 3:
            return jnp.where(inb[..., None], vals, fill)
        return jnp.where(inb, vals, fill)

    p00 = at(v0, u0)
    p01 = at(v0, u0 + 1)
    p10 = at(v0 + 1, u0)
    p11 = at(v0 + 1, u0 + 1)
    top = p00 * (1 - du) + p01 * du
    bot = p10 * (1 - du) + p11 * du
    return top * (1 - dv) + bot * dv


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """(H, W, 3) float in [0,1] -> (H, W) grayscale (ITU-R 601 like cvtColor)."""
    if img.ndim == 2:
        return img
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    return img[..., :3] @ w
