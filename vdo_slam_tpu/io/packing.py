"""Wire-format packing for host->device frame uploads.

The tunnel to a remote-attached TPU is bandwidth-bound (~40 MB/s measured)
with a per-array round-trip cost, so the raw per-frame tensors
(rgb f32 + depth f32 + flow f32x2 + seg i32 = 9.3 MB in 5 arrays at KITTI
size) dominate the tracking loop.  This module packs a frame into ONE
int16 array of shape (4, H, W) — 8 bytes/pixel -> 3.7 MB, a single
transfer — and unpacks it on device with bit ops that XLA fuses into the
consumers:

  ch0: gray u8 | seg u8 << 8     (gray quantized to 1/255; labels < 256,
                                  matching the classifier's _LABEL_SPACE)
  ch1: depth u16 bitcast         (the SAME quantization the reference's
                                  uint16 depth PNGs carry, vdo_slam.cc:107)
  ch2: flow_u fp16 bitcast       (relative precision: ~0.01 px at 20 px,
  ch3: flow_v fp16 bitcast        sub-0.001 px for small flows — measured
                                  to keep object-motion RPE at parity with
                                  the unpacked float path, where the old
                                  1/64 px fixed point cost ~2x object
                                  rotation error; full float range, no
                                  clamping)

Quantization notes: the reference consumes uint16 depth PNGs, so the depth
channel loses nothing a real sequence ever had; channel-isolation tests
showed the 1/256 m depth and 1/255 gray quantization have no measurable
metric effect, while flow precision directly bounds object-motion accuracy
(hence fp16, not fixed point).
"""

from __future__ import annotations

import numpy as np

def depth_wire_scale(depth_map_factor: float) -> float:
    """Raw-sample -> u16 wire scale.  Chosen so the metric quantization is
    ALWAYS 1/256 m regardless of the dataset's depth_map_factor (a raw u16
    KITTI depth PNG with factor 256 round-trips bit-exactly: scale = 1)."""
    return 256.0 / float(depth_map_factor)


def pack_frame(gray: np.ndarray, depth_raw: np.ndarray, flow: np.ndarray,
               seg: np.ndarray, depth_scale: float = 1.0) -> np.ndarray:
    """Host-side pack: (H,W) gray [0,1], (H,W) raw depth samples,
    (H,W,2) float flow, (H,W) int labels -> (4,H,W) int16.

    depth_scale: see depth_wire_scale — raw samples are stored as
    round(depth_raw * depth_scale) in u16."""
    g8 = np.clip(np.rint(gray * 255.0), 0, 255).astype(np.uint16)
    s8 = np.clip(seg, 0, 255).astype(np.uint16)
    ch0 = (g8 | (s8 << 8)).astype(np.int16)
    ch1 = np.clip(np.rint(depth_raw * depth_scale), 0,
                  65535).astype(np.uint16).view(np.int16)
    f = np.ascontiguousarray(flow.astype(np.float16)).view(np.int16)
    return np.stack([ch0, ch1, f[..., 0], f[..., 1]])


def unpack_frame(buf, depth_scale: float = 1.0):
    """Device-side unpack: (4,H,W) int16 -> (gray f32, depth_raw f32,
    flow f32 (H,W,2), seg i32).  Pure elementwise — XLA fuses it into the
    first consumers, so the unpack is effectively free."""
    import jax
    import jax.numpy as jnp

    u = jax.lax.bitcast_convert_type(buf, jnp.uint16)  # raw bit patterns
    gray = (u[0] & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    seg = (u[0] >> 8).astype(jnp.int32)
    depth = u[1].astype(jnp.float32) * (1.0 / depth_scale)
    fl = jax.lax.bitcast_convert_type(buf[2:4],
                                      jnp.float16).astype(jnp.float32)
    flow = jnp.stack([fl[0], fl[1]], axis=-1)
    return gray, depth, flow, seg
