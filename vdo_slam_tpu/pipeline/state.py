"""Device-side per-frame state pytrees.

The reference's Frame object (include/Frame.h) holds ~30 dynamically-sized
std::vectors.  Here a frame is two fixed-shape padded feature banks plus the
pose — a pytree that flows through jit'd stages unchanged in shape, so the
whole per-frame pipeline compiles once.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class StaticBank:
    """Background features (capacity B = MaxTrackPointBG).

    Mirrors mvStatKeysTmp / mvStatDepthTmp / mvFlowNext / mvCorres /
    mvStat3DPointTmp / nStaInlierID of the reference Frame.
    """

    xy: jax.Array        # (B, 2) pixel positions in THIS frame
    depth: jax.Array     # (B,)   metric depth at xy (this frame)
    flow: jax.Array      # (B, 2) measured flow THIS -> NEXT frame
    corres: jax.Array    # (B, 2) xy + flow (predicted next-frame position)
    point_w: jax.Array   # (B, 3) world 3D point (this frame's unprojection)
    assoc: jax.Array     # (B,)   int32 index into PREVIOUS frame bank, -1 new
    valid: jax.Array     # (B,)   slot occupancy

    @staticmethod
    def empty(B: int) -> "StaticBank":
        return StaticBank(
            xy=jnp.zeros((B, 2), jnp.float32),
            depth=jnp.full((B,), -1.0, jnp.float32),
            flow=jnp.zeros((B, 2), jnp.float32),
            corres=jnp.zeros((B, 2), jnp.float32),
            point_w=jnp.zeros((B, 3), jnp.float32),
            assoc=jnp.full((B,), -1, jnp.int32),
            valid=jnp.zeros((B,), bool),
        )


@flax.struct.dataclass
class DynamicBank:
    """Object features (capacity D).

    Mirrors mvObjKeys / mvObjDepth / mvObjFlowNext / mvObjCorres /
    mvObj3DPoint / vSemObjLabel / vObjLabel / nDynInlierID.
    """

    xy: jax.Array         # (D, 2)
    depth: jax.Array      # (D,)
    flow: jax.Array       # (D, 2)
    corres: jax.Array     # (D, 2)
    point_w: jax.Array    # (D, 3)
    sem_label: jax.Array  # (D,) int32 instance-segmentation label
    obj_label: jax.Array  # (D,) int32 motion label: -2 new, -1 outlier,
                          #      0 static, >0 tracked object id
    assoc: jax.Array      # (D,) int32 index into previous frame bank, -1 new
    valid: jax.Array      # (D,)

    @staticmethod
    def empty(D: int) -> "DynamicBank":
        return DynamicBank(
            xy=jnp.zeros((D, 2), jnp.float32),
            depth=jnp.full((D,), -1.0, jnp.float32),
            flow=jnp.zeros((D, 2), jnp.float32),
            corres=jnp.zeros((D, 2), jnp.float32),
            point_w=jnp.zeros((D, 3), jnp.float32),
            sem_label=jnp.zeros((D,), jnp.int32),
            obj_label=jnp.full((D,), -2, jnp.int32),
            assoc=jnp.full((D,), -1, jnp.int32),
            valid=jnp.zeros((D,), bool),
        )


@flax.struct.dataclass
class FrameState:
    """Everything the tracker carries frame to frame on device."""

    static: StaticBank
    dynamic: DynamicBank
    T_cw: jax.Array        # (4,4) current world->camera estimate
    T_cw_gt: jax.Array     # (4,4) origin-normalized GT
    velocity: jax.Array    # (4,4) mVelocity = T_cw_cur @ T_wc_last
    seg: jax.Array         # (H,W) int32 current (possibly repaired) masks
    flow_map: jax.Array    # (H,W,2) current forward flow
    depth_map: jax.Array   # (H,W) current metric depth

    @staticmethod
    def empty(B: int, D: int, H: int, W: int) -> "FrameState":
        eye = jnp.eye(4, dtype=jnp.float32)
        return FrameState(
            static=StaticBank.empty(B),
            dynamic=DynamicBank.empty(D),
            T_cw=eye,
            T_cw_gt=eye,
            velocity=eye,
            seg=jnp.zeros((H, W), jnp.int32),
            flow_map=jnp.zeros((H, W, 2), jnp.float32),
            depth_map=jnp.zeros((H, W), jnp.float32),
        )
