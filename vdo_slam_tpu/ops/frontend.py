"""Front-end feature construction as fixed-shape device ops.

Rebuilds the reference's Frame construction + inter-frame feature plumbing
(Frame.cc:61-260, Tracking.cc:246-314) as padded tensor programs:

  * static candidates  : detected FAST corners (or grid samples) filtered by
                         background mask / depth / flow validity
                         (Frame.cc:100-168)
  * object candidates  : every `step`-th pixel inside instance masks with
                         valid depth and in-bounds flow (Frame.cc:200-228)
  * inheritance        : current keys = last frame's flow correspondences
                         (Tracking.cc:252-314)
  * scene flow         : world-frame 3D flow per object point
                         (GetSceneFlowObj, Tracking.cc:1278-1364)
  * per-label stats    : segment reductions feeding the dynamic-object
                         classifier (DynObjTracking, Tracking.cc:1366-1612)
  * mask propagation   : flow-scatter recovery of lost instance masks
                         (UpdateMask, Tracking.cc:2997-3241)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from . import select
from .image import gather_int


def static_candidates(xy, xy_valid, score, depth_img, flow_img, mask_img,
                      th_depth: float, k: int):
    """Filter detected/sampled keypoints into the static background set.

    Keep iff mask==0, 0 < depth <= th_depth, both flow components != 0, and
    the flow-shifted correspondence lands in the image (Frame.cc:100-168).
    Returns dict(xy, depth, flow, corres, valid) all padded to k.
    """
    H, W = depth_img.shape
    d = gather_int(depth_img, xy)
    m = gather_int(mask_img, xy)
    f = gather_int(flow_img, xy)
    corres = xy + f
    ok = (
        xy_valid
        & (m == 0)
        & (d > 0)
        & (d <= th_depth)
        & (f[..., 0] != 0)
        & (f[..., 1] != 0)
        & cam.in_bounds(corres, W, H)
        & cam.in_bounds(xy, W, H)
    )
    idx, valid = select.masked_top_k(score, ok, k)
    return {
        "xy": select.gather_rows(xy, idx, valid),
        "depth": jnp.where(valid, jnp.take(d, idx), -1.0),
        "flow": select.gather_rows(f, idx, valid),
        "corres": select.gather_rows(corres, idx, valid),
        "valid": valid,
    }


def object_candidates(depth_img, flow_img, mask_img, th_depth_obj: float,
                      step: int, k: int, quota: int, prng_key):
    """Semi-dense object features: every `step`-th pixel inside any instance
    mask with 0 < depth < th_depth_obj and in-bounds flow (Frame.cc:200-228).

    Per-label quota keeps one object from flooding the fixed k slots.
    Returns dict(xy, depth, flow, corres, sem_label, valid).
    """
    H, W = depth_img.shape
    ys = jnp.arange(0, H - (H % step) if H % step else H, step)
    xs = jnp.arange(0, W - (W % step) if W % step else W, step)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(jnp.float32)

    d = gather_int(depth_img, xy)
    m = gather_int(mask_img, xy)
    f = gather_int(flow_img, xy)
    corres = xy + f
    ok = (m > 0) & (d > 0) & (d < th_depth_obj) & cam.in_bounds(corres, W, H)

    # random priority for spatially-unbiased quota fill (deterministic key)
    pri = jax.random.uniform(prng_key, (xy.shape[0],))
    idx, valid = select.quota_select(m, ok, pri, quota, k)
    return {
        "xy": select.gather_rows(xy, idx, valid),
        "depth": jnp.where(valid, jnp.take(d, idx), -1.0),
        "flow": select.gather_rows(f, idx, valid),
        "corres": select.gather_rows(corres, idx, valid),
        "sem_label": jnp.where(valid, jnp.take(m, idx), 0).astype(jnp.int32),
        "valid": valid,
    }


def inherit_static(last_corres, last_valid, depth_img, corres_raw=None):
    """Current static keys = last frame's correspondences; re-gather depth
    (Tracking.cc:252-273).  Depth <= 0 or out-of-bounds -> invalid (-1).

    corres_raw: raw-image-space coordinates for the map gathers when the
    banks carry pinhole (undistorted) coordinates; defaults to last_corres.
    """
    H, W = depth_img.shape
    at = last_corres if corres_raw is None else corres_raw
    inb = cam.in_bounds(at, W, H)
    d = gather_int(depth_img, at)
    good = last_valid & inb & (d > 0)
    return {
        "xy": last_corres,
        "depth": jnp.where(good, d, -1.0),
        "valid": last_valid,  # slot occupancy; depth validity tracked via depth
    }


def inherit_objects(last_obj_corres, last_obj_valid, depth_img, mask_img,
                    th_depth_obj: float, corres_raw=None):
    """Current object keys = last frame's object correspondences; re-gather
    depth + semantic label, with the reference's fallback (depth=0.1, label=0)
    for bad lookups (Tracking.cc:277-300).

    corres_raw: raw-image-space gather coordinates (see inherit_static).
    """
    H, W = depth_img.shape
    at = last_obj_corres if corres_raw is None else corres_raw
    inb = cam.in_bounds(at, W, H)
    d = gather_int(depth_img, at)
    m = gather_int(mask_img, at)
    good = inb & (d < th_depth_obj) & (d > 0)
    return {
        "xy": last_obj_corres,
        "depth": jnp.where(good, d, 0.1),
        "sem_label": jnp.where(good, m, 0).astype(jnp.int32),
        "valid": last_obj_valid,
    }


def scene_flow_world(xy_last, depth_last, T_cw_last, xy_cur, depth_cur,
                     T_cw_cur, K):
    """World-frame 3D scene flow of object points (GetSceneFlowObj,
    Tracking.cc:1278-1364).  Returns (flow3d (N,3), X_w_prev (N,3))."""
    from ..geometry import se3

    Xp = cam.unproject_to_world(xy_last, depth_last, K, se3.inv(T_cw_last))
    Xc = cam.unproject_to_world(xy_cur, depth_cur, K, se3.inv(T_cw_cur))
    return Xc - Xp, Xp


def label_slots(sem_label, label_table):
    """Map semantic labels (N,) to slots in a padded unique-label table
    (L,).  Unmatched labels -> -1."""
    eq = sem_label[:, None] == label_table[None, :]
    slot = jnp.argmax(eq, axis=1)
    return jnp.where(jnp.any(eq, axis=1), slot, -1).astype(jnp.int32)


def per_label_stats(slots, valid, xy, depth, sf3d, width: int, height: int,
                    n_slots: int, sf_mg_thres: float, shrink_row: int,
                    shrink_col: int):
    """Segment reductions for the dynamic classifier (Tracking.cc:1366-1612).

    Returns per label-slot: count, boundary count, |sf| (x,z only,
    Tracking.cc:1446) below-threshold count, depth sum.
    """
    sl = jnp.where(valid & (slots >= 0), slots, n_slots)  # overflow bucket
    ones = valid.astype(jnp.float32)
    u, v = xy[..., 0], xy[..., 1]
    on_boundary = (
        (v < shrink_row) | (v > height - shrink_row)
        | (u < shrink_col) | (u > width - shrink_col)
    ).astype(jnp.float32) * ones
    sf_norm = jnp.sqrt(sf3d[..., 0] ** 2 + sf3d[..., 2] ** 2)
    sf_small = ((sf_norm < sf_mg_thres).astype(jnp.float32)) * ones

    def seg(x):
        return jax.ops.segment_sum(x, sl, num_segments=n_slots + 1)[:-1]

    return {
        "count": seg(ones),
        "boundary": seg(on_boundary),
        "sf_small": seg(sf_small),
        "depth_sum": seg(depth * ones),
    }


def propagate_mask(seg_cur, seg_last, flow_last, obj_corres_last,
                   obj_sem_last, obj_valid_last, label_table,
                   min_points: int = 100):
    """Recover instance masks the segmenter lost (UpdateMask,
    Tracking.cc:2997-3241).

    For each last-frame label l: look up the CURRENT segmentation at the
    flow-predicted correspondences of l's features.  If the majority vote is
    background (the mask vanished), scatter l into seg_cur at
    pixel + flow_last for every last-frame pixel of l.

    The reference computes the exact mode over all observed labels; here the
    vote is background-vs-(l or any tabled label), which matches it whenever
    the winning label is in the current label table (it always is in
    practice since the table covers last-frame features).
    """
    H, W = seg_cur.shape
    L = label_table.shape[0]
    slots = label_slots(obj_sem_last, label_table)
    inb = cam.in_bounds(obj_corres_last, W, H)
    observed = gather_int(seg_cur, obj_corres_last).astype(jnp.int32)
    ok = obj_valid_last & inb & (slots >= 0)
    sl = jnp.where(ok, slots, L)

    def seg_count(x):
        return jax.ops.segment_sum(x.astype(jnp.float32), sl, num_segments=L + 1)[:-1]

    total = seg_count(ok)
    zeros = seg_count(ok & (observed == 0))
    # votes for each candidate (positive) label in the table
    votes = jax.vmap(lambda lab: seg_count(ok & (observed == lab)))(label_table)  # (L, L)
    votes = jnp.where((label_table > 0)[:, None], votes, 0.0)
    max_nonzero = jnp.max(votes, axis=0)
    lost = (total >= min_points) & (zeros > max_nonzero) & (label_table > 0)

    def repair(seg_cur):
        # scatter all lost labels at once: target = pixel + flow (int, like
        # the reference's per-pixel loop at Tracking.cc:3050-3066)
        pix_label = seg_last
        is_lost_pixel = jnp.isin(pix_label,
                                 jnp.where(lost, label_table, -999999))
        ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        fx = flow_last[..., 0].astype(jnp.int32)
        fy = flow_last[..., 1].astype(jnp.int32)
        tx = xs + fx
        ty = ys + fy
        inb_t = (tx > 0) & (tx < W) & (ty > 0) & (ty < H) & is_lost_pixel
        flat_idx = jnp.where(inb_t, ty * W + tx, H * W)  # overflow -> drop
        new_flat = seg_cur.reshape(-1).at[flat_idx].set(
            jnp.where(inb_t, pix_label, 0), mode="drop"
        )
        return new_flat.reshape(H, W)

    # the vote (O(D) gathers + segment sums) runs every frame; the H*W
    # repair scatter only when a mask was actually lost — on the fused
    # production path this keeps the steady-state frame step free of the
    # scatter (under vmap the cond lowers to a select and both branches run,
    # which simply matches the host path's unconditional cost)
    seg_out = jax.lax.cond(jnp.any(lost), repair, lambda s: s, seg_cur)
    return seg_out, lost
