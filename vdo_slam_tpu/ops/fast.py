"""FAST corner detection over an image pyramid — the front-end detector.

TPU-native rebuild of the reference ORBextractor (ORBextractor.cc):
  * 8-level pyramid, scale 1.2          (ComputePyramid, 1112-1137)
  * FAST-9/16 segment test, ini/min thresholds per cell (754-842)
  * octree spatial balancing             (DistributeOctTree, 528-752)
  * rBRIEF descriptors are DISABLED in the reference (ORBextractor.cc:1091,
    kitti yaml:61 "only FAST corners are used") — matching is optical-flow
    based — so this module produces corner locations + scores only.

Design notes (vs the reference's scalar scan):
  * the segment test is evaluated for ALL pixels at once as 16 shifted image
    views + unrolled 9-arc window reductions — pure VPU work that XLA fuses;
  * octree balancing is replaced by per-cell NMS + per-cell cap via a single
    global sort, which has the same spatial-uniformity goal with a fixed
    output shape;
  * the ini/min two-threshold retry per cell (ORBextractor.cc:789-822)
    becomes a per-cell select between two score maps.

Output is a fixed-size padded set: (n, 2) xy at level-0 scale, score, octave,
valid mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# FAST circle of radius 3 (dx, dy), standard clockwise order from 12 o'clock.
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9  # FAST-9


def fast_score(gray: jax.Array, threshold: float) -> jax.Array:
    """FAST-9/16 corner score map; 0 where the segment test fails.

    Score = max over qualifying 9-arcs of (min |circle - center| over the arc)
    (the usual max-threshold-style score, cf. ORBextractor's cv::FAST use).
    gray: (H, W) float32 in [0, 1] or [0, 255]; threshold in same units.
    """
    c = gray
    diffs = []
    for dx, dy in _CIRCLE:
        shifted = jnp.roll(gray, shift=(-dy, -dx), axis=(0, 1))
        diffs.append(shifted - c)
    d = jnp.stack(diffs)  # (16, H, W): circle minus center

    bright = d > threshold
    dark = d < -threshold

    def arc_reduce(mask, mag):
        """max over 16 circular 9-windows of (window-all(mask) * window-min(mag))."""
        best = jnp.zeros_like(gray)
        for s in range(16):
            ok = mask[s]
            mn = mag[s]
            for j in range(1, _ARC):
                i = (s + j) % 16
                ok = ok & mask[i]
                mn = jnp.minimum(mn, mag[i])
            best = jnp.maximum(best, jnp.where(ok, mn, 0.0))
        return best

    score_b = arc_reduce(bright, d)
    score_d = arc_reduce(dark, -d)
    score = jnp.maximum(score_b, score_d)
    # zero the 3px border (incomplete circle wraps around via roll)
    H, W = gray.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    border = (ys < 3) | (ys >= H - 3) | (xs < 3) | (xs >= W - 3)
    return jnp.where(border, 0.0, score)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression (keep strict local maxima)."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score == m) & (score > 0.0), score, 0.0)


def _cell_max(score: jax.Array, cell: int) -> jax.Array:
    """Per-cell max, broadcast back to pixels (cells are non-overlapping)."""
    H, W = score.shape
    ph = (-H) % cell
    pw = (-W) % cell
    padded = jnp.pad(score, ((0, ph), (0, pw)), constant_values=0.0)
    Hc, Wc = padded.shape
    cells = padded.reshape(Hc // cell, cell, Wc // cell, cell)
    cmax = cells.max(axis=(1, 3))
    back = jnp.repeat(jnp.repeat(cmax, cell, axis=0), cell, axis=1)
    return back[:H, :W]


def detect_level(gray: jax.Array, ini_th: float, min_th: float, cell: int,
                 k: int, use_pallas: bool = False):
    """Detect up to k corners at one pyramid level.

    Two-threshold policy: inside each detection cell, use the ini-threshold
    response if the cell fired at all, else fall back to the min-threshold
    response (ORBextractor.cc:789-822).  Returns (xy (k,2) f32, score (k,),
    valid (k,)).
    """
    from . import select as _select

    if use_pallas:
        from .fast_pallas import fast_score_pair_pallas

        s_ini, s_min = fast_score_pair_pallas(gray, ini_th, min_th)
    else:
        s_ini = fast_score(gray, ini_th)
        s_min = fast_score(gray, min_th)
    has_ini = _cell_max(s_ini, cell) > 0.0
    score = jnp.where(has_ini, s_ini, s_min)
    score = nms3(score)

    H, W = gray.shape
    # spatial balancing (the octree-distribution goal, ORBextractor.cc:528-752):
    # per-cell top-quota via lax.top_k on a cells x cell-area view — no
    # full-image sort (bitonic sorts over H*W dominate detector cost on TPU)
    ph = (-H) % cell
    pw = (-W) % cell
    padded = jnp.pad(score, ((0, ph), (0, pw)), constant_values=0.0)
    Hc = (H + ph) // cell
    Wc = (W + pw) // cell
    n_cells = Hc * Wc
    quota = max(-(-k // n_cells), 1)
    cells = padded.reshape(Hc, cell, Wc, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(n_cells, cell * cell)
    top_v, top_i = jax.lax.top_k(cells, quota)          # (n_cells, quota)
    # recover absolute pixel coords
    cy = (jnp.arange(n_cells, dtype=jnp.int32) // Wc)[:, None] * cell
    cx = (jnp.arange(n_cells, dtype=jnp.int32) % Wc)[:, None] * cell
    yy = (cy + top_i // cell).reshape(-1).astype(jnp.float32)
    xx = (cx + top_i % cell).reshape(-1).astype(jnp.float32)
    vv = top_v.reshape(-1)
    # global top-k over the small per-cell shortlist
    idx, ok = _select.masked_top_k(vv, vv > 0.0, k)
    val = jnp.where(ok, vv[idx], 0.0)
    return (
        jnp.stack([xx[idx], yy[idx]], axis=-1),
        val,
        ok,
    )


@functools.partial(jax.jit, static_argnames=("n_features", "n_levels",
                                             "scale_factor", "cell",
                                             "ini_th", "min_th",
                                             "use_pallas"))
def detect_pyramid(gray: jax.Array, n_features: int = 2500,
                   n_levels: int = 8, scale_factor: float = 1.2,
                   ini_th: float = 20.0, min_th: float = 7.0,
                   cell: int = 30, use_pallas: bool | None = None):
    """Full pyramid detection with per-level feature budgets.

    Per-level budget follows the ORB-SLAM geometric split the reference uses
    (ORBextractor ctor): n_l proportional to (1/scale)^l.  Image intensities
    are expected in [0, 1]; thresholds are 8-bit units and scaled internally.
    Returns dict(xy (N,2) level-0 coords, score (N,), octave (N,), valid (N,)).
    """
    if use_pallas is None:  # auto: hand-tiled kernel on TPU, jnp elsewhere
        use_pallas = jax.default_backend() == "tpu"
    t_scale = 1.0 / 255.0
    inv = 1.0 / scale_factor
    raw_w = [inv ** l for l in range(n_levels)]
    total_w = sum(raw_w)
    budgets = [max(int(w / total_w * n_features), 8) for w in raw_w]
    # make budgets sum exactly
    budgets[0] += n_features - sum(budgets)

    H, W = gray.shape
    xs, ss, os_, vs = [], [], [], []
    img = gray
    for l in range(n_levels):
        if l > 0:
            Hl = max(int(round(H * inv ** l)), 16)
            Wl = max(int(round(W * inv ** l)), 16)
            img = jax.image.resize(gray, (Hl, Wl), method="bilinear")
        cell_l = max(int(cell * inv ** l), 8)
        xy, sc, va = detect_level(
            img, ini_th * t_scale, min_th * t_scale, cell_l, budgets[l],
            use_pallas=use_pallas,
        )
        xs.append(xy * (scale_factor ** l))  # back to level-0 coords
        ss.append(sc)
        os_.append(jnp.full((budgets[l],), l, dtype=jnp.int32))
        vs.append(va)
    return {
        "xy": jnp.concatenate(xs, axis=0),
        "score": jnp.concatenate(ss, axis=0),
        "octave": jnp.concatenate(os_, axis=0),
        "valid": jnp.concatenate(vs, axis=0),
    }


def grid_sample_keypoints(key: jax.Array, height: int, width: int,
                          n: int = 3000, n_div: int = 20):
    """Uniform-in-grid random keypoints — the UseSampleFeature path
    (Frame::SampleKeyPoints, Frame.cc:672-740) with a deterministic PRNG key
    instead of time(NULL).  Returns ((n,2) xy float32, valid)."""
    x_step = width // n_div
    y_step = height // n_div
    per_cell = -(-n // (n_div * n_div))  # ceil
    kx, ky = jax.random.split(key)
    gx = jnp.arange(n_div) * x_step
    gy = jnp.arange(n_div) * y_step
    ox = jax.random.uniform(kx, (n_div, n_div, per_cell)) * x_step
    oy = jax.random.uniform(ky, (n_div, n_div, per_cell)) * y_step
    xs = (gx[:, None, None] + ox).reshape(-1)
    ys = (gy[None, :, None] + oy).reshape(-1)
    xy = jnp.stack([xs, ys], axis=-1)[:n]
    valid = (xy[:, 0] > 0) & (xy[:, 0] < width) & (xy[:, 1] > 0) & (xy[:, 1] < height)
    return xy.astype(jnp.float32), valid
