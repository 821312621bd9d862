"""Feature grid for spatial queries.

Rebuild of Frame's 48x64 keypoint grid (AssignFeaturesToGrid /
GetFeaturesInArea, Frame.cc:263-379) as fixed-shape tensors: the reference
uses it for radius matching; here the grid is a padded (rows, cols, cap)
index table plus a vectorized radius query, available to future descriptor
matchers and to users of the API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GRID_ROWS = 48
GRID_COLS = 64


@functools.partial(jax.jit, static_argnames=("width", "height", "cap"))
def assign_to_grid(xy: jax.Array, valid: jax.Array, width: int, height: int,
                   cap: int = 16):
    """Bucket keypoints into the reference's 48x64 grid.

    Returns (table (GRID_ROWS, GRID_COLS, cap) int32 feature indices (-1
    padding), counts (GRID_ROWS, GRID_COLS)).
    """
    gx = jnp.clip((xy[:, 0] * GRID_COLS / width).astype(jnp.int32), 0,
                  GRID_COLS - 1)
    gy = jnp.clip((xy[:, 1] * GRID_ROWS / height).astype(jnp.int32), 0,
                  GRID_ROWS - 1)
    cell = jnp.where(valid, gy * GRID_COLS + gx, GRID_ROWS * GRID_COLS)
    order = jnp.argsort(cell, stable=True)
    cell_sorted = cell[order]
    # rank within cell
    idx = jnp.arange(cell.shape[0], dtype=jnp.int32)
    same = jnp.concatenate([jnp.array([False]),
                            cell_sorted[1:] == cell_sorted[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(same, 0, idx)
    )
    rank = idx - run_start
    n_cells = GRID_ROWS * GRID_COLS
    flat = jnp.full((n_cells + 1) * cap, -1, jnp.int32)
    slot = jnp.where(rank < cap,
                     jnp.minimum(cell_sorted, n_cells) * cap + jnp.minimum(rank, cap - 1),
                     n_cells * cap)
    flat = flat.at[slot].set(order.astype(jnp.int32), mode="drop")
    table = flat[: n_cells * cap].reshape(GRID_ROWS, GRID_COLS, cap)
    counts = jax.ops.segment_sum(
        jnp.where(valid, 1, 0), jnp.minimum(cell, n_cells),
        num_segments=n_cells + 1,
    )[:-1].reshape(GRID_ROWS, GRID_COLS)
    return table, counts


def features_in_area(xy: jax.Array, valid: jax.Array, center: jax.Array,
                     radius: float, k: int = 64):
    """Indices of up to k valid features within an L_inf radius of `center`
    (GetFeaturesInArea semantics, Frame.cc:314-367: |dx|<r and |dy|<r)."""
    d = jnp.abs(xy - center[None, :])
    ok = valid & (d[:, 0] < radius) & (d[:, 1] < radius)
    dist = jnp.where(ok, jnp.sum(d * d, axis=-1), jnp.inf)
    idx = jnp.argsort(dist)[:k]
    return idx.astype(jnp.int32), ok[idx]
