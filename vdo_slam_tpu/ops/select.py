"""Fixed-shape selection primitives.

These replace the reference's dynamic std::vector filtering/top-up idioms
(Frame.cc:100-168 static filtering, Frame.cc:200-228 object sampling,
Tracking.cc:2660-2995 RenewFrameInfo top-up) with masked, padded, sortable
computations — the core trick that makes the whole pipeline XLA-compilable
with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_top_k(score: jax.Array, valid: jax.Array, k: int):
    """Select indices of the k highest-scoring valid entries.

    Returns (idx, out_valid): idx (k,) int32 indices into the input, out_valid
    (k,) bool marking slots actually filled.  Deterministic: ties broken by
    lowest index (lax.top_k and stable argsort agree on this).
    """
    n = score.shape[0]
    neg_inf = jnp.finfo(jnp.float32).min
    masked = jnp.where(valid, score.astype(jnp.float32), neg_inf)
    if k < n:
        # partial top-k beats a full bitonic argsort on TPU
        _, idx = jax.lax.top_k(masked, k)
        return idx.astype(jnp.int32), jnp.take(valid, idx)
    idx = jnp.argsort(-masked, stable=True)[:k]
    out_valid = jnp.take(valid, idx)
    if idx.shape[0] < k:  # more slots requested than candidates: pad
        pad = k - idx.shape[0]
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros(pad, bool)])
    return idx.astype(jnp.int32), out_valid


def compact(valid: jax.Array):
    """Permutation that moves valid entries to the front (stable).

    Returns (perm, n_valid).  perm is (N,) int32; applying `x[perm]` packs all
    valid entries first, preserving relative order.
    """
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    return order.astype(jnp.int32), jnp.sum(valid.astype(jnp.int32))


def per_label_rank(labels: jax.Array, valid: jax.Array):
    """Rank of each element among same-label valid elements (array order).

    Invalid entries get rank = N (never selected).  O(N log N) via sort.
    """
    n = labels.shape[0]
    big = jnp.int32(n)
    key_label = jnp.where(valid, labels.astype(jnp.int32), jnp.int32(2**30))
    pos = jnp.arange(n, dtype=jnp.int32)
    # sort by (label, position): stable argsort on label keeps position order
    order = jnp.argsort(key_label, stable=True)
    sorted_labels = key_label[order]
    # rank within run of equal labels
    same_as_prev = jnp.concatenate(
        [jnp.array([False]), sorted_labels[1:] == sorted_labels[:-1]]
    )
    # segment-wise cumulative count: rank = i - start_of_run(i)
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.where(same_as_prev, 0, idx)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    rank_sorted = idx - run_start
    # scatter ranks back to original positions
    rank = jnp.zeros(n, dtype=jnp.int32).at[order].set(rank_sorted)
    return jnp.where(valid, rank, big)


def quota_select(labels: jax.Array, valid: jax.Array, priority: jax.Array,
                 quota: int, k: int):
    """Select up to `quota` entries per label (highest priority first), then
    compact up to k total slots.

    Returns (idx, out_valid) of shape (k,).  Replaces the reference's
    per-object "top up to MaxTrackPointOBJ" loops (Tracking.cc:2838-2896).
    """
    n = labels.shape[0]
    # ONE sort by (label, -priority); ranking and compaction are then scans/
    # scatters (the previous per_label_rank+compact route re-sorted the n
    # candidates twice more — sorts dominate this op on TPU at the 29k-
    # candidate object-sampling size)
    lab_key = jnp.where(valid, labels.astype(jnp.int32), jnp.int32(2**30))
    order = jnp.lexsort((-priority, lab_key))
    sl = lab_key[order]
    sv = valid[order]
    idx_ar = jnp.arange(n, dtype=jnp.int32)
    same = jnp.concatenate([jnp.array([False]), sl[1:] == sl[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(same, 0, idx_ar))
    rank = idx_ar - run_start
    accept_sorted = sv & (rank < quota)
    # acceptance back to original positions, then a stable cumsum-scatter
    # compact (order-identical to compact()[:k], no extra sort)
    accept = jnp.zeros(n, dtype=bool).at[order].set(accept_sorted)
    pos = jnp.cumsum(accept) - 1
    target = jnp.where(accept & (pos < k), pos, k)  # k -> dropped
    idx = jnp.zeros(k, jnp.int32).at[target].set(idx_ar, mode="drop")
    out_valid = jnp.zeros(k, bool).at[target].set(True, mode="drop")
    return idx, out_valid


def gather_rows(arr: jax.Array, idx: jax.Array, valid: jax.Array, fill=0):
    """Gather rows with invalid slots replaced by `fill`."""
    out = jnp.take(arr, idx, axis=0)
    shape = (-1,) + (1,) * (out.ndim - 1)
    return jnp.where(valid.reshape(shape), out, fill)


def min_dist_to_set(points: jax.Array, ref_points: jax.Array,
                    ref_valid: jax.Array) -> jax.Array:
    """Min Euclidean distance from each point (N,2) to a valid reference set
    (M,2) — vectorized replacement for the reference's O(N*M) "already used"
    checks (Tracking.cc:2730-2744, 2856-2868).  Returns (N,) float32."""
    d2 = jnp.sum(
        (points[:, None, :] - ref_points[None, :, :]) ** 2, axis=-1
    )
    d2 = jnp.where(ref_valid[None, :], d2, jnp.inf)
    return jnp.sqrt(jnp.min(d2, axis=-1))
