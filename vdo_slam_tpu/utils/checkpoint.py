"""Checkpoint / resume for the tracking session.

The reference has no checkpointing (SURVEY.md §5.4) and its RNG is seeded
from wall time, so runs are not reproducible.  Here the PRNG key is explicit
and the full session state (MapState archive + tracker carry state) is
serializable, giving determinism and resume for free.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np

from ..pipeline.map_state import MapState
from ..pipeline.state import DynamicBank, FrameState, StaticBank
from ..pipeline.tracking import ObjectTrack, Tracker


def save_checkpoint(tracker: Tracker, path: str | Path) -> None:
    state_np = (
        jax.tree.map(lambda x: np.asarray(x), tracker.state)
        if tracker.state is not None else None
    )
    payload = {
        "version": 1,
        "frame_id": tracker.frame_id,
        "max_id": tracker.max_id,
        "origin_inv": tracker.origin_inv,
        "key": np.asarray(tracker.key),
        "state": state_np,
        "last_sem": tracker._last_sem,
        "last_obj_rows": tracker._last_obj_rows,
        "last_seg": (np.asarray(tracker._last_seg)
                     if tracker._last_seg is not None else None),
        "last_flow": (np.asarray(tracker._last_flow)
                      if tracker._last_flow is not None else None),
        "tracks": [
            (t.model_label, t.sem_label, np.asarray(t.H), t.active)
            for t in tracker._last_tracks
        ],
        "map": tracker.map,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(tracker: Tracker, path: str | Path) -> Tracker:
    """Restore a Tracker in place (config/stages must already match)."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        payload = pickle.load(f)
    tracker.frame_id = payload["frame_id"]
    tracker.max_id = payload["max_id"]
    tracker.origin_inv = payload["origin_inv"]
    tracker.key = jnp.asarray(payload["key"])
    if payload["state"] is not None:
        tracker.state = jax.tree.map(jnp.asarray, payload["state"])
    tracker._last_sem = payload["last_sem"]
    tracker._last_obj_rows = payload["last_obj_rows"]
    tracker._last_seg = (jnp.asarray(payload["last_seg"])
                         if payload["last_seg"] is not None else None)
    tracker._last_flow = (jnp.asarray(payload["last_flow"])
                          if payload["last_flow"] is not None else None)
    tracker._last_tracks = []
    for model, sem, H, active in payload["tracks"]:
        t = ObjectTrack(model, sem, H)
        t.active = active
        tracker._last_tracks.append(t)
    tracker.map.__dict__.update(payload["map"].__dict__)
    return tracker


def save_fused_checkpoint(tracker, path: str | Path) -> None:
    """Checkpoint for the fused-mode tracker (device state pytree + host
    bookkeeping + archive)."""
    if hasattr(tracker, "flush"):
        tracker.flush()  # drain the async-archive pipeline first
    payload = {
        "version": 1,
        "kind": "fused",
        "frame_id": tracker.frame_id,
        "origin_inv": tracker.origin_inv,
        "keys": tracker._keys,
        "state": jax.tree.map(lambda x: np.asarray(x), tracker.state),
        "last_obj_rows": tracker._last_obj_rows,
        "last_T_wc_gt": tracker._last_T_wc_gt,
        "map": tracker.map,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_fused_checkpoint(tracker, path: str | Path):
    import jax.numpy as jnp

    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("kind") == "fused"
    tracker.frame_id = payload["frame_id"]
    tracker.origin_inv = payload["origin_inv"]
    tracker._keys = payload["keys"]
    tracker.state = jax.tree.map(jnp.asarray, payload["state"])
    tracker._last_obj_rows = payload["last_obj_rows"]
    tracker._last_T_wc_gt = payload["last_T_wc_gt"]
    tracker.map.__dict__.update(payload["map"].__dict__)
    return tracker
