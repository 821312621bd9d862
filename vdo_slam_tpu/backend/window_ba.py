"""Windowed (local) bundle adjustment — PartialBatchOptimization equivalent.

Static-only sliding-window refinement (Optimizer.cc:42-1230, STATIC_ONLY=true
at :211): refines the last WINDOW_SIZE camera poses + static points, then
writes them back in place and recomputes the camera motions
(Optimizer.cc:1055-1144).  Triggered every WINDOW_SIZE-OVERLAP_SIZE frames
by the tracker (Tracking.cc:1168-1183).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..config import VDOConfig
from ..pipeline.map_state import MapState
from .builders import build_window_graph, empty_window_graph
from .factor_graph import LMParams, Variables, lm_solve, lm_solve_schur


def _np_inv(T):
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = T[:3, :3].T
    out[:3, 3] = -T[:3, :3].T @ T[:3, 3]
    return out


def _lm_params(cfg: VDOConfig, iters: int | None = None) -> LMParams:
    be = cfg.backend
    return LMParams(
        iters=iters if iters is not None else min(be.local_iters, 12),
        cg_iters=be.cg_iters,
        cg_tol=be.cg_tol,
        lm_unroll=be.local_unroll,
        huber_delta=be.huber_delta,
        pose_huber_delta=be.pose_huber_delta,
        robust=be.robust_kernel,
    )


def warmup_window_ba(cfg: VDOConfig, window: int | None = None) -> None:
    """Compile AND first-execute the window-BA executables on zero-weight
    graphs with the exact shapes real window solves use (one per
    builders.WINDOW_TIERS entry — the big tier serves the tracklet-rich
    first window, the small one every later window at ~half the padded
    exec cost).  Program load costs seconds on the remote worker; without
    this the first mid-sequence window trigger stalls the tracking loop."""
    from .builders import WINDOW_TIERS

    for t in range(len(WINDOW_TIERS)):
        g, v = empty_window_graph(cfg, window, tier=t)
        _, info = lm_solve_schur(g, v, _lm_params(cfg))
        float(jax.device_get(info["cost"]))


def local_ba_inplace(m: MapState, cfg: VDOConfig, window: int | None = None,
                     iters: int | None = None, solver: str = "schur",
                     n_frames: int | None = None) -> dict:
    """n_frames pins the window end (see build_window_graph) so this can run
    on a background thread while tracking appends new frames; write-back
    touches only indices < n_frames."""
    t0 = time.perf_counter()
    graph, v0, meta = build_window_graph(m, cfg, window, n_frames=n_frames)
    p = _lm_params(cfg, iters)
    v0 = Variables(
        poses=np.asarray(v0.poses), motions=np.asarray(v0.motions),
        points=np.asarray(v0.points),
    )
    t1 = time.perf_counter()
    # static-only window: points couple only through obs edges, so the exact
    # dense-Schur direct solver applies (and outruns matrix-free PCG)
    solve = lm_solve_schur if solver == "schur" else lm_solve
    v, info = solve(graph, v0, p)
    t2 = time.perf_counter()
    # sync on ONE scalar first: splits device queue+execution wait (t_exec)
    # from the payload drain (t_fetch) — the round-4 report lumped both into
    # "fetch", which misread ~110 ms of solve execution as transfer cost
    cost = float(jax.device_get(info["cost"]))
    t2b = time.perf_counter()
    # ONE batched device->host transfer for everything the write-back and
    # report need: per-array np.asarray/device_get pays a full tunnel
    # round-trip each (~33-70 ms) on remote-attached devices
    poses, points, cost0, stats0, stats = jax.device_get(
        (v.poses, v.points, info["cost0"], info["stats0"], info["stats"]))
    t3 = time.perf_counter()

    # write back refined camera poses and recomputed camera motions
    # (Optimizer.cc:1055-1082): vmCameraPose in place, motion = inv(P_a) P_b
    for i, f in enumerate(meta.frame_ids):
        m.cam_pose[f] = poses[i].astype(np.float32)
        if i > 0:
            m.rigid_motion[f - 1][0] = (
                _np_inv(poses[i - 1]) @ poses[i]
            ).astype(np.float32)

    # write back refined static points at every in-window observation
    # (Optimizer.cc:1107-1121); archive arrays may be read-only device views
    s_frm, s_fea, s_pid = meta.stat_obs
    for f in meta.frame_ids:
        if not m.stat_3d[f].flags.writeable:
            m.stat_3d[f] = m.stat_3d[f].copy()
    for f in np.unique(s_frm):
        sel = s_frm == f
        m.stat_3d[f][s_fea[sel]] = points[s_pid[sel]]
    # per-edge-type chi2 + inlier breakdown (Optimizer.cc:640-970 analog)
    return {
        "cost0": float(cost0),
        "cost": float(cost),
        "n_points": meta.n_static_points,
        "window": len(meta.frame_ids),
        "n_tracks_dropped": meta.n_tracks_dropped,
        "edge_stats0": stats0,
        "edge_stats": stats,
        # phase split: host graph build / dispatch / device queue+execution
        # (scalar-synced) / payload drain — separates host cost, device-
        # contention wait, and transfer when a window solve runs long next
        # to the tracking loop
        "t_build_ms": (t1 - t0) * 1e3,
        "t_dispatch_ms": (t2 - t1) * 1e3,
        "t_exec_ms": (t2b - t2) * 1e3,
        "t_fetch_ms": (t3 - t2b) * 1e3,
    }
