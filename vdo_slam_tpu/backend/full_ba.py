"""Full-batch dynamic-SLAM optimization — FullBatchOptimization equivalent.

End-of-run global refinement over the whole archive (Optimizer.cc:1232-2175):
camera chain + static structure + per-frame-per-object motion vertices with
ternary point-motion factors and smoothness, solved by matrix-free LM+PCG.
Refined camera poses go to cam_pose_rf and motions to rigid_motion_rf
(Optimizer.cc:2094-2172); points are refined in place.
"""

from __future__ import annotations

import jax
import numpy as np

from ..config import VDOConfig
from ..pipeline.map_state import MapState
from .builders import build_full_graph
from .factor_graph import LMParams, Variables, lm_solve_chunked


def full_ba_inplace(m: MapState, cfg: VDOConfig, iters: int | None = None) -> dict:
    be = cfg.backend
    graph, v0, meta = build_full_graph(m, cfg)
    p = LMParams(
        iters=iters if iters is not None else be.full_iters,
        cg_iters=be.cg_iters,
        cg_tol=be.cg_tol,
        huber_delta=be.huber_delta,
        robust=be.robust_kernel,
        gain_eps=be.full_gain_thres * 10,  # cross-chunk stop
    )
    v0 = Variables(
        poses=np.asarray(v0.poses), motions=np.asarray(v0.motions),
        points=np.asarray(v0.points),
    )
    # chunked execution: long programs can exceed remote-worker time limits
    v, info = lm_solve_chunked(graph, v0, p, chunk=3)
    poses = np.asarray(v.poses)
    motions = np.asarray(v.motions)
    points = np.asarray(v.points)

    for f in range(m.num_frames):
        m.cam_pose_rf[f] = poses[f].astype(np.float32)
        if not m.stat_3d[f].flags.writeable:
            m.stat_3d[f] = m.stat_3d[f].copy()
        if not m.dyn_3d[f].flags.writeable:
            m.dyn_3d[f] = m.dyn_3d[f].copy()
    for mid, (fp, j) in enumerate(meta.motion_slots):
        m.rigid_motion_rf[fp][j] = motions[mid].astype(np.float32)
    for pid, t in enumerate(meta.static_tracks):
        for (f, j) in t:
            m.stat_3d[f][j] = points[pid]
    for k, (f, j) in enumerate(meta.dyn_obs):
        m.dyn_3d[f][j] = points[meta.n_static_points + k]
    # per-edge-type chi2 + inlier breakdown (Optimizer.cc:1938-2091 analog)
    stats0, stats = jax.device_get((info["stats0"], info["stats"]))
    return {
        "cost0": float(info["cost0"]),
        "cost": float(info["cost"]),
        "n_static": meta.n_static_points,
        "n_dyn": len(meta.dyn_obs),
        "n_motions": meta.n_motions,
        "edge_stats0": stats0,
        "edge_stats": stats,
    }
