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
    import time

    be = cfg.backend
    t0 = time.perf_counter()
    graph, v0, meta = build_full_graph(m, cfg)
    t_build = time.perf_counter() - t0
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
    t0 = time.perf_counter()
    chunk_times = []
    v, info = lm_solve_chunked(
        graph, v0, p, chunk=3,
        callback=lambda i, _: chunk_times.append(time.perf_counter()))
    poses = np.asarray(v.poses)
    motions = np.asarray(v.motions)
    points = np.asarray(v.points)
    t_solve = time.perf_counter() - t0
    t0 = time.perf_counter()

    for f in range(m.num_frames):
        m.cam_pose_rf[f] = poses[f].astype(np.float32)
    for mid, (fp, j) in enumerate(meta.motion_slots):
        m.rigid_motion_rf[fp][j] = motions[mid].astype(np.float32)
    # vectorized point write-back over the flat observation arrays
    s_frm, s_fea, s_pid = meta.stat_obs
    big = np.stack(m.stat_3d)
    big[s_frm, s_fea] = points[s_pid]
    for f in range(m.num_frames):
        m.stat_3d[f] = big[f]
    d_frm, d_fea = meta.dyn_obs
    big = np.stack(m.dyn_3d)
    big[d_frm, d_fea] = points[meta.n_static_points:
                               meta.n_static_points + d_frm.size]
    for f in range(m.num_frames):
        m.dyn_3d[f] = big[f]
    t_wb = time.perf_counter() - t0
    # per-edge-type chi2 + inlier breakdown (Optimizer.cc:1938-2091 analog)
    stats0, stats = jax.device_get((info["stats0"], info["stats"]))
    return {
        "cost0": float(info["cost0"]),
        "cost": float(info["cost"]),
        "n_static": meta.n_static_points,
        "n_dyn": int(meta.dyn_obs[0].size),
        "n_motions": meta.n_motions,
        "edge_stats0": stats0,
        "edge_stats": stats,
        "iters_run": info.get("iters_run"),
        "t_build_s": round(t_build, 2),
        "t_solve_s": round(t_solve, 2),
        "t_writeback_s": round(t_wb, 2),
        "chunk_times": [round(t - chunk_times[0], 2) for t in chunk_times],
    }
