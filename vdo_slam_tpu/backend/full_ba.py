"""Full-batch dynamic-SLAM optimization — FullBatchOptimization equivalent.

End-of-run global refinement over the whole archive (Optimizer.cc:1232-2175):
camera chain + static structure + per-frame-per-object motion vertices with
ternary point-motion factors and smoothness, solved by matrix-free LM+PCG.
Refined camera poses go to cam_pose_rf and motions to rigid_motion_rf
(Optimizer.cc:2094-2172); points are refined in place.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VDOConfig
from ..pipeline.map_state import MapState
from .builders import build_full_graph, empty_full_graph
from .factor_graph import (LMParams, Variables, lm_solve, lm_solve_chunked,
                           lm_solve_sharded_chunked)

# Default LM iterations per device call (BackendConfig.full_ba_chunk).
# Two forces: (a) the remote worker kills single programs over ~60-90 s, so
# iterations must be chunked at all (~0.5 s per warm LM iteration on the
# 114k-point bench graph); (b) the cross-chunk gain test (g2o
# SparseOptimizerTerminateAction semantics, Optimizer.cc:140-142) only
# evaluates at chunk boundaries — chunk=9 with a 9-iteration budget could
# NEVER stop early and burned ~1.6 s of converged iterations on the bench
# (accuracy plateaus at LM iter 4-5, DESIGN §11).  chunk=3 pays extra host
# syncs (~0.1 s each) but lets the solve terminate early.
FULL_BA_CHUNK = 3


def _lm_params(cfg: VDOConfig, iters: int | None = None) -> LMParams:
    be = cfg.backend
    return LMParams(
        iters=iters if iters is not None else be.full_iters,
        cg_iters=be.cg_iters,
        cg_tol=be.cg_tol,
        cg_unroll=be.cg_unroll,
        huber_delta=be.huber_delta,
        pose_huber_delta=be.pose_huber_delta,
        robust=be.robust_kernel,
        gain_eps=be.full_gain_thres * 10,  # cross-chunk stop
    )


def _scaled_cg(cg: int, n_obs: int) -> int:
    """Step the PCG budget up as the graph shrinks (measured, DESIGN §11):
    cfg.cg_iters=12 saturates the 227k-obs bench graph (identical cost and
    RPE vs 24 at -29% solve time), but small graphs under-converge — on the
    8-frame test map cg 12/24/48 give refined obj rotation 3.8e-2/2.5e-2/
    1.2e-2 deg — and their CG iterations are nearly free."""
    if n_obs < 32768:
        return max(cg, 48)
    if n_obs < 131072:
        return max(cg, 24)
    return cg


def scaled_lm_params(cfg: VDOConfig, n_obs: int,
                     iters: int | None = None) -> LMParams:
    """LMParams with the size-scaled CG budget for a graph whose (padded)
    camera-observation edge count is n_obs.  Warmup and the real solve must
    both use this so they compile the same executable."""
    p = _lm_params(cfg, iters)
    return dataclasses.replace(p, cg_iters=_scaled_cg(p.cg_iters, n_obs))


def warmup_full_ba(cfg: VDOConfig, n_frames: int) -> None:
    """Compile AND first-execute the full-BA program on a zero-weight graph
    with the exact shapes full_ba_inplace will use for an n_frames archive.

    Requires the backend full_* caps to be set (deterministic shapes).  Run
    this on a background thread while tracking is still in flight: the first
    execution of a fresh executable costs ~10-25 s on the remote worker, and
    afterwards the real solve runs warm (~1.5 s per chunk).  Raises
    ValueError if the caps are unset."""
    g, v = empty_full_graph(cfg, n_frames)
    p = dataclasses.replace(scaled_lm_params(cfg, g.obs_w.shape[0]),
                            iters=min(cfg.backend.full_ba_chunk,
                                      cfg.backend.full_iters))
    lam = jnp.asarray(p.lambda_init, jnp.float32)
    _, info = lm_solve(g, v, p, lam0=lam)
    float(jax.device_get(info["cost"]))  # block until loaded + executed


def full_ba_inplace(m: MapState, cfg: VDOConfig, iters: int | None = None) -> dict:
    t0 = time.perf_counter()
    graph, v0, meta = build_full_graph(m, cfg)
    p = scaled_lm_params(cfg, graph.obs_w.shape[0], iters)
    v0 = Variables(
        poses=np.asarray(v0.poses), motions=np.asarray(v0.motions),
        points=np.asarray(v0.points),
    )
    graph_host = graph  # numpy copy kept for the g2o dump
    # multi-chip: shard the edge arrays over all attached devices and psum
    # the JᵀWJ reductions over ICI (SURVEY §5.8); single chip runs the plain
    # chunked solve.  Both paths chunk iterations identically (the remote
    # worker kills single programs over ~60-90 s).
    devices = jax.devices()
    sharded = len(devices) > 1
    chunk = min(cfg.backend.full_ba_chunk, p.iters)
    if not sharded:
        # one upload for all chunks (numpy args re-transfer per call
        # otherwise); the sharded path pads first, then shards internally
        graph = jax.device_put(graph)
        v0 = jax.device_put(v0)
    t_build = time.perf_counter() - t0
    # chunked execution: long programs can exceed remote-worker time limits
    t0 = time.perf_counter()
    chunk_times = []
    if sharded:
        mesh = jax.sharding.Mesh(np.asarray(devices), ("ba",))
        v, info = lm_solve_sharded_chunked(
            graph, v0, p, mesh, chunk=chunk,
            callback=lambda i, _: chunk_times.append(time.perf_counter()))
    else:
        v, info = lm_solve_chunked(
            graph, v0, p, chunk=chunk,
            callback=lambda i, _: chunk_times.append(time.perf_counter()))
    # ONE batched device->host transfer (per-array np.asarray pays a full
    # tunnel round-trip each on remote-attached devices)
    poses, motions, points, cost0, cost, stats0, stats = jax.device_get(
        (v.poses, v.motions, v.points, info["cost0"], info["cost"],
         info["stats0"], info["stats"]))
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
    # stash the optimized graph so save_results can write the reference's
    # dynamic_slam_graph_after_opt.g2o (Optimizer.cc:1935-1936)
    m.g2o_dump = {
        "graph": graph_host,
        "v": Variables(poses=poses, motions=motions, points=points),
        "n_poses": m.num_frames,
        "n_motions": meta.n_motions,
        "n_points": meta.n_static_points + int(meta.dyn_obs[0].size),
    }
    # per-edge-type chi2 + inlier breakdown (Optimizer.cc:1938-2091 analog)
    return {
        "cost0": float(cost0),
        "cost": float(cost),
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
