"""Multi-stream SPMD tracking over a device mesh.

The reference is strictly single-threaded (System.cc:44-46, SURVEY.md §2.3);
this module is the new-capability scale-out path (BASELINE.json configs[4]):
run S independent camera streams data-parallel over TPU chips, with the
whole per-frame step — front-end candidates, feature inheritance, camera
RANSAC+LM, scene-flow classification, per-object motion LM, renewal — inside
ONE jit, vmapped over streams and sharded over the mesh, so XLA partitions
the compute and inserts ICI collectives only for the tiny cross-stream
metric reductions (psum/mean).

Design per the scaling recipe: pick a mesh, annotate shardings on the
batched pytrees, let XLA do the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import VDOConfig
from ..geometry import se3
from ..ops import frontend
from ..ops.image import gather_int
from ..pipeline import stages
from ..pipeline.state import DynamicBank, FrameState, StaticBank


def make_stream_state(cfg: VDOConfig):
    """Extended per-stream state: FrameState + device-side object-track
    tables (the host bookkeeping of tracking.py, now on device)."""
    B = cfg.shapes.max_static
    D = cfg.shapes.max_dynamic
    K = cfg.shapes.max_objects
    H, W = cfg.camera.height, cfg.camera.width
    fs = FrameState.empty(B, D, H, W)
    return {
        "frame": fs,
        "slot_sem": jnp.zeros((K,), jnp.int32),
        "slot_model": jnp.zeros((K,), jnp.int32),
        "slot_active": jnp.zeros((K,), bool),
        "slot_H": jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4)),
        "max_id": jnp.asarray(1, jnp.int32),
        "initialized": jnp.asarray(False),
    }


def make_frame_step(cfg: VDOConfig, packed: bool = False):
    """One fully-fused per-frame tracking step (single stream).

    Returns step(state, inputs, key) -> (state, metrics) where inputs is a
    dict(rgb, depth_raw, flow, seg, T_cw_gt) — or, with packed=True, a dict
    (packed (4,H,W) int16 wire buffer [io/packing.py], T_cw_gt); the unpack
    is elementwise and fuses into the first consumers.  The first call per
    stream initializes (frame-0 semantics); subsequent calls track.  Entirely
    jit-compatible (the frame-0 branch is a lax.cond) AND vmappable — the
    Pallas FAST kernel's custom_vmap rule batches the detector grid.
    """
    tr = cfg.tracking
    # build stage bodies WITHOUT their own jit wrappers
    # (vmap of the Pallas FAST kernel routes to its batched-grid variant via
    # custom_vmap, so the auto detector choice holds for multi-stream too)
    prep_fn = _unjit(stages.make_prepare(cfg, use_pallas=None))
    inherit_fn = _unjit(stages.make_inherit(cfg))
    camera_fn = _unjit(stages.make_camera_stage(cfg))
    sflow_fn = _unjit(stages.make_scene_flow(cfg))
    objects_fn = _unjit(stages.make_objects_stage(cfg))
    renew_s_fn, renew_d_fn = [
        _unjit(f) for f in stages.make_renew_stage(cfg)
    ]
    init_fn = _unjit(stages.make_init_stage(cfg))
    classify_fn = stages.make_device_classifier(cfg)

    def track_body(state, inputs, key):
        last: FrameState = state["frame"]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        prep = prep_fn(inputs["rgb"], inputs["depth_raw"], inputs["flow"],
                       inputs["seg"], k1)
        depth = prep["depth"]
        seg = inputs["seg"]
        stat_cur, dyn_cur = inherit_fn(last.static, last.dynamic, depth, seg)
        cam_out = camera_fn(
            last.static, stat_cur["xy"], stat_cur["depth"], last.T_cw,
            last.velocity, inputs["T_cw_gt"], last.T_cw_gt, k2,
        )
        T_cw = cam_out["T_cw"]
        sf = sflow_fn(last.dynamic, dyn_cur["xy"], dyn_cur["depth"],
                      dyn_cur["sem_label"], last.T_cw, T_cw)
        cls = classify_fn(
            dyn_cur["sem_label"], dyn_cur["valid"] & sf["sem_ok"],
            sf["sf_norm"], dyn_cur["depth"], dyn_cur["xy"],
            last.dynamic.sem_label, state["slot_sem"], state["slot_model"],
            state["slot_H"], state["slot_active"], state["max_id"],
        )
        obj_out = objects_fn(
            last.dynamic, dyn_cur["xy"], dyn_cur["depth"],
            dyn_cur["sem_label"], cls["slot_sem"], cls["slot_active"],
            cls["slot_has_mm"], cls["slot_H_prev"], cls["member_ok"],
            last.T_cw, T_cw, k3,
        )
        ok_slot = cls["slot_active"] & (
            obj_out["n_init"] >= tr.min_init_inliers
        )
        gt_sems = inputs.get("gt_sems")
        if gt_sems is not None:
            # bObjStat: an object without GT motion in both frames is a
            # failure (Tracking.cc:831-841) and its TRACK dies — the
            # reference strips its features from renewal (Tracking.cc:2834,
            # 2878) and blocks model-label inheritance (1577), exactly like
            # the host path's final_class stripping (tracking.py:327-348).
            # gt_sems is the (K_GT,) -1-padded list of semantic labels with
            # GT in BOTH frames, computed host-side at staging time.
            ok_slot = ok_slot & jnp.any(
                cls["slot_sem"][:, None] == gt_sems[None, :], axis=1)
        stat_new = renew_s_fn(
            cam_out["uv_cur"], cam_out["inlier"], prep["det_xy"],
            prep["det_valid"], prep["det_score"], depth, inputs["flow"],
            seg, T_cw,
        )
        # failed slots (no GT / too few init inliers) carry NO features —
        # the host path sets final_class[members] = -1 (tracking.py:344-348,
        # mirroring vnObjInlierID handling at Tracking.cc:2829-2841)
        carry_dyn = (cls["obj_label"] > 0) & jnp.any(
            obj_out["inlier"] & ok_slot[:, None], axis=0)
        dyn_new = renew_d_fn(
            obj_out["uv_cur"], cls["obj_label"], carry_dyn, prep["obj_cand"],
            cls["slot_sem"], cls["slot_model"], ok_slot, depth,
            inputs["flow"], seg, T_cw, k4,
        )
        new_state = {
            "frame": FrameState(
                static=stat_new, dynamic=dyn_new, T_cw=T_cw,
                T_cw_gt=inputs["T_cw_gt"], velocity=cam_out["velocity"],
                seg=seg, flow_map=inputs["flow"], depth_map=depth,
            ),
            "slot_sem": cls["slot_sem"],
            "slot_model": cls["slot_model"],
            "slot_active": ok_slot,
            "slot_H": jnp.where(ok_slot[:, None, None], obj_out["H"],
                                jnp.eye(4)),
            "max_id": cls["max_id"],
            "initialized": jnp.asarray(True),
        }
        metrics = {
            "t_rpe": cam_out["t_rpe"],
            "r_rpe": cam_out["r_rpe"],
            "n_inlier": cam_out["n_inlier"],
            "n_objects": jnp.sum(ok_slot.astype(jnp.int32)),
            "speeds": jnp.where(ok_slot, obj_out["speed"], 0.0),
            # per-slot detail for host-side archiving (fused tracker mode)
            "slot_sem": cls["slot_sem"],
            "slot_model": cls["slot_model"],
            "slot_active": ok_slot,
            "slot_H": obj_out["H"],
            "slot_centroid": obj_out["centroid"],
            "slot_n_init": obj_out["n_init"],
            "slot_n_inlier": obj_out["n_inlier"],
            "used_motion_model": cam_out["used_motion_model"],
        }
        return new_state, metrics

    def init_body(state, inputs, key):
        prep = prep_fn(inputs["rgb"], inputs["depth_raw"], inputs["flow"],
                       inputs["seg"], key)
        stat, dyn = init_fn(prep["stat_cand"], prep["obj_cand"])
        eye = jnp.eye(4, dtype=jnp.float32)
        new_state = dict(state)
        new_state["frame"] = FrameState(
            static=stat, dynamic=dyn, T_cw=eye, T_cw_gt=eye, velocity=eye,
            seg=inputs["seg"], flow_map=inputs["flow"],
            depth_map=prep["depth"],
        )
        new_state["initialized"] = jnp.asarray(True)
        Kobj = cfg.shapes.max_objects
        metrics = {
            "t_rpe": jnp.asarray(0.0),
            "r_rpe": jnp.asarray(0.0),
            "n_inlier": jnp.asarray(0, jnp.int32),
            "n_objects": jnp.asarray(0, jnp.int32),
            "speeds": jnp.zeros((Kobj,)),
            "slot_sem": jnp.zeros((Kobj,), jnp.int32),
            "slot_model": jnp.zeros((Kobj,), jnp.int32),
            "slot_active": jnp.zeros((Kobj,), bool),
            "slot_H": jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                       (Kobj, 4, 4)),
            "slot_centroid": jnp.zeros((Kobj, 3)),
            "slot_n_init": jnp.zeros((Kobj,), jnp.int32),
            "slot_n_inlier": jnp.zeros((Kobj,), jnp.int32),
            "used_motion_model": jnp.asarray(False),
        }
        return new_state, metrics

    def step(state, inputs, key):
        if packed:
            from ..io.packing import depth_wire_scale, unpack_frame

            gray, depth_raw, flow, seg = unpack_frame(
                inputs["packed"],
                depth_scale=depth_wire_scale(tr.depth_map_factor),
                flow_down=tr.flow_down,
                hw=(cfg.camera.height, cfg.camera.width))
            unpacked = {"rgb": gray, "depth_raw": depth_raw, "flow": flow,
                        "seg": seg, "T_cw_gt": inputs["T_cw_gt"]}
            if "gt_sems" in inputs:
                unpacked["gt_sems"] = inputs["gt_sems"]
            inputs = unpacked
        return jax.lax.cond(
            state["initialized"],
            lambda: track_body(state, inputs, key),
            lambda: init_body(state, inputs, key),
        )

    return step


def _unjit(fn):
    """Unwrap a jitted stage to its python body for composition."""
    inner = getattr(fn, "__wrapped__", None)
    return inner if inner is not None else fn


def make_stage_probe(cfg: VDOConfig):
    """Per-stage device-time probe for the fused path — the reference's
    5-span timing harness (Map.h:83-84, System.cc:204-237) where the
    production step is ONE fused executable that can't be timed from inside.

    Runs the SAME stage bodies as separate jitted programs on real tracker
    state + frame tensors, with a blocking device sync after each span, and
    nets out the measured per-call dispatch/tunnel overhead.  Bucket map
    (reference span -> fused stages):
      mask_update  -> prepare (depth preprocess, detection, candidates)
                      + inheritance (Tracking.cc:180-244, 2997-3241)
      camera_est   -> camera RANSAC + flow-LM (Tracking.cc:683-713)
      obj_track    -> scene flow + dynamic classifier (Tracking.cc:754-761)
      obj_est      -> vmapped per-object motion LM (Tracking.cc:868-1001)
      map_update   -> static + dynamic feature renewal (Tracking.cc:1017)

    Returns probe(state, inputs, key) -> (times_ms dict, rtt_ms).  Call it
    twice: the first run compiles each stage, the second measures warm.
    Sum(times) exceeds the fused per-frame device time — XLA fuses across
    stage boundaries in the production program — so these are upper-bound
    per-stage device times, honest but not additive."""
    import time as _time

    import numpy as _np

    tr = cfg.tracking
    prep_fn = stages.make_prepare(cfg, use_pallas=None)
    inherit_fn = stages.make_inherit(cfg)
    camera_fn = stages.make_camera_stage(cfg)
    sflow_fn = stages.make_scene_flow(cfg)
    objects_fn = stages.make_objects_stage(cfg)
    renew_s_fn, renew_d_fn = stages.make_renew_stage(cfg)
    classify_fn = jax.jit(stages.make_device_classifier(cfg))

    def probe(state, inputs, key):
        last: FrameState = state["frame"]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        times: dict[str, float] = {}
        calls: dict[str, int] = {}

        def sync(tree):
            # device_get of one leaf forces completion (block_until_ready
            # does not reliably sync on the axon tunnel).  Fetch the
            # SMALLEST leaf: all outputs of one executable materialize
            # together, and pulling a (H, W) map instead would bill the
            # stage ~30 ms of pure wire transfer (measured: the depth-map
            # leaf inflated mask_update ~4x).
            leaves = jax.tree.leaves(tree)
            smallest = min(leaves, key=lambda a: getattr(a, "nbytes", 1 << 30))
            _np.asarray(jax.device_get(smallest))

        def timed(name, fn, *args):
            t0 = _time.perf_counter()
            out = fn(*args)
            sync(out)
            times[name] = times.get(name, 0.0) + (
                _time.perf_counter() - t0) * 1e3
            calls[name] = calls.get(name, 0) + 1
            return out

        # per-call overhead baseline (dispatch + tunnel round-trip): the
        # production step pays it once, the probe pays it per stage
        t0 = _time.perf_counter()
        sync(jnp.zeros(()) + 1.0)
        rtt = (_time.perf_counter() - t0) * 1e3

        prep = timed("mask_update", prep_fn, inputs["rgb"],
                     inputs["depth_raw"], inputs["flow"], inputs["seg"], k1)
        depth, seg = prep["depth"], inputs["seg"]
        stat_cur, dyn_cur = timed("mask_update", inherit_fn, last.static,
                                  last.dynamic, depth, seg)
        cam_out = timed("camera_est", camera_fn, last.static, stat_cur["xy"],
                        stat_cur["depth"], last.T_cw, last.velocity,
                        inputs["T_cw_gt"], last.T_cw_gt, k2)
        T_cw = cam_out["T_cw"]
        sf = timed("obj_track", sflow_fn, last.dynamic, dyn_cur["xy"],
                   dyn_cur["depth"], dyn_cur["sem_label"], last.T_cw, T_cw)
        cls = timed("obj_track", classify_fn, dyn_cur["sem_label"],
                    dyn_cur["valid"] & sf["sem_ok"], sf["sf_norm"],
                    dyn_cur["depth"], dyn_cur["xy"], last.dynamic.sem_label,
                    state["slot_sem"], state["slot_model"], state["slot_H"],
                    state["slot_active"], state["max_id"])
        obj_out = timed("obj_est", objects_fn, last.dynamic, dyn_cur["xy"],
                        dyn_cur["depth"], dyn_cur["sem_label"],
                        cls["slot_sem"], cls["slot_active"],
                        cls["slot_has_mm"], cls["slot_H_prev"],
                        cls["member_ok"], last.T_cw, T_cw, k3)
        ok_slot = cls["slot_active"] & (
            obj_out["n_init"] >= tr.min_init_inliers)
        timed("map_update", renew_s_fn, cam_out["uv_cur"], cam_out["inlier"],
              prep["det_xy"], prep["det_valid"], prep["det_score"], depth,
              inputs["flow"], seg, T_cw)
        carry_dyn = (cls["obj_label"] > 0) & jnp.any(obj_out["inlier"],
                                                     axis=0)
        timed("map_update", renew_d_fn, obj_out["uv_cur"], cls["obj_label"],
              carry_dyn, prep["obj_cand"], cls["slot_sem"],
              cls["slot_model"], ok_slot, depth, inputs["flow"], seg, T_cw,
              k4)
        net = {k: max(v - rtt * calls[k], 0.0) for k, v in times.items()}
        return net, rtt

    return probe


def make_multistream_step(cfg: VDOConfig, mesh: Mesh, axis: str = "stream"):
    """Vmapped + sharded multi-stream step.

    Returns (pstep, shard_state, shard_inputs): pstep(states, inputs, keys)
    processes one frame for all streams with per-stream data sharded over
    `axis`; cross-stream mean metrics come back replicated (XLA inserts the
    all-reduce over ICI).
    """
    step = make_frame_step(cfg)
    vstep = jax.vmap(step)

    data_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def shard_tree(tree):
        return jax.device_put(
            tree, jax.tree.map(lambda _: data_sharding, tree)
        )

    @functools.partial(jax.jit, out_shardings=None)
    def pstep(states, inputs, keys):
        states, metrics = vstep(states, inputs, keys)
        fleet = {
            "mean_t_rpe": jnp.mean(metrics["t_rpe"]),
            "mean_r_rpe": jnp.mean(metrics["r_rpe"]),
            "total_objects": jnp.sum(metrics["n_objects"]),
        }
        return states, metrics, fleet

    return pstep, shard_tree, data_sharding
