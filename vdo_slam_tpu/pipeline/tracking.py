"""The tracking pipeline orchestrator.

Host-side equivalent of the reference Tracking class (src/Tracking.cc, 3792
LoC): a per-frame state machine that sequences the jitted device stages and
performs the tiny label-association bookkeeping between them.  Everything
per-pixel or per-feature runs on device; the host touches only O(labels)
metadata and the append-only MapState archive.

State machine (Tracking.h:119-123): NO_IMAGES_YET -> NOT_INITIALIZED -> OK.
"""

from __future__ import annotations

import time
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KITTI, OMD, VDOConfig
from ..io.dataset import FrameData
from . import stages
from .map_state import MapState
from .state import DynamicBank, FrameState, StaticBank


def _np_inv(T: np.ndarray) -> np.ndarray:
    out = np.eye(4, dtype=np.float32)
    R = T[:3, :3]
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ T[:3, 3]
    return out


def obj_pose_parsing_kt(row: np.ndarray) -> np.ndarray:
    """KITTI object_pose row -> camera-frame object pose
    (Tracking::ObjPoseParsingKT, Tracking.cc:2010-2118): translation row[6:9],
    rotation = R_y(yaw + pi/2) with the reference's Ry*Rx*Rz composition at
    x=z=0."""
    t = row[6:9]
    y = row[9] + np.pi / 2.0
    cy, sy = np.cos(y), np.sin(y)
    R = np.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def obj_pose_parsing_ox(row: np.ndarray, origin_inv: np.ndarray) -> np.ndarray:
    """OMD object_pose row -> world object pose (ObjPoseParsingOX,
    Tracking.cc:2120-2182): axis-angle row[5:8], translation row[2:5],
    normalized by the first camera pose."""
    t = row[2:5]
    rvec = row[5:8].astype(np.float64)
    angle = np.linalg.norm(rvec)
    if angle > 0:
        k = rvec / angle
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * (Kx @ Kx)
    else:
        R = np.eye(3)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.astype(np.float32)
    T[:3, 3] = t
    return _np_inv(origin_inv) @ T


class ObjectTrack:
    """Per-slot metadata carried across frames (host side)."""

    __slots__ = ("model_label", "sem_label", "H", "active")

    def __init__(self, model_label: int, sem_label: int, H: np.ndarray):
        self.model_label = model_label
        self.sem_label = sem_label
        self.H = H
        self.active = True


class Tracker:
    def __init__(self, cfg: VDOConfig, game_map: MapState | None = None):
        self.cfg = cfg
        self.map = game_map if game_map is not None else MapState()
        self.state: FrameState | None = None
        self.frame_id = 0
        self.max_id = 1                    # global object-track id counter
        self.origin_inv: np.ndarray | None = None
        self.key = jax.random.PRNGKey(cfg.seed)
        # host mirrors of last-frame label arrays (for association)
        self._last_sem: np.ndarray | None = None
        self._last_tracks: list[ObjectTrack] = []
        self._last_obj_rows: np.ndarray = np.zeros((0, 10), np.float32)
        self._last_seg = None
        self._last_flow = None
        # compiled stages
        self._prepare = stages.make_prepare(cfg)
        self._mask_prop = stages.make_mask_prop(cfg)
        self._inherit = stages.make_inherit(cfg)
        self._camera = stages.make_camera_stage(cfg)
        self._scene_flow = stages.make_scene_flow(cfg)
        self._objects = stages.make_objects_stage(cfg)
        self._renew_static, self._renew_dynamic = stages.make_renew_stage(cfg)
        self._init_banks = stages.make_init_stage(cfg)
        self.local_ba_hook = None          # set by System (backend trigger)

    # -- helpers ----------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _gt_pose(self, T_cw_gt_raw: np.ndarray) -> np.ndarray:
        """Origin-normalized GT world->camera (Tracking.cc:320-331).

        The first frame's GT is exactly I (matching the pose-chain init)
        even when the run starts mid-sequence (raw origin != I)."""
        if self.origin_inv is None:
            self.origin_inv = np.asarray(T_cw_gt_raw, np.float32)
        return _np_inv(np.asarray(T_cw_gt_raw, np.float32)) @ self.origin_inv

    def _parse_obj_rows(self, rows: np.ndarray, T_wc_gt: np.ndarray):
        """Object GT poses in WORLD frame keyed by semantic id
        (Tracking.cc:334-342 + 789-865)."""
        out = {}
        boxes = {}
        for r in np.asarray(rows, np.float32).reshape(-1, 10):
            sem = int(r[1])
            if self.cfg.tracking.dataset == OMD:
                out[sem] = obj_pose_parsing_ox(r, self.origin_inv)
            else:
                out[sem] = T_wc_gt @ obj_pose_parsing_kt(r)
            boxes[sem] = r[2:6]
        return out, boxes

    # -- public API --------------------------------------------------------

    def grab_frame(self, fd: FrameData) -> dict:
        """Process one RGB-D(+flow+mask) frame; the TrackRGBD equivalent."""
        t_start = time.perf_counter()
        if self.frame_id == 0:
            out = self._initialize(fd)
        else:
            out = self._track(fd)
        out["frame_id"] = self.frame_id
        out["wall_time"] = time.perf_counter() - t_start
        self.frame_id += 1
        return out

    # -- frame 0 -----------------------------------------------------------

    def _initialize(self, fd: FrameData) -> dict:
        cfg = self.cfg
        seg = jnp.asarray(fd.mask, jnp.int32)
        flow = jnp.asarray(fd.flow)
        prep = self._prepare(
            jnp.asarray(fd.rgb), jnp.asarray(fd.depth_raw), flow, seg,
            self._next_key(),
        )
        stat, dyn = self._init_banks(prep["stat_cand"], prep["obj_cand"])
        H_img, W_img = fd.rgb.shape[:2]
        eye = jnp.eye(4, dtype=jnp.float32)
        self.state = FrameState(
            static=stat, dynamic=dyn, T_cw=eye, T_cw_gt=eye, velocity=eye,
            seg=seg, flow_map=flow, depth_map=prep["depth"],
        )
        self._gt_pose(fd.pose_gt_raw)  # records origin
        self._last_sem = np.asarray(dyn.sem_label)
        self._last_obj_rows = fd.obj_gt_rows
        self._last_seg = seg
        self._last_flow = flow

        # archive frame 0 (Tracking::Initialization, Tracking.cc:1215-1276)
        m = self.map
        m.stat_xy.append(np.asarray(stat.xy))
        m.stat_depth.append(np.asarray(stat.depth))
        m.stat_3d.append(np.asarray(stat.point_w))
        m.stat_valid.append(np.asarray(stat.valid))
        m.dyn_xy.append(np.asarray(dyn.xy))
        m.dyn_depth.append(np.asarray(dyn.depth))
        m.dyn_3d.append(np.asarray(dyn.point_w))
        m.dyn_valid.append(np.asarray(dyn.valid))
        m.dyn_obj_label.append(np.asarray(dyn.obj_label))
        m.dyn_sem_label.append(np.asarray(dyn.sem_label))
        m.cam_pose.append(np.eye(4, dtype=np.float32))
        m.cam_pose_rf.append(np.eye(4, dtype=np.float32))
        m.cam_pose_gt.append(np.eye(4, dtype=np.float32))
        m.timings.append(np.zeros(5, np.float32))
        return {"T_cw": np.eye(4, dtype=np.float32), "objects": []}

    # -- frame >= 1 ---------------------------------------------------------

    def _track(self, fd: FrameData) -> dict:
        cfg = self.cfg
        tr = cfg.tracking
        Kobj = cfg.shapes.max_objects
        last = self.state
        timings = np.zeros(5, np.float32)

        # ---- (0) mask propagation (UpdateMask) ---------------------------
        t0 = time.perf_counter()
        seg = jnp.asarray(fd.mask, jnp.int32)
        uniq_last = np.unique(self._last_sem[self._last_sem > 0])
        table = np.zeros(cfg.shapes.max_sem_labels, np.int32)
        table[: min(len(uniq_last), len(table))] = uniq_last[: len(table)]
        seg, _lost = self._mask_prop(
            seg, self._last_seg, self._last_flow, last.dynamic,
            jnp.asarray(table),
        )
        flow = jnp.asarray(fd.flow)
        prep = self._prepare(
            jnp.asarray(fd.rgb), jnp.asarray(fd.depth_raw), flow, seg,
            self._next_key(),
        )
        depth = prep["depth"]
        stat_cur, dyn_cur = self._inherit(last.static, last.dynamic, depth, seg)
        jax.block_until_ready(dyn_cur["xy"])
        timings[0] = (time.perf_counter() - t0) * 1e3

        # ---- (1) camera pose ---------------------------------------------
        t1 = time.perf_counter()
        T_cw_gt = jnp.asarray(self._gt_pose(fd.pose_gt_raw))
        cam_out = self._camera(
            last.static, stat_cur["xy"], stat_cur["depth"], last.T_cw,
            last.velocity, T_cw_gt, last.T_cw_gt, self._next_key(),
        )
        T_cw = cam_out["T_cw"]
        jax.block_until_ready(T_cw)
        timings[1] = (time.perf_counter() - t1) * 1e3

        # ---- (2) scene flow + dynamic classification ----------------------
        t2 = time.perf_counter()
        sf = self._scene_flow(
            last.dynamic, dyn_cur["xy"], dyn_cur["depth"],
            dyn_cur["sem_label"], last.T_cw, T_cw,
        )
        # host gating over <=L labels (DynObjTracking, Tracking.cc:1366-1612)
        cur_sem = np.asarray(dyn_cur["sem_label"])
        valid = np.asarray(dyn_cur["valid"]) & np.asarray(sf["sem_ok"])
        sf_norm = np.asarray(sf["sf_norm"])
        depths = np.asarray(dyn_cur["depth"])
        xy = np.asarray(dyn_cur["xy"])
        H_img, W_img = fd.rgb.shape[:2]
        sr = tr.boundary_shrink_row if tr.dataset == KITTI else 0
        sc = tr.boundary_shrink_col if tr.dataset == KITTI else 0

        feat_class = np.full(cur_sem.shape, -2, np.int64)  # device obj_label draft
        feat_class[~valid & (np.asarray(dyn_cur["valid"]))] = -1
        active: list[tuple[int, np.ndarray]] = []  # (sem_label, member_mask)
        for lab in np.unique(cur_sem[valid & (cur_sem > 0)]):
            mask = valid & (cur_sem == lab)
            n = int(mask.sum())
            if n == 0:
                continue
            u, v = xy[mask, 0], xy[mask, 1]
            frac_boundary = np.mean(
                (v < sr) | (v > H_img - sr) | (u < sc) | (u > W_img - sc)
            )
            if frac_boundary > tr.boundary_frac_thres:
                feat_class[mask] = -1
                continue
            frac_static = np.mean(sf_norm[mask] < tr.sf_mg_thres)
            if frac_static > tr.sf_ds_thres:
                feat_class[mask] = 0          # static object
                continue
            if depths[mask].mean() > tr.th_depth_obj or n < tr.min_obj_points:
                feat_class[mask] = -1         # too far / too small
                continue
            active.append((int(lab), mask))

        # label association with last frame (Tracking.cc:1537-1596)
        slot_sem = np.zeros(Kobj, np.int32)
        slot_model = np.zeros(Kobj, np.int32)
        slot_active = np.zeros(Kobj, bool)
        slot_has_mm = np.zeros(Kobj, bool)
        slot_H_prev = np.tile(np.eye(4, dtype=np.float32), (Kobj, 1, 1))
        last_by_sem = {t.sem_label: t for t in self._last_tracks if t.active}
        new_tracks: list[ObjectTrack] = []
        for k, (lab, mask) in enumerate(active[:Kobj]):
            lb_last = self._last_sem[mask]
            lb_last = lb_last[lb_last > 0]
            new_lab = int(Counter(lb_last.tolist()).most_common(1)[0][0]) \
                if lb_last.size else lab
            if new_lab in last_by_sem:
                model = last_by_sem[new_lab].model_label
                slot_has_mm[k] = True
                slot_H_prev[k] = last_by_sem[new_lab].H
            else:
                model = self.max_id
                self.max_id += 1
            slot_sem[k] = lab
            slot_model[k] = model
            slot_active[k] = True
            feat_class[mask] = model
            new_tracks.append(ObjectTrack(model, lab, np.eye(4, dtype=np.float32)))
        jax.block_until_ready(sf["sf_norm"])
        timings[2] = (time.perf_counter() - t2) * 1e3

        # ---- (3) object motion estimation ---------------------------------
        t3 = time.perf_counter()
        member_ok = jnp.asarray(feat_class > 0)
        obj_out = self._objects(
            last.dynamic, dyn_cur["xy"], dyn_cur["depth"],
            dyn_cur["sem_label"], jnp.asarray(slot_sem),
            jnp.asarray(slot_active), jnp.asarray(slot_has_mm),
            jnp.asarray(slot_H_prev), member_ok, last.T_cw, T_cw,
            self._next_key(),
        )
        n_init = np.asarray(obj_out["n_init"])
        inlier = np.asarray(obj_out["inlier"])
        H_est = np.asarray(obj_out["H"])
        speeds = np.asarray(obj_out["speed"])
        centroids = np.asarray(obj_out["centroid"])
        members = np.asarray(obj_out["members"])
        jax.block_until_ready(obj_out["H"])
        timings[3] = (time.perf_counter() - t3) * 1e3

        # GT motion lookup + failure marking (Tracking.cc:89-191)
        T_wc_gt_cur = _np_inv(np.asarray(T_cw_gt))
        T_wc_gt_last = _np_inv(np.asarray(last.T_cw_gt))
        gt_cur, _ = self._parse_obj_rows(fd.obj_gt_rows, T_wc_gt_cur)
        gt_last, _ = self._parse_obj_rows(self._last_obj_rows, T_wc_gt_last)

        objects = []
        final_class = feat_class.copy()
        for k, trk in enumerate(new_tracks):
            sem = slot_sem[k]
            ok_gt = (sem in gt_cur) and (sem in gt_last)
            ok_init = n_init[k] >= tr.min_init_inliers
            stat_ok = bool(ok_gt and ok_init)
            trk.active = stat_ok
            trk.H = H_est[k] if stat_ok else np.eye(4, dtype=np.float32)
            if stat_ok:
                L_w_p = gt_last[sem]
                L_w_c = gt_cur[sem]
                H_gt_body = _np_inv(L_w_p) @ L_w_c
                sp_gt = L_w_p[:3, 3] - L_w_c[:3, 3]
                H_p_c = L_w_c @ _np_inv(L_w_p)
                v_gt = H_p_c[:3, 3] - (np.eye(3) - H_p_c[:3, :3]) @ centroids[k]
                speed_gt = float(np.linalg.norm(v_gt) * 36.0)
                # reject LM outliers from the track (Optimizer.cc:2961-2968)
                final_class[members[k] & ~inlier[k]] = -1
            else:
                H_gt_body = np.eye(4, dtype=np.float32)
                L_w_p = np.eye(4, dtype=np.float32)
                speed_gt = 0.0
                final_class[members[k]] = -1
            objects.append({
                "slot": k,
                "model_label": int(slot_model[k]),
                "sem_label": int(sem),
                "H": H_est[k] if stat_ok else np.eye(4, dtype=np.float32),
                "H_gt_body": H_gt_body,
                "obj_pose_pre": L_w_p,
                "centroid": centroids[k],
                "speed": float(speeds[k]) if stat_ok else 0.0,
                "speed_gt": speed_gt,
                "status": stat_ok,
                "n_inlier": int(np.asarray(obj_out["n_inlier"])[k]),
                "n_init": int(n_init[k]),
            })
        self._last_tracks = new_tracks

        # ---- (4) renewal ---------------------------------------------------
        t4 = time.perf_counter()
        carry_static = cam_out["inlier"]
        stat_new = self._renew_static(
            cam_out["uv_cur"], carry_static, prep["det_xy"],
            prep["det_valid"], prep["det_score"], depth, flow, seg, T_cw,
        )
        carry_dyn = jnp.asarray(final_class > 0) & jnp.any(
            obj_out["inlier"], axis=0
        )
        dyn_new = self._renew_dynamic(
            obj_out["uv_cur"], jnp.asarray(final_class.astype(np.int32)),
            carry_dyn, prep["obj_cand"], jnp.asarray(slot_sem),
            jnp.asarray(slot_model),
            jnp.asarray(slot_active & np.array([t.active for t in new_tracks] + [False] * (Kobj - len(new_tracks)), bool)),
            depth, flow, seg, T_cw, self._next_key(),
        )
        jax.block_until_ready(dyn_new.xy)
        timings[4] = (time.perf_counter() - t4) * 1e3

        # ---- archive -------------------------------------------------------
        self._archive(fd, stat_new, dyn_new, T_cw, T_cw_gt, cam_out, objects,
                      timings)

        # ---- advance state -------------------------------------------------
        self.state = FrameState(
            static=stat_new, dynamic=dyn_new, T_cw=T_cw, T_cw_gt=T_cw_gt,
            velocity=cam_out["velocity"], seg=seg, flow_map=flow,
            depth_map=depth,
        )
        self._last_sem = np.asarray(dyn_new.sem_label)
        self._last_obj_rows = fd.obj_gt_rows
        self._last_seg = seg
        self._last_flow = flow

        # ---- windowed BA trigger (Tracking.cc:1168-1183) -------------------
        f_id = self.frame_id
        w, o = tr.window_size, tr.overlap_size
        if (self.local_ba_hook is not None and f_id >= w - 1
                and (f_id - o + 1) % (w - o) == 0):
            t5 = time.perf_counter()
            self.local_ba_hook(self.map)
            self.map.lba_times.append((time.perf_counter() - t5) * 1e3)

        return {
            "T_cw": np.asarray(T_cw),
            "t_rpe": float(cam_out["t_rpe"]),
            "r_rpe": float(cam_out["r_rpe"]),
            "n_inlier_cam": int(cam_out["n_inlier"]),
            "used_motion_model": bool(cam_out["used_motion_model"]),
            "objects": objects,
            "timings_ms": timings,
        }

    # -- map archive --------------------------------------------------------

    def _archive(self, fd, stat_new: StaticBank, dyn_new: DynamicBank, T_cw,
                 T_cw_gt, cam_out, objects, timings):
        """Push per-frame results (Track 'Save Graph Structure',
        Tracking.cc:1050-1161)."""
        m = self.map
        m.stat_xy.append(np.asarray(stat_new.xy))
        m.stat_depth.append(np.asarray(stat_new.depth))
        m.stat_3d.append(np.asarray(stat_new.point_w))
        m.stat_valid.append(np.asarray(stat_new.valid))
        m.stat_assoc.append(np.asarray(stat_new.assoc))
        m.dyn_xy.append(np.asarray(dyn_new.xy))
        m.dyn_depth.append(np.asarray(dyn_new.depth))
        m.dyn_3d.append(np.asarray(dyn_new.point_w))
        m.dyn_valid.append(np.asarray(dyn_new.valid))
        m.dyn_assoc.append(np.asarray(dyn_new.assoc))
        m.dyn_obj_label.append(np.asarray(dyn_new.obj_label))
        m.dyn_sem_label.append(np.asarray(dyn_new.sem_label))

        T_wc = _np_inv(np.asarray(T_cw))
        m.cam_pose.append(T_wc)
        m.cam_pose_rf.append(T_wc.copy())
        m.cam_pose_gt.append(_np_inv(np.asarray(T_cw_gt)))

        cam_motion = _np_inv(np.asarray(cam_out["velocity"]))
        mots = [cam_motion]
        mots_gt = [np.asarray(self.state.T_cw_gt) @ _np_inv(np.asarray(T_cw_gt))]
        poses_pre = [cam_motion]
        labels = [0]
        sems = [0]
        stats = [True]
        sp_gt = [1.0]
        sp_est = [0.0]
        cents = [np.zeros(3, np.float32)]
        for ob in objects:
            if not ob["status"]:
                continue
            mots.append(ob["H"])
            mots_gt.append(ob["H_gt_body"])
            poses_pre.append(ob["obj_pose_pre"])
            labels.append(ob["model_label"])
            sems.append(ob["sem_label"])
            stats.append(True)
            sp_gt.append(ob["speed_gt"])
            sp_est.append(ob["speed"])
            cents.append(ob["centroid"])
        m.rigid_motion.append(mots)
        m.rigid_motion_rf.append([x.copy() for x in mots])
        m.rigid_motion_gt.append(mots_gt)
        m.obj_pose_pre.append(poses_pre)
        m.rm_label.append(labels)
        m.sem_label.append(sems)
        m.obj_stat.append(stats)
        m.speed_gt.append(sp_gt)
        m.speed_est.append(sp_est)
        m.centres.append(cents)
        m.sm_label_gt.append(
            [int(r[1]) for r in np.asarray(fd.obj_gt_rows).reshape(-1, 10)]
        )
        m.timings.append(timings)
