"""Jitted device stages of the per-frame tracking pipeline.

Each stage is a pure function over fixed-shape tensors, built once per
configuration and jit-compiled once per image geometry.  Together they cover
Tracking::GrabImageRGBD + Track (Tracking.cc:164-1212):

  prepare      — depth transform, FAST detection, candidate banks
  inherit      — current features = last frame's flow correspondences
  camera       — Kabsch-RANSAC + motion-model init, joint flow-pose LM
  scene_flow   — world-frame 3D flow magnitudes for the dynamic classifier
  objects      — vmapped per-slot init + motion LM, speeds, label updates
  renew        — inlier carryover + top-up to fixed budgets, world points

Host code (tracking.py) does only tiny-label bookkeeping between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import VDOConfig
from ..geometry import camera as cam
from ..geometry import se3
from ..ops import fast, frontend, select
from ..ops.image import gather_int, preprocess_depth, rgb_to_gray
from ..solvers import FlowLMParams, flow_lm, ransac
from .state import DynamicBank, StaticBank


def _K(cfg: VDOConfig) -> jax.Array:
    c = cfg.camera
    return jnp.asarray([c.fx, c.fy, c.cx, c.cy], jnp.float32)


def _warps(cfg: VDOConfig):
    """(to_pinhole, to_raw) pixel-coordinate warps, or None when the camera
    has zero distortion (every shipped demo config; the reference's early-out
    at Frame.cc:383-387).

    With nonzero coefficients the feature banks live in PINHOLE (undistorted)
    coordinates — the space where pi/unproject are exact, mirroring the
    reference's mvKeysUn (Frame.cc:233, 381-410) — while depth/flow/mask maps
    stay in RAW image space, so every map gather converts with the exact
    forward model to_raw.
    """
    c = cfg.camera
    coeffs = (c.k1, c.k2, c.p1, c.p2, c.k3)
    if not any(coeffs):
        return None
    from ..ops import undistort as _ud

    K = _K(cfg)
    dvec = jnp.asarray(coeffs, jnp.float32)
    return (lambda uv: _ud.undistort_points(uv, K, dvec),
            lambda uv: _ud.distort_points(uv, K, dvec))


def _lm_params(cfg: VDOConfig, for_objects: bool) -> FlowLMParams:
    s = cfg.solver
    return FlowLMParams(
        info_proj=s.info_proj,
        info_flow=s.info_flow_obj if for_objects else s.info_flow_cam,
        rp_thres=s.rp_thres,
        iters=(s.lm_iters_obj if for_objects and s.lm_iters_obj is not None
               else s.lm_iters),
        lambda_init=s.lm_lambda_init,
        unroll=s.lm_unroll,
    )


# --------------------------------------------------------------------------
# prepare
# --------------------------------------------------------------------------

def make_prepare(cfg: VDOConfig, use_pallas: bool | None = None):
    B = cfg.shapes.max_static
    D = cfg.shapes.max_dynamic
    fe = cfg.frontend
    tr = cfg.tracking
    warps = _warps(cfg)

    def _to_pinhole(cand):
        """Convert a candidate bank detected in raw image space to pinhole
        coordinates (xy, corres, flow consistent; gathers already done)."""
        to_pin, _ = warps
        xy_un = to_pin(cand["xy"])
        corres_un = to_pin(cand["corres"])
        out = dict(cand)
        out["xy"] = xy_un
        out["corres"] = corres_un
        out["flow"] = corres_un - xy_un
        return out

    def prepare(rgb, depth_raw, flow, seg, key):
        gray = rgb_to_gray(rgb)
        depth = preprocess_depth(depth_raw, tr.dataset, cfg.camera.bf,
                                 tr.depth_map_factor)
        k_det, k_obj = jax.random.split(key)
        if fe.use_sample_feature:
            xy, v = fast.grid_sample_keypoints(
                k_det, gray.shape[0], gray.shape[1],
                n=fe.n_sample_points, n_div=fe.sample_grid_div,
            )
            score = jnp.ones(xy.shape[0])
        else:
            det = fast.detect_pyramid(
                gray, n_features=fe.n_features, n_levels=fe.n_levels,
                scale_factor=fe.scale_factor, ini_th=float(fe.ini_th_fast),
                min_th=float(fe.min_th_fast), cell=fe.fast_cell,
                use_pallas=use_pallas,
            )
            xy, v, score = det["xy"], det["valid"], det["score"]
        stat = frontend.static_candidates(
            xy, v, score, depth, flow, seg, tr.th_depth_bg, B
        )
        obj = frontend.object_candidates(
            depth, flow, seg, tr.th_depth_obj, fe.obj_sample_step, D,
            tr.max_track_points_obj, k_obj,
        )
        if warps is not None:
            stat = _to_pinhole(stat)
            obj = _to_pinhole(obj)
            xy = warps[0](xy)  # detections feed renew's pinhole-space dedupe
        return {"depth": depth, "stat_cand": stat, "obj_cand": obj,
                "det_xy": xy, "det_valid": v, "det_score": score}

    return jax.jit(prepare)


# --------------------------------------------------------------------------
# mask propagation (frame >= 1, before prepare)
# --------------------------------------------------------------------------

def make_mask_prop(cfg: VDOConfig):
    L = cfg.shapes.max_sem_labels
    warps = _warps(cfg)

    def mask_prop(seg_cur, seg_last, flow_last, dyn_last: DynamicBank,
                  label_table):
        corres = dyn_last.corres
        if warps is not None:
            corres = warps[1](corres)  # seg maps live in raw image space
        return frontend.propagate_mask(
            seg_cur, seg_last, flow_last, corres,
            dyn_last.sem_label, dyn_last.valid, label_table,
            min_points=cfg.tracking.mask_recover_min_points,
        )

    return jax.jit(mask_prop)


# --------------------------------------------------------------------------
# inherit
# --------------------------------------------------------------------------

def make_inherit(cfg: VDOConfig):
    tr = cfg.tracking
    warps = _warps(cfg)

    def inherit(stat_last: StaticBank, dyn_last: DynamicBank, depth, seg):
        s_raw = warps[1](stat_last.corres) if warps is not None else None
        d_raw = warps[1](dyn_last.corres) if warps is not None else None
        s = frontend.inherit_static(stat_last.corres, stat_last.valid, depth,
                                    corres_raw=s_raw)
        d = frontend.inherit_objects(
            dyn_last.corres, dyn_last.valid, depth, seg, tr.th_depth_obj,
            corres_raw=d_raw,
        )
        return s, d

    return jax.jit(inherit)


# --------------------------------------------------------------------------
# camera tracking
# --------------------------------------------------------------------------

def make_camera_stage(cfg: VDOConfig):
    K = _K(cfg)
    p = _lm_params(cfg, for_objects=False)
    s = cfg.solver
    n_samples = cfg.shapes.ransac_samples

    def camera(stat_last: StaticBank, cur_xy, cur_depth, T_cw_last, velocity,
               T_cw_gt_cur, T_cw_gt_last, key):
        valid = stat_last.valid & (stat_last.depth > 0) & (cur_depth > 0)
        T_wl = se3.inv(T_cw_last)
        X_w = cam.unproject_to_world(stat_last.xy, stat_last.depth, K, T_wl)
        X_tgt = cam.unproject(cur_xy, cur_depth, K)

        T_r, mask_r, n_r = ransac.ransac_rigid(
            X_w, X_tgt, cur_xy, valid, K, key, n_samples=n_samples,
            thres=s.ransac_reproj_thres,
        )
        T_mm = velocity @ T_cw_last
        T0, init_inlier, n0, used_mm = ransac.choose_init(
            T_r, mask_r, n_r, T_mm, X_w, cur_xy, valid, K,
            thres=s.ransac_reproj_thres,
        )
        if s.refit_init:
            # all-inlier rigid polish of the winning init (LM starts in its
            # quadratic basin -> fewer flow-LM iterations at equal accuracy)
            T0 = ransac.refine_with_inliers(T0, X_w, X_tgt, init_inlier)
        if cfg.tracking.joint_flow:
            out = flow_lm.solve(
                T0, stat_last.xy, stat_last.depth, stat_last.flow, T_cw_last,
                init_inlier, K, p,
            )
            uv_cur = jnp.where(
                out["inlier"][:, None], stat_last.xy + out["flow"], cur_xy
            )
        else:
            # legacy non-joint path (PoseOptimizationNew semantics, with the
            # reference's synthetic depth-noise fault injection)
            from ..solvers import reproj_lm

            rp = reproj_lm.ReprojLMParams(iters=p.iters)
            nkey = jax.random.fold_in(key, 1) if cfg.tracking.depth_noise else None
            out = reproj_lm.solve_pose(
                T0, cur_xy, stat_last.xy, stat_last.depth, T_cw_last,
                init_inlier, K, rp, noise_key=nkey,
                noise_scale=cfg.tracking.depth_noise_scale,
            )
            out = dict(out)
            out["repro_err"] = jnp.sqrt(jnp.maximum(out["chi2"], 0.0)).mean()
            uv_cur = cur_xy
        # fp32 drift control on the composed pose chain
        T_cw = se3.orthonormalize(out["T"])
        vel_new = T_cw @ se3.inv(T_cw_last)
        from ..geometry import metrics
        t_rpe, r_rpe = metrics.camera_rpe(T_cw, T_cw_last, T_cw_gt_cur,
                                          T_cw_gt_last)
        return {
            "T_cw": T_cw,
            "velocity": vel_new,
            "inlier": out["inlier"],
            "init_inlier": init_inlier,
            "n_inlier": out["n_inlier"],
            "uv_cur": uv_cur,
            "used_motion_model": used_mm,
            "repro_err": out["repro_err"],
            "t_rpe": t_rpe,
            "r_rpe": r_rpe,
        }

    return jax.jit(camera)


# --------------------------------------------------------------------------
# scene flow
# --------------------------------------------------------------------------

def make_scene_flow(cfg: VDOConfig):
    K = _K(cfg)

    def scene_flow(dyn_last: DynamicBank, cur_xy, cur_depth, cur_sem,
                   T_cw_last, T_cw_cur):
        sf, X_w_prev = frontend.scene_flow_world(
            dyn_last.xy, dyn_last.depth, T_cw_last, cur_xy, cur_depth,
            T_cw_cur, K,
        )
        # features invalid for the classifier when either frame lacks a label
        # (Tracking.cc:1389-1394 sets vObjLabel=-1)
        sem_ok = (cur_sem > 0) & (dyn_last.sem_label > 0)
        sf_norm = jnp.sqrt(sf[..., 0] ** 2 + sf[..., 2] ** 2)
        return {"sf_norm": sf_norm, "sem_ok": sem_ok, "X_w_prev": X_w_prev,
                "sf3d": sf}

    return jax.jit(scene_flow)


# --------------------------------------------------------------------------
# object motion
# --------------------------------------------------------------------------

def make_objects_stage(cfg: VDOConfig):
    K = _K(cfg)
    p = _lm_params(cfg, for_objects=True)
    s = cfg.solver
    Kobj = cfg.shapes.max_objects
    n_samples = cfg.shapes.ransac_samples
    D = cfg.shapes.max_dynamic
    # per-slot solver bank size (ShapeConfig.obj_solver_cap): renewal's
    # per-label quota bounds slot membership, so compacting each slot's
    # members into (Kobj, M) before RANSAC+LM is exact (measured 25 -> 9
    # ms/frame at D=4096, M=1024, identical outputs)
    cap = cfg.shapes.obj_solver_cap
    if cap is None:
        cap = max(-(-(cfg.tracking.max_track_points_obj * 5 // 4)
                    // 128) * 128, 256)
    M = min(D, cap)
    # the legacy non-joint path is exercised rarely; keep it on the
    # uncompacted route rather than doubling its surface
    compact_solve = cfg.tracking.joint_flow and M < D

    def _objects_compact(dyn_last, cur_xy, members, X_w, X_tgt, T_wl,
                         T_cw_last, T_cw_cur, keys, slot_has_mm, slot_H_prev):
        """Compacted solve: gather each slot's members into a (Kobj, M) bank,
        run RANSAC + the joint-flow LM on the compacted arrays, scatter the
        per-feature results back to D-space.  Slots own disjoint feature
        sets (distinct semantic labels), so the scatters cannot collide."""
        idx, okm = jax.vmap(
            lambda m: select.masked_top_k(m.astype(jnp.float32), m, M)
        )(members)                                            # (Kobj, M)
        uv_l = dyn_last.xy[idx]
        dep_l = dyn_last.depth[idx]
        flo_l = dyn_last.flow[idx]
        uv_c = cur_xy[idx]
        Xw_s = X_w[idx]                                       # (Kobj, M, 3)
        Xt_s = X_tgt[idx]

        def per_slot(Xw, Xt, uvc, m, k, has_mm, H_prev):
            T_r, mask_r, n_r = ransac.ransac_rigid(
                Xw, Xt, uvc, m, K, k, n_samples=n_samples,
                thres=s.ransac_reproj_thres,
            )
            G_mm = T_cw_cur @ H_prev
            mask_mm, n_mm = ransac.reprojection_inliers(
                G_mm, Xw, uvc, m, K, s.ransac_reproj_thres
            )
            use_mm = has_mm & (n_mm >= n_r)
            G0 = jnp.where(use_mm, G_mm, T_r)
            init_in = jnp.where(use_mm, mask_mm, mask_r)
            if s.refit_init:
                G0 = ransac.refine_with_inliers(G0, Xw, Xt, init_in)
            return G0, init_in, jnp.where(use_mm, n_mm, n_r)

        G0, init_in_s, n_init = jax.vmap(per_slot)(
            Xw_s, Xt_s, uv_c, okm, keys, slot_has_mm, slot_H_prev
        )
        out = jax.vmap(
            lambda Ti, uvl, dl, fl, vi: flow_lm.solve(
                Ti, uvl, dl, fl, T_cw_last, vi, K, p)
        )(G0, uv_l, dep_l, flo_l, init_in_s)
        G = se3.orthonormalize(out["T"])
        H = se3.orthonormalize(se3.inv(T_cw_cur)[None] @ G)

        mem_f = members.astype(jnp.float32)
        cnt = jnp.maximum(mem_f.sum(-1), 1.0)
        centroid = jnp.einsum("kn,ni->ki", mem_f, X_w) / cnt[:, None]
        from ..geometry import metrics
        speed = metrics.object_speed(H, centroid)

        Dn = cur_xy.shape[0]
        tgt = jnp.where(okm, idx, Dn)                 # pad lanes -> dropped
        scatter = jax.vmap(
            lambda z, t, v: z.at[t].set(v, mode="drop")
        )
        inl = scatter(jnp.zeros((Kobj, Dn), bool), tgt, out["inlier"])
        init_inlier = scatter(jnp.zeros((Kobj, Dn), bool), tgt, init_in_s)
        # flow-refined current positions for inliers (Optimizer.cc:2942-2954)
        uv_ref = uv_l + out["flow"]                           # (Kobj, M, 2)
        flat_t = jnp.where(okm & out["inlier"], idx, Dn).reshape(-1)
        uv_new = cur_xy.at[flat_t].set(uv_ref.reshape(-1, 2), mode="drop")
        n_inlier = jnp.sum(inl.astype(jnp.int32), axis=-1)
        return {
            "G": G, "H": H, "init_inlier": init_inlier,
            "n_init": n_init, "inlier": inl, "n_inlier": n_inlier,
            "members": members, "centroid": centroid, "speed": speed,
            "uv_cur": uv_new, "repro_err": out["repro_err"],
        }

    def objects(dyn_last: DynamicBank, cur_xy, cur_depth, cur_sem,
                slot_sem, slot_active, slot_has_mm, slot_H_prev,
                member_ok, T_cw_last, T_cw_cur, key):
        """Per-slot object motion estimation.

        slot_sem (Kobj,): current-frame semantic label per object slot;
        slot_active (Kobj,): gated by the host classifier;
        slot_has_mm/slot_H_prev: motion model from the last frame
        (H propagated, Tracking.cc:1786);
        member_ok (D,): feature-level gate (valid & classifier-approved).
        """
        T_wl = se3.inv(T_cw_last)
        X_w = cam.unproject_to_world(dyn_last.xy, dyn_last.depth, K, T_wl)
        X_tgt = cam.unproject(cur_xy, cur_depth, K)
        feat_ok = member_ok & dyn_last.valid & (dyn_last.depth > 0) & (cur_depth > 0)
        members = (cur_sem[None, :] == slot_sem[:, None]) & feat_ok[None, :] \
            & slot_active[:, None]  # (Kobj, D)

        keys = jax.random.split(key, Kobj)

        if compact_solve:
            return _objects_compact(dyn_last, cur_xy, members, X_w, X_tgt,
                                    T_wl, T_cw_last, T_cw_cur, keys,
                                    slot_has_mm, slot_H_prev)

        def per_slot(m, k, has_mm, H_prev):
            T_r, mask_r, n_r = ransac.ransac_rigid(
                X_w, X_tgt, cur_xy, m, K, k, n_samples=n_samples,
                thres=s.ransac_reproj_thres,
            )
            G_mm = T_cw_cur @ H_prev  # MotionModel = mTcw * vObjMod (1786)
            mask_mm, n_mm = ransac.reprojection_inliers(
                G_mm, X_w, cur_xy, m, K, s.ransac_reproj_thres
            )
            use_mm = has_mm & (n_mm >= n_r)
            G0 = jnp.where(use_mm, G_mm, T_r)
            init_in = jnp.where(use_mm, mask_mm, mask_r)
            n_init = jnp.where(use_mm, n_mm, n_r)
            if s.refit_init:
                G0 = ransac.refine_with_inliers(G0, X_w, X_tgt, init_in)
            return G0, init_in, n_init

        G0, init_inlier, n_init = jax.vmap(per_slot)(
            members, keys, slot_has_mm, slot_H_prev
        )

        if cfg.tracking.joint_flow:
            out = flow_lm.solve_objects(
                G0, dyn_last.xy, dyn_last.depth, dyn_last.flow, T_cw_last,
                init_inlier, K, p,
            )
        else:
            # legacy non-joint path (PoseOptimizationObjMot: no robust kernel)
            from ..solvers import reproj_lm

            rp = reproj_lm.ReprojLMParams(iters=p.iters, robust=False)
            out = reproj_lm.solve_objects(
                G0, cur_xy, dyn_last.xy, dyn_last.depth, T_cw_last,
                init_inlier, K, rp,
            )
            out = dict(out)
            # no flow refinement in this mode: keep current positions
            out["flow"] = jnp.broadcast_to(
                cur_xy - dyn_last.xy, (G0.shape[0],) + dyn_last.xy.shape
            )
            out["repro_err"] = jnp.zeros((G0.shape[0],))
        G = se3.orthonormalize(out["T"])
        H = se3.orthonormalize(
            se3.inv(T_cw_cur)[None] @ G
        )  # vObjMod = Twc * G (Tracking.cc:933)

        # previous-frame centroid over the full member set (Tracking.cc:157-166)
        mem_f = members.astype(jnp.float32)
        cnt = jnp.maximum(mem_f.sum(-1), 1.0)
        centroid = jnp.einsum("kn,ni->ki", mem_f, X_w) / cnt[:, None]
        from ..geometry import metrics
        speed = metrics.object_speed(H, centroid)

        # flow-refined current positions for inliers (Optimizer.cc:2942-2954)
        inl = out["inlier"]  # (Kobj, D)
        any_inl = jnp.any(inl, axis=0)
        flow_ref = jnp.einsum("kn,knj->nj", inl.astype(jnp.float32), out["flow"])
        uv_new = jnp.where(any_inl[:, None], dyn_last.xy + flow_ref, cur_xy)

        return {
            "G": G, "H": H, "init_inlier": init_inlier,
            "n_init": n_init, "inlier": inl, "n_inlier": out["n_inlier"],
            "members": members, "centroid": centroid, "speed": speed,
            "uv_cur": uv_new, "repro_err": out["repro_err"],
        }

    return jax.jit(objects)


# --------------------------------------------------------------------------
# renewal
# --------------------------------------------------------------------------

def make_renew_stage(cfg: VDOConfig):
    K = _K(cfg)
    tr = cfg.tracking
    B = cfg.shapes.max_static
    D = cfg.shapes.max_dynamic
    warps = _warps(cfg)

    def renew_static(cur_xy, carry_ok, det_xy, det_valid, det_score,
                     depth_map, flow_map, seg_map, T_cw):
        """RenewFrameInfo static half (Tracking.cc:2660-2790)."""
        H_img, W_img = depth_map.shape
        # (1) carryover inliers re-validated on current maps
        def criteria(xy):
            raw = xy if warps is None else warps[1](xy)
            d = gather_int(depth_map, raw)
            m = gather_int(seg_map, raw)
            f = gather_int(flow_map, raw)
            corres_raw = raw + f
            corres = corres_raw if warps is None else warps[0](corres_raw)
            ok = (
                (m == 0) & (d > 0) & (d <= tr.renew_depth_gate_bg)
                & (f[..., 0] != 0) & (f[..., 1] != 0)
                & cam.in_bounds(raw, W_img, H_img)
                & cam.in_bounds(corres_raw, W_img, H_img)
            )
            return ok, d, corres - xy, corres

        c_ok, _, _, _ = criteria(cur_xy)
        carry = carry_ok & c_ok
        d_ok, _, _, _ = criteria(det_xy)
        # (2) dedupe: drop detections within 1px of a kept carryover
        dist = select.min_dist_to_set(det_xy, cur_xy, carry)
        new_ok = det_valid & d_ok & (dist >= 1.0)

        all_xy = jnp.concatenate([cur_xy, det_xy], axis=0)
        all_ok = jnp.concatenate([carry, new_ok], axis=0)
        all_pri = jnp.concatenate(
            [jnp.where(carry, 2e9, -jnp.inf), det_score], axis=0
        )
        all_assoc = jnp.concatenate(
            [jnp.arange(cur_xy.shape[0], dtype=jnp.int32),
             jnp.full((det_xy.shape[0],), -1, jnp.int32)], axis=0
        )
        idx, valid = select.masked_top_k(all_pri, all_ok, B)
        xy = select.gather_rows(all_xy, idx, valid)
        _, d, f, corres = criteria(xy)
        point_w = cam.unproject_to_world(xy, d, K, se3.inv(T_cw))
        return StaticBank(
            xy=xy, depth=jnp.where(valid, d, -1.0), flow=f, corres=corres,
            point_w=point_w,
            assoc=jnp.where(valid, jnp.take(all_assoc, idx), -1),
            valid=valid,
        )

    def renew_dynamic(cur_xy, cur_obj_label, carry_ok, cand: dict,
                      slot_sem, slot_model, slot_active,
                      depth_map, flow_map, seg_map, T_cw, key):
        """RenewFrameInfo dynamic half (Tracking.cc:2795-2930).

        carry_ok (D,): final inlier features of active objects;
        cand: this frame's fresh object-candidate bank (the mvTmp* pool);
        slot_sem/slot_model/slot_active (Kobj,): active-object tables.
        """
        H_img, W_img = depth_map.shape

        def criteria(xy):
            raw = xy if warps is None else warps[1](xy)
            d = gather_int(depth_map, raw)
            m = gather_int(seg_map, raw)
            f = gather_int(flow_map, raw)
            corres_raw = raw + f
            corres = corres_raw if warps is None else warps[0](corres_raw)
            ok = (
                (m > 0) & (d > 0) & (d < tr.renew_depth_gate_obj)
                & cam.in_bounds(raw, W_img, H_img)
                & cam.in_bounds(corres_raw, W_img, H_img)
            )
            return ok, d, m, corres - xy, corres

        c_ok, c_d, c_m, _, _ = criteria(cur_xy)
        carry = carry_ok & c_ok

        # candidate features: matched to an active object's semantic label ->
        # that object's model label; unclaimed labels -> -2 (new object)
        k_ok, k_d, k_m, _, _ = criteria(cand["xy"])
        cl_eq = cand["sem_label"][None, :] == slot_sem[:, None]  # (Kobj, Dc)
        claimed = jnp.any(cl_eq & slot_active[:, None], axis=0)
        model_of = jnp.einsum(
            "k,kn->n", slot_model.astype(jnp.float32),
            (cl_eq & slot_active[:, None]).astype(jnp.float32),
        ).astype(jnp.int32)
        cand_label = jnp.where(claimed, model_of, -2)
        dist = select.min_dist_to_set(cand["xy"], cur_xy, carry)
        cand_ok = cand["valid"] & k_ok & (dist >= 1.0)

        all_xy = jnp.concatenate([cur_xy, cand["xy"]], axis=0)
        all_ok = jnp.concatenate([carry, cand_ok], axis=0)
        all_sem = jnp.concatenate([c_m, k_m], axis=0)
        all_lab = jnp.concatenate([cur_obj_label, cand_label], axis=0)
        all_assoc = jnp.concatenate(
            [jnp.arange(cur_xy.shape[0], dtype=jnp.int32),
             jnp.full((cand["xy"].shape[0],), -1, jnp.int32)], axis=0
        )
        pri = jnp.concatenate([
            jnp.where(carry, 3.0, -jnp.inf),
            jnp.where(claimed, 2.0, 1.0)
            + 0.5 * jax.random.uniform(key, (cand["xy"].shape[0],)),
        ], axis=0)
        idx, valid = select.quota_select(
            all_sem, all_ok, pri, tr.max_track_points_obj, D
        )
        xy = select.gather_rows(all_xy, idx, valid)
        _, d, m, f, corres = criteria(xy)
        point_w = cam.unproject_to_world(xy, d, K, se3.inv(T_cw))
        return DynamicBank(
            xy=xy, depth=jnp.where(valid, d, 0.1), flow=f, corres=corres,
            point_w=point_w,
            sem_label=jnp.where(valid, m, 0).astype(jnp.int32),
            obj_label=jnp.where(valid, jnp.take(all_lab, idx), -2),
            assoc=jnp.where(valid, jnp.take(all_assoc, idx), -1),
            valid=valid,
        )

    return jax.jit(renew_static), jax.jit(renew_dynamic)


# --------------------------------------------------------------------------
# frame-0 initialization
# --------------------------------------------------------------------------

def make_init_stage(cfg: VDOConfig):
    K = _K(cfg)

    def init_banks(stat_cand, obj_cand):
        """Initialization (Tracking.cc:1215-1276): pose = I, 3D points are
        camera-frame unprojections (== world at the origin frame)."""
        sp = cam.unproject(stat_cand["xy"], stat_cand["depth"], K)
        stat = StaticBank(
            xy=stat_cand["xy"], depth=stat_cand["depth"],
            flow=stat_cand["flow"], corres=stat_cand["corres"],
            point_w=sp,
            assoc=jnp.full(stat_cand["valid"].shape, -1, jnp.int32),
            valid=stat_cand["valid"],
        )
        dp = cam.unproject(obj_cand["xy"], obj_cand["depth"], K)
        dyn = DynamicBank(
            xy=obj_cand["xy"], depth=obj_cand["depth"], flow=obj_cand["flow"],
            corres=obj_cand["corres"], point_w=dp,
            sem_label=obj_cand["sem_label"],
            obj_label=jnp.full(obj_cand["valid"].shape, -2, jnp.int32),
            assoc=jnp.full(obj_cand["valid"].shape, -1, jnp.int32),
            valid=obj_cand["valid"],
        )
        return stat, dyn

    return jax.jit(init_banks)


# --------------------------------------------------------------------------
# fully-device dynamic-object classifier (SPMD path)
# --------------------------------------------------------------------------

_LABEL_SPACE = 256  # instance-segmentation ids are assumed < 256


def make_device_classifier(cfg: VDOConfig):
    """DynObjTracking (Tracking.cc:1366-1612) entirely on device.

    The host path in tracking.py does this label bookkeeping in numpy; this
    variant keeps the whole frame step inside one jit so it can be vmapped
    over streams and sharded over a device mesh.  Association state is
    carried as fixed-size slot tables (sem label, model label, motion) plus
    a scalar max_id counter.
    """
    tr = cfg.tracking
    Kobj = cfg.shapes.max_objects
    H_img, W_img = cfg.camera.height, cfg.camera.width

    def classify(cur_sem, valid, sf_norm, depth, xy,
                 last_sem, last_slot_sem, last_slot_model, last_slot_H,
                 last_slot_active, max_id):
        lab = jnp.clip(cur_sem, 0, _LABEL_SPACE - 1)
        ok = valid & (cur_sem > 0) & (lab == cur_sem)
        labf = jnp.where(ok, lab, 0)

        def count(pred):
            return jax.ops.segment_sum(
                jnp.where(ok & pred, 1.0, 0.0), labf,
                num_segments=_LABEL_SPACE,
            )

        ones = count(jnp.ones_like(ok))
        u, v = xy[..., 0], xy[..., 1]
        sr, sc = tr.boundary_shrink_row, tr.boundary_shrink_col
        on_b = (v < sr) | (v > H_img - sr) | (u < sc) | (u > W_img - sc)
        n_boundary = count(on_b)
        n_static = count(sf_norm < tr.sf_mg_thres)
        d_sum = jax.ops.segment_sum(
            jnp.where(ok, depth, 0.0), labf, num_segments=_LABEL_SPACE
        )
        ones_safe = jnp.maximum(ones, 1.0)

        is_obj = (
            (ones >= tr.min_obj_points)
            & (n_boundary / ones_safe <= tr.boundary_frac_thres)
            & (n_static / ones_safe <= tr.sf_ds_thres)
            & (d_sum / ones_safe <= tr.th_depth_obj)
        )
        is_obj = is_obj.at[0].set(False)
        # per-label classification for features (0 static, -1 dropped)
        lab_class = jnp.where(
            is_obj, 2,
            jnp.where(n_static / ones_safe > tr.sf_ds_thres, 0, -1),
        )  # 2 = active object

        # top-K object labels by population -> slots
        score = jnp.where(is_obj, ones, -1.0)
        slot_lab = jnp.argsort(-score)[:Kobj].astype(jnp.int32)
        slot_active = score[slot_lab] > 0

        # association: majority of LAST-frame sem labels among this slot's
        # members, matched against last slot sem labels
        members = (cur_sem[None, :] == slot_lab[:, None]) & ok[None, :]  # (K,D)
        last_lab = jnp.clip(last_sem, 0, _LABEL_SPACE - 1)
        votes = jax.vmap(
            lambda m: jax.ops.segment_sum(
                jnp.where(m & (last_sem > 0), 1.0, 0.0), last_lab,
                num_segments=_LABEL_SPACE,
            )
        )(members)                                    # (K, 256)
        major = jnp.argmax(votes, axis=-1).astype(jnp.int32)
        has_major = jnp.take_along_axis(votes, major[:, None], axis=-1)[:, 0] > 0
        maj_lab = jnp.where(has_major, major, slot_lab)
        match = maj_lab[:, None] == last_slot_sem[None, :]   # (K, K_last)
        match = match & last_slot_active[None, :]
        matched = jnp.any(match, axis=-1) & slot_active
        match_idx = jnp.argmax(match, axis=-1)
        # new ids for unmatched active slots
        is_new = slot_active & ~matched
        new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        slot_model = jnp.where(
            matched, last_slot_model[match_idx],
            jnp.where(is_new, max_id + new_rank, 0),
        ).astype(jnp.int32)
        new_max_id = max_id + jnp.sum(is_new.astype(jnp.int32))
        slot_H_prev = jnp.where(
            matched[:, None, None], last_slot_H[match_idx],
            jnp.broadcast_to(jnp.eye(4), (Kobj, 4, 4)),
        )
        # feature-level obj labels: model id for members of active slots,
        # else 0 (static object) / -1 (dropped) / -1 (classifier-invalid)
        per_lab_class = lab_class[labf]
        feat_model = jnp.einsum(
            "k,kn->n", slot_model.astype(jnp.float32),
            members.astype(jnp.float32),
        ).astype(jnp.int32)
        obj_label = jnp.where(
            ~valid, -2,
            jnp.where(~ok, -1,
                      jnp.where(per_lab_class == 2,
                                jnp.where(feat_model > 0, feat_model, -1),
                                per_lab_class)),
        )
        return {
            "slot_sem": jnp.where(slot_active, slot_lab, 0),
            "slot_model": slot_model,
            "slot_active": slot_active,
            "slot_has_mm": matched,
            "slot_H_prev": slot_H_prev,
            "max_id": new_max_id,
            "obj_label": obj_label.astype(jnp.int32),
            "member_ok": obj_label > 0,
        }

    return classify
