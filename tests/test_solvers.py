"""Property tests for the estimation core: residual decrease, exact recovery
on clean data, robustness to outliers — the solver health checks the
reference only eyeballed via chi2 printouts (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from vdo_slam_tpu.geometry import camera, se3
from vdo_slam_tpu.solvers import FlowLMParams, flow_lm, ransac

K = camera.intrinsics(320.0, 320.0, 160.0, 120.0)


def make_problem(key, n=200, pose_scale=0.1, noise=0.0, outlier_frac=0.0,
                 motion=None):
    """Synthesize last-frame observations of world points + GT current pose."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # world points in front of the last camera
    X_c_last = jnp.stack([
        jax.random.uniform(k1, (n,), minval=-6.0, maxval=6.0),
        jax.random.uniform(k2, (n,), minval=-3.0, maxval=3.0),
        jax.random.uniform(k3, (n,), minval=5.0, maxval=30.0),
    ], axis=-1)
    T_cw_last = se3.exp(jnp.asarray([0.02, -0.01, 0.03, 0.3, -0.2, 0.1]))
    X_w = se3.apply(se3.inv(T_cw_last), X_c_last)
    if motion is not None:  # rigid object motion in world frame
        X_w_cur = se3.apply(motion, X_w)
    else:
        X_w_cur = X_w

    xi = jax.random.uniform(k4, (6,), minval=-pose_scale, maxval=pose_scale)
    T_cw_cur = se3.exp(xi) @ T_cw_last  # GT current camera
    uv_last = camera.project(X_c_last, K)
    depth_last = X_c_last[..., 2]
    uv_cur = camera.project(se3.apply(T_cw_cur, X_w_cur), K)
    flow = uv_cur - uv_last
    if noise > 0:
        flow = flow + noise * jax.random.normal(k5, flow.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        flow = flow.at[:n_out].add(
            20.0 + 30.0 * jax.random.normal(jax.random.PRNGKey(7), (n_out, 2))
        )
    valid = jnp.ones(n, bool)
    return dict(X_w=X_w, X_w_cur=X_w_cur, T_cw_last=T_cw_last,
                T_cw_cur=T_cw_cur, uv_last=uv_last, depth_last=depth_last,
                flow=flow, valid=valid, n_out=n_out)


def pose_err(T_a, T_b):
    d = se3.log(se3.inv(T_a) @ T_b)
    return float(jnp.linalg.norm(d))


class TestFlowLM:
    def test_camera_exact_recovery(self):
        pb = make_problem(jax.random.PRNGKey(0))
        p = FlowLMParams(iters=25)
        out = flow_lm.solve_camera(
            pb["T_cw_last"], pb["uv_last"], pb["depth_last"], pb["flow"],
            pb["T_cw_last"], pb["valid"], K, p,
        )
        assert pose_err(out["T"], pb["T_cw_cur"]) < 2e-3
        assert int(out["n_inlier"]) > 190

    def test_camera_with_noise_and_outliers(self):
        pb = make_problem(jax.random.PRNGKey(1), noise=0.2, outlier_frac=0.2)
        p = FlowLMParams(iters=30)
        out = flow_lm.solve_camera(
            pb["T_cw_last"], pb["uv_last"], pb["depth_last"], pb["flow"],
            pb["T_cw_last"], pb["valid"], K, p,
        )
        assert pose_err(out["T"], pb["T_cw_cur"]) < 0.02
        inl = np.asarray(out["inlier"])
        # gross outliers rejected
        assert inl[: pb["n_out"]].sum() == 0

    def test_flow_refinement_matches_true_flow(self):
        pb = make_problem(jax.random.PRNGKey(2), noise=0.3)
        p = FlowLMParams(iters=30)
        out = flow_lm.solve_camera(
            pb["T_cw_last"], pb["uv_last"], pb["depth_last"], pb["flow"],
            pb["T_cw_last"], pb["valid"], K, p,
        )
        uv_true = camera.project(
            se3.apply(pb["T_cw_cur"], pb["X_w"]), K
        )
        err_meas = np.linalg.norm(np.asarray(pb["uv_last"] + pb["flow"] - uv_true), axis=1)
        err_ref = np.linalg.norm(np.asarray(out["uv_cur"] - uv_true), axis=1)
        # refined correspondences beat raw flow on average
        assert err_ref.mean() < err_meas.mean()

    def test_object_motion_recovery(self):
        H_true = se3.exp(jnp.asarray([0.0, 0.02, 0.0, 0.4, 0.0, 0.8]))
        pb = make_problem(jax.random.PRNGKey(3), motion=H_true)
        p = FlowLMParams(info_flow=0.5, iters=30)
        G_true = pb["T_cw_cur"] @ H_true
        G_init = pb["T_cw_cur"]  # identity motion init
        out = flow_lm.solve(
            G_init, pb["uv_last"], pb["depth_last"], pb["flow"],
            pb["T_cw_last"], pb["valid"], K, p,
        )
        assert pose_err(out["T"], G_true) < 5e-3

    def test_vmapped_objects(self):
        H1 = se3.exp(jnp.asarray([0.0, 0.01, 0.0, 0.5, 0.0, 0.5]))
        H2 = se3.exp(jnp.asarray([0.0, -0.02, 0.0, -0.3, 0.0, 0.9]))
        pb1 = make_problem(jax.random.PRNGKey(4), motion=H1)
        pb2 = make_problem(jax.random.PRNGKey(4), motion=H2)
        # same geometry, two motions: object slots select disjoint halves
        n = pb1["uv_last"].shape[0]
        valid = jnp.zeros((2, n), bool)
        valid = valid.at[0, : n // 2].set(True).at[1, n // 2 :].set(True)
        flow = jnp.concatenate([pb1["flow"][: n // 2], pb2["flow"][n // 2 :]])
        p = FlowLMParams(info_flow=0.5, iters=30)
        G_init = jnp.stack([pb1["T_cw_cur"], pb1["T_cw_cur"]])
        out = flow_lm.solve_objects(
            G_init, pb1["uv_last"], pb1["depth_last"], flow,
            pb1["T_cw_last"], valid, K, p,
        )
        assert pose_err(out["T"][0], pb1["T_cw_cur"] @ H1) < 0.01
        assert pose_err(out["T"][1], pb2["T_cw_cur"] @ H2) < 0.01

    def test_too_few_points_returns_init(self):
        pb = make_problem(jax.random.PRNGKey(5), n=8)
        valid = jnp.zeros(8, bool).at[0].set(True).at[1].set(True)
        p = FlowLMParams(iters=5)
        out = flow_lm.solve(
            pb["T_cw_last"], pb["uv_last"], pb["depth_last"], pb["flow"],
            pb["T_cw_last"], valid, K, p,
        )
        assert pose_err(out["T"], pb["T_cw_last"]) < 1e-6


class TestRansac:
    def test_kabsch_exact(self):
        key = jax.random.PRNGKey(0)
        P = jax.random.normal(key, (10, 3)) * 5.0
        T_true = se3.exp(jnp.asarray([0.3, -0.2, 0.5, 1.0, 2.0, -0.5]))
        Q = se3.apply(T_true, P)
        T = ransac.kabsch(P, Q, jnp.ones(10))
        assert pose_err(T, T_true) < 1e-4

    def test_ransac_with_outliers(self):
        # corrupted flow -> wrong current pixel -> wrong 3D target AND wrong
        # scoring observation, exactly like bad optical flow in the pipeline
        pb = make_problem(jax.random.PRNGKey(6), pose_scale=0.15,
                          outlier_frac=0.3)
        uv_cur = pb["uv_last"] + pb["flow"]
        z_cur = se3.apply(pb["T_cw_cur"], pb["X_w_cur"])[..., 2]
        X_tgt = camera.unproject(uv_cur, z_cur, K)
        T, mask, n_in = ransac.ransac_rigid(
            pb["X_w"], X_tgt, uv_cur, pb["valid"], K, jax.random.PRNGKey(9),
            n_samples=256, thres=0.4,
        )
        assert int(n_in) > 120
        assert pose_err(T, pb["T_cw_cur"]) < 0.02
        assert np.asarray(mask)[: pb["n_out"]].sum() < 5

    def test_kabsch_polar_matches_svd_kabsch(self):
        # noisy, non-uniformly weighted problem: the SVD-free polar solve
        # must agree with the classic SVD Kabsch to fp32 round-off
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        P = jax.random.normal(k1, (64, 3)) * 4.0
        T_true = se3.exp(jnp.asarray([-0.4, 0.25, 0.6, 0.5, -1.5, 2.0]))
        Q = se3.apply(T_true, P) + 0.05 * jax.random.normal(k2, (64, 3))
        w = jax.random.uniform(k3, (64,), minval=0.0, maxval=1.0)
        T_svd = ransac.kabsch(P, Q, w)
        T_pol = ransac.kabsch_polar(P, Q, w, jnp.eye(4))
        assert pose_err(T_svd, T_pol) < 1e-4
        assert pose_err(T_pol, T_true) < 0.05

    def test_kabsch_polar_degenerate_falls_back(self):
        P = jnp.zeros((16, 3))
        Q = jnp.zeros((16, 3))
        T_fb = se3.exp(jnp.asarray([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]))
        # all-zero weights and collinear/degenerate points -> fallback
        T = ransac.kabsch_polar(P, Q, jnp.zeros(16), T_fb)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_fb))
        # 2 inliers only (under the 3-point minimum) -> fallback
        w2 = jnp.zeros(16).at[0].set(1.0).at[1].set(1.0)
        P2 = jnp.asarray(np.random.RandomState(0).randn(16, 3), jnp.float32)
        T = ransac.kabsch_polar(P2, P2, w2, T_fb)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_fb))

    def test_refit_init_beats_triangle_hypothesis(self):
        # refine_with_inliers (all-inlier polish) must land closer to the
        # true pose than the raw 3-point RANSAC winner on noisy 3D targets
        pb = make_problem(jax.random.PRNGKey(12), pose_scale=0.15, noise=0.4)
        uv_cur = pb["uv_last"] + pb["flow"]
        z_cur = se3.apply(pb["T_cw_cur"], pb["X_w_cur"])[..., 2]
        X_tgt = camera.unproject(uv_cur, z_cur, K)
        T_r, mask, _ = ransac.ransac_rigid(
            pb["X_w"], X_tgt, uv_cur, pb["valid"], K, jax.random.PRNGKey(4),
            n_samples=256, thres=2.0,
        )
        T_ref = ransac.refine_with_inliers(T_r, pb["X_w"], X_tgt, mask)
        assert pose_err(T_ref, pb["T_cw_cur"]) < pose_err(T_r, pb["T_cw_cur"])

    def test_choose_init_prefers_motion_model_when_better(self):
        pb = make_problem(jax.random.PRNGKey(10))
        uv_cur = pb["uv_last"] + pb["flow"]
        T_bad = se3.exp(jnp.ones(6) * 0.3) @ pb["T_cw_cur"]
        T, mask, n, used_mm = ransac.choose_init(
            T_bad, jnp.zeros_like(pb["valid"]), jnp.asarray(0),
            pb["T_cw_cur"], pb["X_w"], uv_cur, pb["valid"], K,
        )
        assert bool(used_mm)
        assert int(n) > 150


class TestReprojLM:
    """Non-joint (bJoint=false) solver path — PoseOptimizationNew/ObjMot."""

    def test_camera_recovery(self):
        from vdo_slam_tpu.solvers import reproj_lm

        pb = make_problem(jax.random.PRNGKey(20))
        uv_obs = pb["uv_last"] + pb["flow"]
        p = reproj_lm.ReprojLMParams(iters=25)
        out = reproj_lm.solve_camera(
            pb["T_cw_last"], uv_obs, pb["uv_last"], pb["depth_last"],
            pb["T_cw_last"], pb["valid"], K, p,
        )
        assert pose_err(out["T"], pb["T_cw_cur"]) < 2e-3
        assert int(out["n_inlier"]) > 190

    def test_camera_outlier_rejection(self):
        from vdo_slam_tpu.solvers import reproj_lm

        pb = make_problem(jax.random.PRNGKey(21), outlier_frac=0.2)
        uv_obs = pb["uv_last"] + pb["flow"]
        p = reproj_lm.ReprojLMParams(iters=30)
        out = reproj_lm.solve_camera(
            pb["T_cw_last"], uv_obs, pb["uv_last"], pb["depth_last"],
            pb["T_cw_last"], pb["valid"], K, p,
        )
        assert pose_err(out["T"], pb["T_cw_cur"]) < 0.01
        assert np.asarray(out["inlier"])[: pb["n_out"]].sum() == 0

    def test_object_motion_vmapped(self):
        from vdo_slam_tpu.geometry import se3 as s3
        from vdo_slam_tpu.solvers import reproj_lm

        H = s3.exp(jnp.asarray([0.0, 0.02, 0.0, 0.5, 0.0, 0.7]))
        pb = make_problem(jax.random.PRNGKey(22), motion=H)
        uv_obs = pb["uv_last"] + pb["flow"]
        G_true = pb["T_cw_cur"] @ H
        p = reproj_lm.ReprojLMParams(iters=30, robust=False)
        out = reproj_lm.solve_objects(
            pb["T_cw_cur"][None], uv_obs, pb["uv_last"], pb["depth_last"],
            pb["T_cw_last"], pb["valid"][None], K, p,
        )
        assert pose_err(out["T"][0], G_true) < 5e-3

    def test_depth_noise_injection_degrades_gracefully(self):
        from vdo_slam_tpu.solvers import reproj_lm

        pb = make_problem(jax.random.PRNGKey(23))
        uv_obs = pb["uv_last"] + pb["flow"]
        p = reproj_lm.ReprojLMParams(iters=25)
        out = reproj_lm.solve_pose(
            pb["T_cw_last"], uv_obs, pb["uv_last"], pb["depth_last"],
            pb["T_cw_last"], pb["valid"], K, p,
            noise_key=jax.random.PRNGKey(0),
            noise_scale=0.15 / (725.0 * 0.5),
        )
        # noisy anchors -> worse than clean but still in the ballpark
        assert pose_err(out["T"], pb["T_cw_cur"]) < 0.05


class TestObjectsStageCompaction:
    """make_objects_stage with per-slot member compaction
    (ShapeConfig.obj_solver_cap) must match the full-D solve exactly —
    renewal's per-label quota bounds slot membership, so the gather is
    lossless (see the measured equivalence in config.py)."""

    def _cfg(self, cap):
        import dataclasses

        from vdo_slam_tpu.config import VDOConfig, ShapeConfig

        cfg = VDOConfig()
        return cfg.replace(
            camera=dataclasses.replace(cfg.camera, fx=320.0, fy=320.0,
                                       cx=160.0, cy=120.0, width=320,
                                       height=240),
            shapes=ShapeConfig(max_static=256, max_dynamic=512,
                               max_objects=4, ransac_samples=64,
                               obj_solver_cap=cap),
        )

    def _inputs(self, cfg):
        from vdo_slam_tpu.pipeline.state import DynamicBank

        key = jax.random.PRNGKey(5)
        D = cfg.shapes.max_dynamic
        Kobj = cfg.shapes.max_objects
        n_per, labels = 120, (1, 2, 3)
        T_cw_last = jnp.eye(4)
        T_cw_cur = se3.exp(jnp.asarray([0.01, -0.02, 0.01, 0.1, 0.05, -0.1]))
        xs, deps, flows, sems = [], [], [], []
        for li, lab in enumerate(labels):
            k1, k2, k3, key = jax.random.split(jax.random.fold_in(key, lab), 4)
            X = jnp.stack([
                jax.random.uniform(k1, (n_per,), minval=-4.0 + 2 * li,
                                   maxval=-1.0 + 2 * li),
                jax.random.uniform(k2, (n_per,), minval=-2.0, maxval=2.0),
                jax.random.uniform(k3, (n_per,), minval=6.0, maxval=14.0),
            ], axis=-1)
            H = se3.exp(jnp.asarray([0.02 * li, 0.01, -0.01,
                                     0.3 + 0.2 * li, 0.1, -0.05]))
            uv_l = camera.project(X, K)
            X_cur = se3.apply(T_cw_cur, se3.apply(H, X))
            uv_c = camera.project(X_cur, K)
            xs.append((uv_l, uv_c, X[:, 2], X_cur[:, 2]))
            sems.append(jnp.full((n_per,), lab, jnp.int32))
        uv_l = jnp.concatenate([a[0] for a in xs])
        uv_c = jnp.concatenate([a[1] for a in xs])
        dep_l = jnp.concatenate([a[2] for a in xs])
        dep_c = jnp.concatenate([a[3] for a in xs])
        sem = jnp.concatenate(sems)
        n = uv_l.shape[0]
        pad = D - n
        bank = DynamicBank.empty(D)
        bank = bank.replace(
            xy=jnp.concatenate([uv_l, jnp.zeros((pad, 2))]),
            depth=jnp.concatenate([dep_l, jnp.full((pad,), -1.0)]),
            flow=jnp.concatenate([uv_c - uv_l, jnp.zeros((pad, 2))]),
            sem_label=jnp.concatenate([sem, jnp.zeros((pad,), jnp.int32)]),
            valid=jnp.concatenate([jnp.ones((n,), bool),
                                   jnp.zeros((pad,), bool)]),
        )
        cur_xy = jnp.concatenate([uv_c, jnp.zeros((pad, 2))])
        cur_depth = jnp.concatenate([dep_c, jnp.full((pad,), -1.0)])
        cur_sem = bank.sem_label
        slot_sem = jnp.asarray(list(labels) + [0] * (Kobj - 3), jnp.int32)
        slot_active = jnp.asarray([True] * 3 + [False] * (Kobj - 3))
        return dict(
            dyn_last=bank, cur_xy=cur_xy, cur_depth=cur_depth,
            cur_sem=cur_sem, slot_sem=slot_sem, slot_active=slot_active,
            slot_has_mm=jnp.zeros((Kobj,), bool),
            slot_H_prev=jnp.broadcast_to(jnp.eye(4), (Kobj, 4, 4)),
            member_ok=bank.valid, T_cw_last=T_cw_last, T_cw_cur=T_cw_cur,
            key=jax.random.PRNGKey(11),
        )

    def test_compact_matches_full(self):
        from vdo_slam_tpu.pipeline import stages

        outs = {}
        for name, cap in (("compact", 128), ("full", 10 ** 9)):
            cfg = self._cfg(cap)
            fn = stages.make_objects_stage(cfg)
            inp = self._inputs(cfg)
            outs[name] = jax.device_get(fn(
                inp["dyn_last"], inp["cur_xy"], inp["cur_depth"],
                inp["cur_sem"], inp["slot_sem"], inp["slot_active"],
                inp["slot_has_mm"], inp["slot_H_prev"], inp["member_ok"],
                inp["T_cw_last"], inp["T_cw_cur"], inp["key"],
            ))
        a, b = outs["compact"], outs["full"]
        np.testing.assert_array_equal(a["n_init"], b["n_init"])
        np.testing.assert_array_equal(a["inlier"], b["inlier"])
        np.testing.assert_array_equal(a["init_inlier"], b["init_inlier"])
        np.testing.assert_allclose(a["H"], b["H"], atol=1e-4)
        np.testing.assert_allclose(a["uv_cur"], b["uv_cur"], atol=1e-3)
        np.testing.assert_allclose(a["speed"], b["speed"], atol=1e-3)
        # and the solves actually recovered the injected motions
        for li in range(3):
            H_true = se3.exp(jnp.asarray([0.02 * li, 0.01, -0.01,
                                          0.3 + 0.2 * li, 0.1, -0.05]))
            assert pose_err(jnp.asarray(a["H"][li]), H_true) < 5e-3
