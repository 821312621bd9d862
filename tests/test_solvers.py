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
