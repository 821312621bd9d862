import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdo_slam_tpu.geometry import camera, metrics, se3


def random_pose(key, scale_t=2.0):
    k1, k2 = jax.random.split(key)
    omega = jax.random.uniform(k1, (3,), minval=-1.5, maxval=1.5)
    t = jax.random.uniform(k2, (3,), minval=-scale_t, maxval=scale_t)
    return se3.from_Rt(se3.so3_exp(omega), t)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        xi = jax.random.uniform(key, (64, 6), minval=-1.0, maxval=1.0)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-4)

    def test_exp_zero_is_identity(self):
        T = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)

    def test_exp_small_angle_stable(self):
        xi = jnp.array([1e-9, 0, 0, 1.0, 2.0, 3.0])
        T = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(T[:3, 3]), [1.0, 2.0, 3.0], atol=1e-5)
        assert not np.any(np.isnan(np.asarray(T)))

    def test_inverse_analytic(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 16)
        T = jnp.stack([random_pose(k) for k in keys])
        TT = T @ se3.inv(T)
        np.testing.assert_allclose(
            np.asarray(TT), np.broadcast_to(np.eye(4), TT.shape), atol=1e-5
        )

    def test_inverse_matches_rt_formula(self):
        # Converter::toInvMatrix: [R^T, -R^T t]
        T = random_pose(jax.random.PRNGKey(2))
        Ti = se3.inv(T)
        R, t = np.asarray(T[:3, :3]), np.asarray(T[:3, 3])
        np.testing.assert_allclose(np.asarray(Ti[:3, :3]), R.T, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Ti[:3, 3]), -R.T @ t, atol=1e-6)

    def test_apply_matches_matmul(self):
        T = random_pose(jax.random.PRNGKey(3))
        X = jax.random.normal(jax.random.PRNGKey(4), (32, 3))
        Xh = jnp.concatenate([X, jnp.ones((32, 1))], axis=-1)
        expect = (np.asarray(T) @ np.asarray(Xh).T).T[:, :3]
        np.testing.assert_allclose(np.asarray(se3.apply(T, X)), expect, atol=1e-5)

    def test_retract_left_multiplicative(self):
        T = random_pose(jax.random.PRNGKey(5))
        xi = jnp.ones(6) * 0.1
        np.testing.assert_allclose(
            np.asarray(se3.retract(T, xi)), np.asarray(se3.exp(xi) @ T), atol=1e-6
        )

    def test_so3_log_roundtrip(self):
        w = jnp.array([[0.3, -0.2, 0.9], [1e-7, 0, 0], [0, 3.0, 0]])
        R = se3.so3_exp(w)
        np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.asarray(w), atol=1e-4)

    def test_orthonormalize(self):
        T = random_pose(jax.random.PRNGKey(6))
        T_drift = T.at[:3, :3].mul(1.001)
        T_fix = se3.orthonormalize(T_drift)
        R = np.asarray(T_fix[:3, :3])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestCamera:
    K = camera.intrinsics(721.5377, 721.5377, 609.5593, 172.854)

    def test_project_unproject_roundtrip(self):
        uv = jnp.array([[100.0, 50.0], [609.5, 172.8], [1200.0, 370.0]])
        z = jnp.array([5.0, 20.0, 35.0])
        X = camera.unproject(uv, z, self.K)
        uv2 = camera.project(X, self.K)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_unproject_formula(self):
        # (u-cx) z / fx — Frame.cc:475
        X = camera.unproject(jnp.array([609.5593 + 721.5377, 172.854]), jnp.asarray(10.0), self.K)
        np.testing.assert_allclose(np.asarray(X), [10.0, 0.0, 10.0], atol=1e-4)

    def test_world_roundtrip(self):
        T_wc = random_pose(jax.random.PRNGKey(7))
        uv = jnp.array([[300.0, 200.0]])
        z = jnp.array([12.0])
        Xw = camera.unproject_to_world(uv, z, self.K, T_wc)
        uv2 = camera.project_from_world(Xw, self.K, se3.inv(T_wc))
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)


class TestMetrics:
    def test_identity_error_is_zero(self):
        T = jnp.eye(4)
        assert float(metrics.clamped_trace_angle_deg(T)) < 1e-3
        assert float(metrics.translation_norm(T)) == 0.0

    def test_known_rotation_angle(self):
        # 10-degree rotation about z
        ang = np.deg2rad(10.0)
        R = se3.so3_exp(jnp.array([0.0, 0.0, ang]))
        T = se3.from_Rt(R, jnp.zeros(3))
        np.testing.assert_allclose(float(metrics.clamped_trace_angle_deg(T)), 10.0, atol=0.01)

    def test_small_angle_no_fp32_floor(self):
        """The skew-norm extraction must resolve angles far below the
        sqrt(2*eps_f32) ~ 0.02 deg floor of the naive acos((tr-1)/2) form
        on f32-rounded matrices (DESIGN.md §8)."""
        ang = 2e-4  # rad ~ 0.0115 deg, below the trace-form floor
        R = se3.so3_exp(jnp.array([0.0, 0.0, ang]))
        T = np.asarray(se3.from_Rt(R, jnp.zeros(3)), np.float32)
        got = float(metrics.clamped_trace_angle_deg(jnp.asarray(T)))
        np.testing.assert_allclose(got, np.degrees(ang), rtol=0.02)
        # identity in f32 reads as ~0, not ~0.02 deg
        eye = jnp.eye(4, dtype=jnp.float32)
        assert float(metrics.clamped_trace_angle_deg(eye)) < 1e-5

    def test_host_report_angle_matches_device_metric(self):
        from vdo_slam_tpu.eval.results import _stable_angle_deg

        T = np.asarray(se3.from_Rt(se3.so3_exp(jnp.array([0.01, -0.02, 0.03])),
                                   jnp.array([1.0, 2.0, 3.0])))
        np.testing.assert_allclose(
            _stable_angle_deg(T.astype(np.float64)),
            float(metrics.clamped_trace_angle_deg(jnp.asarray(T))),
            rtol=1e-4,
        )

    def test_camera_rpe_zero_when_equal(self):
        T0 = random_pose(jax.random.PRNGKey(8))
        T1 = random_pose(jax.random.PRNGKey(9))
        t_err, r_err = metrics.camera_rpe(T1, T0, T1, T0)
        assert float(t_err) < 1e-4
        assert float(r_err) < 0.2  # acos precision floor in fp32

    def test_camera_rpe_detects_translation_offset(self):
        T0 = se3.identity()
        T1_gt = se3.from_Rt(jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
        T1_est = se3.from_Rt(jnp.eye(3), jnp.array([1.5, 0.0, 0.0]))
        t_err, _ = metrics.camera_rpe(T1_est, T0, T1_gt, T0)
        np.testing.assert_allclose(float(t_err), 0.5, atol=1e-5)

    def test_object_speed_pure_translation(self):
        # H translating 1m per frame at 10fps -> 36 km/h
        H = se3.from_Rt(jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
        sp = metrics.object_speed(H, jnp.array([5.0, 0.0, 20.0]))
        np.testing.assert_allclose(float(sp), 36.0, atol=1e-4)

    def test_rotating_object_speed_uses_centroid(self):
        ang = np.deg2rad(5.0)
        R = se3.so3_exp(jnp.array([0.0, ang, 0.0]))
        c = jnp.array([0.0, 0.0, 10.0])
        # H = pure rotation about the centroid => translation part t = (I-R)c
        t = (jnp.eye(3) - R) @ c
        H = se3.from_Rt(R, t)
        sp = metrics.object_speed(H, c)
        assert float(sp) < 1e-3


class TestConfig:
    def test_defaults_match_kitti_yaml(self):
        from vdo_slam_tpu.config import VDOConfig

        cfg = VDOConfig()
        assert cfg.camera.fx == pytest.approx(721.5377)
        assert cfg.tracking.window_size == 20
        assert cfg.tracking.joint_flow is True
        assert cfg.solver.rp_thres == pytest.approx(0.04)

    def test_load_reference_yaml(self, tmp_path):
        from vdo_slam_tpu.config import load_settings

        # OpenCV FileStorage format (with the %YAML:1.0 directive pyyaml rejects)
        y = tmp_path / "settings.yaml"
        y.write_text(
            "%YAML:1.0\n\nCamera.fx: 500.0\nCamera.fy: 501.0\nCamera.cx: 320.0\n"
            "Camera.cy: 240.0\nCamera.bf: 40.0\nChooseData: 2\nWINDOW_SIZE: 10\n"
            "OVERLAP_SIZE: 2\nMaxTrackPointBG: 600\nORBextractor.nFeatures: 1000\n"
        )
        cfg = load_settings(y)
        assert cfg.camera.fx == 500.0
        assert cfg.tracking.window_size == 10
        assert cfg.shapes.max_static == 600
        assert cfg.frontend.n_features == 1000
