"""End-to-end pipeline tests on the synthetic oracle scene.

The reference's de-facto test was eyeballing ATE/RPE on a downloaded KITTI
demo (SURVEY.md §4); here the scene is generated with exact GT, so the
asserts are tight and hermetic.
"""

import numpy as np
import pytest

from vdo_slam_tpu.config import KITTI, VDOConfig, ShapeConfig, TrackingConfig
from vdo_slam_tpu.io.dataset import SyntheticDataset
from vdo_slam_tpu.io.synthetic import make_scene


def small_config(scene, **tracking_overrides):
    import dataclasses

    cam = scene.K_mat
    cfg = VDOConfig()
    cfg = cfg.replace(
        camera=dataclasses.replace(
            cfg.camera,
            fx=float(cam[0, 0]), fy=float(cam[1, 1]),
            cx=float(cam[0, 2]), cy=float(cam[1, 2]),
            width=scene.rgb.shape[2], height=scene.rgb.shape[1],
            bf=40.0,
        ),
        tracking=dataclasses.replace(
            TrackingConfig(),
            **{
                **dict(
                    dataset=KITTI,
                    depth_map_factor=1.0,
                    # small test images: scale the boundary shrink down
                    boundary_shrink_row=8, boundary_shrink_col=12,
                    min_obj_points=40, min_init_inliers=20,
                ),
                **tracking_overrides,
            },
        ),
        shapes=ShapeConfig(max_static=600, max_dynamic=2048, max_objects=8,
                           ransac_samples=128),
        frontend=dataclasses.replace(cfg.frontend, n_features=1200, n_levels=3),
    )
    return cfg


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_frames=8, width=320, height=240, num_objects=2,
                      seed=3)


@pytest.fixture(scope="module")
def ran_system(tracked_session):
    # the session-wide tracked sequence (conftest.py) — shared with the
    # backend/aux modules so the 50-90 s pipeline run happens once per session
    return (tracked_session["sysm"], tracked_session["reports"],
            tracked_session["scene"])


class TestEgoMotion:
    def test_camera_rpe_small(self, ran_system):
        sysm, reports, scene = ran_system
        rpes = [r["t_rpe"] for r in reports if "t_rpe" in r]
        assert len(rpes) >= 6
        # camera moves 0.25m/frame; avg translation error well under 10%
        assert np.mean(rpes) < 0.03, rpes
        r_rpes = [r["r_rpe"] for r in reports if "r_rpe" in r]
        assert np.mean(r_rpes) < 0.5, r_rpes

    def test_metric_report(self, ran_system):
        sysm, _, _ = ran_system
        rep = sysm.metrics()
        assert rep["cam_t_rpe"] < 0.03
        assert rep["cam_r_rpe_deg"] < 0.5

    def test_trajectory_tracks_gt(self, ran_system):
        sysm, _, scene = ran_system
        est = np.stack(sysm.map.cam_pose)      # camera->world
        gt = scene.T_wc_gt[: est.shape[0]]
        # absolute position drift small relative to 2m total path
        drift = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
        assert drift[-1] < 0.15, drift


class TestObjects:
    def test_objects_detected_and_moving(self, ran_system):
        sysm, reports, _ = ran_system
        ok_frames = [
            r for r in reports[2:]
            if any(o["status"] for o in r.get("objects", []))
        ]
        assert len(ok_frames) >= 3, "objects should be tracked in most frames"

    def test_object_motion_error(self, ran_system):
        sysm, _, _ = ran_system
        rep = sysm.metrics()
        if rep["n_obj_estimates"] == 0:
            pytest.skip("no object estimates")
        assert rep["obj_t_rpe"] < 0.15, rep
        assert rep["obj_r_rpe_deg"] < 3.0, rep

    def test_object_speed_reasonable(self, ran_system):
        sysm, reports, scene = ran_system
        speeds = [
            o["speed"]
            for r in reports for o in r.get("objects", []) if o["status"]
        ]
        gts = [
            o["speed_gt"]
            for r in reports for o in r.get("objects", []) if o["status"]
        ]
        if not speeds:
            pytest.skip("no tracked objects")
        err = np.abs(np.asarray(speeds) - np.asarray(gts))
        assert np.median(err) < 5.0, (speeds, gts)


class TestArtifacts:
    def test_save_results_files(self, ran_system, tmp_path):
        sysm, _, _ = ran_system
        sysm.save_results(tmp_path)
        for f in [
            "initial_stereo_new.txt", "refined_stereo_new.txt",
            "cam_pose_gt_stereo.txt", "obj_mot_stereo_new.txt",
            "obj_mot_gt.txt", "obj_centre.txt",
        ]:
            assert (tmp_path / f).exists(), f
        lines = (tmp_path / "initial_stereo_new.txt").read_text().splitlines()
        assert len(lines) == sysm.map.num_frames
        assert len(lines[0].split()) == 17  # id + 4x4 flattened
        # per-object tracking counts (GetObjTrackTime, Tracking.cc:2423-2495)
        ott = (tmp_path / "obj_track_time.txt").read_text().splitlines()
        assert ott[0].startswith("#")
        assert all(len(r.split()) == 4 for r in ott[1:])

    def test_save_results_writes_g2o_after_full_ba(self, tracked_session,
                                                   tmp_path):
        """The optimized full graph must land in the results dir as
        dynamic_slam_graph_after_opt.g2o (Optimizer.cc:1935-1936)."""
        import copy

        from vdo_slam_tpu.backend.full_ba import full_ba_inplace
        from vdo_slam_tpu.eval.results import save_results

        m = copy.deepcopy(tracked_session["sysm"].map)
        full_ba_inplace(m, tracked_session["cfg"], iters=3)
        save_results(m, tmp_path)
        g2o = tmp_path / "dynamic_slam_graph_after_opt.g2o"
        assert g2o.exists()
        text = g2o.read_text()
        assert "VERTEX_SE3:QUAT" in text and "EDGE_SE3_TRACKXYZ" in text

    def test_timing_summary(self, ran_system):
        sysm, _, _ = ran_system
        t = sysm.timing()
        assert t["camera_est_ms"] > 0

    def test_tracklets_exist(self, ran_system):
        from vdo_slam_tpu.pipeline.map_state import build_tracklets

        sysm, _, _ = ran_system
        tracks, _ = build_tracklets(sysm.map.stat_assoc, sysm.map.stat_valid)
        lens = [len(t) for t in tracks]
        assert len(tracks) > 100
        assert max(lens) >= 4  # some features survive several frames


class TestNonJointMode:
    @pytest.mark.slow
    def test_pipeline_with_joint_flow_disabled(self, scene):
        """The reference's bJoint=false path end-to-end."""
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.pipeline import System

        cfg = small_config(scene, joint_flow=False)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        reports = sysm.run_sequence(ds, max_frames=5)
        rpes = [r["t_rpe"] for r in reports if "t_rpe" in r]
        assert np.mean(rpes) < 0.05, rpes


class TestOMDMode:
    def test_omd_dataset_pipeline(self, scene):
        """OMD path: ChooseData=1, grid-sampled background features, OX
        object-pose parsing, no boundary shrink (Tracking.cc:1404 KITTI-only)."""
        import dataclasses

        from vdo_slam_tpu.config import OMD
        from vdo_slam_tpu.io.dataset import SyntheticOMDDataset
        from vdo_slam_tpu.pipeline import System

        cfg = small_config(scene, dataset=OMD, sf_mg_thres=0.05,
                           sf_ds_thres=0.99)
        cfg = cfg.replace(
            frontend=dataclasses.replace(cfg.frontend, use_sample_feature=True,
                                         n_sample_points=1500),
        )
        ds = SyntheticOMDDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        reports = sysm.run_sequence(ds, max_frames=5)
        rpes = [r["t_rpe"] for r in reports if "t_rpe" in r]
        assert np.mean(rpes) < 0.05, rpes
        rep = sysm.metrics()
        # object GT parsed through the OX path gives sane body-frame errors
        if rep["n_obj_estimates"]:
            assert rep["obj_t_rpe"] < 0.2, rep


class TestRobustness:
    def test_mask_dropout_recovered_by_propagation(self, scene):
        """Drop an object's instance mask in two frames; UpdateMask's flow
        scatter must keep the object tracked (Tracking.cc:3049-3066)."""
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.pipeline import System

        class DropoutDS(SyntheticDataset):
            def __getitem__(self, i):
                fd = super().__getitem__(i)
                if i in (3, 4):  # segmenter failure for object 1
                    fd.mask = np.where(fd.mask == 1, 0, fd.mask)
                return fd

        cfg = small_config(scene)
        ds = DropoutDS(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        reports = sysm.run_sequence(ds)
        # object 1 still produces successful estimates at/after the dropout
        ok = [
            any(o["status"] and o["sem_label"] == 1 for o in r.get("objects", []))
            for r in reports
        ]
        assert any(ok[3:6]), ok

    @pytest.mark.slow
    def test_depth_noise_pipeline(self, scene):
        """Reference-style synthetic depth-noise injection on the non-joint
        path (Frame.cc:489-493) — pipeline stays functional."""
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.pipeline import System

        cfg = small_config(scene, joint_flow=False, depth_noise=True)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        reports = sysm.run_sequence(ds, max_frames=4)
        rpes = [r["t_rpe"] for r in reports if "t_rpe" in r]
        assert np.mean(rpes) < 0.2, rpes


class TestDistortedCamera:
    """Keypoint undistortion wired into the live pipeline (Frame.cc:233-257,
    381-410): a scene rendered through a strongly distorted lens must track
    as well as the pinhole scene when the coefficients are configured."""

    DIST = (-0.28, 0.07, 0.0, 0.0, 0.0)  # KITTI-raw-like barrel distortion

    @pytest.fixture(scope="class")
    def dscene(self):
        return make_scene(num_frames=8, width=320, height=240, num_objects=2,
                          seed=3, dist=self.DIST)

    def _run(self, dscene, configured: bool):
        import dataclasses

        from vdo_slam_tpu.pipeline import System

        cfg = small_config(dscene)
        if configured:
            cfg = cfg.replace(camera=dataclasses.replace(
                cfg.camera, k1=self.DIST[0], k2=self.DIST[1]))
        ds = SyntheticDataset(dscene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        sysm.run_sequence(ds)
        return sysm.metrics()

    @pytest.fixture(scope="class")
    def rep_configured(self, dscene):
        return self._run(dscene, configured=True)

    @pytest.fixture(scope="class")
    def rep_unconfigured(self, dscene):
        return self._run(dscene, configured=False)

    @pytest.mark.slow
    def test_distorted_scene_tracks_like_pinhole(self, rep_configured):
        # same bounds the pinhole-scene TestEgoMotion asserts
        assert rep_configured["cam_t_rpe"] < 0.03, rep_configured
        assert rep_configured["cam_r_rpe_deg"] < 0.5, rep_configured

    @pytest.mark.slow
    def test_undistortion_beats_unconfigured_control(
            self, rep_configured, rep_unconfigured):
        """Control: the same distorted scene with zero configured coeffs
        tracks measurably worse — the warp path does real work."""
        assert rep_configured["cam_t_rpe"] < 0.4 * rep_unconfigured["cam_t_rpe"], (
            rep_configured, rep_unconfigured)


class TestOnDiskSequence:
    """End-to-end over a REAL on-disk reference-layout sequence: synthetic
    scene -> write_reference_sequence -> SequenceDataset -> System, asserting
    the png/flo/semantic/pose parsers feed the live pipeline correctly
    (vs. example/vdo_slam.cc:150-450).  Shares the tracked_session scene so
    the fused step's executable is already compiled."""

    DMF = 512.0  # raw uint16 depth = DMF*bf/z in [~400, 4100] for z in [5,50]

    @pytest.fixture(scope="class")
    def disk_run(self, tracked_session, tmp_path_factory):
        from vdo_slam_tpu.io.dataset import SequenceDataset
        from vdo_slam_tpu.io.sequence_writer import write_reference_sequence

        from vdo_slam_tpu.pipeline import System

        scene = tracked_session["scene"]
        root = tmp_path_factory.mktemp("ref_seq")
        write_reference_sequence(scene, root, depth_map_factor=self.DMF,
                                 bf=40.0)
        ds = SequenceDataset(root)
        cfg = small_config(scene, depth_map_factor=self.DMF)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        sysm.run_sequence(ds)
        return sysm, ds, root

    def test_disk_pipeline_matches_in_memory(self, disk_run, tracked_session):
        sysm, _, _ = disk_run
        rep = sysm.metrics()
        ref = tracked_session["sysm"].metrics()
        # 8-bit image + uint16 depth quantization: same accuracy class
        assert rep["cam_t_rpe"] < max(2.5 * ref["cam_t_rpe"], 0.03), (rep, ref)
        assert rep["cam_r_rpe_deg"] < max(2.5 * ref["cam_r_rpe_deg"], 0.5)
        assert rep["n_obj_estimates"] >= ref["n_obj_estimates"] // 2

    def test_native_reader_agrees_with_python_reader(self, disk_run):
        from vdo_slam_tpu.io.dataset import SequenceDataset
        from vdo_slam_tpu.io.native_loader import (NativeSequenceDataset,
                                                   build_native_loader)

        _, ds, root = disk_run
        if build_native_loader() is None:
            pytest.skip("native toolchain unavailable")
        nat = NativeSequenceDataset(root)
        fd_py, fd_nat = ds[1], nat[1]
        np.testing.assert_allclose(fd_nat.rgb, fd_py.rgb, atol=1e-5)
        np.testing.assert_allclose(fd_nat.depth_raw, fd_py.depth_raw, atol=0)
        np.testing.assert_allclose(fd_nat.flow, fd_py.flow, atol=0)
        np.testing.assert_array_equal(fd_nat.mask, fd_py.mask)


class TestMidSequenceStart:
    @pytest.mark.slow  # second full pipeline run (~1-2 min CPU)
    def test_offset_start_accuracy_matches_origin_start(self, scene,
                                                        tracked_session):
        """Starting mid-sequence (GT origin != I) must track as accurately
        as starting at frame 0: the first frame's rebased GT pose is I by
        construction, matching the pose-chain init (regression: the old
        _gt_pose returned inv(raw0) for the first frame, which poisoned the
        first RPE pair for every offset stream)."""
        from vdo_slam_tpu.pipeline import System

        cfg = small_config(scene)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)

        class _View:
            def __init__(self, base, start):
                self.base, self.start = base, start

            def __len__(self):
                return len(self.base) - self.start

            def __getitem__(self, i):
                return self.base[self.start + i]

        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                      mode="fused")
        sysm.run_sequence(_View(ds, 3))
        rep = sysm.metrics()
        ref = tracked_session["sysm"].metrics()
        assert rep["cam_t_rpe"] < max(3.0 * ref["cam_t_rpe"], 0.005), (rep,
                                                                       ref)
        assert rep["cam_r_rpe_deg"] < max(3.0 * ref["cam_r_rpe_deg"], 0.01)
        assert rep["obj_t_rpe"] < 0.02, rep


class TestHalfResFlowWire:
    @pytest.mark.slow  # extra full fused pipeline run (~1-2 min CPU)
    def test_flow_half_tracks_at_parity(self, scene, tracked_session):
        """The 5 B/px wire (half-res fp16 flow, io/packing.py) must track
        the small scene at parity with the host-orchestrated reference run:
        flow is consumed at sparse gathers and the mask warp, and the
        bilinear reconstruction error of a smooth flow field stays below
        the fp16 wire noise away from motion boundaries."""
        from vdo_slam_tpu.pipeline import System

        cfg = small_config(scene, wire_flow_half=True, fused_chunk=2)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                      mode="fused")
        sysm.run_sequence(ds)
        rep = sysm.metrics()
        ref = tracked_session["sysm"].metrics()
        assert rep["cam_t_rpe"] < max(1.5 * ref["cam_t_rpe"], 0.003), (rep,
                                                                       ref)
        assert rep["cam_r_rpe_deg"] < max(1.5 * ref["cam_r_rpe_deg"], 0.008)
        assert rep["obj_t_rpe"] < max(1.5 * ref["obj_t_rpe"], 0.01), (rep,
                                                                      ref)
        assert rep["obj_r_rpe_deg"] < max(2.0 * ref["obj_r_rpe_deg"], 0.1), (
            rep, ref)
        assert rep["n_obj_estimates"] >= 0.8 * ref["n_obj_estimates"]
