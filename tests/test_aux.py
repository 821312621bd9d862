"""Aux subsystems: velocity eval, plots, checkpoint/resume, g2o dump, CLI."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tracked(tracked_session):
    # shared session run (conftest.py); these tests only read the map
    return (tracked_session["sysm"], tracked_session["ds"],
            tracked_session["cfg"], tracked_session["scene"])


class TestVelocity:
    def test_velocity_report(self, tracked, tmp_path):
        from vdo_slam_tpu.eval.velocity import velocity_report

        sysm, *_ = tracked
        rep = velocity_report(sysm.map, tmp_path)
        assert rep["n_estimates"] > 3
        assert rep["speed_err_kmh"] < 8.0, rep
        assert (tmp_path / "speed_estimated.txt").exists()
        assert (tmp_path / "tracking_id.txt").exists()


class TestPlots:
    def test_plot_files(self, tracked, tmp_path):
        from vdo_slam_tpu.eval.plots import plot_metric_error

        sysm, *_ = tracked
        paths = plot_metric_error(sysm.map, tmp_path)
        assert len(paths) == 2
        for p in paths:
            assert (tmp_path / p.split("/")[-1]).stat().st_size > 1000


class TestCheckpoint:
    @pytest.mark.slow
    def test_roundtrip_resume_deterministic(self, tracked, tmp_path):
        from vdo_slam_tpu.pipeline import System
        from vdo_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        # reuse the session scene/config: identical shapes -> warm compiles
        _, ds, cfg, _ = tracked

        # run A: 3 frames, checkpoint, 2 more
        a = System(cfg, enable_local_ba=False, enable_global_ba=False)
        for i in range(3):
            a.track_rgbd(ds[i])
        ck = tmp_path / "ck.pkl"
        save_checkpoint(a.tracker, ck)
        for i in range(3, 5):
            a.track_rgbd(ds[i])

        # run B: resume from checkpoint, same remaining frames
        b = System(cfg, enable_local_ba=False, enable_global_ba=False)
        load_checkpoint(b.tracker, ck)
        b.map = b.tracker.map
        assert b.tracker.frame_id == 3
        for i in range(3, 5):
            b.track_rgbd(ds[i])

        pa = np.stack(a.map.cam_pose)
        pb = np.stack(b.tracker.map.cam_pose)
        np.testing.assert_allclose(pa, pb, atol=1e-5)


class TestG2oDump:
    def test_dump_full_graph(self, tracked, tmp_path):
        from vdo_slam_tpu.backend.builders import build_full_graph
        from vdo_slam_tpu.backend.factor_graph import Variables
        from vdo_slam_tpu.backend.g2o_io import save_g2o

        sysm, _, cfg, _ = tracked
        graph, v0, meta = build_full_graph(sysm.map, cfg)
        p = tmp_path / "graph.g2o"
        save_g2o(graph, v0, p, meta.n_poses, meta.n_motions,
                 v0.points.shape[0])
        text = p.read_text()
        assert "VERTEX_SE3:QUAT" in text
        assert "VERTEX_TRACKXYZ" in text
        assert "EDGE_SE3:QUAT" in text
        assert "EDGE_SE3_TRACKXYZ" in text
        assert len(text.splitlines()) > meta.n_poses + 100


class TestCLI:
    @pytest.mark.slow
    def test_synthetic_cli(self, tmp_path, capsys):
        from vdo_slam_tpu.run import main

        rc = main([
            "--synthetic", "--frames", "4", "--quiet", "--no-global-ba",
            "--no-local-ba", "--out", str(tmp_path),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "metrics_initial" in out
        assert (tmp_path / "initial_stereo_new.txt").exists()


class TestFusedCheckpoint:
    @pytest.mark.slow
    def test_fused_roundtrip(self, tracked, tmp_path):
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.io.synthetic import make_scene
        from vdo_slam_tpu.pipeline import System
        from vdo_slam_tpu.utils.checkpoint import (
            load_fused_checkpoint, save_fused_checkpoint,
        )

        scene = make_scene(num_frames=6, width=320, height=240,
                           num_objects=1, seed=5)
        cfg = small_config(scene)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        a = System(cfg, enable_local_ba=False, enable_global_ba=False,
                   mode="fused")
        for i in range(3):
            a.track_rgbd(ds[i])
        ck = tmp_path / "f.pkl"
        save_fused_checkpoint(a.tracker, ck)
        for i in range(3, 5):
            a.track_rgbd(ds[i])

        b = System(cfg, enable_local_ba=False, enable_global_ba=False,
                   mode="fused")
        load_fused_checkpoint(b.tracker, ck)
        b.map = b.tracker.map
        for i in range(3, 5):
            b.track_rgbd(ds[i])
        np.testing.assert_allclose(
            np.stack(a.map.cam_pose), np.stack(b.tracker.map.cam_pose),
            atol=1e-5,
        )
