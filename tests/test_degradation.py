"""Robustness under degraded inputs — the noise regime the reference's
thresholds were tuned for (learned flow + Mask R-CNN masks, README.md:97-118;
scene-flow gates Tracking.cc:1366-1612, depth gates 2691/2849).

The clean synthetic oracle validates correctness; this module validates
GRACEFUL DEGRADATION: no crash, bounded error growth, logged truncation when
capacities overflow.
"""

import copy
import dataclasses

import numpy as np
import pytest

from tests.test_pipeline_e2e import small_config
from vdo_slam_tpu.io.dataset import SyntheticDataset
from vdo_slam_tpu.io.synthetic import degrade_scene, make_scene
from vdo_slam_tpu.pipeline import System


@pytest.fixture(scope="module")
def clean_scene():
    return make_scene(num_frames=10, width=320, height=240, num_objects=2,
                      seed=3)


def _run(scene, cfg_scene=None, **sys_kw):
    cfg = small_config(cfg_scene if cfg_scene is not None else scene)
    ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
    sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                  mode="fused", **sys_kw)
    reports = sysm.run_sequence(ds)
    return sysm, reports


class TestDegradedInputs:
    def test_flow_noise_and_outliers(self, clean_scene):
        """sigma=0.75 px flow noise + 1% gross outliers: the robust solvers
        must keep camera RPE bounded and still produce object estimates."""
        hard = degrade_scene(clean_scene, flow_noise_px=0.75,
                             flow_outlier_frac=0.01, seed=1)
        sysm, _ = _run(hard, cfg_scene=clean_scene)
        rep = sysm.metrics()
        assert np.isfinite(rep["cam_t_rpe"])
        assert rep["cam_t_rpe"] < 0.08, rep
        assert rep["cam_r_rpe_deg"] < 0.3, rep
        assert rep["n_obj_estimates"] >= 3, rep

    def test_mask_erosion_jitter_and_flow_noise(self, clean_scene):
        """The full Mask-R-CNN-like corruption stack (erode 1 px, jitter
        ±1 px, flow noise + outliers) at once."""
        hard = degrade_scene(clean_scene, flow_noise_px=0.75,
                             flow_outlier_frac=0.01, mask_erode_px=1,
                             mask_jitter_px=1, seed=1)
        sysm, reports = _run(hard, cfg_scene=clean_scene)
        rep = sysm.metrics()
        assert np.isfinite(rep["cam_t_rpe"])
        assert rep["cam_t_rpe"] < 0.08, rep
        assert rep["cam_r_rpe_deg"] < 0.3, rep
        assert rep["n_obj_estimates"] >= 3, rep
        assert sysm.map.num_frames == len(reports)

    def test_label_merge(self, clean_scene):
        """Instance-segmentation merge failure (two objects share a label):
        must not crash; camera unaffected."""
        hard = degrade_scene(clean_scene, merge_labels={2: 1}, seed=1)
        sysm, _ = _run(hard, cfg_scene=clean_scene)
        rep = sysm.metrics()
        assert rep["cam_t_rpe"] < 0.01, rep

    def test_depth_noise(self, clean_scene):
        """The reference's own stereo-depth noise model (sigma ~ z^2,
        Frame.cc:489-493) applied to the input depth map."""
        hard = degrade_scene(clean_scene, depth_noise_scale=2e-4, seed=1)
        sysm, _ = _run(hard, cfg_scene=clean_scene)
        rep = sysm.metrics()
        assert rep["cam_t_rpe"] < 0.05, rep
        assert rep["n_obj_estimates"] >= 3, rep


class TestMaskDropRecovery:
    """Total instance-mask dropout — the exact failure UpdateMask exists for
    (Tracking.cc:3049-3066): the segmenter loses an object for 1-2 frames;
    the mask-propagation repair must re-synthesize it from the last frame's
    mask warped by flow so the track SURVIVES with the same id.  Runs on the
    fused/production path (stages.make_mask_prop fused into the device step,
    parallel/multistream.py)."""

    DROP_FRAMES = (4, 5)
    DROP_LABEL = 1

    def _dropped_scene(self, clean_scene):
        mask = clean_scene.mask.copy()
        for f in self.DROP_FRAMES:
            mask[f] = np.where(mask[f] == self.DROP_LABEL, 0, mask[f])
        return dataclasses.replace(clean_scene, mask=mask)

    def _sem_tracks(self, sysm):
        """frame -> {sem_label: model_label} from the archive."""
        out = {}
        for f in range(len(sysm.map.sem_label)):
            sems = sysm.map.sem_label[f]
            labs = sysm.map.rm_label[f]
            out[f + 1] = {int(s): int(l) for s, l in zip(sems[1:], labs[1:])}
        return out

    def test_track_survives_mask_drop(self, clean_scene):
        scene = self._dropped_scene(clean_scene)
        sysm, _ = _run(scene, cfg_scene=clean_scene)
        tracks = self._sem_tracks(sysm)
        # the object is estimated THROUGH the dropped frames...
        ids = {f: tracks[f].get(self.DROP_LABEL) for f in (3, 4, 5, 6)}
        assert all(i is not None for i in ids.values()), tracks
        # ...with the SAME persistent model id (no re-seed as a new object)
        assert len(set(ids.values())) == 1, ids
        # and accuracy on the repaired frames stays in the clean regime
        rep = sysm.metrics()
        assert rep["obj_t_rpe"] < 0.15, rep

    def test_without_repair_the_track_dies(self, clean_scene):
        """Control: with fused_mask_prop off, the dropped mask loses the
        object on those frames — proves the test exercises the repair."""
        scene = self._dropped_scene(clean_scene)
        cfg = small_config(clean_scene, fused_mask_prop=False)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                      mode="fused")
        sysm.run_sequence(ds)
        tracks = self._sem_tracks(sysm)
        assert any(tracks[f].get(self.DROP_LABEL) is None
                   for f in self.DROP_FRAMES), tracks

    def test_host_path_parity(self, clean_scene):
        """The host Tracker (reference-bookkeeping path) recovers the same
        way — host-vs-fused behavioral parity under mask dropout."""
        scene = self._dropped_scene(clean_scene)
        cfg = small_config(clean_scene)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                      mode="reference")
        sysm.run_sequence(ds)
        tracks = self._sem_tracks(sysm)
        ids = {f: tracks[f].get(self.DROP_LABEL) for f in (3, 4, 5, 6)}
        assert all(i is not None for i in ids.values()), tracks
        assert len(set(ids.values())) == 1, ids


class TestCrowdedScene:
    def test_ten_objects_with_occlusion_crossings(self):
        """10 objects (over the max_objects=8 slot budget) with lateral
        crossings that occlude each other: slots saturate gracefully, far
        objects are depth-gated like the reference (Tracking.cc:2849), no
        crash, camera unaffected."""
        scene = make_scene(num_frames=10, width=320, height=240,
                           num_objects=10, obj_spacing=2.5,
                           obj_cross_frac=0.5, seed=7)
        # the render must actually contain a crowded frame
        vis = max(len(np.unique(scene.mask[f])) - 1 for f in range(10))
        assert vis >= 8, vis
        sysm, reports = _run(scene)
        rep = sysm.metrics()
        assert rep["cam_t_rpe"] < 0.01, rep
        assert rep["n_obj_estimates"] >= 5, rep
        K = sysm.cfg.shapes.max_objects
        assert all(r.get("n_objects", 0) <= K for r in reports)


class TestCapacityOverflow:
    def test_window_ba_truncation_is_logged_not_fatal(self, tracked_session,
                                                      monkeypatch, capsys):
        """Tracklet counts over P_CAP/E_CAP must truncate (keep the longest
        tracks), log it, and still solve (builders.py:173-183)."""
        import vdo_slam_tpu.backend.builders as builders
        from vdo_slam_tpu.backend.window_ba import local_ba_inplace

        monkeypatch.setattr(builders, "P_CAP", 32)
        monkeypatch.setattr(builders, "E_CAP", 128)
        m = copy.deepcopy(tracked_session["sysm"].map)
        info = local_ba_inplace(m, tracked_session["cfg"], window=6, iters=5)
        err = capsys.readouterr().err
        assert "capacity truncation" in err
        assert info["cost"] <= info["cost0"]
        assert np.isfinite(info["cost"])

    def test_full_ba_cap_overflow_falls_back_to_buckets(self,
                                                        tracked_session,
                                                        capsys):
        """full_* caps smaller than the graph must fall back to
        bucket-rounded shapes with a logged message and still refine
        (builders.py:_apply_cap)."""
        from vdo_slam_tpu.backend.full_ba import full_ba_inplace

        cfg = tracked_session["cfg"]
        cfg = cfg.replace(backend=dataclasses.replace(
            cfg.backend, full_obs_cap=64, full_ter_cap=16,
            full_point_cap=32, full_motion_cap=2, full_smo_cap=2))
        m = copy.deepcopy(tracked_session["sysm"].map)
        info = full_ba_inplace(m, cfg, iters=3)
        err = capsys.readouterr().err
        assert "exceeds configured cap" in err
        assert info["cost"] <= info["cost0"]
        assert np.isfinite(info["cost"])


class TestLongSequence:
    @pytest.mark.slow  # ~100 s CPU: 120 tracked frames + window BA
    def test_long_sequence_bounded_drift(self):
        """A sequence an order of magnitude past the usual fixtures, WITH
        windowed BA triggering repeatedly: the archive grows unbounded (the
        reference's append-only Map), per-frame RPE stays bounded (no error
        feedback loop), and the window solves keep succeeding."""
        scene = make_scene(num_frames=120, width=160, height=120,
                           num_objects=2, seed=11)
        cfg = small_config(scene)
        cfg = cfg.replace(
            shapes=dataclasses.replace(cfg.shapes, max_static=300,
                                       max_dynamic=1024),
            frontend=dataclasses.replace(cfg.frontend, n_features=600),
            tracking=dataclasses.replace(cfg.tracking,
                                         boundary_shrink_row=4,
                                         boundary_shrink_col=6,
                                         min_obj_points=20,
                                         min_init_inliers=10),
        )
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=True, enable_global_ba=False,
                      mode="fused")
        reports = sysm.run_sequence(ds)
        n = len(ds)  # scene frames - 1 (last frame has no forward flow)
        assert sysm.map.num_frames == n
        rep = sysm.metrics()
        assert rep["cam_t_rpe"] < 0.02, rep
        # windowed BA fired on schedule (every window-overlap frames)
        tr = cfg.tracking
        expected = (n - tr.overlap_size) // (tr.window_size
                                             - tr.overlap_size)
        assert len(sysm.map.lba_times) >= expected - 1
        assert sysm.tracker.ba_failures == 0
        # per-frame error must not trend upward (no feedback loop): the
        # last-quarter mean stays within 3x the first-quarter mean
        rpes = np.array([r["t_rpe"] for r in reports if "t_rpe" in r])
        q = len(rpes) // 4
        assert rpes[-q:].mean() < 3.0 * rpes[:q].mean() + 1e-3
