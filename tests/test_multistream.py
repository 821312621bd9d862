"""Multi-stream SPMD tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vdo_slam_tpu.config import KITTI, ShapeConfig, TrackingConfig, VDOConfig
from vdo_slam_tpu.io.dataset import SyntheticDataset
from vdo_slam_tpu.io.synthetic import make_scene
from vdo_slam_tpu.parallel import (
    make_frame_step, make_multistream_step, make_stream_state,
)


def tiny_config(w=96, h=64):
    cfg = VDOConfig()
    return cfg.replace(
        camera=dataclasses.replace(cfg.camera, fx=float(w), fy=float(w),
                                   cx=w / 2.0, cy=h / 2.0, width=w, height=h,
                                   bf=40.0),
        tracking=dataclasses.replace(
            TrackingConfig(), dataset=KITTI, depth_map_factor=1.0,
            boundary_shrink_row=4, boundary_shrink_col=6,
            min_obj_points=20, min_init_inliers=10,
        ),
        shapes=ShapeConfig(max_static=128, max_dynamic=256, max_objects=4,
                           ransac_samples=32),
        frontend=dataclasses.replace(cfg.frontend, n_features=200, n_levels=2),
    )


def stream_inputs(scene, ds, i):
    fd = ds[i]
    T_cw = np.eye(4, dtype=np.float32)
    R = fd.pose_gt_raw[:3, :3]
    T_cw[:3, :3] = R.T
    T_cw[:3, 3] = -R.T @ fd.pose_gt_raw[:3, 3]
    return {
        "rgb": jnp.asarray(fd.rgb),
        "depth_raw": jnp.asarray(fd.depth_raw),
        "flow": jnp.asarray(fd.flow),
        "seg": jnp.asarray(fd.mask, jnp.int32),
        "T_cw_gt": jnp.asarray(T_cw),
    }


class TestFusedFrameStep:
    def test_single_stream_fused_step_tracks(self):
        cfg = tiny_config()
        scene = make_scene(num_frames=4, width=96, height=64, num_objects=1,
                           seed=1)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        step = jax.jit(make_frame_step(cfg))
        state = make_stream_state(cfg)
        key = jax.random.PRNGKey(0)
        for i in range(3):
            key, k = jax.random.split(key)
            state, metrics = step(state, stream_inputs(scene, ds, i), k)
        assert bool(state["initialized"])
        assert float(metrics["t_rpe"]) < 0.1
        assert int(metrics["n_inlier"]) > 20


class TestMultiStream:
    @pytest.mark.slow
    def test_8way_sharded_step(self):
        n_dev = len(jax.devices())
        assert n_dev >= 8, "conftest should provide 8 virtual devices"
        mesh = Mesh(np.array(jax.devices()[:8]), ("stream",))
        cfg = tiny_config()
        S = 8
        scenes = [
            make_scene(num_frames=3, width=96, height=64, num_objects=1,
                       seed=s)
            for s in range(S)
        ]
        dss = [SyntheticDataset(sc, depth_map_factor=1.0, bf=40.0)
               for sc in scenes]

        pstep, shard_tree, sharding = make_multistream_step(cfg, mesh)
        states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[make_stream_state(cfg) for _ in range(S)]
        )
        states = shard_tree(states)
        key = jax.random.PRNGKey(0)
        fleet = None
        for i in range(2):
            inputs = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[stream_inputs(scenes[s], dss[s], i) for s in range(S)],
            )
            inputs = shard_tree(inputs)
            key, *ks = jax.random.split(key, S + 1)
            states, metrics, fleet = pstep(states, inputs, jnp.stack(ks))
        assert np.asarray(states["initialized"]).all()
        assert float(fleet["mean_t_rpe"]) < 0.2
        # per-stream metrics exist for every stream
        assert metrics["t_rpe"].shape == (S,)


class TestFusedSystem:
    def test_fused_mode_tracks_scene(self):
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.io.synthetic import make_scene
        from vdo_slam_tpu.pipeline import System

        scene = make_scene(num_frames=6, width=320, height=240,
                           num_objects=2, seed=3)
        cfg = small_config(scene)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                      mode="fused")
        reports = sysm.run_sequence(ds)
        rpes = [r["t_rpe"] for r in reports[1:]]
        assert np.mean(rpes) < 0.03, rpes
        rep = sysm.metrics()
        assert rep["cam_t_rpe"] < 0.03
        # objects tracked and archived
        assert rep["n_obj_estimates"] >= 3
        assert sysm.map.num_frames == len(reports)

        # chunked drive (fused_chunk=2 over 5 frames: 2 chunks + 1 tail
        # single) must reproduce the per-frame drive's archive exactly
        import dataclasses as dc

        cfg2 = cfg.replace(tracking=dc.replace(cfg.tracking, fused_chunk=2))
        sysm2 = System(cfg2, enable_local_ba=False, enable_global_ba=False,
                       mode="fused")
        reports2 = sysm2.run_sequence(ds)
        assert sysm2.map.num_frames == sysm.map.num_frames
        # XLA reassociates fp32 across the unrolled scan body: ~2e-5 drift
        np.testing.assert_allclose(
            np.stack(sysm2.map.cam_pose), np.stack(sysm.map.cam_pose),
            atol=2e-4)
        rep2 = sysm2.metrics()
        assert abs(rep2["cam_t_rpe"] - rep["cam_t_rpe"]) < 1e-4
        assert rep2["n_obj_estimates"] == rep["n_obj_estimates"]


class TestEntropyWireFused:
    def test_entropy_wire_archive_matches_dense(self):
        """The lossless entropy wire (config.wire_entropy, io/packing.py)
        must reproduce the dense half-res wire's fused-mode run: the
        device-side decode is bit-exact, so the only permissible deltas
        are XLA reassociation noise from the different unpack HLO.  Pins
        the full plumbing (config -> pack -> staged upload -> fused unpack
        -> archive), not just the tensor round-trip."""
        import dataclasses as dc

        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.pipeline import System

        scene = make_scene(num_frames=6, width=320, height=240,
                           num_objects=2, seed=3)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        base = small_config(scene, wire_flow_half=True)
        runs = {}
        for name, entropy in (("dense", False), ("entropy", True)):
            cfg = base.replace(tracking=dc.replace(
                base.tracking, wire_entropy=entropy,
                wire_seg_cap=2048, wire_depth_exc_cap=2048))
            sysm = System(cfg, enable_local_ba=False,
                          enable_global_ba=False, mode="fused")
            sysm.run_sequence(ds)
            runs[name] = sysm
        a, b = runs["dense"], runs["entropy"]
        assert a.map.num_frames == b.map.num_frames
        np.testing.assert_allclose(np.stack(a.map.cam_pose),
                                   np.stack(b.map.cam_pose), atol=2e-5)
        ra, rb = a.metrics(), b.metrics()
        assert ra["n_obj_estimates"] == rb["n_obj_estimates"]
        for k in ("cam_t_rpe", "cam_r_rpe_deg", "obj_t_rpe"):
            assert abs(ra[k] - rb[k]) < 1e-5, (k, ra[k], rb[k])


class TestPartialGT:
    """bObjStat semantics on sequences with partial GT (Tracking.cc:831-841):
    an object whose GT motion is missing in either frame of a pair is a
    failure — excluded from the map archive AND its track dies (features
    stripped from renewal, Tracking.cc:2834/2878; model-label inheritance
    blocked, 1577), so it gets a FRESH model id when GT returns.  The fused
    path must reproduce the host path's archive on such a sequence."""

    DROP_SEM = 2
    DROP_FRAMES = (3, 4)

    def _partial_ds(self, scene):
        base = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        drop_sem, drop_frames = self.DROP_SEM, self.DROP_FRAMES

        class _PartialGT:
            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                fd = base[i]
                if i in drop_frames:
                    rows = np.asarray(fd.obj_gt_rows,
                                      np.float32).reshape(-1, 10)
                    fd = dataclasses.replace(
                        fd, obj_gt_rows=rows[rows[:, 1] != drop_sem])
                return fd

        return _PartialGT()

    @staticmethod
    def _track_ids_by_sem(m, sem):
        """(frame, model_id) pairs archived for `sem` (archive row j is
        frame j+1)."""
        out = []
        for j, (labs, sems) in enumerate(zip(m.rm_label, m.sem_label)):
            for lab, s in zip(labs, sems):
                if s == sem:
                    out.append((j + 1, lab))
        return out

    def test_fused_archive_matches_host_on_partial_gt(self):
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.pipeline import System

        scene = make_scene(num_frames=8, width=320, height=240,
                           num_objects=2, seed=3)
        cfg = small_config(scene)
        maps = {}
        for mode in ("reference", "fused"):
            sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                          mode=mode)
            sysm.run_sequence(self._partial_ds(scene))
            maps[mode] = sysm.map

        host, fused = maps["reference"], maps["fused"]
        assert host.num_frames == fused.num_frames
        # identical per-frame archived object sets (archive row j = frame
        # j+1; entry 0 of each row is the camera)
        host_sems = [sorted(s[1:]) for s in host.sem_label]
        fused_sems = [sorted(s[1:]) for s in fused.sem_label]
        assert host_sems == fused_sems, (host_sems, fused_sems)
        # the dropped object vanishes from the archive exactly while its GT
        # pair is incomplete: frames 3, 4 (cur missing) and 5 (last missing)
        for j, sems in enumerate(host_sems):
            frame = j + 1
            expect = frame not in (3, 4, 5)
            assert (self.DROP_SEM in sems) == expect, (frame, sems)
        # track-id continuity: the surviving object keeps ONE id throughout
        # in both paths; the dropped object gets a FRESH id on GT return
        for m in (host, fused):
            keep = self._track_ids_by_sem(m, 1)
            assert len({lab for _, lab in keep}) == 1, keep
            dropped = self._track_ids_by_sem(m, self.DROP_SEM)
            pre = {lab for f, lab in dropped if f < 3}
            post = {lab for f, lab in dropped if f >= 6}
            assert len(pre) == 1 and len(post) == 1, dropped
            assert pre != post, dropped
        # same obj_track_time view (GetObjTrackTime, the bookkeeping the
        # old fused path undercounted) up to model-id numbering order
        from vdo_slam_tpu.pipeline.map_state import object_track_time

        def _counts(m):
            max_id = max(max(l) for l in m.rm_label) + 1
            cnt, _, _ = object_track_time(m.rm_label, m.sem_label,
                                          m.sm_label_gt, max_id)
            return sorted(cnt.tolist())

        assert _counts(host) == _counts(fused)
        # camera trajectory unaffected by the object-GT gap
        np.testing.assert_allclose(np.stack(host.cam_pose)[:, :3, 3],
                                   np.stack(fused.cam_pose)[:, :3, 3],
                                   atol=5e-3)


class TestStageProbe:
    @pytest.mark.slow  # compiles 7 separate stage programs (~80 s CPU)
    def test_calibrate_stage_times_fills_timings(self):
        """The fused path must produce the reference's 5-span stage timing
        (Map.h:83-84, System.cc:204-237) via the stage probe: non-zero
        measured ms archived for every frame, past and future."""
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.io.synthetic import make_scene
        from vdo_slam_tpu.pipeline import System

        scene = make_scene(num_frames=4, width=320, height=240,
                           num_objects=2, seed=3)
        cfg = small_config(scene)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False,
                      mode="fused")
        sysm.run_sequence(ds, max_frames=3)
        # n_iters=2 keeps the 6 prefix-program compiles cheap on CPU; the
        # production default (8) only affects timing resolution
        times = sysm.tracker.calibrate_stage_times(ds[3], rounds=1,
                                                   n_iters=2)
        assert times.pop("_rtt_ms") >= 0.0
        # the production-body measurement must exist alongside the probe
        # spans (the 5 reference spans + wire unpack + output pack)
        assert times.pop("_frame_ms") > 0.0
        from vdo_slam_tpu.parallel.multistream import PROBE_SPANS

        assert set(times) == set(PROBE_SPANS)
        assert sum(times.values()) > 0.0, times
        # every archived frame (incl. ones archived before calibration)
        # carries the measured split
        rep = sysm.track_rgbd(ds[3])
        sysm.tracker.flush()
        arr = np.stack(sysm.map.timings)
        assert arr.shape[1] == 5
        assert (arr.sum(axis=1) > 0).all()
        from vdo_slam_tpu.eval.results import timing_summary

        summary = timing_summary(sysm.map)
        assert summary["camera_est_ms"] >= 0.0
        assert sum(v for k, v in summary.items()
                   if k.endswith("_ms") and k != "local_ba_ms") > 0.0


class TestMultiStreamSystem:
    @pytest.mark.slow  # two full pipelines + batched step (~2 min CPU)
    def test_full_pipeline_per_stream_with_equivalence(self):
        """S-stream mode must run the COMPLETE per-stream pipeline (archive,
        windowed BA, metrics) and stream s must reproduce a solo
        FusedTracker run on the same data (same key schedule, same archive
        math; vmap fp reassociation tolerance only)."""
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.parallel import MultiStreamSystem
        from vdo_slam_tpu.pipeline import System

        scenes = [
            make_scene(num_frames=7, width=320, height=240, num_objects=2,
                       seed=3),
            make_scene(num_frames=7, width=320, height=240, num_objects=2,
                       seed=9),
        ]
        cfg = small_config(scenes[0])
        dss = [SyntheticDataset(s, depth_map_factor=1.0, bf=40.0)
               for s in scenes]

        msys = MultiStreamSystem(cfg, n_streams=2, enable_local_ba=True)
        reps = msys.run(dss, verbose=False)
        n = len(dss[0])
        # every stream has a full archive + metrics
        for s in range(2):
            assert msys.maps[s].num_frames == n
            assert len(reps[s]) == n
        m = msys.metrics()
        assert len(m["per_stream"]) == 2
        for p in m["per_stream"]:
            assert p["cam_t_rpe"] < 0.03, p
            assert p["n_obj_estimates"] >= 3, p
        assert m["aggregate"]["n_obj_estimates"] == sum(
            p["n_obj_estimates"] for p in m["per_stream"])

        # equivalence: stream 0 == solo fused run on the same dataset
        solo = System(cfg, enable_local_ba=True, enable_global_ba=False,
                      mode="fused")
        solo.run_sequence(dss[0])
        np.testing.assert_allclose(
            np.stack(msys.maps[0].cam_pose), np.stack(solo.map.cam_pose),
            atol=2e-4)
        sm = solo.metrics()
        assert abs(m["per_stream"][0]["cam_t_rpe"] - sm["cam_t_rpe"]) < 1e-4
        assert (m["per_stream"][0]["n_obj_estimates"]
                == sm["n_obj_estimates"])
        # windowed BA ran per stream
        assert all(t.ba_failures == 0 for t in msys.trackers)

    def test_save_results_per_stream(self, tmp_path):
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.parallel import MultiStreamSystem

        scene = make_scene(num_frames=4, width=320, height=240,
                           num_objects=2, seed=3)
        cfg = small_config(scene)
        ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
        msys = MultiStreamSystem(cfg, n_streams=2, enable_local_ba=False)
        msys.run([ds, ds])
        msys.save_results(tmp_path)
        for s in range(2):
            assert (tmp_path / f"stream_{s}" / "initial_stereo_new.txt").exists()
