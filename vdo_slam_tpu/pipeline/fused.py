"""Fused-mode tracking: the entire per-frame pipeline in ONE device call.

The host-orchestrated Tracker (tracking.py) mirrors the reference's control
flow stage by stage (~8 device calls + transfers per frame) and keeps exact
host-side label bookkeeping.  This mode instead drives parallel.make_frame_
step — front-end, camera, classifier, objects, renewal fused into a single
jit with the device-side classifier — and only archives results on the host.
One launch per frame amortizes dispatch/transfer latency, which dominates on
remote-attached accelerators.

GT availability (which the reference folds into bObjStat, Tracking.cc:
831-841) is computed host-side at staging time and fed to the device step as
the `gt_sems` input, so slot gating / renewal / label inheritance match the
host path exactly — including on sequences with partial GT.
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VDOConfig
from ..io.dataset import FrameData
from ..io.packing import pack_frame
from ..parallel.multistream import make_frame_step, make_stream_state
from .map_state import MapState
from .tracking import _np_inv, obj_pose_parsing_kt, obj_pose_parsing_ox

# cap on per-frame GT-object semantic labels fed to the device bObjStat gate
# (far above any shipped sequence's simultaneous object count)
_K_GT = 32


def _rows_sems(rows) -> set[int]:
    r = np.asarray(rows, np.float32).reshape(-1, 10)
    return {int(x) for x in r[:, 1]}


def _pack_outputs(state, metrics):
    """Device-side repack of the per-frame outputs into ONE dense vector.

    The tunnel pays a per-array round-trip cost; the natural output tree has
    17+ small arrays (~40 ms to drain, measured), so everything is flattened
    into a single f32 buffer (~200 KB) and split again on host.  Float32
    packs are exact for every field (ints < 2^24)."""
    fs = state["frame"]
    s, d, m = fs.static, fs.dynamic, metrics
    f32 = jnp.float32
    stat = jnp.concatenate([
        s.xy, s.depth[:, None], s.point_w,
        s.valid.astype(f32)[:, None], s.assoc.astype(f32)[:, None],
    ], axis=1)                                                  # (B, 8)
    dyn = jnp.concatenate([
        d.xy, d.depth[:, None], d.point_w,
        d.valid.astype(f32)[:, None], d.assoc.astype(f32)[:, None],
        d.obj_label.astype(f32)[:, None], d.sem_label.astype(f32)[:, None],
    ], axis=1)                                                  # (D, 10)
    slots = jnp.concatenate([
        m["slot_sem"].astype(f32)[:, None],
        m["slot_model"].astype(f32)[:, None],
        m["slot_active"].astype(f32)[:, None],
        m["slot_H"].reshape(-1, 16),
        m["slot_centroid"],
        m["slot_n_init"].astype(f32)[:, None],
        m["slot_n_inlier"].astype(f32)[:, None],
        m["speeds"][:, None],
    ], axis=1)                                                  # (K, 25)
    mats = jnp.stack([fs.T_cw, fs.velocity])                    # (2, 4, 4)
    scal = jnp.stack([
        m["t_rpe"], m["r_rpe"], m["n_inlier"].astype(f32),
        m["n_objects"].astype(f32), m["used_motion_model"].astype(f32),
    ])                                                          # (5,)
    return jnp.concatenate([stat.ravel(), dyn.ravel(), slots.ravel(),
                            mats.ravel(), scal])


def _unpack_host(vec, B, D, K):
    """Inverse of _pack_outputs on a host numpy vector -> the archive's view."""
    o = 0
    stat = vec[o:o + B * 8].reshape(B, 8); o += B * 8
    dyn = vec[o:o + D * 10].reshape(D, 10); o += D * 10
    slots = vec[o:o + K * 25].reshape(K, 25); o += K * 25
    mats = vec[o:o + 32].reshape(2, 4, 4); o += 32
    scal = vec[o:o + 5]
    host_stat = (stat[:, 0:2], stat[:, 2], stat[:, 3:6],
                 stat[:, 6] > 0.5, stat[:, 7].astype(np.int32))
    host_dyn = (dyn[:, 0:2], dyn[:, 2], dyn[:, 3:6], dyn[:, 6] > 0.5,
                dyn[:, 7].astype(np.int32), dyn[:, 8].astype(np.int32),
                dyn[:, 9].astype(np.int32))
    metrics = {
        "t_rpe": scal[0], "r_rpe": scal[1], "n_inlier": scal[2],
        "n_objects": scal[3], "used_motion_model": scal[4],
        "slot_sem": slots[:, 0].astype(np.int32),
        "slot_model": slots[:, 1].astype(np.int32),
        "slot_active": slots[:, 2] > 0.5,
        "slot_H": slots[:, 3:19].reshape(-1, 4, 4),
        "slot_centroid": slots[:, 19:22],
        "slot_n_init": slots[:, 22].astype(np.int32),
        "slot_n_inlier": slots[:, 23].astype(np.int32),
        "speeds": slots[:, 24],
    }
    return {"stat": host_stat, "dyn": host_dyn, "T_cw": mats[0],
            "velocity": mats[1], "metrics": metrics}


class FusedTracker:
    """Single-stream tracker built on the fused frame step."""

    MAX_FRAMES = 8192

    def __init__(self, cfg: VDOConfig, game_map: MapState | None = None):
        self.cfg = cfg
        self.map = game_map if game_map is not None else MapState()
        raw_step = make_frame_step(cfg, packed=True)

        def _step(state, inputs, key):
            state, metrics = raw_step(state, inputs, key)
            return state, _pack_outputs(state, metrics)

        self.step = jax.jit(_step)
        # chunked execution: C whole frames per device call (fully-unrolled
        # scan — unrolled bodies layout-specialize on TPU, CLAUDE.md), which
        # amortizes the per-call dispatch + transfer overhead of remote-
        # attached devices C-fold
        self.chunk = max(int(cfg.tracking.fused_chunk), 1)
        if self.chunk > 1:
            C = self.chunk

            def _chunk_step(state, inputs, keys):
                def body(st, x):
                    st, vec = _step(st, {"packed": x["packed"],
                                         "T_cw_gt": x["T_cw_gt"],
                                         "gt_sems": x["gt_sems"]}, x["key"])
                    return st, vec
                xs = {"packed": inputs["packed"],
                      "T_cw_gt": inputs["T_cw_gt"],
                      "gt_sems": inputs["gt_sems"], "key": keys}
                return jax.lax.scan(body, state, xs, length=C, unroll=C)

            self.step_chunk = jax.jit(_chunk_step)
        self._pending_chunk = None
        # Batched-drain machinery.  Every device->host fetch costs ~one
        # tunnel round-trip ON THE CRITICAL PATH even from a background
        # thread (the client serializes requests: the 30 ms/frame
        # never-sync chunk rate collapses to 65-77 ms/frame with ANY
        # per-chunk fetch, payload size nearly irrelevant).  So completed
        # chunks accumulate in _pending_batch and drain Q at a time in ONE
        # jax.device_get on the drainer thread.
        self._drainer = None
        from collections import deque

        self._drain_futs = deque()
        self._pending_batch = []
        self.drain_chunks = max(int(cfg.tracking.fused_drain_chunks), 1)
        self.state = make_stream_state(cfg)
        # pre-split the whole run's PRNG keys ONCE; host-resident so no
        # per-frame device round-trip for jax.random.split
        self._keys = np.asarray(
            jax.random.split(jax.random.PRNGKey(cfg.seed), self.MAX_FRAMES)
        )
        self.frame_id = 0
        self.origin_inv: np.ndarray | None = None
        # GT sem labels of the last STAGED frame (staging runs strictly in
        # frame order, possibly on the uploader thread); None until frame 0
        # is staged.  Distinct from _last_obj_rows, which the drainer thread
        # advances at ARCHIVE time.
        self._stage_last_sems: set[int] | None = None
        self._last_obj_rows = np.zeros((0, 10), np.float32)
        self._last_T_wc_gt = np.eye(4, dtype=np.float32)
        self.local_ba_hook = None
        self._ba_thread: threading.Thread | None = None
        # pending window ends (archive lengths) not yet launched: solves run
        # strictly sequentially on ONE background thread, and a trigger that
        # arrives while a solve is in flight is QUEUED instead of joined —
        # a join here stalls the drainer (and through the batched drains the
        # whole tracking loop) for the full solve latency.  Measured: the
        # first mid-stream window solve waits ~3 s on the busy wire; the
        # blocking join cost ~2.3 s of tracking wall (19.4 -> 28+ fps).
        self._ba_queue: list[int] = []
        self._ba_lock = threading.Lock()
        self.ba_failures = 0  # background window solves that raised
        # per-solve health dicts (cost0/cost, points, tracks dropped, edge
        # stats) — the reference's per-window chi2 printouts
        # (Optimizer.cc:640-970); one stderr line is logged per solve
        self.ba_health: list[dict] = []
        # per-frame stage-time estimate archived with every frame: zeros
        # until calibrate_stage_times() measures the real split (the fused
        # step is one executable; spans can't be timed inside it)
        self._stage_ms = np.zeros(5, np.float32)
        self._probe_rtt_ms = 0.0

    def _gt_pose(self, raw):
        # rebased so the first frame's GT is exactly I (matching the
        # pose-chain init) even when the run starts mid-sequence
        if self.origin_inv is None:
            self.origin_inv = np.asarray(raw, np.float32)
        return _np_inv(np.asarray(raw, np.float32)) @ self.origin_inv

    def _stage_gt_sems(self, fd: FrameData) -> np.ndarray:
        """(K_GT,) -1-padded sem labels with GT in BOTH the previous and
        this frame — the device-side bObjStat gate's input (Tracking.cc:
        831-841).  Must be called once per frame, in frame order."""
        cur = _rows_sems(fd.obj_gt_rows)
        last = self._stage_last_sems
        both = sorted(cur & last)[:_K_GT] if last is not None else []
        self._stage_last_sems = cur
        out = np.full((_K_GT,), -1, np.int32)
        out[:len(both)] = both
        return out

    def _gt_obj(self, rows, T_wc_gt):
        from ..config import OMD

        out = {}
        for r in np.asarray(rows, np.float32).reshape(-1, 10):
            if self.cfg.tracking.dataset == OMD:
                out[int(r[1])] = obj_pose_parsing_ox(r, self.origin_inv)
            else:
                out[int(r[1])] = T_wc_gt @ obj_pose_parsing_kt(r)
        return out

    def device_inputs(self, fd: FrameData) -> dict:
        """Stage a frame's tensors on device in ONE packed int16 transfer
        (async) — 3.7 MB instead of 9.3 MB over 5 arrays; callable ahead of
        time so uploads overlap the previous frame's compute (the double-
        buffered host->device pipeline, SURVEY.md §2.3)."""
        T_cw_gt = self._gt_pose(fd.pose_gt_raw)
        from ..io.packing import wire_kwargs

        pre = getattr(fd, "packed", None)
        staged = jax.device_put({
            "packed": pre if pre is not None else pack_frame(
                np.asarray(fd.rgb, np.float32),
                np.asarray(fd.depth_raw, np.float32),
                np.asarray(fd.flow, np.float32),
                np.asarray(fd.mask),
                **wire_kwargs(self.cfg.tracking)),
            "T_cw_gt": np.asarray(T_cw_gt, np.float32),
            "gt_sems": self._stage_gt_sems(fd),
        })
        staged["_T_cw_gt_host"] = T_cw_gt
        return staged

    def calibrate_stage_times(self, fd: FrameData, rounds: int = 2,
                              n_iters: int = 8) -> dict:
        """Measure the reference's 5-span per-stage split (Map.h:83-84,
        System.cc:204-237) on the fused path.

        Uses the scan-N prefix probe (parallel.multistream.make_scan_probe):
        prefix k runs spans 1..k of the frame step N times inside one jit,
        and span time = (T_k - T_{k-1}) / N — dispatch and tunnel round-trip
        cancel exactly, so per-stage device times well below one round-trip
        are resolved.  The production chunk step is one fused executable, so
        spans can't be timed inside it — run this OFF the critical path
        (e.g. right after warmup); the measured ms are archived with every
        frame, past and future.  `rounds` = timed repetitions per prefix
        (min wins; each prefix is compiled + warmed first).  Returns
        {stage: ms} plus the dispatch baseline under key "_rtt_ms".
        `n_iters` trades compile time (8 programs, each ~n_iters unrolled
        bodies) against timing resolution (span deltas are n_iters x the
        per-frame stage time)."""
        from ..parallel.multistream import STAGE_SPANS, make_scan_probe

        # device_inputs advances the staging-order GT state; the probe runs
        # off the sequence (often on an already-staged frame), so restore it
        saved_sems = self._stage_last_sems
        staged = self.device_inputs(fd)
        self._stage_last_sems = saved_sems
        probe = make_scan_probe(self.cfg, n_iters=n_iters)
        key = jnp.asarray(self._keys[self.frame_id % self.MAX_FRAMES])
        times, rtt = probe(self.state, staged, key, reps=max(rounds, 1))
        # archive the reference's 5 spans (clamped only for the ARCHIVE —
        # negative probe deltas are measurement noise, not real time; the
        # returned dict keeps them signed)
        self._stage_ms = np.asarray(
            [max(times[k], 0.0) for k in STAGE_SPANS], np.float32)
        self._probe_rtt_ms = rtt
        # backfill frames archived before calibration (they carried zeros)
        for i in range(len(self.map.timings)):
            self.map.timings[i] = self._stage_ms.copy()
        out = dict(times)
        out["_rtt_ms"] = rtt
        return out

    def _finish_frame(self, fd_p, T_cw_gt_p, fid_p, vec_np, t0_p):
        """Archive one frame's unpacked outputs + fire the window-BA trigger.

        Must not touch self.frame_id: it runs on the drainer thread while
        the main thread dispatches subsequent chunks."""
        sh = self.cfg.shapes
        host = _unpack_host(vec_np, sh.max_static, sh.max_dynamic,
                            sh.max_objects)
        self._archive(fd_p, host, T_cw_gt_p, fid_p)
        hm = host["metrics"]
        rep = {
            "frame_id": fid_p,
            "T_cw": host["T_cw"],
            "t_rpe": float(hm["t_rpe"]),
            "r_rpe": float(hm["r_rpe"]),
            "n_inlier_cam": int(hm["n_inlier"]),
            "n_objects": int(hm["n_objects"]),
            "wall_time": time.perf_counter() - t0_p,
        }
        if self.ba_failures:
            rep["ba_failures"] = self.ba_failures
        # windowed BA trigger on the ARCHIVED frame (Tracking.cc:1168-1183).
        # Runs on a background thread with the window end PINNED to the
        # current archive length: tracking keeps appending (and the fused
        # device state never reads the refined values back — the documented
        # fused-mode deviation), so the solve only has to finish before the
        # next trigger / flush.
        tr = self.cfg.tracking
        w, o = tr.window_size, tr.overlap_size
        if (self.local_ba_hook is not None and fid_p >= w - 1
                and (fid_p - o + 1) % (w - o) == 0):
            with self._ba_lock:
                self._ba_queue.append(self.map.num_frames)
            self._maybe_launch_ba()
        return rep

    def _run_ba(self, n_frames: int):
        t5 = time.perf_counter()
        try:
            health = self.local_ba_hook(self.map, n_frames)
            ms = (time.perf_counter() - t5) * 1e3
            self.map.lba_times.append(ms)
            if isinstance(health, dict):
                self.ba_health.append(health)
                import sys

                obs = health.get("edge_stats", {}).get("obs", {})
                print(
                    f"[window-ba] end={n_frames} cost "
                    f"{health['cost0']:.3e} -> {health['cost']:.3e}"
                    f"  points={health['n_points']}"
                    f"  obs_inliers={int(obs.get('n_inlier', 0))}/"
                    f"{int(obs.get('n', 0))}"
                    f"  tracks_dropped={health['n_tracks_dropped']}"
                    f"  {ms:.0f}ms (build "
                    f"{health.get('t_build_ms', 0):.0f} dispatch "
                    f"{health.get('t_dispatch_ms', 0):.0f} exec "
                    f"{health.get('t_exec_ms', 0):.0f} fetch "
                    f"{health.get('t_fetch_ms', 0):.0f})",
                    file=sys.stderr)
        except Exception:
            # a lost window solve degrades refinement quality only;
            # surface it instead of dying silently on the daemon
            import traceback

            traceback.print_exc()
            self.ba_failures += 1
        finally:
            # hand the thread slot over and launch the next queued window
            with self._ba_lock:
                self._ba_thread = None
            self._maybe_launch_ba()

    def _maybe_launch_ba(self):
        """Launch the next queued window solve iff none is in flight.
        Solves stay strictly sequential (write-back of window k completes
        before window k+1's graph build reads the refined poses), but the
        trigger path never blocks on an in-flight solve."""
        with self._ba_lock:
            if self._ba_thread is not None or not self._ba_queue:
                return
            n_frames = self._ba_queue.pop(0)
            t = threading.Thread(target=self._run_ba, args=(n_frames,),
                                 daemon=True)
            self._ba_thread = t
            # started under the lock: a concurrent trigger must never see a
            # claimed-but-unstarted slot as free
            t.start()

    def _drain_pending(self):
        """Archive the previous frame's (async-copied) outputs."""
        if getattr(self, "_pending", None) is None:
            return None
        fd_p, T_cw_gt_p, fid_p, vec, t0_p = self._pending
        self._pending = None
        return self._finish_frame(fd_p, T_cw_gt_p, fid_p, np.asarray(vec),
                                  t0_p)

    def _drain_batch_now(self, batch):
        """Fetch + archive a BATCH of chunks' outputs in ONE device_get
        (runs on the drainer thread in the chunked drive, inline at
        flush)."""
        all_vecs = jax.device_get([p[3] for p in batch])   # one round-trip
        reps = []
        for (fds, gts, fid0, _, t0_p, n_real), vecs_np in zip(batch,
                                                              all_vecs):
            vecs_np = np.asarray(vecs_np)
            reps.extend(
                self._finish_frame(fds[c], gts[c], fid0 + c, vecs_np[c],
                                   t0_p)
                for c in range(n_real)
            )
        return reps

    def _drain_pending_chunk(self):
        """Synchronously archive EVERYTHING still in flight, in order."""
        reps = []
        while self._drain_futs:
            reps.extend(self._drain_futs.popleft().result())
        if self._pending_chunk is not None:
            self._pending_batch.append(self._pending_chunk)
            self._pending_chunk = None
        if self._pending_batch:
            batch, self._pending_batch = self._pending_batch, []
            reps.extend(self._drain_batch_now(batch))
        return reps

    def _join_ba(self):
        """Drain ALL queued + in-flight window solves (sequence flush)."""
        while True:
            with self._ba_lock:
                t = self._ba_thread
                if t is None and not self._ba_queue:
                    return
            if t is not None:
                t.join()
            else:
                # queued but not launched (the finishing thread is between
                # releasing the slot and its trailing _maybe_launch_ba)
                self._maybe_launch_ba()

    def grab_frame(self, fd: FrameData, staged: dict | None = None,
                   prefetch_cb=None) -> dict:
        """Fully-pipelined frame processing.

        The step is dispatched asynchronously, its outputs start async
        device->host copies immediately, and the PREVIOUS frame's outputs
        (whose copies overlapped this step's compute) are archived.  The
        returned report therefore describes frame_id-1; call flush() at the
        end of a sequence for the final frame.  This removes all blocking
        round-trips from the steady-state loop — the only waits left are
        true data dependencies.
        """
        t0 = time.perf_counter()
        inputs = dict(staged) if staged is not None else dict(self.device_inputs(fd))
        T_cw_gt = inputs.pop("_T_cw_gt_host")
        k = self._keys[self.frame_id % self.MAX_FRAMES]  # host-resident key
        self.state, vec = self.step(self.state, inputs, k)
        # stage the NEXT frame while this step computes
        prefetched = prefetch_cb() if prefetch_cb is not None else None
        self._prefetched = prefetched
        # start the async copy of this frame's single packed output vector
        vec.copy_to_host_async()
        rep_prev = self._drain_pending()
        self._pending = (fd, T_cw_gt, self.frame_id, vec, t0)
        self.frame_id += 1
        if rep_prev is None:
            rep_prev = {"frame_id": -1, "pipelining": True}
        return rep_prev

    def device_inputs_chunk(self, fds) -> dict:
        """Stage a CHUNK of frames on device in one transfer (async)."""
        from ..io.packing import wire_kwargs

        wk = wire_kwargs(self.cfg.tracking)
        packs, gts, sems = [], [], []
        for fd in fds:
            gts.append(self._gt_pose(fd.pose_gt_raw))
            sems.append(self._stage_gt_sems(fd))
            # pre-packed frames (io/packed_dataset.py) skip the per-frame
            # host pack entirely — the wire IS the dataset
            pre = getattr(fd, "packed", None)
            packs.append(pre if pre is not None else pack_frame(
                np.asarray(fd.rgb, np.float32),
                np.asarray(fd.depth_raw, np.float32),
                np.asarray(fd.flow, np.float32),
                np.asarray(fd.mask), **wk))
        staged = jax.device_put({
            "packed": np.stack(packs),
            "T_cw_gt": np.stack(gts).astype(np.float32),
            "gt_sems": np.stack(sems),
        })
        staged["_T_cw_gt_host"] = gts
        return staged

    def grab_chunk(self, fds, staged: dict | None = None,
                   prefetch_cb=None, n_real: int | None = None) -> list[dict]:
        """Pipelined processing of len(fds) == chunk frames in ONE device
        call; returns the PREVIOUS chunk's per-frame reports (see
        grab_frame).  Call flush() for the final chunk.

        n_real < chunk marks a PADDED tail chunk (trailing entries repeat
        the last real frame so the sequence tail reuses the warm chunk
        executable instead of compiling a single-frame program mid-run);
        only the first n_real frames are archived/reported."""
        assert len(fds) == self.chunk, (len(fds), self.chunk)
        if n_real is None:
            n_real = self.chunk
        t0 = time.perf_counter()
        inputs = dict(staged) if staged is not None \
            else dict(self.device_inputs_chunk(fds))
        gts = inputs.pop("_T_cw_gt_host")
        k0 = self.frame_id % self.MAX_FRAMES
        # wrap-safe slice: a chunk size that doesn't divide MAX_FRAMES would
        # otherwise produce a short key slice at the ring boundary and fail
        # the jitted scan with a shape mismatch
        keys = self._keys.take(range(k0, k0 + self.chunk), axis=0,
                               mode="wrap")
        self.state, vecs = self.step_chunk(self.state, inputs, keys)
        prefetched = prefetch_cb() if prefetch_cb is not None else None
        self._prefetched = prefetched
        vecs.copy_to_host_async()
        # accumulate completed chunks; every Q-th, hand the batch to the
        # drainer thread for ONE batched fetch + archive, and return
        # whatever the drainer already finished
        if self._pending_chunk is not None:
            self._pending_batch.append(self._pending_chunk)
            self._pending_chunk = None
        if len(self._pending_batch) >= self.drain_chunks:
            if self._drainer is None:
                from concurrent.futures import ThreadPoolExecutor

                self._drainer = ThreadPoolExecutor(1)
            batch, self._pending_batch = self._pending_batch, []
            self._drain_futs.append(
                self._drainer.submit(self._drain_batch_now, batch))
        reps = []
        while self._drain_futs and self._drain_futs[0].done():
            reps.extend(self._drain_futs.popleft().result())
        self._pending_chunk = (list(fds), gts, self.frame_id, vecs, t0,
                               n_real)
        self.frame_id += self.chunk
        return reps

    def flush(self) -> dict | list | None:
        """Archive the final in-flight frame/chunk and join any background
        window solve (call once after the loop)."""
        rep = self._drain_pending()
        reps = self._drain_pending_chunk()
        self._join_ba()
        return reps if reps else rep

    def _archive(self, fd: FrameData, host: dict, T_cw_gt, fid: int):
        m = self.map
        s_xy, s_d, s_3d, s_v, s_a = host["stat"]
        d_xy, d_d, d_3d, d_v, d_a, d_ol, d_sl = host["dyn"]
        metrics = host["metrics"]
        m.stat_xy.append(s_xy)
        m.stat_depth.append(s_d)
        m.stat_3d.append(s_3d)
        m.stat_valid.append(s_v)
        m.dyn_xy.append(d_xy)
        m.dyn_depth.append(d_d)
        m.dyn_3d.append(d_3d)
        m.dyn_valid.append(d_v)
        m.dyn_obj_label.append(d_ol)
        m.dyn_sem_label.append(d_sl)
        T_cw = host["T_cw"]
        T_wc = _np_inv(T_cw)
        m.cam_pose.append(T_wc)
        m.cam_pose_rf.append(T_wc.copy())
        m.cam_pose_gt.append(_np_inv(np.asarray(T_cw_gt)))
        m.timings.append(self._stage_ms.copy())

        if fid == 0:
            self._last_obj_rows = fd.obj_gt_rows
            self._last_T_wc_gt = _np_inv(np.asarray(T_cw_gt))
            return
        m.stat_assoc.append(s_a)
        m.dyn_assoc.append(d_a)

        T_wc_gt = _np_inv(np.asarray(T_cw_gt))
        gt_cur = self._gt_obj(fd.obj_gt_rows, T_wc_gt)
        gt_last = self._gt_obj(self._last_obj_rows, self._last_T_wc_gt)

        cam_motion = _np_inv(host["velocity"])
        mots = [cam_motion]
        # GT camera motion = Tcw_gt_last @ Twc_gt_cur (Tracking.cc:1136)
        mots_gt = [self._last_T_wc_gt_inv() @ T_wc_gt]
        poses_pre = [cam_motion]
        labels = [0]
        sems = [0]
        stats = [True]
        sp_gt = [1.0]
        sp_est = [0.0]
        cents = [np.zeros(3, np.float32)]

        active = metrics["slot_active"]
        H_all = metrics["slot_H"]
        sem_all = metrics["slot_sem"]
        model_all = metrics["slot_model"]
        cen_all = metrics["slot_centroid"]
        speed_all = metrics["speeds"]
        for k in range(active.shape[0]):
            if not active[k]:
                continue
            sem = int(sem_all[k])
            ok_gt = sem in gt_cur and sem in gt_last
            if ok_gt:
                L_w_p = gt_last[sem]
                L_w_c = gt_cur[sem]
                H_gt_body = _np_inv(L_w_p) @ L_w_c
                H_p_c = L_w_c @ _np_inv(L_w_p)
                v_gt = H_p_c[:3, 3] - (np.eye(3) - H_p_c[:3, :3]) @ cen_all[k]
                speed_gt = float(np.linalg.norm(v_gt) * 36.0)
            else:
                # unreachable in normal operation: the device step's
                # gt_sems gate already deactivates no-GT slots (bObjStat,
                # Tracking.cc:831-841); kept as a defensive skip — the
                # reference also drops failures from the map (1089-1098)
                continue
            mots.append(H_all[k])
            mots_gt.append(H_gt_body)
            poses_pre.append(L_w_p)
            labels.append(int(model_all[k]))
            sems.append(sem)
            stats.append(True)
            sp_gt.append(speed_gt)
            sp_est.append(float(speed_all[k]))
            cents.append(cen_all[k])

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
        self._last_obj_rows = fd.obj_gt_rows
        self._last_T_wc_gt = T_wc_gt

    def _last_T_wc_gt_inv(self):
        return _np_inv(self._last_T_wc_gt)
