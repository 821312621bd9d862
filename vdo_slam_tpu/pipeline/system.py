"""Public API facade — the equivalent of the reference System class
(include/System.h, src/System.cc):

    sys = System(cfg_or_settings_yaml)          # System::System
    T_cw = sys.track_rgbd(frame_data)           # System::TrackRGBD
    sys.save_results(out_dir)                   # System::SaveResults
    sys.run_sequence(dataset)                   # example/vdo_slam.cc main loop
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import VDOConfig, load_settings
from ..eval import results as results_mod
from ..io.dataset import FrameData
from .map_state import MapState
from .tracking import Tracker


class System:
    def __init__(self, cfg: VDOConfig | str | Path, enable_local_ba: bool = True,
                 enable_global_ba: bool = True, mode: str = "reference"):
        """mode: 'reference' = host-orchestrated stage-by-stage tracking with
        exact reference bookkeeping; 'fused' = whole frame in one device call
        (device-side classifier) — the low-latency production path."""
        if not isinstance(cfg, VDOConfig):
            cfg = load_settings(cfg)
        self.cfg = cfg
        self.map = MapState()
        if mode == "fused":
            from .fused import FusedTracker

            self.tracker = FusedTracker(cfg, self.map)
        else:
            self.tracker = Tracker(cfg, self.map)
        self.enable_global_ba = enable_global_ba
        if enable_local_ba:
            from ..backend.window_ba import local_ba_inplace

            self.tracker.local_ba_hook = (
                lambda m, n_frames=None: local_ba_inplace(
                    m, cfg, n_frames=n_frames))

    def track_rgbd(self, fd: FrameData) -> dict:
        """Feed one frame; returns the frame report incl. the pose estimate."""
        return self.tracker.grab_frame(fd)

    def run_sequence(self, dataset, max_frames: int | None = None,
                     verbose: bool = False) -> list[dict]:
        """Demo-driver loop (example/vdo_slam.cc:98-141).

        In fused mode the next frame's tensors are staged on device while the
        current frame computes (double-buffered host->device pipeline)."""
        n = len(dataset) if max_frames is None else min(len(dataset), max_frames)
        reports = []
        can_stage = hasattr(self.tracker, "device_inputs")
        if can_stage and n:
            # fused path: background-thread frame decode + staged uploads +
            # async archive = a 3-deep pipeline
            from ..io.prefetch import ThreadedPrefetcher

            class _Limit:
                def __init__(s, b, k):
                    s.b, s.k = b, k

                def __len__(s):
                    return s.k

                def __getitem__(s, i):
                    return s.b[i]

            def _show(rep):
                if not rep.get("pipelining"):
                    if verbose and "t_rpe" in rep:
                        print(
                            f"frame {rep['frame_id']}: "
                            f"rpe t={rep['t_rpe']:.4f} r={rep['r_rpe']:.4f} "
                            f"inliers={rep['n_inlier_cam']}"
                        )
                    reports.append(rep)

            C = getattr(self.tracker, "chunk", 1)
            if C > 1 and n >= C:
                # chunked drive: C frames per device call, prefetching the
                # next chunk while the current one computes.  The pack +
                # device_put of the NEXT chunk runs on a dedicated uploader
                # thread: a device_put issued from the dispatching thread
                # SERIALIZES with in-flight compute on the remote tunnel
                # (measured: compute+upload = sum same-thread, but overlaps
                # fully from a second thread), and the upload is the
                # steady-state critical path
                from concurrent.futures import ThreadPoolExecutor

                pf = ThreadedPrefetcher(_Limit(dataset, n))
                it = iter(pf)
                nxt = [None]
                uploader = ThreadPoolExecutor(1)

                def _stage_next():
                    take = []
                    for _ in range(C):
                        x = next(it, None)
                        if x is None:
                            break
                        take.append(x)
                    nxt[0] = take
                    if len(take) == C:
                        return self.tracker.device_inputs_chunk(take)
                    return None

                def prefetch_chunk():
                    return uploader.submit(_stage_next)

                try:
                    fds = [next(it) for _ in range(C)]
                    staged = self.tracker.device_inputs_chunk(fds)
                    while True:
                        for rep in self.tracker.grab_chunk(
                                fds, staged, prefetch_cb=prefetch_chunk):
                            _show(rep)
                        fut = getattr(self.tracker, "_prefetched", None)
                        staged = fut.result() if fut is not None else None
                        fds = nxt[0]
                        if staged is None or fds is None or len(fds) < C:
                            break
                    # ordered drain before the tail
                    for rep in self.tracker._drain_pending_chunk():
                        _show(rep)
                    # tail frames (n % C != 0) run as ONE padded chunk that
                    # repeats the last frame: reuses the warm chunk
                    # executable instead of compiling the single-frame
                    # program mid-run (5-400 s on the remote worker)
                    if fds:
                        pad = list(fds) + [fds[-1]] * (C - len(fds))
                        tail_staged = self.tracker.device_inputs_chunk(pad)
                        for rep in self.tracker.grab_chunk(
                                pad, tail_staged, n_real=len(fds)):
                            _show(rep)
                finally:
                    uploader.shutdown(wait=True)
                    pf.close()
                final = self.tracker.flush()
                for rep in ([final] if isinstance(final, dict)
                            else (final or [])):
                    _show(rep)
                if self.enable_global_ba and self.map.num_frames > 2:
                    from ..backend.full_ba import full_ba_inplace

                    full_ba_inplace(self.map, self.cfg)
                return reports

            pf = ThreadedPrefetcher(_Limit(dataset, n))
            it = iter(pf)
            fd = next(it)
            staged = self.tracker.device_inputs(fd)
            next_fd = [None]
            try:
                for i in range(n):
                    def prefetch():
                        nxt = next(it, None)
                        next_fd[0] = nxt
                        if nxt is None:
                            return None
                        return self.tracker.device_inputs(nxt)

                    rep = self.tracker.grab_frame(fd, staged,
                                                  prefetch_cb=prefetch)
                    staged = getattr(self.tracker, "_prefetched", None)
                    if next_fd[0] is not None:
                        fd = next_fd[0]
                    if not rep.get("pipelining"):
                        if verbose and "t_rpe" in rep:
                            print(
                                f"frame {rep['frame_id']}: "
                                f"rpe t={rep['t_rpe']:.4f} "
                                f"r={rep['r_rpe']:.4f} "
                                f"inliers={rep['n_inlier_cam']}"
                            )
                        reports.append(rep)
            finally:
                pf.close()
            final = self.tracker.flush()
            if final is not None:
                reports.append(final)
            if self.enable_global_ba and self.map.num_frames > 2:
                from ..backend.full_ba import full_ba_inplace

                full_ba_inplace(self.map, self.cfg)
            return reports
        for i in range(n):
            rep = self.track_rgbd(dataset[i])
            if verbose and "t_rpe" in rep:
                print(
                    f"frame {i}: rpe t={rep['t_rpe']:.4f} r={rep['r_rpe']:.4f} "
                    f"inliers={rep['n_inlier_cam']} objs="
                    f"{[(o['model_label'], round(o['speed'], 1)) for o in rep['objects'] if o['status']]}"
                )
            reports.append(rep)
        # drain the async-archive pipeline (fused mode lags one frame)
        if hasattr(self.tracker, "flush"):
            final = self.tracker.flush()
            if final is not None:
                reports.append(final)
        # final-frame global refinement (Tracking.cc:1190-1208, KITTI only in
        # the reference; here gated by enable_global_ba)
        if self.enable_global_ba and self.map.num_frames > 2:
            from ..backend.full_ba import full_ba_inplace

            full_ba_inplace(self.map, self.cfg)
        return reports

    def _flush(self):
        if hasattr(self.tracker, "flush"):
            self.tracker.flush()

    def metrics(self, refined: bool = False) -> dict:
        self._flush()
        return results_mod.metric_report(self.map, refined=refined)

    def timing(self) -> dict:
        self._flush()
        return results_mod.timing_summary(self.map)

    def save_results(self, out_dir: str | Path) -> None:
        self._flush()
        results_mod.save_results(self.map, out_dir)
