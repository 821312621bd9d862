"""MultiStreamSystem — the COMPLETE pipeline, S camera streams at once.

`make_multistream_step` scales the raw tracking step over a mesh (SURVEY.md
§2.3 "Multi-stream data parallel"); this module runs the WHOLE reference
pipeline per stream on top of it: every stream gets its own append-only
MapState archive, windowed BA triggers (Tracking.cc:1168-1183), metric
reports and result files — so S-stream mode is behaviorally identical to S
independent single-stream systems, while the per-frame device work is ONE
vmapped/sharded executable (one dispatch, one packed upload, one packed
drain for all streams).

Design: each stream owns a FusedTracker for its HOST half (archive, GT
parsing, window-BA trigger, reports) — the tracker's device step is simply
never called; the batched step computes all streams' packed output vectors
and each tracker archives its slice.  Stream s therefore behaves exactly
like a solo FusedTracker (same PRNG key schedule, same archive math), which
the equivalence test asserts.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import VDOConfig
from ..io.packing import depth_wire_scale, pack_frame
from .multistream import make_frame_step, make_stream_state


def make_multistream_packed_step(cfg: VDOConfig, mesh: Mesh,
                                 axis: str = "stream"):
    """Batched packed-wire step: (states, inputs(S,...), keys(S,2)) ->
    (states, vecs (S, n)) with stream data sharded over `axis`."""
    # deferred: pipeline.fused itself imports parallel.multistream
    from ..pipeline.fused import _pack_outputs

    step = make_frame_step(cfg, packed=True)

    def one(state, inputs, key):
        state, metrics = step(state, inputs, key)
        return state, _pack_outputs(state, metrics)

    vstep = jax.vmap(one)
    data_sharding = NamedSharding(mesh, P(axis))

    def shard_tree(tree):
        return jax.device_put(
            tree, jax.tree.map(lambda _: data_sharding, tree)
        )

    return jax.jit(vstep), shard_tree


class MultiStreamSystem:
    """S end-to-end pipelines over one device mesh.

    datasets: one dataset per stream (lengths may differ; the run stops at
    the shortest — fixed shapes keep the executable shared).
    """

    def __init__(self, cfg: VDOConfig, n_streams: int,
                 enable_local_ba: bool = True, devices=None):
        from ..pipeline.fused import FusedTracker

        self.cfg = cfg
        self.S = n_streams
        devices = jax.devices() if devices is None else devices
        n_dev = max(d for d in range(1, len(devices) + 1)
                    if n_streams % d == 0)
        self.mesh = Mesh(np.asarray(devices[:n_dev]), ("stream",))
        self.step, self._shard = make_multistream_packed_step(cfg, self.mesh)
        # one host-side tracker per stream: archive + GT parsing + window-BA
        # trigger + reports; their device steps are never invoked
        self.trackers = [FusedTracker(cfg) for _ in range(n_streams)]
        if enable_local_ba:
            from ..backend.window_ba import local_ba_inplace

            for t in self.trackers:
                t.local_ba_hook = (
                    lambda m, n_frames=None: local_ba_inplace(
                        m, cfg, n_frames=n_frames))
        self.states = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[make_stream_state(cfg) for _ in range(n_streams)],
        )
        self.states = self._shard(self.states)
        self.frame_id = 0
        # batched-drain pipeline (same rationale as FusedTracker: every
        # device->host fetch costs ~one tunnel round-trip on the critical
        # path; drain Q frames in ONE device_get on a drainer thread)
        from collections import deque

        self._pending: deque = deque()
        self._drain_futs: deque = deque()
        self._drainer = None
        self.drain_every = max(int(cfg.tracking.fused_drain_chunks), 1)

    @property
    def maps(self):
        return [t.map for t in self.trackers]

    def _stage(self, fds) -> dict:
        """One stacked (S,4,H,W) packed upload for all streams."""

        def _wire(fd):
            # pre-packed frames (io/packed_dataset.py) skip the host pack
            pre = getattr(fd, "packed", None)
            if pre is not None:
                return pre
            from ..io.packing import wire_kwargs

            return pack_frame(np.asarray(fd.rgb, np.float32),
                              np.asarray(fd.depth_raw, np.float32),
                              np.asarray(fd.flow, np.float32),
                              np.asarray(fd.mask),
                              **wire_kwargs(self.cfg.tracking))

        packed = np.stack([_wire(fd) for fd in fds])
        gts = [t._gt_pose(fd.pose_gt_raw)
               for t, fd in zip(self.trackers, fds)]
        sems = [t._stage_gt_sems(fd) for t, fd in zip(self.trackers, fds)]
        staged = self._shard({
            "packed": packed,
            "T_cw_gt": np.stack(gts).astype(np.float32),
            "gt_sems": np.stack(sems),
        })
        staged["_gts_host"] = gts
        return staged

    def step_frame(self, fds, staged: dict | None = None,
                   sync: bool = True) -> list[dict]:
        """Process one frame for every stream (ONE device call); archives
        per stream and returns per-stream reports.

        sync=False pipelines the output drain: the frame's packed vectors
        start an async copy, every `drain_every`-th frame the accumulated
        batch is fetched in ONE device_get on the drainer thread, and the
        return value is whatever frames the drainer has finished (a list of
        per-stream report lists).  Call flush() at the end of the run."""
        t0 = time.perf_counter()
        if staged is None:
            staged = self._stage(fds)
        gts = staged.pop("_gts_host")
        fid = self.frame_id
        keys = jnp.stack([
            jnp.asarray(t._keys[fid % t.MAX_FRAMES]) for t in self.trackers
        ])
        self.states, vecs = self.step(self.states, staged, keys)
        self.frame_id += 1
        for t in self.trackers:
            t.frame_id = fid + 1
        if sync:
            vecs_np = np.asarray(vecs)  # (S, n)
            return self._archive_frame(fds, gts, fid, vecs_np, t0)
        vecs.copy_to_host_async()
        self._pending.append((list(fds), gts, fid, vecs, t0))
        done: list = []
        if len(self._pending) >= self.drain_every:
            if self._drainer is None:
                from concurrent.futures import ThreadPoolExecutor

                self._drainer = ThreadPoolExecutor(1)
            batch = list(self._pending)
            self._pending.clear()
            self._drain_futs.append(
                self._drainer.submit(self._drain_batch, batch))
        while self._drain_futs and self._drain_futs[0].done():
            done.extend(self._drain_futs.popleft().result())
        return done

    def _archive_frame(self, fds, gts, fid, vecs_np, t0) -> list[dict]:
        reps = []
        for s, t in enumerate(self.trackers):
            reps.append(t._finish_frame(fds[s], gts[s], fid, vecs_np[s], t0))
        return reps

    def _drain_batch(self, batch) -> list[list[dict]]:
        """ONE device_get for a batch of frames' (S, n) output vectors,
        then archive per stream in frame order (runs on the drainer)."""
        all_vecs = jax.device_get([b[3] for b in batch])
        out = []
        for (fds, gts, fid, _, t0), vn in zip(batch, all_vecs):
            vn = np.asarray(vn)
            out.append(self._archive_frame(fds, gts, fid, vn, t0))
        return out

    def flush(self) -> list[list[dict]]:
        """Drain every in-flight frame (ordered) and join window solves."""
        done: list = []
        while self._drain_futs:
            done.extend(self._drain_futs.popleft().result())
        if self._pending:
            batch = list(self._pending)
            self._pending.clear()
            done.extend(self._drain_batch(batch))
        for t in self.trackers:
            t._join_ba()
        return done

    def run(self, datasets, max_frames: int | None = None,
            verbose: bool = False) -> list[list[dict]]:
        """Drive all streams to the shortest dataset's end; returns
        per-stream report lists."""
        from concurrent.futures import ThreadPoolExecutor

        assert len(datasets) == self.S, (len(datasets), self.S)
        n = min(len(d) for d in datasets)
        if max_frames is not None:
            n = min(n, max_frames)
        all_reps: list[list[dict]] = [[] for _ in range(self.S)]

        def _show(frame_reps):
            for s, r in enumerate(frame_reps):
                all_reps[s].append(r)
            if verbose and "t_rpe" in frame_reps[0]:
                print(f"frame {frame_reps[0]['frame_id']}: " + "  ".join(
                    f"s{s}: t={r['t_rpe']:.4f}"
                    for s, r in enumerate(frame_reps)))

        staged = self._stage([d[0] for d in datasets]) if n else None
        # next frame's pack + device_put on a dedicated thread: uploads
        # issued from the dispatching thread serialize with in-flight
        # compute on the remote tunnel (see System.run_sequence)
        uploader = ThreadPoolExecutor(1)
        try:
            for i in range(n):
                fds = [d[i] for d in datasets]
                nxt = ([d[i + 1] for d in datasets]) if i + 1 < n else None
                fut = (uploader.submit(self._stage, nxt)
                       if nxt is not None else None)
                for frame_reps in self.step_frame(fds, staged, sync=False):
                    _show(frame_reps)
                staged = fut.result() if fut is not None else None
        finally:
            uploader.shutdown(wait=True)
        for frame_reps in self.flush():
            _show(frame_reps)
        return all_reps

    def metrics(self, refined: bool = False) -> dict:
        """Per-stream metric reports + cross-stream aggregate."""
        from ..eval.results import metric_report

        per = [metric_report(t.map, refined=refined) for t in self.trackers]
        agg = {}
        for k in per[0]:
            vals = [p[k] for p in per]
            agg[k] = (float(np.sum(vals)) if k == "n_obj_estimates"
                      else float(np.mean(vals)))
        return {"per_stream": per, "aggregate": agg}

    def save_results(self, out_dir) -> None:
        """One reference-format results directory per stream."""
        from pathlib import Path

        from ..eval.results import save_results

        for s, t in enumerate(self.trackers):
            save_results(t.map, Path(out_dir) / f"stream_{s}")
