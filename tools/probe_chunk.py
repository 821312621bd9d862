"""Per-chunk instrumentation of the fused drive loop (what blocks where).

Replicates System.run_sequence's chunked drive inline, timing each phase of
every iteration:

  dispatch — step_chunk call (async; should return in ~1 ms)
  stage    — fut.result() wait for the next chunk's threaded upload
  drain    — harvesting completed drainer futures
  other    — report bookkeeping etc.

Usage: python tools/probe_chunk.py [--frames 48]
"""

from __future__ import annotations

import dataclasses
import pickle
import sys
import time
from pathlib import Path


sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n_frames: int = 48):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vdo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vdo_slam_tpu.config import (KITTI, ShapeConfig, TrackingConfig,
                                     VDOConfig, tpu_fast)
    from vdo_slam_tpu.io.dataset import SyntheticDataset
    from vdo_slam_tpu.io.packed_dataset import InMemoryPackedDataset
    from vdo_slam_tpu.io.synthetic import make_scene
    from vdo_slam_tpu.pipeline import System

    W, H = 1242, 375
    N = 100
    cache = Path(f"/tmp/vdo_bench_scene_{N}.pkl")
    if cache.exists():
        scene = pickle.loads(cache.read_bytes())
    else:
        scene = make_scene(num_frames=N + 1, width=W, height=H,
                           num_objects=3, fx=721.5377, seed=7)
        cache.write_bytes(pickle.dumps(scene))

    cfg = VDOConfig()
    cfg = cfg.replace(
        camera=dataclasses.replace(cfg.camera, fx=721.5377, fy=721.5377,
                                   cx=W / 2.0, cy=H / 2.0, width=W, height=H,
                                   bf=387.5744),
        tracking=dataclasses.replace(TrackingConfig(), dataset=KITTI,
                                     depth_map_factor=256.0, fused_chunk=4),
        shapes=ShapeConfig(),
    )
    cfg = tpu_fast(cfg)
    from bench import _env_overrides  # VDO_BENCH_* A/B knobs
    cfg = _env_overrides(cfg)
    ds = SyntheticDataset(scene, depth_map_factor=256.0, bf=387.5744)
    pds = InMemoryPackedDataset(ds, depth_map_factor=256.0,
                                flow_down=cfg.tracking.flow_down,
                                flow_delta=cfg.tracking.flow_delta,
                                depth_down=cfg.tracking.depth_down,
                               depth_resid=cfg.tracking.depth_resid,
                               entropy=cfg.tracking.entropy,
                               seg_cap=cfg.tracking.wire_seg_cap,
                               depth_exc_cap=cfg.tracking.wire_depth_exc_cap)

    sysm = System(cfg, enable_local_ba=False, mode="fused")
    tr = sysm.tracker
    C = tr.chunk

    t0 = time.perf_counter()
    sysm.run_sequence(pds, max_frames=2 * C)
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    from concurrent.futures import ThreadPoolExecutor

    uploader = ThreadPoolExecutor(1)
    start = 2 * C
    nt = min(n_frames, len(pds) - start)
    n_chunks = nt // C
    chunks = [[pds[start + i * C + c] for c in range(C)]
              for i in range(n_chunks)]

    staged = tr.device_inputs_chunk(chunks[0])
    t_loop = time.perf_counter()
    rows = []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        fut = (uploader.submit(tr.device_inputs_chunk, chunks[i + 1])
               if i + 1 < n_chunks else None)
        t1 = time.perf_counter()
        tr.grab_chunk(chunks[i], staged)
        t2 = time.perf_counter()
        staged = fut.result() if fut is not None else None
        t3 = time.perf_counter()
        rows.append((t1 - t0, t2 - t1, t3 - t2))
    t4 = time.perf_counter()
    tr._drain_pending_chunk()
    tr.flush()
    t5 = time.perf_counter()
    total = t5 - t_loop
    log(f"chunk phases (ms): submit / grab_chunk(dispatch+drain-harvest) / "
        f"stage-wait")
    for i, (a, b, c) in enumerate(rows):
        log(f"  chunk {i}: {a * 1e3:7.1f} {b * 1e3:7.1f} {c * 1e3:7.1f}")
    log(f"final drain+flush: {(t5 - t4) * 1e3:.1f} ms")
    log(f"total: {total:.2f}s for {n_chunks * C} frames = "
        f"{total / (n_chunks * C) * 1e3:.1f} ms/frame "
        f"({n_chunks * C / total:.1f} fps)")
    uploader.shutdown(wait=True)

    # ---- A/B: the production System.run_sequence drive on the NEXT span
    # of frames, same System instance (isolates run_sequence overhead from
    # rig drift / fresh-client effects)
    class _Tail:
        def __init__(self, base, start, n):
            self.base, self.start, self.n = base, start, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return self.base[self.start + i]

    start2 = start + n_chunks * C
    nt2 = min(n_frames, len(pds) - start2)
    t0 = time.perf_counter()
    sysm.run_sequence(_Tail(pds, start2, nt2))
    dt = time.perf_counter() - t0
    log(f"run_sequence: {dt:.2f}s for {nt2} frames = "
        f"{dt / nt2 * 1e3:.1f} ms/frame ({nt2 / dt:.1f} fps)")


if __name__ == "__main__":
    n = 48
    if "--frames" in sys.argv:
        n = int(sys.argv[sys.argv.index("--frames") + 1])
    main(n)
