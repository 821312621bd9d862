"""Decompose the fused tracking loop's wall time on the real device.

Measures, on the bench scene and bench config (same shapes/executables, so
the axon server's HLO cache is shared with bench.py):

  upload_ms_frame  — device_put of real packed chunks, blocked, per frame
  device_ms_frame  — step_chunk on pre-staged inputs, never syncing until
                     the end (the loop's pure-compute rate)
  loop_ms_frame    — the production run_sequence drive (threaded uploads,
                     batched async drains, window BA on)

The gap loop - max(upload, device) is tunnel round-trip scheduling.
Run on an otherwise-idle host (CLAUDE.md: 1 core; concurrent work skews
every number).  Usage:  python tools/probe_loop.py [--frames 48]
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
    log(f"wire: {pds[0].packed.nbytes / 1e6:.2f} MB/frame")

    sysm = System(cfg, enable_local_ba=False, mode="fused")
    tr = sysm.tracker
    C = tr.chunk

    # warm the chunk executable
    t0 = time.perf_counter()
    sysm.run_sequence(pds, max_frames=2 * C)
    tr.flush()
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    # ---- upload: blocked device_put of real packed chunks
    reps = max(1, (n_frames // C))
    chunks = [[pds[(i * C + c) % len(pds)] for c in range(C)]
              for i in range(reps)]
    t0 = time.perf_counter()
    for ch in chunks:
        staged = tr.device_inputs_chunk(ch)
        jax.block_until_ready(staged["packed"])
    # force a real sync (block_until_ready is unreliable on axon)
    float(jax.device_get(staged["packed"][0, 0]))
    up = (time.perf_counter() - t0) / (reps * C) * 1e3
    log(f"upload: {up:.1f} ms/frame  ({reps * C} frames)")

    # ---- device: never-sync chunk steps on two pre-staged inputs
    s0 = tr.device_inputs_chunk(chunks[0])
    s1 = tr.device_inputs_chunk(chunks[1 % len(chunks)])
    for s in (s0, s1):
        s.pop("_T_cw_gt_host")
    keys = tr._keys.take(range(0, C), axis=0, mode="wrap")
    state = tr.state
    # one unmeasured step to absorb dispatch warmup
    state, vec = tr.step_chunk(state, s0, keys)
    float(jax.device_get(vec[0, 0]))
    t0 = time.perf_counter()
    for i in range(reps):
        state, vec = tr.step_chunk(state, s0 if i % 2 == 0 else s1, keys)
    float(jax.device_get(vec[0, 0]))
    dev = (time.perf_counter() - t0) / (reps * C) * 1e3
    log(f"device: {dev:.1f} ms/frame  ({reps} chunks, chunk={C})")

    # ---- production loop (fresh system), window BA off then on
    class _Tail:
        def __init__(self, base, start, n):
            self.base, self.start, self.n = base, start, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return self.base[self.start + i]

    for ba in (False, True):
        sysm2 = System(cfg, enable_local_ba=ba, mode="fused")
        sysm2.run_sequence(pds, max_frames=2 * C)   # warm (cached programs)
        sysm2.tracker.flush()
        nt = min(n_frames, len(pds) - 2 * C)
        t0 = time.perf_counter()
        sysm2.run_sequence(_Tail(pds, 2 * C, nt))
        loop = (time.perf_counter() - t0) / nt * 1e3
        log(f"loop:   {loop:.1f} ms/frame  ({nt} frames, window BA "
            f"{'on' if ba else 'off'}) = {1e3 / loop:.1f} fps")
        log(f"gap (loop - max(upload, device)): "
            f"{loop - max(up, dev):.1f} ms/frame")


if __name__ == "__main__":
    n = 48
    if "--frames" in sys.argv:
        n = int(sys.argv[sys.argv.index("--frames") + 1])
    main(n)
