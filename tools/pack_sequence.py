#!/usr/bin/env python
"""Offline sequence packer: reference-layout directory -> packed dataset.

The reference already precomputes flow/masks offline (README.md:118); this
tool takes that one step further for TPU serving: it converts a sequence
directory (example/vdo_slam.cc:150-450 layout) into the device wire format
(io/packing.py) so the tracking loop's per-frame host work drops to a memmap
read + upload (io/packed_dataset.py).

Usage:
  python tools/pack_sequence.py <seq_dir> <out_dir> \
      [--depth-map-factor 256] [--full-res-flow] [--frames N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vdo_slam_tpu.io.dataset import SequenceDataset  # noqa: E402
from vdo_slam_tpu.io.packed_dataset import pack_dataset  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("seq_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--depth-map-factor", type=float, default=256.0,
                    help="DepthMapFactor from the run's settings yaml")
    ap.add_argument("--full-res-flow", action="store_true",
                    help="pack full-resolution flow (8 B/px wire) instead "
                         "of the half-res 5 B/px wire")
    ap.add_argument("--flow-delta", action="store_true",
                    help="row-delta entropy-code the fp16 flow planes "
                         "(lossless; ~2x fewer post-compression bytes on a "
                         "compressing link — matches tpu_fast's "
                         "wire_flow_delta; run config must match)")
    ap.add_argument("--depth-down", type=int, default=1, choices=(1, 2),
                    help="depth plane downsample (2 = half-res inverse-"
                         "depth wire; run config wire_depth_down must "
                         "match)")
    ap.add_argument("--depth-resid", type=int, default=0,
                    help="with --depth-down 2: carry the N worst-"
                         "reconstructed pixels as bit-exact corrections "
                         "(matches wire_depth_resid)")
    ap.add_argument("--frames", type=int, default=None)
    args = ap.parse_args(argv)

    ds = SequenceDataset(args.seq_dir)
    out = pack_dataset(ds, args.out_dir,
                       depth_map_factor=args.depth_map_factor,
                       flow_half=not args.full_res_flow, n=args.frames,
                       flow_delta=args.flow_delta,
                       depth_down=args.depth_down,
                       depth_resid=args.depth_resid)
    print(f"packed {args.frames or len(ds)} frames -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
