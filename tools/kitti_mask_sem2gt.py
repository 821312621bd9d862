#!/usr/bin/env python
"""Offline mask-label alignment tool.

Equivalent of the reference's tools/kitti_mask_sem2gt.cpp: instance masks
from a segmenter (e.g. Mask R-CNN) carry arbitrary per-frame ids; this tool
relabels each mask instance with the KITTI ground-truth object id whose 2D
box overlaps it the most, producing the semantic/%06d.txt files the pipeline
consumes.

Usage:
  python tools/kitti_mask_sem2gt.py <mask_dir> <object_pose.txt> <out_dir> \
      [--min-overlap 0.3]

Mask input format: either the reference's .mask text format (header line
"h w n", n category rows, then an h*w int matrix) or plain int-matrix .txt.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def read_mask_file(path: Path) -> np.ndarray:
    """Reads .mask (header + categories + matrix) or plain .txt matrices."""
    tokens = path.read_text().split()
    if path.suffix == ".mask":
        h, w, n = int(tokens[0]), int(tokens[1]), int(tokens[2])
        # skip n category descriptor rows (2 tokens each: id, category)
        body = tokens[3 + 2 * n:]
        return np.asarray(body[: h * w], dtype=np.int64).reshape(h, w)
    mat = np.asarray(tokens, dtype=np.int64)
    # plain matrix: infer shape from line count
    n_rows = len(path.read_text().splitlines())
    return mat.reshape(n_rows, -1)


def load_gt_boxes(pose_file: Path):
    """object_pose.txt rows -> {frame: [(obj_id, x1, y1, x2, y2), ...]}."""
    out: dict[int, list] = {}
    for line in pose_file.read_text().splitlines():
        v = [float(x) for x in line.split()]
        if len(v) < 6:
            continue
        out.setdefault(int(v[0]), []).append(
            (int(v[1]), v[2], v[3], v[4], v[5])
        )
    return out


def relabel(mask: np.ndarray, boxes: list, min_overlap: float) -> np.ndarray:
    """Majority-overlap vote of each instance against GT boxes
    (kitti_mask_sem2gt.cpp's overlap-vote relabeling)."""
    out = np.zeros_like(mask)
    for inst in np.unique(mask):
        if inst <= 0:
            continue
        sel = mask == inst
        area = sel.sum()
        ys, xs = np.nonzero(sel)
        best_id, best_frac = 0, 0.0
        for (obj_id, x1, y1, x2, y2) in boxes:
            inside = ((xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)).sum()
            frac = inside / max(area, 1)
            if frac > best_frac:
                best_frac, best_id = frac, obj_id
        if best_frac >= min_overlap:
            out[sel] = best_id
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mask_dir")
    ap.add_argument("object_pose")
    ap.add_argument("out_dir")
    ap.add_argument("--min-overlap", type=float, default=0.3)
    args = ap.parse_args(argv)

    mask_dir = Path(args.mask_dir)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    boxes = load_gt_boxes(Path(args.object_pose))

    files = sorted(list(mask_dir.glob("*.mask")) + list(mask_dir.glob("*.txt")))
    for f in files:
        frame = int(f.stem)
        mask = read_mask_file(f)
        aligned = relabel(mask, boxes.get(frame, []), args.min_overlap)
        np.savetxt(out_dir / f"{frame:06d}.txt", aligned, fmt="%d")
    print(f"aligned {len(files)} frames -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
