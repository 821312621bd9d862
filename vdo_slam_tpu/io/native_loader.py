"""ctypes bindings for the native (C++) sequence loader.

Builds native/loader.cpp on demand (g++ -O3 -shared, libpng+zlib) and exposes
NativeSequenceDataset — a drop-in replacement for io.dataset.SequenceDataset
with decode in native code and a background prefetch thread, replacing the
reference demo driver's synchronous cv::imread loop (example/vdo_slam.cc:
98-141).  Falls back gracefully (build_native_loader returns None) when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .dataset import FrameData, SequenceDataset

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "loader.cpp"
_LIB = _REPO_ROOT / "native" / "libvdoloader.so"


def build_native_loader(force: bool = False):
    """Compile (if needed) and load the native library; None on failure."""
    try:
        if force or not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                str(_SRC), "-o", str(_LIB), "-lpng", "-lz", "-lpthread",
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB))
    except Exception:
        return None

    lib.vdo_png_info.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int)] * 4
    lib.vdo_png_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_long]
    lib.vdo_flo_info.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.vdo_flo_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_long]
    lib.vdo_mask_read.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_long]
    lib.vdo_seq_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int]
    lib.vdo_seq_open.restype = ctypes.c_void_p
    lib.vdo_seq_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vdo_seq_close.argtypes = [ctypes.c_void_p]
    return lib


def read_png_native(lib, path: str) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.vdo_png_info(path.encode(), w, h, c, bd) != 0:
        raise IOError(f"png read failed: {path}")
    out = np.empty(h.value * w.value * c.value, np.float32)
    got = lib.vdo_png_read(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           out.size)
    if got < 0:
        raise IOError(f"png read failed: {path}")
    img = out.reshape(h.value, w.value, c.value)
    return img[..., 0] if c.value == 1 else img


class NativeSequenceDataset(SequenceDataset):
    """SequenceDataset with native decode + double-buffered prefetch."""

    def __init__(self, seq_dir: str | Path):
        super().__init__(seq_dir)
        self._lib = build_native_loader()
        if self._lib is None:
            raise RuntimeError("native loader unavailable (no toolchain?)")
        # probe geometry from frame 0 rgb
        probe = read_png_native(self._lib, str(self.dir / "image_0" / "000000.png"))
        self._H, self._W = probe.shape[:2]
        self._handle = self._lib.vdo_seq_open(
            str(self.dir).encode(), len(self.timestamps), self._H, self._W
        )

    def __getitem__(self, i: int) -> FrameData:
        H, W = self._H, self._W
        rgb = np.empty((H, W), np.float32)
        depth = np.empty((H, W), np.float32)
        flow = np.empty((H, W, 2), np.float32)
        mask = np.empty((H, W), np.int32)
        rc = self._lib.vdo_seq_get(
            self._handle, i,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            flow.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise IOError(f"native frame load failed at {i} (rc={rc})")
        return FrameData(
            rgb=rgb, depth_raw=depth, flow=flow, mask=mask,
            pose_gt_raw=self.poses_gt[i],
            obj_gt_rows=self.obj_by_frame[i],
            timestamp=self.timestamps[i],
        )

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.vdo_seq_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
