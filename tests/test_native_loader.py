"""Native C++ loader tests: build, decode parity with the python readers,
prefetching sequence iteration over a reference-layout directory."""

import numpy as np
import pytest

from vdo_slam_tpu.io.flo import write_flo
from vdo_slam_tpu.io.native_loader import build_native_loader, read_png_native
from vdo_slam_tpu.io.synthetic import make_scene


@pytest.fixture(scope="module")
def lib():
    lib = build_native_loader()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    """Write a reference-layout sequence from a synthetic scene."""
    from PIL import Image

    root = tmp_path_factory.mktemp("seq")
    scene = make_scene(num_frames=3, width=96, height=64, num_objects=1)
    for sub in ["image_0", "depth", "semantic", "flow"]:
        (root / sub).mkdir()
    times = []
    pose_lines = []
    for i in range(3):
        name = f"{i:06d}"
        Image.fromarray(
            (scene.rgb[i] * 255).astype(np.uint8)
        ).save(root / "image_0" / f"{name}.png")
        Image.fromarray(
            (scene.depth[i] * 100).astype(np.uint16)
        ).save(root / "depth" / f"{name}.png")
        np.savetxt(root / "semantic" / f"{name}.txt", scene.mask[i], fmt="%d")
        write_flo(root / "flow" / f"{name}.flo", scene.flow[i])
        times.append(f"{0.1 * i:.6f}")
        T = scene.T_wc_gt[i]
        pose_lines.append(
            str(i) + " " + " ".join(f"{v:.9f}" for v in T.reshape(-1))
        )
    (root / "times.txt").write_text("\n".join(times) + "\n")
    (root / "pose_gt.txt").write_text("\n".join(pose_lines) + "\n")
    (root / "object_pose.txt").write_text("")
    return root, scene


class TestNativeDecode:
    def test_png_gray8(self, lib, seq_dir):
        root, scene = seq_dir
        img = read_png_native(lib, str(root / "image_0" / "000000.png"))
        ref = (scene.rgb[0] * 255).astype(np.uint8).astype(np.float32)
        np.testing.assert_allclose(img, ref, atol=0)

    def test_png_gray16(self, lib, seq_dir):
        root, scene = seq_dir
        img = read_png_native(lib, str(root / "depth" / "000000.png"))
        ref = (scene.depth[0] * 100).astype(np.uint16).astype(np.float32)
        np.testing.assert_allclose(img, ref, atol=0)

    def test_sequence_prefetch_matches_python_reader(self, lib, seq_dir):
        from vdo_slam_tpu.io.dataset import SequenceDataset
        from vdo_slam_tpu.io.native_loader import NativeSequenceDataset

        root, _ = seq_dir
        nat = NativeSequenceDataset(root)
        py = SequenceDataset(root)
        for i in range(2):
            a = nat[i]
            b = py[i]
            np.testing.assert_allclose(a.rgb, b.rgb, atol=2e-3)
            np.testing.assert_allclose(a.depth_raw, b.depth_raw, atol=0)
            np.testing.assert_allclose(a.flow, b.flow, atol=0)
            np.testing.assert_array_equal(a.mask, b.mask)
        # out-of-order access still works (prefetch resync)
        a0 = nat[0]
        b0 = py[0]
        np.testing.assert_allclose(a0.depth_raw, b0.depth_raw, atol=0)
        nat.close()
