"""Pre-packed dataset ingest (io/packed_dataset.py + tools/pack_sequence.py).

The wire format as an on-disk dataset must be bit-identical to packing at
runtime: same bytes uploaded -> same pipeline outputs.
"""

import dataclasses

import numpy as np
import pytest

from vdo_slam_tpu.config import KITTI
from vdo_slam_tpu.io.dataset import SyntheticDataset
from vdo_slam_tpu.io.packed_dataset import (InMemoryPackedDataset,
                                            PackedDataset, pack_dataset)
from vdo_slam_tpu.io.packing import depth_wire_scale, pack_frame
from vdo_slam_tpu.io.synthetic import make_scene
from vdo_slam_tpu.pipeline import System

from tests.test_pipeline_e2e import small_config


@pytest.fixture(scope="module")
def raw_ds():
    scene = make_scene(num_frames=6, width=320, height=240, num_objects=2,
                       seed=3)
    return scene, SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)


def test_roundtrip_bits_and_gt(raw_ds, tmp_path):
    scene, ds = raw_ds
    out = pack_dataset(ds, tmp_path / "packed", depth_map_factor=1.0,
                       flow_half=True)
    pk = PackedDataset(out)
    assert len(pk) == len(ds)
    dscale = depth_wire_scale(1.0)
    for i in (0, 2, len(ds) - 1):
        fd = ds[i]
        want = pack_frame(fd.rgb, fd.depth_raw, fd.flow, fd.mask,
                          depth_scale=dscale, flow_half=True).ravel()
        got = pk[i]
        np.testing.assert_array_equal(np.asarray(got.packed), want)
        np.testing.assert_array_equal(got.pose_gt_raw,
                                      np.asarray(fd.pose_gt_raw, np.float32))
        np.testing.assert_array_equal(
            got.obj_gt_rows,
            np.asarray(fd.obj_gt_rows, np.float32).reshape(-1, 10))
        assert got.timestamp == pytest.approx(fd.timestamp)


def test_config_mismatch_rejected(raw_ds, tmp_path):
    _, ds = raw_ds
    out = pack_dataset(ds, tmp_path / "packed", depth_map_factor=1.0,
                       flow_half=True)
    pk = PackedDataset(out)
    cfg = small_config(ds.scene)
    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, wire_flow_half=True))
    pk.check_config(cfg)  # matches
    bad = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, wire_flow_half=False))
    with pytest.raises(ValueError):
        pk.check_config(bad)
    bad2 = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, depth_map_factor=256.0))
    with pytest.raises(ValueError):
        pk.check_config(bad2)


def test_fused_pipeline_identical_on_packed(raw_ds, tmp_path):
    """Same bytes on the wire -> bit-identical fused-pipeline trajectory."""
    scene, ds = raw_ds
    cfg = small_config(scene, wire_flow_half=True, fused_chunk=2)

    sys_raw = System(cfg, enable_local_ba=False, enable_global_ba=False,
                     mode="fused")
    sys_raw.run_sequence(ds)

    pk = PackedDataset(pack_dataset(ds, tmp_path / "packed",
                                    depth_map_factor=1.0, flow_half=True))
    pk.check_config(cfg)
    sys_pk = System(cfg, enable_local_ba=False, enable_global_ba=False,
                    mode="fused")
    sys_pk.run_sequence(pk)

    assert sys_raw.map.num_frames == sys_pk.map.num_frames
    for a, b in zip(sys_raw.map.cam_pose, sys_pk.map.cam_pose):
        np.testing.assert_array_equal(a, b)
    ma, mb = sys_raw.metrics(), sys_pk.metrics()
    assert ma == mb


def test_in_memory_packed_matches_disk(raw_ds, tmp_path):
    _, ds = raw_ds
    mem = InMemoryPackedDataset(ds, depth_map_factor=1.0, flow_half=True)
    disk = PackedDataset(pack_dataset(ds, tmp_path / "p",
                                      depth_map_factor=1.0, flow_half=True))
    for i in range(len(ds)):
        np.testing.assert_array_equal(np.asarray(mem[i].packed).ravel(),
                                      np.asarray(disk[i].packed))


def test_flow_delta_pack_versioned_and_identical(raw_ds, tmp_path):
    """A flow_delta pack is stamped version 3, check_config enforces the
    encoding match both ways, and the fused pipeline on the delta pack is
    bit-identical to the plain-pack run (the coding is lossless)."""
    scene, ds = raw_ds
    cfg = small_config(scene, wire_flow_half=True, fused_chunk=2)
    cfg_delta = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, wire_flow_delta=True))

    plain = PackedDataset(pack_dataset(ds, tmp_path / "plain",
                                       depth_map_factor=1.0, flow_half=True))
    delta = PackedDataset(pack_dataset(ds, tmp_path / "delta",
                                       depth_map_factor=1.0, flow_half=True,
                                       flow_delta=True))
    assert delta.meta["version"] == 3 and delta.meta["flow_delta"] is True
    delta.check_config(cfg_delta)
    with pytest.raises(ValueError):
        delta.check_config(cfg)            # plain config on a delta pack
    with pytest.raises(ValueError):
        plain.check_config(cfg_delta)      # delta config on a plain pack

    sys_plain = System(cfg, enable_local_ba=False, enable_global_ba=False,
                       mode="fused")
    sys_plain.run_sequence(plain)
    sys_delta = System(cfg_delta, enable_local_ba=False,
                       enable_global_ba=False, mode="fused")
    sys_delta.run_sequence(delta)
    assert sys_plain.map.num_frames == sys_delta.map.num_frames
    for a, b in zip(sys_plain.map.cam_pose, sys_delta.map.cam_pose):
        np.testing.assert_array_equal(a, b)
    assert sys_plain.metrics() == sys_delta.metrics()


def test_pack_sequence_cli(raw_ds, tmp_path):
    """tools/pack_sequence.py over a reference-layout directory on disk."""
    from vdo_slam_tpu.io.sequence_writer import write_reference_sequence

    scene, ds = raw_ds
    seq_dir = tmp_path / "seq"
    write_reference_sequence(scene, seq_dir, depth_map_factor=256.0, bf=40.0)

    import tools.pack_sequence as cli

    rc = cli.main([str(seq_dir), str(tmp_path / "packed"),
                   "--depth-map-factor", "256.0", "--frames", "3"])
    assert rc == 0
    pk = PackedDataset(tmp_path / "packed")
    assert len(pk) == 3
    assert pk.meta["flow_half"] is True
