"""Tools (mask alignment) + shipped configs + OMD parsing path."""

import numpy as np
import pytest


class TestMaskAlignTool:
    def test_relabel_by_overlap(self, tmp_path):
        import sys

        sys.path.insert(0, "tools")
        from kitti_mask_sem2gt import main, relabel

        mask = np.zeros((40, 60), np.int64)
        mask[5:15, 5:20] = 7      # instance 7 inside GT box of object 3
        mask[25:35, 30:50] = 9    # instance 9 inside GT box of object 5
        boxes = [(3, 4, 4, 22, 16), (5, 28, 24, 52, 36)]
        out = relabel(mask, boxes, 0.3)
        assert set(np.unique(out)) == {0, 3, 5}
        assert (out[5:15, 5:20] == 3).all()
        assert (out[25:35, 30:50] == 5).all()

        # end-to-end through files
        md = tmp_path / "masks"
        md.mkdir()
        np.savetxt(md / "000000.txt", mask, fmt="%d")
        pose = tmp_path / "object_pose.txt"
        pose.write_text(
            "0 3 4 4 22 16 0 0 10 0\n0 5 28 24 52 36 0 0 12 0\n"
        )
        outd = tmp_path / "sem"
        rc = main([str(md), str(pose), str(outd)])
        assert rc == 0
        got = np.loadtxt(outd / "000000.txt", dtype=np.int64)
        assert set(np.unique(got)) == {0, 3, 5}

    def test_mask_format_with_header(self, tmp_path):
        import sys

        sys.path.insert(0, "tools")
        from kitti_mask_sem2gt import read_mask_file

        p = tmp_path / "000000.mask"
        # header: h w n, then n category rows (id, name), then matrix
        p.write_text("2 3 1\n1 car\n0 1 1\n0 0 1\n")
        m = read_mask_file(p)
        assert m.shape == (2, 3)
        assert m[0, 1] == 1 and m[1, 2] == 1


class TestCubeSegmentationTool:
    """tools/cube_segmentation.py — OMD preprocessing (cube_segmentation.m)."""

    def _scene(self):
        # dark background, two saturated color cubes big enough to survive
        # the min-size filter after erode(9)/dilate(38)
        rgb = np.full((300, 400, 3), 20, np.uint8)
        rgb[30:180, 40:190] = (200, 30, 30)    # red cube, 150x150
        rgb[120:280, 230:390] = (30, 60, 210)  # blue cube, 160x160
        return rgb

    def test_segments_two_cubes(self):
        import sys

        sys.path.insert(0, "tools")
        from cube_segmentation import segment_cubes

        labels = segment_cubes(self._scene())
        ids = sorted(set(np.unique(labels)) - {0})
        assert ids == [1, 2]
        # label centers should land inside the painted cubes
        for lo_y, hi_y, lo_x, hi_x in [(30, 180, 40, 190), (120, 280, 230, 390)]:
            patch = labels[lo_y + 40:hi_y - 40, lo_x + 40:hi_x - 40]
            vals = np.unique(patch)
            assert len(vals) == 1 and vals[0] > 0

    def test_min_size_filter_drops_specks(self):
        import sys

        sys.path.insert(0, "tools")
        from cube_segmentation import segment_cubes

        rgb = np.full((300, 400, 3), 20, np.uint8)
        rgb[10:40, 10:40] = (200, 30, 30)  # 30x30 speck << 10000 px
        labels = segment_cubes(rgb)
        assert (labels == 0).all()

    def test_morphology_matches_definitions(self):
        import sys

        sys.path.insert(0, "tools")
        from cube_segmentation import dilate, erode

        m = np.zeros((20, 20), bool)
        m[5:12, 5:12] = True
        er = erode(m, 3)
        assert er.sum() == 5 * 5 and er[6:11, 6:11].all()
        di = dilate(er, 3)
        assert (di == m).all()


class TestShippedConfigs:
    @pytest.mark.parametrize("name,fx,dataset", [
        ("kitti.yaml", 721.5377, 2),
        ("kitti-0018-0020.yaml", 718.8560, 2),
        ("omd.yaml", 618.3587036132812, 1),
    ])
    def test_load(self, name, fx, dataset):
        from vdo_slam_tpu.config import load_settings

        cfg = load_settings(f"configs/{name}")
        assert cfg.camera.fx == pytest.approx(fx)
        assert cfg.tracking.dataset == dataset
        assert cfg.tracking.window_size == 20

    def test_omd_uses_sampled_features(self):
        from vdo_slam_tpu.config import load_settings

        cfg = load_settings("configs/omd.yaml")
        assert cfg.frontend.use_sample_feature is True
        assert cfg.tracking.sf_mg_thres == pytest.approx(0.02)


class TestOMDParsing:
    def test_obj_pose_parsing_ox_axis_angle(self):
        from vdo_slam_tpu.pipeline.tracking import obj_pose_parsing_ox

        # axis-angle rotation of 90deg about z, translation (1,2,3),
        # identity origin
        row = np.asarray([0, 1, 1.0, 2.0, 3.0, 0.0, 0.0, np.pi / 2, 0, 0],
                         np.float32)
        T = obj_pose_parsing_ox(row, np.eye(4, dtype=np.float32))
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(
            T[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )

    def test_obj_pose_parsing_kt_yaw(self):
        from vdo_slam_tpu.pipeline.tracking import obj_pose_parsing_kt

        # yaw = -pi/2 so R = Ry(0) = I after the +pi/2 shift
        row = np.asarray([0, 1, 0, 0, 0, 0, 4.0, 5.0, 6.0, -np.pi / 2],
                         np.float32)
        T = obj_pose_parsing_kt(row)
        np.testing.assert_allclose(T[:3, 3], [4, 5, 6], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
