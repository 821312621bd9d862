import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdo_slam_tpu.io.synthetic import make_scene
from vdo_slam_tpu.ops import fast, frontend, image, select


class TestSelect:
    def test_masked_top_k(self):
        score = jnp.array([5.0, 1.0, 9.0, 3.0, 7.0])
        valid = jnp.array([True, True, False, True, True])
        idx, ok = jax.jit(select.masked_top_k, static_argnums=2)(score, valid, 3)
        assert list(np.asarray(idx)) == [4, 0, 3]
        assert all(np.asarray(ok))

    def test_masked_top_k_underfull(self):
        score = jnp.array([1.0, 2.0])
        valid = jnp.array([False, True])
        idx, ok = select.masked_top_k(score, valid, 4)
        assert list(np.asarray(ok)) == [True, False, False, False]

    def test_compact(self):
        valid = jnp.array([False, True, False, True, True])
        perm, n = select.compact(valid)
        assert int(n) == 3
        assert list(np.asarray(valid)[np.asarray(perm)][:3]) == [True] * 3

    def test_per_label_rank(self):
        labels = jnp.array([2, 1, 2, 2, 1, 3])
        valid = jnp.ones(6, bool)
        r = select.per_label_rank(labels, valid)
        assert list(np.asarray(r)) == [0, 0, 1, 2, 1, 0]

    def test_quota_select(self):
        labels = jnp.array([1, 1, 1, 2, 2, 3])
        valid = jnp.ones(6, bool)
        pri = jnp.array([0.1, 0.9, 0.5, 0.3, 0.7, 0.2])
        idx, ok = select.quota_select(labels, valid, pri, quota=2, k=6)
        chosen = set(np.asarray(idx)[np.asarray(ok)].tolist())
        # label 1 keeps its top-2 priorities (idx 1, 2), label 2 both, label 3 one
        assert chosen == {1, 2, 3, 4, 5}

    def test_min_dist_to_set(self):
        pts = jnp.array([[0.0, 0.0], [5.0, 0.0]])
        ref = jnp.array([[1.0, 0.0], [100.0, 100.0]])
        rv = jnp.array([True, True])
        d = select.min_dist_to_set(pts, ref, rv)
        np.testing.assert_allclose(np.asarray(d), [1.0, 4.0], atol=1e-5)


class TestImageOps:
    def test_preprocess_depth_kitti(self):
        from vdo_slam_tpu.config import KITTI

        raw = jnp.array([[256.0, 0.0, -3.0]])
        d = image.preprocess_depth(raw, KITTI, bf=387.5744, depth_map_factor=256.0)
        np.testing.assert_allclose(float(d[0, 0]), 387.5744, rtol=1e-5)
        assert float(d[0, 1]) == 0.0 and float(d[0, 2]) == 0.0

    def test_gather_int_truncation_and_bounds(self):
        img = jnp.arange(12.0).reshape(3, 4)
        uv = jnp.array([[1.9, 0.9], [3.0, 2.0], [-1.0, 0.0], [4.0, 0.0]])
        out = image.gather_int(img, uv, fill=-7.0)
        assert float(out[0]) == 1.0  # truncated to (1, 0)
        assert float(out[1]) == 11.0
        assert float(out[2]) == -7.0 and float(out[3]) == -7.0

    def test_gather_bilinear(self):
        img = jnp.array([[0.0, 1.0], [2.0, 3.0]])
        out = image.gather_bilinear(img, jnp.array([[0.5, 0.5]]))
        np.testing.assert_allclose(float(out[0]), 1.5, atol=1e-6)


class TestFAST:
    def _corner_image(self):
        img = np.zeros((64, 64), np.float32)
        img[20:44, 20:44] = 1.0  # bright square: 4 corners
        return jnp.asarray(img)

    def test_detects_square_corners(self):
        img = self._corner_image()
        score = fast.fast_score(img, 0.3)
        nms = fast.nms3(score)
        ys, xs = np.nonzero(np.asarray(nms))
        pts = set(zip(ys.tolist(), xs.tolist()))
        # all four square corners present (within 2px)
        for cy, cx in [(20, 20), (20, 43), (43, 20), (43, 43)]:
            assert any(abs(y - cy) <= 2 and abs(x - cx) <= 2 for y, x in pts), (cy, cx)

    def test_flat_image_no_corners(self):
        img = jnp.ones((64, 64)) * 0.5
        assert float(fast.fast_score(img, 0.05).max()) == 0.0

    def test_pyramid_shapes_and_validity(self):
        scene = make_scene(num_frames=2, width=160, height=120, num_objects=1)
        out = fast.detect_pyramid(
            jnp.asarray(scene.rgb[0]), n_features=300, n_levels=3
        )
        assert out["xy"].shape[0] == out["score"].shape[0] == out["valid"].shape[0]
        assert int(out["valid"].sum()) > 50  # textured scene has corners
        xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
        assert xy[:, 0].max() < 160 and xy[:, 1].max() < 120

    def test_grid_sample(self):
        xy, valid = fast.grid_sample_keypoints(jax.random.PRNGKey(0), 120, 160, n=500)
        assert xy.shape == (500, 2)
        ok = np.asarray(xy)[np.asarray(valid)]
        assert (ok[:, 0] < 160).all() and (ok[:, 1] < 120).all()


class TestFrontend:
    def setup_method(self):
        self.scene = make_scene(num_frames=3, width=160, height=120, num_objects=2)

    def test_static_candidates_avoid_objects(self):
        s = self.scene
        det = fast.detect_pyramid(jnp.asarray(s.rgb[0]), n_features=400, n_levels=2)
        out = frontend.static_candidates(
            det["xy"], det["valid"], det["score"],
            jnp.asarray(s.depth[0]), jnp.asarray(s.flow[0]),
            jnp.asarray(s.mask[0]), th_depth=40.0, k=300,
        )
        v = np.asarray(out["valid"])
        assert v.sum() > 30
        labels = np.asarray(
            image.gather_int(jnp.asarray(s.mask[0]), out["xy"])
        )[v]
        assert (labels == 0).all()
        d = np.asarray(out["depth"])[v]
        assert (d > 0).all() and (d <= 40.0).all()

    def test_object_candidates_cover_objects(self):
        s = self.scene
        out = frontend.object_candidates(
            jnp.asarray(s.depth[0]), jnp.asarray(s.flow[0]),
            jnp.asarray(s.mask[0]), th_depth_obj=25.0, step=4, k=1024,
            quota=400, prng_key=jax.random.PRNGKey(0),
        )
        v = np.asarray(out["valid"])
        labs = np.asarray(out["sem_label"])[v]
        assert set(labs.tolist()) <= {1, 2}
        assert (labs > 0).all()
        assert v.sum() > 50

    def test_scene_flow_static_object_is_zero(self):
        # static world points seen from two GT poses -> zero scene flow
        s = self.scene
        from vdo_slam_tpu.geometry import se3

        K = jnp.asarray([s.K_mat[0, 0], s.K_mat[1, 1], s.K_mat[0, 2], s.K_mat[1, 2]])
        T0 = jnp.asarray(s.T_wc_gt[0])
        T1 = jnp.asarray(s.T_wc_gt[1])
        # pick a background pixel with valid flow in frame 0
        ys, xs = np.nonzero((s.mask[0] == 0) & (s.depth[0] > 1))
        i = len(ys) // 2
        uv0 = jnp.asarray([[float(xs[i]), float(ys[i])]])
        z0 = jnp.asarray([float(s.depth[0, ys[i], xs[i]])])
        f = s.flow[0, ys[i], xs[i]]
        uv1 = uv0 + jnp.asarray(f)
        z1 = image.gather_int(jnp.asarray(s.depth[1]), uv1)
        sf, _ = frontend.scene_flow_world(
            uv0, z0, se3.inv(T0), uv1, z1, se3.inv(T1), K
        )
        assert float(jnp.linalg.norm(sf)) < 0.25  # int-gather quantization noise

    def test_per_label_stats(self):
        slots = jnp.array([0, 0, 1, -1, 1, 0])
        valid = jnp.array([True, True, True, True, False, True])
        xy = jnp.array([[5.0, 5.0], [100, 100], [10, 10], [0, 0], [1, 1], [150, 110]])
        depth = jnp.ones(6) * 10.0
        sf = jnp.zeros((6, 3)).at[0, 0].set(5.0)
        st = frontend.per_label_stats(
            slots, valid, xy, depth, sf, width=160, height=120, n_slots=2,
            sf_mg_thres=0.12, shrink_row=25, shrink_col=50,
        )
        np.testing.assert_allclose(np.asarray(st["count"]), [3.0, 1.0])
        # slot0: pts (5,5) boundary, (100,100) boundary (v>95), (150,110) boundary
        assert float(st["sf_small"][0]) == 2.0  # one point has big sf
        np.testing.assert_allclose(float(st["depth_sum"][1]), 10.0)

    def test_mask_propagation_recovers_lost_mask(self):
        s = self.scene
        seg_last = jnp.asarray(s.mask[0])
        flow_last = jnp.asarray(s.flow[0])
        # simulate segmenter failure: label 1 missing in current frame
        seg_cur_broken = jnp.where(jnp.asarray(s.mask[1]) == 1, 0, jnp.asarray(s.mask[1]))
        # last-frame object features of label 1
        oc = frontend.object_candidates(
            jnp.asarray(s.depth[0]), flow_last, seg_last,
            th_depth_obj=25.0, step=4, k=1024, quota=600,
            prng_key=jax.random.PRNGKey(0),
        )
        table = jnp.asarray([1, 2, 0, 0], jnp.int32)
        fixed, lost = frontend.propagate_mask(
            seg_cur_broken, seg_last, flow_last, oc["corres"],
            oc["sem_label"], oc["valid"], table, min_points=50,
        )
        lost = np.asarray(lost)
        assert lost[0] and not lost[1]
        # recovered mask overlaps the true current mask of label 1
        true1 = np.asarray(s.mask[1]) == 1
        rec1 = np.asarray(fixed) == 1
        inter = (true1 & rec1).sum()
        assert inter > 0.5 * true1.sum()


class TestPallasFAST:
    def test_matches_jnp_reference(self):
        from vdo_slam_tpu.ops.fast_pallas import fast_score_pair_pallas

        rng = np.random.default_rng(0)
        img = (rng.random((120, 200)) > 0.5).astype(np.float32)
        gi = jnp.asarray(img)
        ref_i = fast.fast_score(gi, 20 / 255.0)
        ref_m = fast.fast_score(gi, 7 / 255.0)
        pi, pm = fast_score_pair_pallas(gi, 20 / 255.0, 7 / 255.0,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(pi), np.asarray(ref_i), atol=0)
        np.testing.assert_allclose(np.asarray(pm), np.asarray(ref_m), atol=0)

    def test_non_aligned_shapes(self):
        from vdo_slam_tpu.ops.fast_pallas import fast_score_pair_pallas

        rng = np.random.default_rng(1)
        img = (rng.random((97, 131)) > 0.5).astype(np.float32)
        gi = jnp.asarray(img)
        ref = fast.fast_score(gi, 15 / 255.0)
        pi, _ = fast_score_pair_pallas(gi, 15 / 255.0, 7 / 255.0,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(pi), np.asarray(ref), atol=0)

    def test_vmap_matches_per_image(self):
        """vmap routes to the (batch, band)-grid kernel (the multi-stream
        SPMD path); results must equal per-image calls bit-exactly."""
        from vdo_slam_tpu.ops.fast_pallas import fast_score_pair_pallas

        rng = np.random.default_rng(2)
        imgs = (rng.random((3, 64, 150)) > 0.5).astype(np.float32)
        gb = jnp.asarray(imgs)
        bi, bm = jax.vmap(
            lambda g: fast_score_pair_pallas(g, 20 / 255.0, 7 / 255.0,
                                             interpret=True)
        )(gb)
        for s in range(3):
            ri, rm = fast_score_pair_pallas(gb[s], 20 / 255.0, 7 / 255.0,
                                            interpret=True)
            np.testing.assert_allclose(np.asarray(bi[s]), np.asarray(ri),
                                       atol=0)
            np.testing.assert_allclose(np.asarray(bm[s]), np.asarray(rm),
                                       atol=0)


class TestGrid:
    def test_assign_and_query(self):
        from vdo_slam_tpu.ops import grid

        xy = jnp.array([[10.0, 10.0], [12.0, 11.0], [600.0, 300.0],
                        [0.0, 0.0]])
        valid = jnp.array([True, True, True, False])
        table, counts = grid.assign_to_grid(xy, valid, width=640, height=480,
                                            cap=4)
        assert int(counts.sum()) == 3
        idx, ok = grid.features_in_area(xy, valid, jnp.array([11.0, 10.0]),
                                        radius=5.0, k=4)
        found = set(np.asarray(idx)[np.asarray(ok)].tolist())
        assert found == {0, 1}


class TestUndistort:
    def test_zero_distortion_identity(self):
        from vdo_slam_tpu.ops import undistort

        K = jnp.asarray([500.0, 500.0, 320.0, 240.0])
        uv = jnp.array([[100.0, 50.0], [320.0, 240.0]])
        out = undistort.undistort_points(uv, K, jnp.zeros(5))
        np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-4)

    def test_roundtrip_with_distortion(self):
        from vdo_slam_tpu.ops import undistort

        K = jnp.asarray([500.0, 500.0, 320.0, 240.0])
        dist = jnp.asarray([-0.2, 0.05, 0.001, -0.001, 0.0])
        # distort some ideal points, then undistort back
        uv_ideal = jnp.array([[100.0, 80.0], [500.0, 400.0], [320.0, 240.0]])
        xn = jnp.stack([(uv_ideal[:, 0] - 320) / 500,
                        (uv_ideal[:, 1] - 240) / 500], axis=-1)
        xd = undistort.distort_normalized(xn, dist)
        uv_dist = jnp.stack([xd[:, 0] * 500 + 320, xd[:, 1] * 500 + 240],
                            axis=-1)
        rec = undistort.undistort_points(uv_dist, K, dist)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(uv_ideal),
                                   atol=0.02)


class TestVisualize:
    @pytest.mark.slow
    def test_draw_frame_and_trajectory(self, tmp_path):
        from tests.test_pipeline_e2e import small_config
        from vdo_slam_tpu.eval.visualize import draw_frame, draw_trajectory
        from vdo_slam_tpu.io.dataset import SyntheticDataset
        from vdo_slam_tpu.io.synthetic import make_scene
        from vdo_slam_tpu.pipeline import System

        sc = make_scene(num_frames=3, width=160, height=120, num_objects=1)
        cfg = small_config(sc)
        ds = SyntheticDataset(sc, depth_map_factor=1.0, bf=40.0)
        sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
        sysm.run_sequence(ds)
        m = sysm.map
        p1 = draw_frame(sc.rgb[1], m.stat_xy[1], m.stat_valid[1],
                        m.dyn_xy[1], m.dyn_obj_label[1], m.dyn_valid[1],
                        tmp_path / "frame.png")
        p2 = draw_trajectory(m, tmp_path / "traj.png")
        assert (tmp_path / "frame.png").stat().st_size > 5000
        assert (tmp_path / "traj.png").stat().st_size > 5000


class TestORB:
    def test_orientation_gradient_direction(self):
        from vdo_slam_tpu.ops import orb

        # intensity ramp along +x -> centroid to the right -> angle ~ 0
        img = jnp.tile(jnp.linspace(0, 1, 64)[None, :], (64, 1))
        ang = orb.orientations(img, jnp.array([[32.0, 32.0]]))
        assert abs(float(ang[0])) < 0.1
        # ramp along +y -> angle ~ pi/2
        ang2 = orb.orientations(img.T, jnp.array([[32.0, 32.0]]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.1

    def test_descriptor_selfmatch_under_translation(self):
        from vdo_slam_tpu.ops import orb

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((128, 128)).astype(np.float32))
        pts_a = jnp.asarray(rng.uniform(30, 98, size=(20, 2)).astype(np.float32))
        da = orb.descriptors(img, pts_a)
        # same image shifted by whole pixels: descriptors at shifted points match
        shift = jnp.asarray([3.0, 2.0])
        img_b = jnp.roll(img, shift=(2, 3), axis=(0, 1))
        db = orb.descriptors(img_b, pts_a + shift[None])
        valid = jnp.ones(20, bool)
        best, dist = orb.match_hamming(da, db, valid, valid)
        # most keypoints match themselves with small Hamming distance
        self_match = (np.asarray(best) == np.arange(20)).mean()
        assert self_match > 0.8, (self_match, np.asarray(dist))


class TestBirdeye:
    def test_scene_flow_birdeye(self, tmp_path):
        from vdo_slam_tpu.eval.visualize import draw_scene_flow_birdeye

        rng = np.random.default_rng(0)
        P = rng.uniform([-10, -2, 2], [10, 2, 25], size=(50, 3))
        F = rng.normal(0, 0.3, size=(50, 3))
        p = draw_scene_flow_birdeye(P, F, np.ones(50, bool),
                                    tmp_path / "sf.png")
        assert (tmp_path / "sf.png").stat().st_size > 5000


class TestWirePacking:
    def test_pack_unpack_roundtrip_precision(self):
        """The int16 wire format must preserve what the solvers need:
        depth to 1/256 m, labels/gray exactly, and flow to fp16 relative
        precision — the 1/64 px fixed point it replaced measurably doubled
        object-motion rotation error (DESIGN.md §9)."""
        import jax.numpy as jnp

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(0)
        H, W = 48, 64
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        depth = rng.uniform(0, 80, (H, W)).astype(np.float32)
        flow = rng.uniform(-200, 200, (H, W, 2)).astype(np.float32)
        flow[0, 0] = [0.01, -0.004]      # small-flow precision matters most
        seg = rng.integers(0, 5, (H, W)).astype(np.int32)
        scale = depth_wire_scale(1.0)
        buf = pack_frame(gray, depth, flow, seg, depth_scale=scale)
        assert buf.dtype == np.int16 and buf.shape == (4, H, W)
        g2, d2, f2, s2 = (np.asarray(x) for x in
                          unpack_frame(jnp.asarray(buf), depth_scale=scale))
        np.testing.assert_array_equal(s2, seg)
        assert np.abs(g2 - gray).max() <= 0.5 / 255 + 1e-6
        assert np.abs(d2 - depth).max() <= 0.5 / 256 + 1e-5
        # fp16 relative error: 2^-11 of magnitude (plus tiny abs floor)
        rel = np.abs(f2 - flow) / np.maximum(np.abs(flow), 1e-3)
        assert rel.max() <= 2.0 ** -10, rel.max()
        # small flows keep SUB-milli-pixel absolute error (the old 1/64 px
        # fixed point was 30x worse here)
        assert np.abs(f2[0, 0] - flow[0, 0]).max() < 1e-4

    def test_flow_half_wire(self):
        """flow_half mode: 5 B/px flat wire — gray/seg/depth unchanged,
        flow exact (to fp16) at even pixels and bilinear in between, so a
        SMOOTH flow field reconstructs to sub-0.01 px everywhere."""
        import jax.numpy as jnp

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(1)
        H, W = 47, 63                    # odd on purpose (KITTI is 375x1242)
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        depth = rng.uniform(0, 80, (H, W)).astype(np.float32)
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        # smooth field with gentle curvature (like real camera-motion flow)
        flow = np.stack([3.0 + 0.02 * xx + 0.001 * yy * yy / H,
                         -1.5 + 0.015 * yy + 0.0005 * xx * xx / W],
                        axis=-1).astype(np.float32)
        seg = rng.integers(0, 5, (H, W)).astype(np.int32)
        scale = depth_wire_scale(1.0)
        buf = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                         flow_half=True)
        Hh, Wh = (H + 1) // 2, (W + 1) // 2
        assert buf.dtype == np.int16 and buf.shape == (2 * H * W
                                                       + 2 * Hh * Wh,)
        g2, d2, f2, s2 = (np.asarray(x) for x in unpack_frame(
            jnp.asarray(buf), depth_scale=scale, flow_half=True, hw=(H, W)))
        np.testing.assert_array_equal(s2, seg)
        assert np.abs(g2 - gray).max() <= 0.5 / 255 + 1e-6
        assert np.abs(d2 - depth).max() <= 0.5 / 256 + 1e-5
        # even pixels: exact to fp16; everywhere: bilinear of a smooth field
        assert np.abs(f2[0::2, 0::2] - flow[0::2, 0::2]).max() < 2e-2
        assert np.abs(f2 - flow).max() < 5e-2, np.abs(f2 - flow).max()

    def test_flow_quarter_wire(self):
        """flow_down=4: 4.25 B/px flat wire.  Rigid motion induces an
        affine-in-pixel flow field per label; the two-stage seg-aware
        bilinear reconstruction is EXACT (to fp16) for a per-label affine
        field in each label's interior, including across the object
        boundary where plain bilinear would smear."""
        import jax.numpy as jnp

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(2)
        H, W = 47, 63
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        depth = rng.uniform(0, 80, (H, W)).astype(np.float32)
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        # label 0 = background, label 1 = a box; DIFFERENT affine fields
        seg = np.zeros((H, W), np.int32)
        seg[12:36, 20:48] = 1
        bg = np.stack([2.0 + 0.02 * xx - 0.01 * yy,
                       -1.0 + 0.015 * yy + 0.005 * xx], axis=-1)
        ob = np.stack([-8.0 - 0.03 * xx + 0.02 * yy,
                       6.0 - 0.01 * yy - 0.02 * xx], axis=-1)
        flow = np.where((seg == 1)[..., None], ob, bg).astype(np.float32)
        scale = depth_wire_scale(1.0)
        buf = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                         flow_down=4)
        Hq, Wq = (H + 3) // 4, (W + 3) // 4
        assert buf.shape == (2 * H * W + 2 * Hq * Wq,)
        g2, d2, f2, s2 = (np.asarray(x) for x in unpack_frame(
            jnp.asarray(buf), depth_scale=scale, flow_down=4, hw=(H, W)))
        np.testing.assert_array_equal(s2, seg)
        assert np.abs(g2 - gray).max() <= 0.5 / 255 + 1e-6
        assert np.abs(d2 - depth).max() <= 0.5 / 256 + 1e-5
        # every 4th pixel: carried exactly (to fp16)
        assert np.abs(f2[0::4, 0::4] - flow[0::4, 0::4]).max() < 2e-2
        # interior of each label (away from coarse cells that straddle the
        # boundary with no same-label support): affine-exact reconstruction
        interior = np.zeros((H, W), bool)
        interior[2:10, 2:16] = True       # pure background block
        interior[16:32, 24:44] = True     # pure object block
        err = np.abs(f2 - flow)[interior]
        assert err.max() < 3e-2, err.max()
        # global sanity: bounded even at the boundary cells
        assert np.abs(f2 - flow).max() < 0.6

    def test_depth_half_wire(self):
        """wire_depth_down=2: every-2nd-pixel u16 depth, reconstructed on
        device by seg-aware GRADIENT-VOTE interpolation in INVERSE depth
        (io/packing.py, _upsample2x_seg(extrap=True)).  1/z is affine in
        pixel on a 3D plane, so planar interiors reconstruct to quantization
        accuracy — and with each corner voting its locally-fitted same-label
        plane, one-sided BOUNDARY cells are first-order too (linear
        extrapolation), not the 0-order nearest extension that doubled
        camera-rotation RPE in the round-5 A/B.  Zero (invalid) coarse
        samples carry no weight anywhere."""
        import jax.numpy as jnp

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(4)
        H, W = 47, 63
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        # two planes in inverse depth, split by the object mask
        inv_bg = 0.05 + 1e-4 * xx + 2e-4 * yy
        inv_ob = 0.02 + 2e-4 * xx - 1e-4 * yy
        seg = np.zeros((H, W), np.int32)
        seg[12:36, 20:48] = 1
        depth = np.where(seg == 1, 1.0 / inv_ob, 1.0 / inv_bg).astype(
            np.float32)
        depth[8, 8] = 0.0                 # even-pixel invalid sample
        flow = rng.normal(0, 3, (H, W, 2)).astype(np.float32)
        scale = depth_wire_scale(1.0)
        buf = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                         flow_down=2, depth_down=2)
        Hh, Wh = (H + 1) // 2, (W + 1) // 2
        assert buf.shape == (H * W + 3 * Hh * Wh,)   # 3.5 B/px
        g2, d2, f2, s2 = (np.asarray(x) for x in unpack_frame(
            jnp.asarray(buf), depth_scale=scale, flow_down=2, depth_down=2,
            hw=(H, W)))
        np.testing.assert_array_equal(s2, seg)
        assert np.abs(g2 - gray).max() <= 0.5 / 255 + 1e-6
        # even pixels: carried exactly (to the u16 1/256 m quantization)
        ev = np.abs(d2[0::2, 0::2] - depth[0::2, 0::2])
        ev[4, 4] = 0.0                    # the injected invalid sample
        assert ev.max() <= 0.5 / 256 + 1e-4, ev.max()
        assert d2[8, 8] == 0.0            # invalid stays invalid
        # planar interiors: quantization-level reconstruction everywhere
        interior = np.zeros((H, W), bool)
        interior[2:10, 12:19] = True
        interior[16:32, 24:44] = True
        err = np.abs(d2 - depth)[interior]
        assert err.max() < 0.02, err.max()
        # BOUNDARY pixels too: every cell here keeps at least one
        # same-label corner, whose extrapolated plane vote is exact for a
        # planar region up to u16 quantization (the pre-extrap 0-order
        # reconstruction erred up to ~0.5 m on this scene)
        assert np.abs(d2 - depth)[depth > 0].max() < 0.02, \
            np.abs(d2 - depth)[depth > 0].max()

    def test_depth_resid_wire(self):
        """wire_depth_resid: the half-res depth wire's planar-in-1/z model
        errs on CURVED surfaces (a segment label is not one plane); the
        sparse residual block carries the N worst-reconstructed pixels as
        bit-exact u16 corrections, host-ranked by the SAME reconstruction
        the device runs (io/packing.py _depth_residuals) and applied as one
        scatter after the upsample.  With N covering the curved region, the
        whole map reconstructs to quantization accuracy."""
        import jax.numpy as jnp

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(5)
        H, W = 47, 63
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        # planar background + a strongly CURVED bump (quadratic in 1/z)
        # inside the SAME label — invisible to the seg-aware interpolation
        inv = 0.05 + 1e-4 * xx + 2e-4 * yy
        bump = ((yy - 24) ** 2 + (xx - 40) ** 2) < 100
        inv = inv + np.where(bump, 4e-4 * ((xx - 40) ** 2 % 7), 0.0)
        seg = np.zeros((H, W), np.int32)
        depth = (1.0 / inv).astype(np.float32)
        flow = rng.normal(0, 3, (H, W, 2)).astype(np.float32)
        scale = depth_wire_scale(1.0)
        base = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                          flow_down=2, depth_down=2)
        R = 512
        buf = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                         flow_down=2, depth_down=2, depth_resid=R)
        Hh, Wh = (H + 1) // 2, (W + 1) // 2
        assert buf.shape == (H * W + 3 * Hh * Wh + 3 * R,)
        assert np.array_equal(base, buf[:base.size])  # pure append
        d_base = np.asarray(unpack_frame(
            jnp.asarray(base), depth_scale=scale, flow_down=2,
            depth_down=2, hw=(H, W))[1])
        d_fix = np.asarray(unpack_frame(
            jnp.asarray(buf), depth_scale=scale, flow_down=2, depth_down=2,
            depth_resid=R, hw=(H, W))[1])
        q = 0.5 / scale + 1e-4
        # without corrections the curved region errs well above quantization
        assert np.abs(d_base - depth).max() > 10 * q
        # with them: quantization-level everywhere (512 covers the bump)
        assert np.abs(d_fix - depth).max() <= 2 * q, \
            np.abs(d_fix - depth).max()
        # corrected pixels are BIT-exact vs the u16 the host would ship
        tgt = np.rint(depth * scale) / scale
        bad = np.abs(d_base - depth) > 2 * q
        np.testing.assert_allclose(d_fix[bad], tgt[bad], atol=1e-5)

    def test_entropy_wire_lossless(self):
        """wire_entropy: the lossless entropy wire (io/packing.py) must
        reconstruct gray/depth/flow/seg BIT-IDENTICAL to the dense flat
        wire — it re-encodes (int8 raveled depth deltas + sparse bit-exact
        exceptions, sparse seg transitions, u8-pair gray) purely to cut
        raw upload bytes; two integer cumsums invert it on device.  Also
        checks the static exception caps raise instead of degrading."""
        import jax.numpy as jnp
        import pytest

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(6)
        H, W = 47, 63
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        yy, xx = np.mgrid[:H, :W].astype(np.float32)
        # piecewise-smooth depth with big jumps (object + invalid hole) so
        # the exception path is exercised; plus pixel-scale texture
        depth = (20.0 + 0.05 * xx + rng.normal(0, 0.2, (H, W))).astype(
            np.float32)
        seg = np.zeros((H, W), np.int32)
        seg[12:36, 20:48] = 7
        depth[seg == 7] = 8.0 + 0.02 * yy[seg == 7]
        depth[40:44, 5:15] = 0.0          # invalid region (jump to/from 0)
        flow = rng.normal(0, 5, (H, W, 2)).astype(np.float32)
        scale = depth_wire_scale(1.0)
        CS, CD = 128, 512
        for fdelta in (False, True):
            dense = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                               flow_down=2, flow_delta=fdelta)
            ent = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                             flow_down=2, flow_delta=fdelta, entropy=True,
                             seg_cap=CS, depth_exc_cap=CD)
            Hh, Wh = (H + 1) // 2, (W + 1) // 2
            nh = (H * W + 1) // 2
            assert ent.shape == (2 * nh + 2 * Hh * Wh + 4 * CD + 4 * CS,)
            assert ent.size < dense.size   # it IS smaller
            a = unpack_frame(jnp.asarray(dense), depth_scale=scale,
                             flow_down=2, flow_delta=fdelta, hw=(H, W))
            b = unpack_frame(jnp.asarray(ent), depth_scale=scale,
                             flow_down=2, flow_delta=fdelta, entropy=True,
                             seg_cap=CS, depth_exc_cap=CD, hw=(H, W))
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # over-cap frames raise (never silently degrade)
        with pytest.raises(ValueError, match="seg"):
            pack_frame(gray, depth, flow,
                       rng.integers(0, 9, (H, W)).astype(np.int32),
                       depth_scale=scale, flow_down=2, entropy=True,
                       seg_cap=CS, depth_exc_cap=100000)
        with pytest.raises(ValueError, match="depth_exc"):
            pack_frame(gray, rng.uniform(0, 500, (H, W)).astype(np.float32),
                       flow, seg, depth_scale=scale, flow_down=2,
                       entropy=True, seg_cap=100000, depth_exc_cap=8)


    def test_flow_delta_wire_lossless(self):
        """wire_flow_delta: row-delta entropy coding of the fp16 flow
        planes must reconstruct BIT-IDENTICAL samples vs the plain wire —
        it is a compression-side transform only (io/packing.py
        _row_delta_u16 / _row_undelta_u16).  Checked on both the (4,H,W)
        full-res layout and the flat flow_down=2 layout, with adversarial
        values (inf/-inf/nan/extremes) to exercise the mod-2^16 wrap."""
        import jax.numpy as jnp

        from vdo_slam_tpu.io.packing import (depth_wire_scale, pack_frame,
                                             unpack_frame)

        rng = np.random.default_rng(3)
        H, W = 47, 63
        gray = rng.uniform(0, 1, (H, W)).astype(np.float32)
        depth = rng.uniform(0, 80, (H, W)).astype(np.float32)
        flow = rng.uniform(-300, 300, (H, W, 2)).astype(np.float32)
        flow[0, :4, 0] = [np.inf, -np.inf, np.nan, 65504.0]  # fp16 extremes
        seg = rng.integers(0, 5, (H, W)).astype(np.int32)
        scale = depth_wire_scale(1.0)
        for down in (1, 2):
            plain = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                               flow_down=down)
            delta = pack_frame(gray, depth, flow, seg, depth_scale=scale,
                               flow_down=down, flow_delta=True)
            assert plain.shape == delta.shape          # same wire layout
            assert not np.array_equal(plain, delta)    # different encoding
            a = unpack_frame(jnp.asarray(plain), depth_scale=scale,
                             flow_down=down, hw=(H, W))
            b = unpack_frame(jnp.asarray(delta), depth_scale=scale,
                             flow_down=down, flow_delta=True, hw=(H, W))
            for x, y in zip(a, b):
                np.testing.assert_array_equal(
                    np.asarray(x).view(np.uint32),
                    np.asarray(y).view(np.uint32))     # bit-exact, NaN-safe
