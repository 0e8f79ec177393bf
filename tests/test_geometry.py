"""Golden tests for frustum / coordinate-chain / ray geometry."""

import numpy as np
import pytest

from preworld_tpu.geometry import (
    GridConfig,
    bda_matrix,
    create_frustum,
    curr2adjsensor_chain,
    frustum_pixel_indices,
    frustum_to_lidar,
    get_rays,
    invert_rigid,
    sensor2keyego_chain,
    voxel_indices,
)


def rigid(rot_deg, t):
    ang = np.deg2rad(rot_deg)
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ]
    )
    m[:3, 3] = t
    return m


class TestFrustum:
    def test_shape_and_depth_bins(self):
        grid = GridConfig()
        f = create_frustum(grid, (512, 1408), 16)
        assert f.shape == (88, 32, 88, 3)
        assert np.isclose(f[0, 0, 0, 2], 1.0)
        assert np.isclose(f[-1, 0, 0, 2], 44.5)
        assert np.isclose(f[0, 0, 0, 0], 0.0)
        assert np.isclose(f[0, 0, -1, 0], 1407.0)
        assert np.isclose(f[0, -1, 0, 1], 511.0)

    def test_identity_projection(self):
        """With identity extrinsics/post-aug and pinhole K, a frustum point at
        pixel (cx, cy) depth d must land at (0, 0, d) in camera=ego space."""
        grid = GridConfig(depth=(1.0, 3.0, 1.0))
        f = create_frustum(grid, (8, 8), 4)  # D=2, 2x2 feat
        K = np.array([[10.0, 0, 3.5], [0, 10.0, 3.5], [0, 0, 1]], np.float32)
        s2e = np.eye(4, dtype=np.float32)[None, None]
        pts = np.asarray(
            frustum_to_lidar(
                f,
                s2e,
                K[None, None],
                np.eye(3, dtype=np.float32)[None, None],
                np.zeros((1, 1, 3), np.float32),
                np.eye(3, dtype=np.float32)[None],
            )
        )
        # unprojection golden: x = (u - cx)/fx * d
        u, v, d = f[..., 0], f[..., 1], f[..., 2]
        np.testing.assert_allclose(pts[0, 0, ..., 0], (u - 3.5) / 10 * d, atol=1e-5)
        np.testing.assert_allclose(pts[0, 0, ..., 1], (v - 3.5) / 10 * d, atol=1e-5)
        np.testing.assert_allclose(pts[0, 0, ..., 2], d, atol=1e-5)

    def test_post_aug_undo(self):
        """post_rot/post_tran applied then undone must reproduce identity case."""
        grid = GridConfig(depth=(1.0, 3.0, 1.0))
        f = create_frustum(grid, (8, 8), 4)
        K = np.array([[10.0, 0, 3.5], [0, 10.0, 3.5], [0, 0, 1]], np.float32)
        s2e = np.eye(4, dtype=np.float32)[None, None]
        bda = np.eye(3, dtype=np.float32)[None]
        base = np.asarray(
            frustum_to_lidar(
                f, s2e, K[None, None],
                np.eye(3, dtype=np.float32)[None, None],
                np.zeros((1, 1, 3), np.float32),
                bda,
            )
        )
        # scale image by 2 and shift by (3, 1): frustum pixels transform too
        post_rot = np.diag([2.0, 2.0, 1.0]).astype(np.float32)
        post_tran = np.array([3.0, 1.0, 0.0], np.float32)
        f_aug = f.copy()
        f_aug[..., :2] = f[..., :2] * 2.0 + post_tran[:2]
        aug = np.asarray(
            frustum_to_lidar(
                f_aug, s2e, K[None, None],
                post_rot[None, None], post_tran[None, None],
                bda,
            )
        )
        np.testing.assert_allclose(aug, base, atol=1e-4)

    def test_voxel_indices_layout(self):
        """rank = b*Z*Y*X + z*Y*X + y*X + x with OOB -> sentinel
        (parity: view_transformer.py:242-245)."""
        grid = GridConfig(x=(0, 4, 1), y=(0, 4, 1), z=(0, 2, 1))
        pts = np.array(
            [
                [[0.5, 0.5, 0.5], [3.9, 2.1, 1.2], [-0.1, 0, 0], [4.0, 0, 0]],
            ],
            np.float32,
        ).reshape(1, 1, 1, 1, 4, 3)
        idx = np.asarray(voxel_indices(pts, grid)).reshape(-1)
        assert idx[0] == 0
        assert idx[1] == 1 * 16 + 2 * 4 + 3
        sentinel = 1 * 4 * 4 * 2
        assert idx[2] == sentinel and idx[3] == sentinel

    def test_pixel_indices(self):
        pix = frustum_pixel_indices(2, 3, 4, 5, 6)
        assert pix.shape == (2, 3, 4, 5, 6)
        assert (pix[:, :, 0] == pix[:, :, 3]).all()
        assert pix.max() == 2 * 3 * 5 * 6 - 1


class TestTransformChains:
    def test_invert_rigid(self):
        m = rigid(33.0, [1, 2, 3])
        np.testing.assert_allclose(invert_rigid(m) @ m, np.eye(4), atol=1e-12)

    def test_sensor2keyego_identity_for_key(self):
        """Key-frame key-cam sensor2keyego must equal its own sensor2ego
        (bevdet_occ.py:99-104 with key pose = frame0 cam0)."""
        B, T, N = 1, 2, 2
        s2e = np.stack(
            [rigid(10 * i, [i, 0, 0]) for i in range(T * N)]
        ).reshape(1, T, N, 4, 4)
        e2g = np.stack(
            [rigid(5 * i, [0, i, 0]) for i in range(T * N)]
        ).reshape(1, T, N, 4, 4)
        # all cams of a frame share the ego pose in reality; emulate that
        e2g[0, 0, 1] = e2g[0, 0, 0]
        e2g[0, 1, 1] = e2g[0, 1, 0]
        out = sensor2keyego_chain(s2e, e2g)
        np.testing.assert_allclose(out[0, 0, 0], s2e[0, 0, 0], atol=1e-6)
        # golden: global2keyego @ ego2global @ sensor2ego
        expect = (
            np.linalg.inv(e2g[0, 0, 0]) @ e2g[0, 1, 1] @ s2e[0, 1, 1]
        )
        np.testing.assert_allclose(out[0, 1, 1], expect, atol=1e-5)

    def test_curr2adjsensor(self):
        B, T, N = 1, 3, 1
        s2e = np.stack([rigid(7 * i, [0, 0, i]) for i in range(T)]).reshape(
            1, T, 1, 4, 4
        )
        e2g = np.stack([rigid(0, [2 * i, 0, 0]) for i in range(T)]).reshape(
            1, T, 1, 4, 4
        )
        out = curr2adjsensor_chain(s2e, e2g, temporal_frames=2)
        assert out.shape == (1, 2, 1, 4, 4)
        expect = (
            np.linalg.inv(e2g[0, 1, 0] @ s2e[0, 1, 0]) @ e2g[0, 0, 0] @ s2e[0, 0, 0]
        )
        np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-5)

    def test_bda_flip_composition(self):
        m = bda_matrix(0.0, 1.0, True, False)
        np.testing.assert_allclose(m, np.diag([-1.0, 1.0, 1.0]), atol=1e-7)
        m = bda_matrix(90.0, 2.0, False, True)
        p = m @ np.array([1.0, 0.0, 1.0])
        np.testing.assert_allclose(p, [0.0, -2.0, 2.0], atol=1e-6)


class TestRays:
    def test_ray_through_principal_point(self):
        K = np.array([[100.0, 0, 50], [0, 100.0, 30], [0, 0, 1]])
        c2w = rigid(0, [1, 2, 3]).astype(np.float32)
        o, d, vd = get_rays(np.array([50.0]), np.array([30.0]), K, c2w)
        np.testing.assert_allclose(o[0], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(vd, axis=-1), 1.0, atol=1e-6)

    def test_ray_rotation(self):
        K = np.eye(3)
        c2w = rigid(90, [0, 0, 0]).astype(np.float32)
        _, d, _ = get_rays(np.array([0.0]), np.array([0.0]), K, c2w)
        np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-6)

    def test_wrs_shapes_and_determinism(self):
        from preworld_tpu.geometry.rays import build_rays

        rng = np.random.default_rng(0)
        n_img = 4
        coors = [rng.integers(0, 64, (100, 2)) for _ in range(n_img)]
        depths = [rng.uniform(1, 40, 100) for _ in range(n_img)]
        segs = [rng.integers(0, 17, 100) for _ in range(n_img)]
        imgs = [rng.uniform(0, 1, (100, 3)) for _ in range(n_img)]
        c2ws = [rigid(10 * i, [i, 0, 0]).astype(np.float32) for i in range(n_img)]
        Ks = [np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])] * n_img
        rays = build_rays(
            coors, depths, segs, imgs, c2ws, Ks,
            time_ids=[0, 0, 1, 1], max_ray_nums=128,
            rng=np.random.default_rng(1),
        )
        assert rays.shape == (128, 16)
        rays2 = build_rays(
            coors, depths, segs, imgs, c2ws, Ks,
            time_ids=[0, 0, 1, 1], max_ray_nums=128,
            rng=np.random.default_rng(1),
        )
        np.testing.assert_array_equal(rays, rays2)

    def test_wrs_prefers_key_frame(self):
        """weight_adj=0 should exclude aux-frame rays entirely."""
        from preworld_tpu.geometry.rays import build_rays

        rng = np.random.default_rng(0)
        coors = [np.full((50, 2), 1), np.full((50, 2), 9)]
        depths = [np.ones(50)] * 2
        segs = [np.full(50, 11), np.full(50, 11)]
        imgs = [np.zeros((50, 3))] * 2
        c2ws = [np.eye(4, dtype=np.float32)] * 2
        Ks = [np.eye(3)] * 2
        rays = build_rays(
            coors, depths, segs, imgs, c2ws, Ks,
            time_ids=[0, 1], max_ray_nums=40, weight_adj=0.0,
            rng=rng,
        )
        assert (rays[:, 0] == 1).all()


class TestNativeLib:
    """C++ data-path core vs the numpy implementations."""

    def test_ray_records_match_numpy(self):
        import pytest
        from preworld_tpu.data import native
        from preworld_tpu.geometry.rays import pts2ray

        if not native.available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(0)
        n = 1000
        coor = rng.integers(0, 600, (n, 2)).astype(np.float32)
        depth = rng.uniform(1, 40, n).astype(np.float32)
        seg = rng.integers(0, 17, n).astype(np.float32)
        rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        c2w = rigid(25, [1, -2, 0.5]).astype(np.float32)
        K = np.array([[500.0, 0, 300], [0, 510.0, 200], [0, 0, 1]], np.float32)
        ours = native.build_ray_records(coor, depth, seg, rgb, c2w, K)
        ref = pts2ray(coor, depth, seg, rgb, c2w, K)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_zbuffer_matches_numpy(self):
        import pytest
        from preworld_tpu.data import native
        from preworld_tpu.data.pipeline import points_to_depth_map

        if not native.available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(1)
        pts = np.stack(
            [rng.uniform(-5, 70, 5000), rng.uniform(-5, 50, 5000),
             rng.uniform(0, 50, 5000)], axis=1
        ).astype(np.float32)
        ours = native.zbuffer_depth_map(pts, 48, 64, 1.0, 45.0)
        ref = points_to_depth_map(pts, 48, 64, (1.0, 45.0))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_wrs_topk_respects_weights(self):
        import pytest
        from preworld_tpu.data import native

        if not native.available():
            pytest.skip("native lib not built")
        w = np.concatenate([np.full(500, 1e-8), np.full(500, 1.0)]).astype(
            np.float32
        )
        idx = native.wrs_topk(w, 400, seed=7)
        assert idx.shape == (400,)
        assert (idx >= 500).mean() > 0.95  # heavy weights dominate
