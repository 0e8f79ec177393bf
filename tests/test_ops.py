"""Kernel tests vs NumPy/torch oracles: bev_pool, grid_sample, render ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import chex

from preworld_tpu.ops import (
    alpha2weight,
    bev_pool,
    bev_pool_dense_oracle,
    cumdist_mask,
    grid_sample_2d,
    grid_sample_3d,
    raw2alpha,
    sample_ray_points,
    RaySamplingSpec,
)


class TestBevPool:
    def test_reference_golden(self):
        """The reference's embedded self-check (`bev_pool.py:145-176`):
        8 frustum points, 2 in-range to the same voxel, depth*feat sum = 4.4
        with exact hand gradients."""
        depth = np.array([0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9], np.float64)
        feat = np.ones((8, 2), np.float64) * 0.1
        # points 2 and 3 land in voxel 0; everything else out of range
        vox = np.array([99, 99, 0, 0, 99, 99, 99, 99])
        pix = np.arange(8)
        out = bev_pool(
            jnp.asarray(depth)[None, None, :, None, None],
            jnp.asarray(feat).reshape(1, 1, 8, 1, 2)[:, :, :, :, :].reshape(1, 1, 8, 1, 2),
            jnp.asarray(vox).reshape(1, 1, 8, 1, 1),
            jnp.asarray(pix).reshape(1, 1, 8, 1, 1),
            num_voxels=99,
        )
        # depth[2]*0.1 + depth[3]*0.1 per channel = 0.03; total over 2ch = 0.06
        np.testing.assert_allclose(np.asarray(out[0]).sum(), 0.06, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0]), [0.03, 0.03], atol=1e-7)

    def test_vs_dense_oracle(self):
        rng = np.random.default_rng(0)
        B, N, D, H, W, C = 2, 2, 3, 4, 5, 6
        nvox = 50
        depth = rng.uniform(size=(B, N, D, H, W)).astype(np.float32)
        feat = rng.normal(size=(B, N, H, W, C)).astype(np.float32)
        vox = rng.integers(0, nvox + 1, size=(B, N, D, H, W)).astype(np.int32)
        from preworld_tpu.geometry import frustum_pixel_indices

        pix = frustum_pixel_indices(B, N, D, H, W)
        out = np.asarray(bev_pool(depth, feat, vox, pix, nvox))
        oracle = bev_pool_dense_oracle(depth, feat, vox, pix, nvox)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)

    def test_gradients_match_reference_formulation(self):
        """Autodiff grads must equal the handwritten CUDA backward semantics
        (`bev_pool_cuda.cu:67-121`): d_depth[p] = <g[vox(p)], feat[pix(p)]>,
        d_feat[pix] = sum_d depth * g[vox]."""
        rng = np.random.default_rng(1)
        B, N, D, H, W, C = 1, 1, 3, 2, 2, 4
        nvox = 10
        depth = rng.uniform(size=(B, N, D, H, W)).astype(np.float32)
        feat = rng.normal(size=(B, N, H, W, C)).astype(np.float32)
        vox = rng.integers(0, nvox + 1, size=(B, N, D, H, W)).astype(np.int32)
        from preworld_tpu.geometry import frustum_pixel_indices

        pix = frustum_pixel_indices(B, N, D, H, W)
        g = rng.normal(size=(nvox, C)).astype(np.float32)

        def f(dep, fea):
            return (bev_pool(dep, fea, vox, pix, nvox) * g).sum()

        gd, gf = jax.grad(f, argnums=(0, 1))(depth, feat)
        # oracle gradients
        dflat = depth.reshape(-1)
        vflat = vox.reshape(-1)
        pflat = pix.reshape(-1)
        fflat = feat.reshape(-1, C)
        gd_o = np.zeros_like(dflat)
        gf_o = np.zeros_like(fflat)
        for i in range(dflat.shape[0]):
            if vflat[i] < nvox:
                gd_o[i] = g[vflat[i]] @ fflat[pflat[i]]
                gf_o[pflat[i]] += dflat[i] * g[vflat[i]]
        np.testing.assert_allclose(
            np.asarray(gd).reshape(-1), gd_o, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gf).reshape(-1, C), gf_o, rtol=1e-4, atol=1e-5
        )


def torch_grid_sample_2d(inp, grid, align_corners=True):
    torch = pytest.importorskip("torch")
    return (
        torch.nn.functional.grid_sample(
            torch.from_numpy(inp),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=align_corners,
        )
        .numpy()
    )


class TestGridSample:
    @pytest.mark.parametrize("align", [True, False])
    def test_2d_vs_torch(self, align):
        rng = np.random.default_rng(0)
        inp = rng.normal(size=(2, 3, 8, 9)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, size=(2, 5, 7, 2)).astype(np.float32)
        ours = np.asarray(grid_sample_2d(inp, grid, align_corners=align))
        ref = torch_grid_sample_2d(inp, grid, align)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("align", [True, False])
    def test_3d_vs_torch(self, align):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        inp = rng.normal(size=(2, 4, 5, 6, 7)).astype(np.float32)
        grid = rng.uniform(-1.2, 1.2, size=(2, 3, 4, 2, 3)).astype(np.float32)
        ours = np.asarray(grid_sample_3d(inp, grid, align_corners=align))
        ref = (
            torch.nn.functional.grid_sample(
                torch.from_numpy(inp),
                torch.from_numpy(grid),
                mode="bilinear",
                padding_mode="zeros",
                align_corners=align,
            )
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestFieldSample:
    """Corner-expanded table sampling == the general trilinear oracle."""

    def _setup(self, seed=0):
        rng = np.random.default_rng(seed)
        field = jnp.asarray(rng.normal(size=(9, 7, 5, 21)).astype(np.float32))
        # points spanning in-range, partially-out and fully-out
        pts = jnp.asarray(
            rng.uniform(-1.6, 1.6, size=(50, 11, 3)).astype(np.float32)
        )
        return field, pts

    def test_matches_grid_sample_oracle(self):
        from preworld_tpu.models.nerf_head import _sample_field
        from preworld_tpu.ops.field_sample import (
            build_corner_table,
            sample_corner_table,
        )

        field, pts = self._setup()
        want = _sample_field(field, pts)
        table = build_corner_table(field)
        got = sample_corner_table(table, field.shape[:3], pts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_gradients_match_oracle(self):
        from preworld_tpu.models.nerf_head import _sample_field
        from preworld_tpu.ops.field_sample import (
            build_corner_table,
            sample_corner_table,
        )

        field, pts = self._setup(1)
        cot = jnp.asarray(
            np.random.default_rng(2).normal(size=(50, 11, 21)).astype(np.float32)
        )

        g_oracle = jax.grad(
            lambda f: (cot * _sample_field(f, pts)).sum()
        )(field)
        g_fast = jax.grad(
            lambda f: (
                cot
                * sample_corner_table(build_corner_table(f), f.shape[:3], pts)
            ).sum()
        )(field)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_oracle), rtol=1e-4, atol=1e-4
        )

    def test_parity_tables_match_oracle(self):
        """z-parity two-table sampling (the TPU fwd) == the oracle, f32."""
        from preworld_tpu.models.nerf_head import _sample_field
        from preworld_tpu.ops.field_sample import (
            build_parity_tables,
            sample_parity_tables,
        )

        field, pts = self._setup(3)
        want = _sample_field(field, pts)
        t_e, t_o = build_parity_tables(field)
        got = sample_parity_tables(t_e, t_o, field.shape[:3], pts, 21)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
        # even-Z dims exercise the other n_even/n_odd split
        field2 = field[:, :, :4]
        want2 = _sample_field(field2, pts)
        t_e, t_o = build_parity_tables(field2)
        got2 = sample_parity_tables(t_e, t_o, field2.shape[:3], pts, 21)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(want2), rtol=1e-5, atol=1e-5
        )

    def test_fused_custom_vjp_matches_oracle(self):
        """sample_field_fused: fwd == oracle; bwd (corner8 scatter) == the
        oracle's autodiff gradient; no grad to pts."""
        from preworld_tpu.models.nerf_head import _sample_field
        from preworld_tpu.ops.field_sample import sample_field_fused

        field, pts = self._setup(4)
        got = sample_field_fused(field, pts)
        want = _sample_field(field, pts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

        cot = jnp.asarray(
            np.random.default_rng(5).normal(size=want.shape).astype(np.float32)
        )
        g_f, g_p = jax.grad(
            lambda f, p: (cot * sample_field_fused(f, p)).sum(),
            argnums=(0, 1),
        )(field, pts)
        g_oracle = jax.grad(
            lambda f: (cot * _sample_field(f, pts)).sum()
        )(field)
        np.testing.assert_allclose(
            np.asarray(g_f), np.asarray(g_oracle), rtol=1e-4, atol=1e-4
        )
        assert float(jnp.abs(g_p).max()) == 0.0

    def test_segmented_scatter_grad_matches(self):
        """The bwd's lax.scan-segmented scatter == the single-shot scatter
        (incl. the zero-update padding of the final segment)."""
        from preworld_tpu.ops.field_sample import _corner8_scatter_grad

        field, pts = self._setup(7)
        g = jnp.asarray(
            np.random.default_rng(8)
            .normal(size=(*pts.shape[:-1], field.shape[-1]))
            .astype(np.float32)
        )
        one = _corner8_scatter_grad(field.shape, field.shape[:3], pts, g)
        seg = _corner8_scatter_grad(
            field.shape, field.shape[:3], pts, g, seg_target=97
        )
        np.testing.assert_allclose(
            np.asarray(seg), np.asarray(one), rtol=1e-5, atol=1e-5
        )

    def test_bf16_tables_close_to_f32(self):
        """The flagship's bfloat16 sampling tables stay within bf16 noise."""
        from preworld_tpu.ops.field_sample import sample_field_fused

        field, pts = self._setup(6)
        exact = sample_field_fused(field, pts)
        quant = sample_field_fused(field, pts, jnp.bfloat16)
        err = np.abs(np.asarray(quant) - np.asarray(exact))
        scale = np.abs(np.asarray(exact)) + 1.0
        assert (err / scale).max() < 3e-2

    def _live_cap_grads(self, live_per_ray, cap, seed=9, contiguous=False):
        """Gradient of sample_tables_fused with a SPARSE cotangent (most
        samples dead, like the render's post-early-exit weights) at the
        given live_cap. `contiguous` places each ray's live samples in one
        run (the renderer's first-hit..early-exit pattern — the case the
        span-window tier 1 compacts); scattered positions exercise the
        overflow tiers."""
        from preworld_tpu.ops.field_sample import (
            build_parity_tables,
            sample_tables_fused,
        )

        rng = np.random.default_rng(seed)
        field = jnp.asarray(rng.normal(size=(9, 7, 5, 21)).astype(np.float32))
        R, S = 24, 33
        pts = jnp.asarray(
            rng.uniform(-1.4, 1.4, size=(R, S, 3)).astype(np.float32)
        )
        cot = np.zeros((R, S, 21), np.float32)
        for r in range(R):
            k = live_per_ray[r % len(live_per_ray)]
            if contiguous:
                start = rng.integers(0, S - k + 1) if k else 0
                pos = np.arange(start, start + k)
            else:
                pos = rng.choice(S, size=k, replace=False)
            cot[r, pos] = rng.normal(size=(k, 21))
        cot = jnp.asarray(cot)
        t_e, t_o = build_parity_tables(field)
        te = jax.lax.stop_gradient(t_e)
        to = jax.lax.stop_gradient(t_o)
        return jax.grad(
            lambda f: (
                cot * sample_tables_fused(f, te, to, pts, cap)
            ).sum()
        )(field)

    def test_live_cap_compaction_exact(self):
        """Backward live-sample compaction (cap sufficient) == full scatter
        — contiguous live runs so every ray rides the tier-1 span window."""
        full = self._live_cap_grads([3, 7, 0, 12], 0, contiguous=True)
        compact = self._live_cap_grads([3, 7, 0, 12], 16, contiguous=True)
        np.testing.assert_allclose(
            np.asarray(compact), np.asarray(full), rtol=1e-5, atol=1e-6
        )

    def test_live_cap_scattered_positions_exact(self):
        """Random (non-contiguous) live positions: rays whose SPAN exceeds
        the cap ride tier 2 / the fallback — exact either way."""
        full = self._live_cap_grads([3, 7, 0, 12], 0)
        compact = self._live_cap_grads([3, 7, 0, 12], 16)
        np.testing.assert_allclose(
            np.asarray(compact), np.asarray(full), rtol=1e-5, atol=1e-6
        )

    def test_live_cap_overflow_rays_take_tier2(self):
        """Grazing-style rays whose live count exceeds the cap are zeroed in
        the compact pass and scattered WHOLE in the k_over-ray second tier
        (r4 two-tier scheme) — results stay exact (no dropped gradient) and
        the compact path keeps running for the other rays."""
        full = self._live_cap_grads([3, 30, 2], 0, seed=11)
        capped = self._live_cap_grads([3, 30, 2], 8, seed=11)
        np.testing.assert_allclose(
            np.asarray(capped), np.asarray(full), rtol=1e-5, atol=1e-6
        )

    def test_live_cap_mass_overflow_falls_back(self):
        """More rays overflow than the tier-2 window (k_over = max(64,
        R//64)) -> the lax.cond full-scatter fallback fires; exact."""
        # 72 of 96 rays carry 20 live samples vs cap 8 -> over.sum() > 64
        pattern = [20, 20, 20, 3]
        from preworld_tpu.ops.field_sample import (
            build_parity_tables,
            sample_tables_fused,
        )

        rng = np.random.default_rng(17)
        field = jnp.asarray(rng.normal(size=(9, 7, 5, 21)).astype(np.float32))
        R, S = 96, 33
        pts = jnp.asarray(
            rng.uniform(-0.9, 0.9, size=(R, S, 3)).astype(np.float32)
        )
        cot = np.zeros((R, S, 21), np.float32)
        for r in range(R):
            pos = rng.choice(S, size=pattern[r % 4], replace=False)
            cot[r, pos] = rng.normal(size=(pattern[r % 4], 21))
        cot = jnp.asarray(cot)
        t_e, t_o = build_parity_tables(field)
        te = jax.lax.stop_gradient(t_e)
        to = jax.lax.stop_gradient(t_o)

        def grad_at(cap_):
            return jax.grad(
                lambda f: (
                    cot * sample_tables_fused(f, te, to, pts, cap_)
                ).sum()
            )(field)

        np.testing.assert_allclose(
            np.asarray(grad_at(8)), np.asarray(grad_at(0)),
            rtol=1e-5, atol=1e-6,
        )

    def test_live_cap_ignores_oob_cotangents(self):
        """Rays whose nonzero cotangents sit mostly on OUT-OF-BOUNDS samples
        must still take the compact path: OOB updates are zeroed by `valid`
        inside the scatter, so the cap counts only in-bounds live samples.
        (Render rays that exit the voxel slab read the zero sentinel ->
        alpha ~= alpha_init > fast_color_thres -> their whole OOB tail
        carries nonzero cotangent; without the in-range mask one such ray
        forces the full-scatter fallback for the entire batch.)"""
        from preworld_tpu.ops.field_sample import (
            build_parity_tables,
            sample_tables_fused,
        )

        rng = np.random.default_rng(13)
        field = jnp.asarray(rng.normal(size=(9, 7, 5, 21)).astype(np.float32))
        R, S, cap = 8, 40, 6
        # first 4 samples in-bounds, the rest far out of range (an exiting
        # ray), ALL with nonzero cotangent: in-bounds live = 4 <= cap while
        # g!=0 live = 40 >> cap
        pts = np.empty((R, S, 3), np.float32)
        pts[:, :4] = rng.uniform(-0.8, 0.8, size=(R, 4, 3))
        pts[:, 4:] = rng.uniform(2.5, 3.0, size=(R, S - 4, 3))
        cot = jnp.asarray(rng.normal(size=(R, S, 21)).astype(np.float32))
        t_e, t_o = build_parity_tables(field)
        te = jax.lax.stop_gradient(t_e)
        to = jax.lax.stop_gradient(t_o)

        def grad_at(cap_):
            return jax.grad(
                lambda f: (
                    cot * sample_tables_fused(f, te, to, jnp.asarray(pts), cap_)
                ).sum()
            )(field)

        full = grad_at(0)
        compact = grad_at(cap)
        np.testing.assert_allclose(
            np.asarray(compact), np.asarray(full), rtol=1e-5, atol=1e-6
        )
        # the in-bounds prefix must actually contribute (guards against a
        # vacuous pass where everything OOB zeroes the whole gradient)
        assert np.abs(np.asarray(full)).max() > 0


class TestRender:
    def test_chunked_render_matches_dense(self):
        """ray_chunk > 0 (lax.map + remat, chunk-additive distortion
        partials) == the dense single-pass render, losses included."""
        import dataclasses
        from preworld_tpu.models.nerf_head import (
            NerfHeadConfig,
            nerf_head_losses,
        )

        rng = np.random.default_rng(0)
        B, R, X, Y, Z = 1, 48, 12, 12, 6
        density = jnp.asarray(rng.normal(size=(B, X, Y, Z)).astype(np.float32))
        semantic = jnp.asarray(
            rng.normal(size=(B, X, Y, Z, 17)).astype(np.float32)
        )
        color = jnp.asarray(rng.normal(size=(B, X, Y, Z, 3)).astype(np.float32))
        rays = np.zeros((B, R, 16), np.float32)
        rays[..., 2] = rng.uniform(1, 30, (B, R))
        rays[..., 2, ::5] = 0.0  # some unsupervised rays
        rays[..., 3] = rng.integers(0, 17, (B, R))
        rays[..., 4:7] = rng.uniform(-2, 2, (B, R, 3))
        rays[..., 7:10] = rng.normal(size=(B, R, 3))
        rays[..., 13:16] = rng.uniform(0, 1, (B, R, 3))
        rays = jnp.asarray(rays)
        bda = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))

        dense = nerf_head_losses(
            density, semantic, color, rays, bda,
            dataclasses.replace(NerfHeadConfig(), ray_chunk=0),
        )
        chunked = nerf_head_losses(
            density, semantic, color, rays, bda,
            dataclasses.replace(NerfHeadConfig(), ray_chunk=12),
        )
        assert dense.keys() == chunked.keys()
        for k in dense:
            np.testing.assert_allclose(
                float(chunked[k]), float(dense[k]), rtol=2e-5, atol=1e-6,
                err_msg=k,
            )

    def test_sharded_render_matches_dense(self):
        """shard_map render (scenes over 'data', rays over 'seq') == the
        dense unsharded path — losses AND gradients. Covers the scene-wide
        distortion psum and the per-device live_cap backward under manual
        sharding (models/nerf_head.py::_render_batch)."""
        import dataclasses
        from preworld_tpu.models.nerf_head import (
            NerfHeadConfig,
            nerf_head_losses,
        )
        from preworld_tpu.parallel import make_mesh

        rng = np.random.default_rng(3)
        B, R, X, Y, Z = 4, 64, 12, 12, 6
        density = jnp.asarray(rng.normal(size=(B, X, Y, Z)).astype(np.float32))
        semantic = jnp.asarray(
            rng.normal(size=(B, X, Y, Z, 17)).astype(np.float32)
        )
        color = jnp.asarray(rng.normal(size=(B, X, Y, Z, 3)).astype(np.float32))
        rays = np.zeros((B, R, 16), np.float32)
        rays[..., 2] = rng.uniform(1, 30, (B, R))
        rays[..., 2, ::5] = 0.0
        rays[..., 3] = rng.integers(0, 17, (B, R))
        rays[..., 4:7] = rng.uniform(-2, 2, (B, R, 3))
        rays[..., 7:10] = rng.normal(size=(B, R, 3))
        rays[..., 13:16] = rng.uniform(0, 1, (B, R, 3))
        rays = jnp.asarray(rays)
        bda = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        cfg = NerfHeadConfig()
        mesh = make_mesh(n_data=4, n_seq=2)

        def total(de, mesh_):
            return sum(
                nerf_head_losses(
                    de, semantic, color, rays, bda, cfg, mesh=mesh_
                ).values()
            )

        dense = nerf_head_losses(density, semantic, color, rays, bda, cfg)
        sharded = jax.jit(
            lambda de: nerf_head_losses(
                de, semantic, color, rays, bda, cfg, mesh=mesh
            )
        )(density)
        assert dense.keys() == sharded.keys()
        for k in dense:
            np.testing.assert_allclose(
                float(sharded[k]), float(dense[k]), rtol=2e-5, atol=1e-6,
                err_msg=k,
            )
        g_dense = jax.grad(lambda de: total(de, None))(density)
        g_shard = jax.jit(jax.grad(lambda de: total(de, mesh)))(density)
        np.testing.assert_allclose(
            np.asarray(g_shard), np.asarray(g_dense), rtol=2e-4, atol=1e-6
        )

    def test_spec_counts_match_reference(self):
        """With the paper config: bg_len=1/39, world_len=200, step 0.5
        => N_inner=391, N_outer=26 (`nerf_head.py:35-36,129`)."""
        spec = RaySamplingSpec()
        assert abs(spec.bg_len - 1 / 39) < 1e-6
        assert spec.num_inner == 391
        assert spec.num_outer == 26
        assert spec.t_midpoints.shape == (417,)
        np.testing.assert_allclose(spec.xyz_min[2], -0.08, atol=1e-6)

    def test_raw2alpha_formula(self):
        d = jnp.array([-5.0, 0.0, 3.0, 20.0])
        a = raw2alpha(d, shift=1.0, interval=0.5)
        expect = 1 - (1 + np.exp(np.asarray(d) + 1.0)) ** (-0.5)
        np.testing.assert_allclose(np.asarray(a), expect, rtol=1e-5)

    def test_raw2alpha_init_bias(self):
        spec = RaySamplingSpec()
        a = raw2alpha(jnp.zeros(1), shift=spec.act_shift, interval=1.0)
        # float32 cancellation near 1.0 dominates; check the scale, not digits
        np.testing.assert_allclose(np.asarray(a), spec.alpha_init, rtol=0.15)

    def test_alpha2weight_vs_sequential_oracle(self):
        """Dense masked compositing must equal the CUDA per-ray loop with
        early exit (`render_utils_kernel.cu:577-651`)."""
        rng = np.random.default_rng(2)
        R, S = 4, 50
        alpha = rng.uniform(0, 0.5, size=(R, S)).astype(np.float32)
        alpha[1] = 0.9  # force early exit
        mask = rng.uniform(size=(R, S)) > 0.2
        w, last = alpha2weight(jnp.asarray(alpha), jnp.asarray(mask))
        w_o = np.zeros((R, S))
        last_o = np.zeros(R)
        for r in range(R):
            T = 1.0
            for s in range(S):
                if not mask[r, s]:
                    continue
                w_o[r, s] = T * alpha[r, s]
                T *= 1 - alpha[r, s]
                if T < 1e-3:
                    break
            last_o[r] = T
        np.testing.assert_allclose(np.asarray(w), w_o, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(last), last_o, rtol=1e-4, atol=1e-6)

    def test_alpha2weight_grad_vs_float64_oracle(self):
        """SURVEY §7 hard-part 6: validate transmittance backward numerics."""
        rng = np.random.default_rng(3)
        R, S = 2, 10
        alpha = rng.uniform(0.01, 0.3, size=(R, S))
        mask = np.ones((R, S), bool)
        gw = rng.normal(size=(R, S))
        gl = rng.normal(size=R)

        def loss(a):
            w, last = alpha2weight(a, jnp.asarray(mask), early_exit_thres=0.0)
            return (w * gw).sum() + (last * gl).sum()

        grad = np.asarray(jax.grad(loss)(jnp.asarray(alpha, jnp.float32)))
        # float64 numerical gradient
        eps = 1e-6
        num = np.zeros_like(alpha)
        for r in range(R):
            for s in range(S):
                ap, am = alpha.copy(), alpha.copy()
                ap[r, s] += eps
                am[r, s] -= eps

                def np_loss(a):
                    T = np.cumprod(1 - a, axis=1) / (1 - a)
                    T[:, 0] = 1.0
                    T = np.concatenate(
                        [np.ones((R, 1)), np.cumprod(1 - a, axis=1)[:, :-1]], 1
                    )
                    w = a * T
                    last = np.prod(1 - a, axis=1)
                    return (w * gw).sum() + (last * gl).sum()

                num[r, s] = (np_loss(ap) - np_loss(am)) / (2 * eps)
        np.testing.assert_allclose(grad, num, rtol=1e-2, atol=1e-4)

    def test_sample_ray_points_inner_outer(self):
        spec = RaySamplingSpec()
        o = jnp.array([[0.0, 0.0, 2.2]])  # scene center
        d = jnp.array([[1.0, 0.0, 0.0]])
        pts, inner, t = sample_ray_points(o, d, jnp.eye(3), spec)
        assert pts.shape == (1, spec.num_samples, 3)
        # points inside radius are unnormalized linear marching
        npts = np.asarray(pts[0])
        nin = np.asarray(inner[0])
        assert nin[:10].all()
        # contracted outer points have norm in (1, 1 + bg_len]
        outs = np.linalg.norm(npts[~nin], axis=-1)
        assert (outs > 1).all() and (outs <= 1 + spec.bg_len + 1e-5).all()

    def test_cumdist_mask_thins_oversampled(self):
        spec = RaySamplingSpec()
        R, S = 1, spec.num_samples
        o = jnp.array([[0.0, 0.0, 2.2]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        pts, inner, _ = sample_ray_points(o, d, jnp.eye(3), spec)
        keep = np.asarray(cumdist_mask(pts, inner, spec))
        # all inner points kept
        assert (keep[np.asarray(inner)]).all()
        # outer region is thinned but not empty
        outer = ~np.asarray(inner)
        assert keep[outer].sum() < outer.sum()


class TestBevPoolPallas:
    """Pallas kernel (interpret mode on CPU) vs the XLA segment-sum path."""

    def _case(self, seed=0, B=1, N=2, D=6, H=4, W=5, C=8, nvox=int(1.5 * 512)):
        from preworld_tpu.geometry import frustum_pixel_indices

        rng = np.random.default_rng(seed)
        depth = rng.uniform(size=(B, N, D, H, W)).astype(np.float32)
        feat = rng.normal(size=(B, N, H, W, C)).astype(np.float32)
        vox = rng.integers(0, nvox + 1, size=(B, N, D, H, W)).astype(np.int32)
        pix = frustum_pixel_indices(B, N, D, H, W)
        return depth, feat, vox, pix, nvox

    def test_forward_matches_xla(self):
        from preworld_tpu.ops.bev_pool_pallas import bev_pool_fused

        depth, feat, vox, pix, nvox = self._case()
        ours = np.asarray(
            bev_pool_fused(depth, feat, vox, pix, nvox, pts_cap=512,
                           interpret=True)
        )
        ref = np.asarray(bev_pool(depth, feat, vox, pix, nvox))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_grads_match_xla(self):
        from preworld_tpu.ops.bev_pool_pallas import bev_pool_fused

        depth, feat, vox, pix, nvox = self._case(1)
        g = np.random.default_rng(2).normal(size=(nvox, feat.shape[-1])).astype(
            np.float32
        )

        def f_pallas(d, fe):
            return (
                bev_pool_fused(d, fe, vox, pix, nvox, pts_cap=512,
                               interpret=True) * g
            ).sum()

        def f_xla(d, fe):
            return (bev_pool(d, fe, vox, pix, nvox) * g).sum()

        gd_p, gf_p = jax.grad(f_pallas, argnums=(0, 1))(depth, feat)
        gd_x, gf_x = jax.grad(f_xla, argnums=(0, 1))(depth, feat)
        np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x),
                                   rtol=1e-4, atol=1e-5)

    def _check(self, vox_np, nvox, C=8):
        """Oracle check for a given voxel-id distribution (skew edges of
        the dynamic per-tile block walk)."""
        from preworld_tpu.geometry import frustum_pixel_indices
        from preworld_tpu.ops.bev_pool_pallas import bev_pool_fused

        B, N, D, H, W = vox_np.shape
        rng = np.random.default_rng(3)
        depth = rng.uniform(size=(B, N, D, H, W)).astype(np.float32)
        feat = rng.normal(size=(B, N, H, W, C)).astype(np.float32)
        pix = frustum_pixel_indices(B, N, D, H, W)
        ours = np.asarray(
            bev_pool_fused(depth, feat, vox_np, pix, nvox, interpret=True)
        )
        ref = np.zeros((nvox, C), np.float32)
        ok = vox_np.reshape(-1) < nvox
        np.add.at(
            ref, vox_np.reshape(-1)[ok],
            feat.reshape(-1, C)[np.asarray(pix).reshape(-1)[ok]]
            * depth.reshape(-1)[ok, None],
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_all_points_one_voxel(self):
        # worst skew: a single tile walks every block, all others none
        shape = (1, 2, 6, 4, 5)
        self._check(np.full(shape, 7, np.int32), int(1.5 * 512))

    def test_all_points_out_of_range(self):
        shape = (1, 2, 6, 4, 5)
        self._check(np.full(shape, 10_000, np.int32), int(1.5 * 512))

    def test_boundary_voxels(self):
        # ids packed at tile boundaries and the last in-range id
        nvox = int(1.5 * 512)
        rng = np.random.default_rng(4)
        ids = np.array([0, 511, 512, 513, 1023, nvox - 1, nvox, nvox + 7])
        vox = rng.choice(ids, size=(1, 2, 6, 4, 5)).astype(np.int32)
        self._check(vox, nvox)


class TestCostVolumeExpanded:
    """Corner-table cost volume (the TPU default) == grid_sample oracle."""

    def test_matches_patch_path(self):
        from preworld_tpu.models.depthnet import (
            stereo_cost_volume,
            stereo_cost_volume_expanded,
        )

        rng = np.random.default_rng(3)
        BN, H, W, C, D = 3, 12, 20, 16, 4
        prev = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        # warp mixing in-image, border-straddling, and far-out samples
        gx = rng.uniform(-1.4, 1.4, size=(BN, D, H, W)).astype(np.float32)
        gy = rng.uniform(-1.4, 1.4, size=(BN, D, H, W)).astype(np.float32)
        gx[:, 0, :2] = -2.0  # behind-camera sentinel
        gy[:, 0, :2] = -2.0
        grid = jnp.asarray(np.stack([gx, gy], -1).reshape(BN, D * H, W, 2))

        ref = stereo_cost_volume(prev, curr, grid, bias=5.0, depth_chunk=2)
        ours = stereo_cost_volume_expanded(
            prev, curr, grid, bias=5.0, depth_chunk=2
        )
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestFusedWindowAttention:
    """Pallas fused window attention (interpret) == the XLA einsum path."""

    def _xla_attn(self, q, k, v, bias, mask, h):
        Bn, N, C = q.shape
        d = C // h
        qh = q.reshape(Bn, N, h, d) * (d ** -0.5)
        kh = k.reshape(Bn, N, h, d)
        vh = v.reshape(Bn, N, h, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(Bn, N, C)

    def _case(self, masked, Bn=6, N=16, h=4, d=8, nW=3, seed=0):
        from preworld_tpu.ops.window_attn_pallas import fused_window_attention

        rng = np.random.default_rng(seed)
        C = h * d
        q = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(h, N, N)).astype(np.float32))
        mask = (
            jnp.asarray(
                np.where(rng.random((nW, N, N)) > 0.7, -100.0, 0.0)
                .astype(np.float32)
            )
            if masked else None
        )
        qkv = jnp.concatenate([q, k, v], axis=-1)
        got = fused_window_attention(qkv, bias, mask, h, window_g=4,
                                     interpret=True)
        want = self._xla_attn(q, k, v, bias, mask, h)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_unmasked(self):
        self._case(False)

    def test_masked_shifted(self):
        self._case(True)

    def test_odd_window_count(self):
        self._case(True, Bn=9, nW=9, seed=1)  # forces window_g fallback

    def _grad_case(self, masked, Bn=6, N=16, h=4, d=8, nW=3, seed=2):
        from preworld_tpu.ops.window_attn_pallas import (
            fused_window_attention_vjp,
        )

        rng = np.random.default_rng(seed)
        C = h * d
        q = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(h, N, N)).astype(np.float32))
        mask = (
            jnp.asarray(
                np.where(rng.random((nW, N, N)) > 0.7, -100.0, 0.0)
                .astype(np.float32)
            )
            if masked else None
        )
        qkv = jnp.concatenate([q, k, v], axis=-1)
        # cotangent-weighted scalar so every output element gets a distinct
        # gradient contribution
        ct = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))

        def loss_fused(qkv_, bias_):
            out = fused_window_attention_vjp(
                qkv_, bias_, mask, h, 4, True
            )
            return (out * ct).sum()

        def loss_xla(qkv_, bias_):
            q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
            return (self._xla_attn(q_, k_, v_, bias_, mask, h) * ct).sum()

        gq_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
        gq_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(
            np.asarray(gq_f), np.asarray(gq_x), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(gb_f), np.asarray(gb_x), rtol=2e-5, atol=2e-5
        )

    def test_grad_unmasked(self):
        self._grad_case(False)

    def test_grad_masked_shifted(self):
        self._grad_case(True)

    @pytest.mark.parametrize("band", [False, True])
    def test_swinblock_train_grads_match_xla(self, monkeypatch, band):
        """Full SwinBlock (shifted, train=True) with BOTH fused custom VJPs
        (attention + MLP) == the XLA path, values AND param grads (incl.
        the relative-position bias table through dbias). C=128 so the
        fused-MLP lane gate passes. band=True routes through the image-
        layout band kernel (H=8, W=12, ws=4 -> nH=2, nW=3: covers the odd
        trailing window AND the shifted mask indexing per band row)."""
        import preworld_tpu.ops.swin_mlp_pallas as smp
        import preworld_tpu.ops.window_attn_pallas as wap
        from preworld_tpu.models.swin import SwinBlock

        orig = wap.fused_window_attention_vjp
        monkeypatch.setattr(
            wap, "fused_window_attention_vjp",
            lambda qkv, bias, mask, h, g=8, interp=False: orig(
                qkv, bias, mask, h, g, True
            ),
        )
        orig_band = wap.band_window_attention_vjp
        monkeypatch.setattr(
            wap, "band_window_attention_vjp",
            lambda qkv, bias, mask, h, ws, interp=False: orig_band(
                qkv, bias, mask, h, ws, True
            ),
        )
        orig_mlp = smp.fused_swin_mlp_vjp
        monkeypatch.setattr(
            smp, "fused_swin_mlp_vjp",
            lambda x, ls, lb, w1, b1, w2, b2, rs, br, hc, interp: orig_mlp(
                x, ls, lb, w1, b1, w2, b2, rs, br, hc, True
            ),
        )

        rng = np.random.default_rng(0)
        B, H, W, C, heads, ws = 2, 8, 12, 128, 4, 4
        x = jnp.asarray(rng.normal(size=(B, H * W, C)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(B, H * W, C)).astype(np.float32))

        def run(fused):
            blk = SwinBlock(C, heads, ws, shift=True, use_fused_attn=fused,
                            use_fused_mlp=fused,
                            use_band_attn=band if fused else False)
            params = blk.init(jax.random.PRNGKey(0), x, (H, W), train=True)

            def loss(p):
                return (blk.apply(p, x, (H, W), train=True) * ct).sum()

            return loss(params), jax.grad(loss)(params), params

        lf, gf, pf = run(True)
        lx, gx, px = run(False)
        # same init -> identical param trees
        chex.assert_trees_all_close(pf, px, rtol=0, atol=0)
        np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
        chex.assert_trees_all_close(gf, gx, rtol=5e-5, atol=5e-5)


class TestPlaneSweepKernel:
    """Experimental Pallas cost-volume kernel vs the XLA path (interpret)."""

    def test_matches_xla_on_smooth_warp(self):
        from preworld_tpu.models.depthnet import stereo_cost_volume
        from preworld_tpu.ops.cost_volume_pallas import plane_sweep_cost
        import flax.linen as nn

        rng = np.random.default_rng(0)
        BN, H, W, C, D = 2, 16, 128, 128, 4
        prev = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        gx = np.zeros((BN, D, H, W), np.float32)
        gy = np.zeros((BN, D, H, W), np.float32)
        for d in range(D):
            shift = 3.0 * (d + 1) / D
            gx[:, d] = (xs + shift + rng.normal(0, 0.3, (H, W))) / (W - 1) * 2 - 1
            gy[:, d] = (ys + 0.5 * shift + rng.normal(0, 0.3, (H, W))) / (H - 1) * 2 - 1
        gx[:, :, :2, :4] = -1.5  # out-of-image samples
        grid = jnp.asarray(np.stack([gx, gy], -1).reshape(BN, D * H, W, 2))

        ours = nn.softmax(
            -plane_sweep_cost(prev, curr, grid, bias=5.0, interpret=True),
            axis=1,
        )
        ref = stereo_cost_volume(prev, curr, grid, bias=5.0, depth_chunk=2)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-4
        )

    def test_gen_stereo_grid_matches_einsum_chain(self):
        """The fused scalar-coefficient gen_stereo_grid (r4: one elementwise
        pass, no big einsums) == the straightforward einsum-chain
        transcription of the reference `gen_grid`
        (`view_transformer.py:546-574`), including post-aug rotation /
        translation and the behind-camera mask."""
        from preworld_tpu.data.synthetic import camera_rig
        from preworld_tpu.models.depthnet import gen_stereo_grid
        from preworld_tpu.geometry.frustum import GridConfig, create_frustum

        rng = np.random.default_rng(21)
        input_size = (64, 128)
        N, cv_down = 2, 4
        grid_cfg = GridConfig(
            x=(-8.0, 8.0, 0.8), y=(-8.0, 8.0, 0.8), z=(-1.0, 5.4, 0.8),
            depth=(1.0, 9.0, 0.5),
        )
        frustum = jnp.asarray(create_frustum(grid_cfg, input_size, cv_down))
        rig = camera_rig(N, input_size, rng)
        yaw = np.deg2rad(5.0)
        adj = np.eye(4, dtype=np.float32)
        adj[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                       [np.sin(yaw), np.cos(yaw)]]
        adj[0, 3] = 0.9
        s2e = rig["sensor2ego"]
        k2s_np = np.stack(
            [np.linalg.inv(s2e[n]) @ np.linalg.inv(adj) @ s2e[n]
             for n in range(N)]
        ).astype(np.float32)
        # camera 1: flip the z row so part of the frustum lands BEHIND the
        # previous camera — exercises the -2 sentinel branch
        k2s_np[1, 2, :] *= -1.0
        k2s = jnp.asarray(k2s_np)[None]
        intrins = jnp.asarray(rig["intrin"])[None]
        # non-trivial post-aug: rotation + flip-ish scale + translation
        th = 0.05
        pr = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1]], np.float32) * np.array(
            [[0.9], [1.1], [1.0]], np.float32)
        post_rots = jnp.asarray(np.broadcast_to(pr, (1, N, 3, 3)).copy())
        post_trans = jnp.asarray(
            rng.normal(0, 3.0, size=(1, N, 3)).astype(np.float32)
        )

        got = gen_stereo_grid(
            frustum, k2s, intrins, post_rots, post_trans, input_size
        )

        # straightforward chain (the reference transcription, pre-r4 form)
        hi, wi = input_size
        pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
        inv_post = jnp.linalg.inv(post_rots)
        pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
        pts = jnp.concatenate(
            [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], -1
        )
        rots = k2s[:, :, :3, :3]
        trans = k2s[:, :, :3, 3]
        combine = rots @ jnp.linalg.inv(intrins)
        pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
        pts = pts + trans[:, :, None, None, None, :]
        neg_mask = pts[..., 2] < 1e-3
        pts = jnp.einsum("bnij,bndhwj->bndhwi", intrins, pts)
        pts = pts[..., :2] / pts[..., 2:3]
        pts = jnp.einsum(
            "bnij,bndhwj->bndhwi", post_rots[:, :, :2, :2], pts
        )
        pts = pts + post_trans[:, :, None, None, None, :2]
        px = pts[..., 0] / (wi - 1.0) * 2.0 - 1.0
        py = pts[..., 1] / (hi - 1.0) * 2.0 - 1.0
        px = jnp.where(neg_mask, -2.0, px)
        py = jnp.where(neg_mask, -2.0, py)
        D = frustum.shape[0]
        want = jnp.stack([px, py], -1).reshape(
            N, D * (hi // cv_down), wi // cv_down, 2
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )
        # the behind-camera sentinel actually fired somewhere
        assert (np.asarray(got) == -2.0).any()

    def test_matches_xla_on_realistic_geometry(self):
        """Full gen_stereo_grid geometry (ego motion + yaw) at reduced scale.

        The kernel's documented fallback renders samples beyond its window
        as zeros+bias, so we assert exactness on ~all entries rather than
        all: the tail must stay tiny at realistic geometry.
        """
        from preworld_tpu.data.synthetic import camera_rig
        from preworld_tpu.models.depthnet import (
            gen_stereo_grid,
            stereo_cost_volume,
        )
        from preworld_tpu.ops.cost_volume_pallas import plane_sweep_cost
        from preworld_tpu.geometry.frustum import GridConfig, create_frustum
        import flax.linen as nn

        rng = np.random.default_rng(7)
        input_size = (128, 352)
        N, C, cv_down = 3, 128, 4
        H, W = input_size[0] // cv_down, input_size[1] // cv_down
        grid_cfg = GridConfig(
            x=(-40.0, 40.0, 0.4), y=(-40.0, 40.0, 0.4), z=(-1.0, 5.4, 6.4),
            depth=(1.0, 23.0, 1.0),
        )
        frustum = jnp.asarray(create_frustum(grid_cfg, input_size, cv_down))
        D = frustum.shape[0]

        rig = camera_rig(N, input_size, rng)
        # prev ego pose: 1.2 m forward + 4 deg yaw between frames
        yaw = np.deg2rad(4.0)
        adj = np.eye(4, dtype=np.float32)
        adj[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                       [np.sin(yaw), np.cos(yaw)]]
        adj[0, 3] = 1.2
        s2e = rig["sensor2ego"]
        k2s = np.stack(
            [np.linalg.inv(s2e[n]) @ np.linalg.inv(adj) @ s2e[n]
             for n in range(N)]
        ).astype(np.float32)

        grid_w = gen_stereo_grid(
            frustum,
            jnp.asarray(k2s)[None],
            jnp.asarray(rig["intrin"])[None],
            jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                        (N, 3, 3))).reshape(1, N, 3, 3),
            jnp.zeros((1, N, 3)),
            input_size,
        )
        prev = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))

        ours = nn.softmax(
            -plane_sweep_cost(prev, curr, grid_w, bias=5.0, interpret=True),
            axis=1,
        )
        ref = stereo_cost_volume(prev, curr, grid_w, bias=5.0, depth_chunk=1)
        ours, ref = np.asarray(ours), np.asarray(ref)
        mism = np.abs(ours - ref) > 1e-4
        assert mism.mean() < 2e-3, mism.mean()

    def test_window_resegmentation(self):
        """Per-depth y drift large enough to force multiple window DMAs."""
        from preworld_tpu.models.depthnet import stereo_cost_volume
        from preworld_tpu.ops.cost_volume_pallas import plane_sweep_cost
        import flax.linen as nn

        rng = np.random.default_rng(1)
        BN, H, W, C, D = 1, 64, 128, 32, 8
        prev = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        gx = np.zeros((BN, D, H, W), np.float32)
        gy = np.zeros((BN, D, H, W), np.float32)
        for d in range(D):
            # y shift sweeps 0..56 rows across depth: exceeds the WH=48
            # window band repeatedly -> several segments per tile
            gx[:, d] = (xs + 0.3 * d) / (W - 1) * 2 - 1
            gy[:, d] = (ys + 8.0 * d + 0.25) / (H - 1) * 2 - 1
        grid = jnp.asarray(np.stack([gx, gy], -1).reshape(BN, D * H, W, 2))

        ours = nn.softmax(
            -plane_sweep_cost(prev, curr, grid, bias=5.0, interpret=True),
            axis=1,
        )
        ref = stereo_cost_volume(prev, curr, grid, bias=5.0, depth_chunk=2)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-4
        )


class TestFusedSwinMlp:
    """Pallas fused LN2+MLP+residual (interpret) == the XLA block path."""

    def _xla_mlp(self, x, ls, lb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = xc * jax.lax.rsqrt(var + 1e-5) * ls + lb
        h = jax.nn.gelu(xn @ w1 + b1, approximate=False)
        return x + h @ w2 + b2

    def _case(self, M, C, Hd, block_rows, hidden_chunk, shape3d=False,
              seed=0):
        from preworld_tpu.ops.swin_mlp_pallas import fused_swin_mlp

        rng = np.random.default_rng(seed)
        shape = (2, M // 2, C) if shape3d else (M, C)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ls = jnp.asarray(rng.normal(size=C).astype(np.float32))
        lb = jnp.asarray(rng.normal(size=C).astype(np.float32))
        w1 = jnp.asarray((rng.normal(size=(C, Hd)) * 0.05).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=Hd).astype(np.float32))
        w2 = jnp.asarray((rng.normal(size=(Hd, C)) * 0.05).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=C).astype(np.float32))
        got = fused_swin_mlp(x, ls, lb, w1, b1, w2, b2,
                             block_rows=block_rows,
                             hidden_chunk=hidden_chunk, interpret=True)
        want = self._xla_mlp(x, ls, lb, w1, b1, w2, b2)
        assert got.shape == x.shape
        # erf approximation (A&S 7.1.26, max err 1.5e-7) bounds the
        # achievable mismatch far below any bf16-visible level
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_exact_tiles(self):
        self._case(256, 128, 512, 128, 256)

    def test_ragged_rows_padding(self):
        self._case(300, 128, 512, 128, 512)

    def test_3d_tokens_hidden_chunking(self):
        self._case(64, 128, 512, 32, 128, shape3d=True)

    def _grad_case(self, M=256, C=128, Hd=512, block_rows=128,
                   hidden_chunk=256, row_scale=None, seed=1):
        from preworld_tpu.ops.swin_mlp_pallas import fused_swin_mlp_vjp

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
        ls = jnp.asarray(rng.normal(size=C).astype(np.float32))
        lb = jnp.asarray(rng.normal(size=C).astype(np.float32))
        w1 = jnp.asarray((rng.normal(size=(C, Hd)) * 0.05).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=Hd).astype(np.float32))
        w2 = jnp.asarray((rng.normal(size=(Hd, C)) * 0.05).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=C).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))

        def loss_fused(*args):
            out = fused_swin_mlp_vjp(
                *args, row_scale, block_rows, hidden_chunk, True
            )
            return (out * ct).sum()

        def loss_xla(x_, ls_, lb_, w1_, b1_, w2_, b2_):
            xf = x_.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            xc = xf - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            xn = xc * jax.lax.rsqrt(var + 1e-5) * ls_ + lb_
            h = jax.nn.gelu(xn @ w1_ + b1_, approximate=False)
            y = h @ w2_ + b2_
            if row_scale is not None:
                y = y * row_scale[:, None]
            return ((x_ + y) * ct).sum()

        args = (x, ls, lb, w1, b1, w2, b2)
        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        gx = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
        for a, b, name in zip(
            gf, gx, ["x", "ls", "lb", "w1", "b1", "w2", "b2"]
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
                err_msg=f"grad mismatch: {name}",
            )

    def test_grads(self):
        self._grad_case()

    def test_grads_ragged_rows(self):
        self._grad_case(M=300, block_rows=128)

    def test_grads_drop_path_row_scale(self):
        rng = np.random.default_rng(7)
        rs = jnp.asarray(
            (rng.random(300) > 0.3).astype(np.float32) / 0.7
        )
        self._grad_case(M=300, block_rows=128, row_scale=rs, seed=2)


class TestPlaneSweepSupportedGate:
    def test_width_gate_matches_pack_info_assert(self):
        """plane_sweep_supported must reject every shape plane_sweep_cost
        would assert on (auto-selection promises a graceful fallback)."""
        from preworld_tpu.ops.cost_volume_pallas import (
            TW,
            plane_sweep_supported,
        )

        def pack_ok(W):
            wp = max(-(-W // TW) * TW, 256)
            return wp - min(224, wp) <= 15 * 16  # _pack_info xs16 assert

        for W in (64, 128, 224, 352, 440, 464, 465, 512, 1024):
            sup = plane_sweep_supported((1, 128, W, 128))
            assert sup == pack_ok(W), (W, sup)
        # flagship stays on the fused path; too-wide falls back cleanly
        assert plane_sweep_supported((6, 128, 352, 128))
        assert not plane_sweep_supported((6, 128, 512, 128))
        # existing gates still active
        assert not plane_sweep_supported((6, 126, 352, 128))  # H % 8
        assert not plane_sweep_supported((6, 128, 352, 96))   # C % 128

    def test_wide_feature_x_subwindow_packing(self):
        """W=352 (flagship cv width): Wp=384 exercises n_tw=3 tiles and
        xs16 4-bit packing values up to 10 — no other test leaves Wp=256."""
        from preworld_tpu.models.depthnet import stereo_cost_volume
        from preworld_tpu.ops.cost_volume_pallas import plane_sweep_cost
        import flax.linen as nn

        rng = np.random.default_rng(5)
        BN, H, W, C, D = 1, 16, 352, 32, 4
        prev = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(BN, H, W, C)).astype(np.float32))
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        gx = np.zeros((BN, D, H, W), np.float32)
        gy = np.zeros((BN, D, H, W), np.float32)
        for d in range(D):
            # large x drift pushes row sub-window starts across the full
            # 16-aligned packing range [0, (Wp-SW)/16 = 10]
            shift = 40.0 * (d + 1) / D
            gx[:, d] = (xs + shift + rng.normal(0, 0.2, (H, W))) / (W - 1) * 2 - 1
            gy[:, d] = (ys + 0.3 * shift) / (H - 1) * 2 - 1
        grid = jnp.asarray(np.stack([gx, gy], -1).reshape(BN, D * H, W, 2))

        ours = nn.softmax(
            -plane_sweep_cost(prev, curr, grid, bias=5.0, interpret=True),
            axis=1,
        )
        ref = stereo_cost_volume(prev, curr, grid, bias=5.0, depth_chunk=2)
        ours, ref = np.asarray(ours), np.asarray(ref)
        mism = np.abs(ours - ref) > 1e-4
        assert mism.mean() < 2e-3, mism.mean()


class TestFusedSwinAttnBlock:
    """The fully-fused attention half-block on the stage-persistent padded
    layout (ops/swin_block_pallas.py, interpret mode) == the legacy XLA
    SwinBlock path: values AND grads (params + input), through pad
    (H, W not multiples of ws), shift, the odd trailing window and the
    fused-MLP tail."""

    def _patch_interpret(self, monkeypatch):
        import preworld_tpu.ops.swin_block_pallas as sbp

        orig = sbp.fused_swin_attn_block_vjp
        monkeypatch.setattr(
            sbp, "fused_swin_attn_block_vjp",
            lambda x, ls, lb, wq, bq, wp, bp, bias, mask, rs, h, ws, H, W,
            shift, interp=False: orig(
                x, ls, lb, wq, bq, wp, bp, bias, mask, rs, h, ws, H, W,
                shift, True
            ),
        )

    @pytest.mark.parametrize("shifted", [False, True])
    def test_matches_legacy_block(self, monkeypatch, shifted):
        from preworld_tpu.models.swin import SwinBlock

        self._patch_interpret(monkeypatch)
        rng = np.random.default_rng(3)
        B, H, W, C, heads, ws = 2, 7, 10, 128, 4, 4
        pad_b, pad_r = (ws - H % ws) % ws, (ws - W % ws) % ws
        Hp, Wp = H + pad_b, W + pad_r
        x = jnp.asarray(rng.normal(size=(B, H * W, C)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(B, H * W, C)).astype(np.float32))

        blk = SwinBlock(C, heads, ws, shift=shifted, use_fused_attn=False,
                        use_fused_mlp=False)
        params = blk.init(jax.random.PRNGKey(0), x, (H, W), train=True)

        def loss_legacy(p, x_):
            return (blk.apply(p, x_, (H, W), train=True) * ct).sum()

        def loss_fused(p, x_):
            # pad with GARBAGE (not zeros): the kernel's in-bounds masking
            # must make pad content irrelevant
            x4 = x_.reshape(B, H, W, C)
            x4 = jnp.pad(x4, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                         constant_values=37.0)
            out = blk.apply(p, x4, (H, W), train=True)
            return (out[:, :H, :W].reshape(B, H * W, C) * ct).sum()

        lx, gx = jax.value_and_grad(loss_legacy, argnums=(0, 1))(params, x)
        lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(float(lf[0] if isinstance(lf, tuple) else lf),
                                   float(lx[0] if isinstance(lx, tuple) else lx),
                                   rtol=2e-5)
        chex.assert_trees_all_close(gf, gx, rtol=5e-5, atol=5e-5)

    def test_transformer_stage_routing(self, monkeypatch):
        """SwinTransformer with use_block_attn=True (interpret) == the
        plain XLA transformer (use_fused_* False), incl. PatchMerging
        handoff between padded stages and the stage-0 stereo output."""
        from preworld_tpu.models.swin import SwinTransformer

        self._patch_interpret(monkeypatch)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))

        def run(block):
            m = SwinTransformer(
                embed_dims=128, depths=(2, 2), num_heads=(4, 8),
                window_size=4, out_indices=(0, 1), drop_path_rate=0.0,
                use_fused_attn=False, use_fused_mlp=False,
                use_block_attn=block,
            )
            p = m.init(jax.random.PRNGKey(1), x, False, False)
            return m.apply(p, x, False, False), p

        outs_f, pf = run(True)
        outs_x, px = run(False)
        chex.assert_trees_all_close(pf, px, rtol=0, atol=0)
        assert len(outs_f) == len(outs_x)
        for a, b in zip(outs_f, outs_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            )


class TestPlaneSweepHom:
    """r5 homography path: per-plane 3x3 homographies replace the
    (BN, D*H, W, 2) grid tensor (gen_stereo_homography +
    plane_sweep_cost_hom). Oracle: the grid path they replace."""

    def _geometry(self, rng, input_size, N, cv_down, with_postaug=False):
        from preworld_tpu.data.synthetic import camera_rig
        from preworld_tpu.geometry.frustum import GridConfig, create_frustum

        grid_cfg = GridConfig(
            x=(-40.0, 40.0, 0.4), y=(-40.0, 40.0, 0.4), z=(-1.0, 5.4, 6.4),
            depth=(1.0, 25.0, 1.0),  # D=24: divisible by the oracle chunks
        )
        frustum = jnp.asarray(create_frustum(grid_cfg, input_size, cv_down))
        rig = camera_rig(N, input_size, rng)
        yaw = np.deg2rad(4.0)
        adj = np.eye(4, dtype=np.float32)
        adj[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                       [np.sin(yaw), np.cos(yaw)]]
        adj[0, 3] = 1.2
        s2e = rig["sensor2ego"]
        k2s = np.stack(
            [np.linalg.inv(s2e[n]) @ np.linalg.inv(adj) @ s2e[n]
             for n in range(N)]
        ).astype(np.float32)
        if with_postaug:
            th = 0.04
            pr = np.array([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0],
                           [0, 0, 1]], np.float32) * np.array(
                [[0.95], [1.05], [1.0]], np.float32)
            post_rots = np.broadcast_to(pr, (1, N, 3, 3)).copy()
            post_trans = rng.normal(0, 2.0, (1, N, 3)).astype(np.float32)
        else:
            post_rots = np.broadcast_to(
                np.eye(3, dtype=np.float32), (1, N, 3, 3)
            ).copy()
            post_trans = np.zeros((1, N, 3), np.float32)
        return (frustum, jnp.asarray(k2s)[None], jnp.asarray(rig["intrin"])[None],
                jnp.asarray(post_rots), jnp.asarray(post_trans))

    def test_homography_matches_grid(self):
        """H evaluated densely == gen_stereo_grid converted to feature
        pixels, including the behind-camera sentinel and a non-trivial
        (rotation + scale + translation) post-aug."""
        from preworld_tpu.models.depthnet import (
            gen_stereo_grid,
            gen_stereo_homography,
        )

        rng = np.random.default_rng(11)
        input_size = (64, 128)
        N, cv_down = 2, 4
        frustum, k2s, intr, prots, ptrans = self._geometry(
            rng, input_size, N, cv_down, with_postaug=True
        )
        # flip one camera's z row so part of the frustum is behind-camera
        k2s = k2s.at[0, 1, 2, :].multiply(-1.0)
        D, Hf, Wf = frustum.shape[:3]

        grid = np.asarray(gen_stereo_grid(
            frustum, k2s, intr, prots, ptrans, input_size
        )).reshape(N, D, Hf, Wf, 2)
        hom = np.asarray(gen_stereo_homography(
            frustum, k2s, intr, prots, ptrans, input_size
        ))

        ww, hh = np.meshgrid(np.arange(Wf), np.arange(Hf), indexing="xy")
        pix = np.stack([ww, hh, np.ones_like(ww)], -1).astype(np.float64)
        proj = np.einsum("ndij,hwj->ndhwi", hom.astype(np.float64), pix)
        z = proj[..., 2]
        gx_h = proj[..., 0] / z
        gy_h = proj[..., 1] / z

        gx_g = (grid[..., 0] + 1.0) * 0.5 * (Wf - 1)
        gy_g = (grid[..., 1] + 1.0) * 0.5 * (Hf - 1)
        neg_g = grid[..., 0] == -2.0  # the grid's behind-camera sentinel
        neg_h = z < 1e-3
        assert (neg_g == neg_h).all()
        assert neg_h.any()  # the flipped camera actually fired it
        ok = ~neg_h
        np.testing.assert_allclose(gx_h[ok], gx_g[ok], rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(gy_h[ok], gy_g[ok], rtol=1e-3, atol=1e-2)

    def test_kernel_hom_matches_xla_oracle(self):
        """plane_sweep_cost_hom == the XLA grid_sample oracle fed the SAME
        homography-derived coordinates (tight: isolates the KERNEL from
        the ~0.1-px f32 composition noise both coordinate paths share —
        measured comparable to the shipped grid path against an f64
        oracle), plus a loose cross-check against the grid-path kernel."""
        import flax.linen as nn

        from preworld_tpu.models.depthnet import (
            gen_stereo_grid,
            gen_stereo_homography,
            stereo_cost_volume,
        )
        from preworld_tpu.ops.cost_volume_pallas import (
            plane_sweep_cost,
            plane_sweep_cost_hom,
        )

        rng = np.random.default_rng(7)
        input_size = (128, 352)
        N, C, cv_down = 3, 128, 4
        H, W = input_size[0] // cv_down, input_size[1] // cv_down
        frustum, k2s, intr, prots, ptrans = self._geometry(
            rng, input_size, N, cv_down
        )
        grid_w = gen_stereo_grid(frustum, k2s, intr, prots, ptrans,
                                 input_size)
        hom = gen_stereo_homography(frustum, k2s, intr, prots, ptrans,
                                    input_size)
        D = frustum.shape[0]
        prev = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))

        got = np.asarray(plane_sweep_cost_hom(
            prev, curr, hom, bias=5.0, interpret=True
        ))

        # oracle on the homography-derived grid (f32, kernel algebra)
        hnp = np.asarray(hom)
        ww = np.broadcast_to(np.arange(W, dtype=np.float32)[None], (H, W))
        hh = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (H, W))
        pix = np.stack([ww, hh, np.ones_like(ww)], -1)
        proj = np.einsum("ndij,hwj->ndhwi", hnp, pix).astype(np.float32)
        z = proj[..., 2]
        gx = proj[..., 0] / z
        gy = proj[..., 1] / z
        px = np.where(z < 1e-3, -2.0, gx / (0.5 * (W - 1)) - 1.0)
        py = np.where(z < 1e-3, -2.0, gy / (0.5 * (H - 1)) - 1.0)
        grid_h = jnp.asarray(
            np.stack([px, py], -1).reshape(N, D * H, W, 2)
        )
        ref = np.asarray(stereo_cost_volume(
            prev, curr, grid_h, bias=5.0, depth_chunk=1
        ))
        ours = np.asarray(nn.softmax(-jnp.asarray(got), axis=1))
        mism = np.abs(ours - ref) > 1e-4
        assert mism.mean() < 2e-3, mism.mean()

        # cross-path check: same up to the two paths' independent f32
        # composition noise (softmax space)
        want = np.asarray(nn.softmax(-plane_sweep_cost(
            prev, curr, grid_w, bias=5.0, interpret=True
        ), axis=1))
        mism = np.abs(ours - want) > 1e-2
        assert mism.mean() < 0.05, mism.mean()

    def test_compute_stereo_cost_volume_fused_routes_hom(self, monkeypatch):
        """The model-facing entry with use_fused=True goes through the
        homography kernel and matches the plain XLA path."""
        import preworld_tpu.ops.cost_volume_pallas as cvp
        from preworld_tpu.models.view_transformer import (
            compute_stereo_cost_volume,
        )

        orig = cvp.plane_sweep_cost_hom
        calls = {}

        def patched(prev, curr, hom, bias=0.0, interpret=False):
            calls["hom_shape"] = hom.shape
            return orig(prev, curr, hom, bias=bias, interpret=True)

        monkeypatch.setattr(cvp, "plane_sweep_cost_hom", patched)

        rng = np.random.default_rng(3)
        input_size = (128, 352)
        N, C, cv_down = 2, 128, 4
        H, W = input_size[0] // cv_down, input_size[1] // cv_down
        frustum, k2s, intr, prots, ptrans = self._geometry(
            rng, input_size, N, cv_down
        )
        prev = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        curr = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        cams = {"intrin": intr, "post_rot": prots, "post_tran": ptrans}
        stereo = {"prev_feat": prev, "curr_feat": curr, "k2s_sensor": k2s}

        got = np.asarray(compute_stereo_cost_volume(
            frustum, cams, stereo, input_size, bias=5.0, use_fused=True
        ))
        assert calls["hom_shape"] == (N, frustum.shape[0], 3, 3)
        ref = np.asarray(compute_stereo_cost_volume(
            frustum, cams, stereo, input_size, bias=5.0,
            use_fused=False, use_table=False,
        ))
        mism = np.abs(got - ref) > 1e-4
        assert mism.mean() < 2e-3, mism.mean()


class TestConv3dZFold:
    """Block-z-banded 2D reformulation of conv3d (layers.conv3d_zfold):
    exact vs nn.Conv 3D across strides, odd Z, bias — XLA's conv3d
    lowering im2cols ~k^3 patch copies into HBM (2.57 GB for one flagship
    heads conv, measured r5), which this path avoids."""

    @pytest.mark.parametrize("strides,Z", [(1, 16), (2, 16), (1, 5), (2, 7)])
    def test_matches_conv3d(self, strides, Z):
        import flax
        import flax.linen as nn

        from preworld_tpu.models.layers import ConvNormAct

        rng = np.random.default_rng(Z * 10 + strides)
        x = jnp.asarray(rng.normal(size=(2, 10, 12, Z, 8)).astype(np.float32))
        m = ConvNormAct(6, (3, 3, 3), strides=strides, use_bias=True,
                        norm=None, act=None)
        v = m.init(jax.random.PRNGKey(0), x)
        p = flax.core.unfreeze(v["params"])
        p["Conv_0"]["kernel"] = jnp.asarray(
            rng.normal(size=p["Conv_0"]["kernel"].shape).astype(np.float32))
        p["Conv_0"]["bias"] = jnp.asarray(
            rng.normal(size=p["Conv_0"]["bias"].shape).astype(np.float32))
        got = m.apply({"params": p}, x)
        ref = nn.Conv(6, (3, 3, 3), strides=(strides,) * 3,
                      padding=[(1, 1)] * 3, use_bias=True).apply(
            {"params": p["Conv_0"]}, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_grads_match(self):
        import flax
        import flax.linen as nn

        from preworld_tpu.models.layers import ConvNormAct

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 4, 3)).astype(np.float32))
        ct_key = jax.random.PRNGKey(1)
        m = ConvNormAct(4, (3, 3, 3), use_bias=True, norm=None, act=None)
        v = m.init(jax.random.PRNGKey(0), x)

        def loss_fold(p, x_):
            return (m.apply({"params": p}, x_) ** 2).sum()

        ref_conv = nn.Conv(4, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=True)

        def loss_ref(p, x_):
            return (ref_conv.apply({"params": p["Conv_0"]}, x_) ** 2).sum()

        gf = jax.grad(loss_fold, argnums=(0, 1))(dict(v["params"]), x)
        gr = jax.grad(loss_ref, argnums=(0, 1))(dict(v["params"]), x)
        chex.assert_trees_all_close(gf, gr, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("strides", [1, 2])
    def test_zfold_direct_odd_shapes(self, strides):
        """conv3d_zfold directly, asymmetric spatial extents."""
        import flax.linen as nn

        from preworld_tpu.models.layers import conv3d_zfold

        rng = np.random.default_rng(9 + strides)
        x = jnp.asarray(
            rng.normal(size=(2, 9, 11, 6, 8)).astype(np.float32)
        )
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 6)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        got = conv3d_zfold(x, k, b, (strides,) * 3, [(1, 1)] * 3, (1, 1, 1))
        ref = nn.Conv(6, (3, 3, 3), strides=(strides,) * 3,
                      padding=[(1, 1)] * 3, use_bias=True).apply(
            {"params": {"kernel": k, "bias": b}}, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


class TestSortedScatterGrad:
    """r5: the corner8 backward's sorted MXU segment-sum path
    (field_sample.scatter_sorted via bev_pool_pallas_sorted) == the
    `.at[].add` scatter oracle, full and live-cap-compacted."""

    @pytest.mark.parametrize("live_cap", [0, 8])
    def test_matches_scatter_path(self, monkeypatch, live_cap):
        import preworld_tpu.ops.bev_pool_pallas as bpp
        import preworld_tpu.ops.field_sample as fs

        orig = bpp.bev_pool_pallas_sorted
        monkeypatch.setattr(
            bpp, "bev_pool_pallas_sorted",
            lambda vals, vox, nv, **kw: orig(vals, vox, nv, interpret=True),
        )
        rng = np.random.default_rng(4)
        X, Y, Z, C = 12, 10, 6, 5
        R, S = 64, 40
        pts = rng.uniform(-1.25, 1.25, (R, S, 3)).astype(np.float32)
        g = rng.normal(size=(R, S, C)).astype(np.float32)
        if live_cap:
            # contiguous live spans (the tier-1 window assumption) + a few
            # overflow rays handled by tier 2
            mask = np.zeros((R, S), np.float32)
            starts = rng.integers(0, S - 6, R)
            for r in range(R):
                mask[r, starts[r] : starts[r] + rng.integers(1, 6)] = 1.0
            mask[:3, :] = 1.0  # overflow rays (span S > cap)
            g = g * mask[..., None]
        pts_j, g_j = jnp.asarray(pts), jnp.asarray(g)

        def run(sorted_flag):
            monkeypatch.setenv(
                "PREWORLD_SORTED_SCATTER", "1" if sorted_flag else "0"
            )
            return np.asarray(fs._corner8_scatter_grad(
                (X, Y, Z, C), (X, Y, Z), pts_j, g_j, live_cap=live_cap
            ))

        want = run(False)
        got = run(True)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert np.abs(want).max() > 0  # the fixture actually scattered
