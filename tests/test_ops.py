"""Golden tests for the XLA ops against torch / the reference implementation."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from aa_rmvsnet_tpu.ops import (
    bilinear_sample,
    bilinear_sample_normalized,
    warp_src_feature,
    resize_bilinear_align_corners,
    resize_trilinear_align_corners,
)
from aa_rmvsnet_tpu.ops.deform import deform_sample, deform_conv_apply

from conftest import reference_available


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestBilinearSample:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_torch_grid_sample(self, seed):
        B, H, W, C = 2, 13, 17, 5
        feat = rand(B, H, W, C, seed=seed)
        # grid spanning in-bounds and far out-of-bounds
        grid = (np.random.RandomState(seed + 10).rand(B, 9, 11, 2) * 3 - 1.5).astype(np.float32)

        ours = np.asarray(bilinear_sample_normalized(jnp.asarray(feat), jnp.asarray(grid)))

        t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
        t_out = F.grid_sample(
            t_feat, torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=True,
        )
        theirs = t_out.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_pixel_coords_identity(self):
        """Sampling at integer pixel centers returns the texels themselves."""
        feat = rand(1, 6, 7, 3)
        ys, xs = np.meshgrid(np.arange(6), np.arange(7), indexing="ij")
        coords = np.stack([xs, ys], -1).astype(np.float32)[None]
        out = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(coords)))
        np.testing.assert_allclose(out, feat, atol=1e-6)

    def test_out_of_bounds_is_zero(self):
        feat = np.ones((1, 4, 4, 2), np.float32)
        coords = np.array([[[-2.0, -2.0], [10.0, 1.0], [1.0, 8.5]]], np.float32)
        out = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(coords)))
        np.testing.assert_array_equal(out, 0)


class TestResize:
    @pytest.mark.parametrize("scale", [2, 4])
    def test_bilinear_upsample_matches_torch(self, scale):
        x = rand(2, 9, 11, 6, seed=3)
        ours = np.asarray(
            resize_bilinear_align_corners(jnp.asarray(x), 9 * scale, 11 * scale)
        )
        t = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=scale,
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)

    def test_trilinear_matches_torch(self):
        x = rand(1, 12, 10, 8, 2, seed=4)  # N, D, H, W, C
        ours = np.asarray(resize_trilinear_align_corners(jnp.asarray(x), 32, 5, 4))
        t = F.interpolate(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3), size=(32, 5, 4),
            mode="trilinear", align_corners=True,
        ).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)

    def test_downsample_matches_torch(self):
        x = rand(1, 16, 16, 3, seed=5)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 8, 4))
        t = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(8, 4),
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
class TestHomographyWarp:
    def _random_projs(self, B, seed=0):
        """Plausible MVS projection matrices: K @ [R|t] with small rotations."""
        rng = np.random.RandomState(seed)
        projs = []
        for _ in range(2):
            K = np.array([[250.0, 0, 30.0], [0, 250.0, 25.0], [0, 0, 1]], np.float32)
            batch = []
            for b in range(B):
                angle = rng.uniform(-0.1, 0.1)
                c, s = np.cos(angle), np.sin(angle)
                R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
                t = rng.uniform(-10, 10, size=(3, 1)).astype(np.float32)
                E = np.eye(4, dtype=np.float32)
                E[:3, :3], E[:3, 3:] = R, t
                P = E.copy()
                P[:3, :4] = K @ P[:3, :4]
                batch.append(P)
            projs.append(np.stack(batch))
        return projs  # [src_proj, ref_proj]

    def test_matches_reference_warp(self):
        from oracle import import_reference_module

        ref_mod = import_reference_module("models.module")

        B, H, W, C, D = 2, 24, 32, 8, 3
        feat = rand(B, H, W, C, seed=7)
        src_proj, ref_proj = self._random_projs(B, seed=8)
        depths = np.linspace(400, 900, D).astype(np.float32)[None].repeat(B, 0)

        ours = np.asarray(
            warp_src_feature(
                jnp.asarray(feat), jnp.asarray(src_proj), jnp.asarray(ref_proj),
                jnp.asarray(depths),
            )
        )  # (B, D, H, W, C)

        from oracle import torch11_grid_sample_semantics

        t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
        with torch11_grid_sample_semantics():
            for d in range(D):
                theirs = ref_mod.homo_warping_depthwise(
                    t_feat, torch.from_numpy(src_proj), torch.from_numpy(ref_proj),
                    torch.from_numpy(depths[:, d]),
                ).permute(0, 2, 3, 1).numpy()
                np.testing.assert_allclose(ours[:, d], theirs, atol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
class TestDeformSampling:
    def test_matches_reference_deform_conv(self):
        from oracle import import_reference_module

        ref_mod = import_reference_module("models.module")
        torch.manual_seed(0)
        B, H, W, C, O = 2, 11, 13, 6, 4
        layer = ref_mod.DeformConv2d(C, O, kernel_size=3, padding=1, stride=1, bias=True)
        # Non-zero offsets/modulation to exercise the fractional path.
        with torch.no_grad():
            layer.p_conv.weight.normal_(0, 0.05)
            layer.m_conv.weight.normal_(0, 0.05)

        x = rand(B, H, W, C, seed=11)
        t_x = torch.from_numpy(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            theirs = layer(t_x).permute(0, 2, 3, 1).numpy()
            offset = layer.p_conv(t_x).permute(0, 2, 3, 1).numpy()
            modulation = torch.sigmoid(layer.m_conv(t_x)).permute(0, 2, 3, 1).numpy()

        samples = deform_sample(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(modulation)
        )
        kernel = layer.conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        bias = layer.conv.bias.detach().numpy()
        ours = np.asarray(deform_conv_apply(samples, jnp.asarray(kernel), jnp.asarray(bias)))
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_zero_offset_half_modulation_is_scaled_conv(self):
        """With zero offsets and m=0.5 (the reference's init state) the op is
        an ordinary 3x3 conv scaled by 0.5."""
        B, H, W, C, O = 1, 8, 9, 4, 5
        x = rand(B, H, W, C, seed=12)
        offset = np.zeros((B, H, W, 18), np.float32)
        modulation = np.full((B, H, W, 9), 0.5, np.float32)
        kernel = rand(3, 3, C, O, seed=13)

        samples = deform_sample(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(modulation))
        ours = np.asarray(deform_conv_apply(samples, jnp.asarray(kernel)))

        t = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(kernel.transpose(3, 2, 0, 1)).contiguous(),
            padding=1,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, 0.5 * t, atol=1e-4)


class TestPatchSample:
    """Patch-table sampling must match the plain bilinear sampler exactly."""

    def test_matches_bilinear_sampler(self):
        from aa_rmvsnet_tpu.ops.patch_sample import build_patch_table, patch_bilinear_sample
        from aa_rmvsnet_tpu.ops.grid_sample import bilinear_sample_xy

        B, H, W, C = 2, 13, 17, 5
        feat = rand(B, H, W, C, seed=20)
        rng = np.random.RandomState(21)
        # spans in-bounds, border-straddling, and far out-of-bounds
        x = (rng.rand(B, 300) * (W + 8) - 4).astype(np.float32)
        y = (rng.rand(B, 300) * (H + 8) - 4).astype(np.float32)

        table = build_patch_table(jnp.asarray(feat))
        ours = np.asarray(
            patch_bilinear_sample(table, jnp.asarray(x), jnp.asarray(y), H, W)
        )
        ref = np.asarray(
            bilinear_sample_xy(jnp.asarray(feat), jnp.asarray(x), jnp.asarray(y))
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_quantized_table_error_bound(self):
        """fp8 e4m3 with per-channel scales: relative error per texel is
        bounded by half the e4m3 quantum (2^-4 of the channel max); the
        bilinear blend is a convex combination, so the same bound holds on
        every sample."""
        from aa_rmvsnet_tpu.ops.patch_sample import (
            build_patch_table,
            build_patch_table_quant,
            patch_bilinear_sample,
        )

        B, H, W, C = 2, 13, 17, 5
        feat = rand(B, H, W, C, seed=23)
        rng = np.random.RandomState(24)
        x = (rng.rand(B, 300) * (W + 8) - 4).astype(np.float32)
        y = (rng.rand(B, 300) * (H + 8) - 4).astype(np.float32)

        table, scale = build_patch_table_quant(jnp.asarray(feat))
        assert table.dtype == jnp.float8_e4m3fn
        quant = np.asarray(
            patch_bilinear_sample(
                table, jnp.asarray(x), jnp.asarray(y), H, W,
                scale=scale, compute_dtype=jnp.float32,
            )
        )
        exact = np.asarray(
            patch_bilinear_sample(
                build_patch_table(jnp.asarray(feat)),
                jnp.asarray(x), jnp.asarray(y), H, W,
            )
        )
        ch_max = np.abs(feat).max(axis=(1, 2))  # (B, C)
        bound = (2.0 ** -4) * ch_max[:, None, :] + 1e-6
        assert np.all(np.abs(quant - exact) <= bound)

    def test_packed_matches_bilinear_within_span(self):
        """Packed 4x4 rows: exact vs the plain sampler whenever each
        group's coordinate span is <= 2 px — including groups straddling
        the border and fully out of bounds."""
        from aa_rmvsnet_tpu.ops.patch_sample import (
            build_patch_table4,
            patch_bilinear_sample_packed,
        )
        from aa_rmvsnet_tpu.ops.grid_sample import bilinear_sample_xy

        B, H, W, C, G, K = 2, 13, 17, 5, 200, 8
        feat = rand(B, H, W, C, seed=30)
        rng = np.random.RandomState(31)
        # group base anywhere incl. outside; K samples within a 2 px span
        bx = (rng.rand(B, G, 1) * (W + 8) - 4).astype(np.float32)
        by = (rng.rand(B, G, 1) * (H + 8) - 4).astype(np.float32)
        x = bx + (rng.rand(B, G, K) * 2.0).astype(np.float32)
        y = by + (rng.rand(B, G, K) * 2.0).astype(np.float32)

        table = build_patch_table4(jnp.asarray(feat))
        ours = np.asarray(
            patch_bilinear_sample_packed(
                table, jnp.asarray(x), jnp.asarray(y), H, W
            )
        )
        ref = np.asarray(
            bilinear_sample_xy(
                jnp.asarray(feat),
                jnp.asarray(x.reshape(B, -1)),
                jnp.asarray(y.reshape(B, -1)),
            )
        ).reshape(B, G, K, C)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_packed6_matches_bilinear_within_4px_span(self):
        """6x6 packed rows: exact for spans up to 4 px — where the 4x4
        window would silently lose taps (the gather_pack x2 enabler at the
        north-star geometry, whose K=16 span is ~3.8 px)."""
        from aa_rmvsnet_tpu.ops.patch_sample import (
            build_patch_table_packed,
            patch_bilinear_sample_packed,
        )
        from aa_rmvsnet_tpu.ops.grid_sample import bilinear_sample_xy

        B, H, W, C, G, K = 2, 13, 17, 5, 200, 16
        feat = rand(B, H, W, C, seed=36)
        rng = np.random.RandomState(37)
        bx = (rng.rand(B, G, 1) * (W + 8) - 4).astype(np.float32)
        by = (rng.rand(B, G, 1) * (H + 8) - 4).astype(np.float32)
        # spans drawn up to the full 4 px limit (beyond the 4x4 contract)
        x = bx + (rng.rand(B, G, K) * 4.0).astype(np.float32)
        y = by + (rng.rand(B, G, K) * 4.0).astype(np.float32)

        table = build_patch_table_packed(jnp.asarray(feat), taps=6)
        ours = np.asarray(
            patch_bilinear_sample_packed(
                table, jnp.asarray(x), jnp.asarray(y), H, W, taps=6
            )
        )
        ref = np.asarray(
            bilinear_sample_xy(
                jnp.asarray(feat),
                jnp.asarray(x.reshape(B, -1)),
                jnp.asarray(y.reshape(B, -1)),
            )
        ).reshape(B, G, K, C)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_packed_tiled_matches_single_tile(self):
        """The lax.map pixel tiling (memory lever, round-3) must be
        numerically invisible, including the folded output layout."""
        from aa_rmvsnet_tpu.ops.patch_sample import (
            build_patch_table4,
            patch_bilinear_sample_packed,
        )

        B, H, W, C, G, K = 1, 13, 17, 5, 192, 4
        feat = rand(B, H, W, C, seed=34)
        rng = np.random.RandomState(35)
        bx = (rng.rand(B, G, 1) * (W + 4) - 2).astype(np.float32)
        by = (rng.rand(B, G, 1) * (H + 4) - 2).astype(np.float32)
        x = jnp.asarray(bx + (rng.rand(B, G, K) * 2.0).astype(np.float32))
        y = jnp.asarray(by + (rng.rand(B, G, K) * 2.0).astype(np.float32))

        table = build_patch_table4(jnp.asarray(feat))
        one = np.asarray(patch_bilinear_sample_packed(table, x, y, H, W))
        # Tiny target -> 64-px tiles -> 3 tiles of 64 groups each
        per_px = K * 4 * 128 * 4
        tiled = np.asarray(
            patch_bilinear_sample_packed(
                table, x, y, H, W, tile_target_bytes=64 * per_px,
            )
        )
        np.testing.assert_allclose(tiled, one, atol=1e-6)
        folded = np.asarray(
            patch_bilinear_sample_packed(
                table, x, y, H, W, folded_out=True,
                tile_target_bytes=64 * per_px,
            )
        )
        np.testing.assert_allclose(folded.reshape(B, G, K, C), one, atol=1e-6)

    def test_packed_quant_matches_unpacked_quant(self):
        """fp8 packed rows must dequantize to the same samples as the fp8
        2x2 path (same per-channel scales, same table values)."""
        from aa_rmvsnet_tpu.ops.patch_sample import (
            build_patch_table4_quant,
            build_patch_table_quant,
            patch_bilinear_sample,
            patch_bilinear_sample_packed,
        )

        B, H, W, C, G, K = 1, 13, 17, 5, 150, 4
        feat = rand(B, H, W, C, seed=32)
        rng = np.random.RandomState(33)
        bx = (rng.rand(B, G, 1) * (W + 4) - 2).astype(np.float32)
        by = (rng.rand(B, G, 1) * (H + 4) - 2).astype(np.float32)
        x = bx + (rng.rand(B, G, K) * 2.0).astype(np.float32)
        y = by + (rng.rand(B, G, K) * 2.0).astype(np.float32)

        t4, s4 = build_patch_table4_quant(jnp.asarray(feat))
        packed = np.asarray(
            patch_bilinear_sample_packed(
                t4, jnp.asarray(x), jnp.asarray(y), H, W,
                scale=s4, compute_dtype=jnp.float32,
            )
        )
        t2, s2 = build_patch_table_quant(jnp.asarray(feat))
        flat = np.asarray(
            patch_bilinear_sample(
                t2, jnp.asarray(x.reshape(B, -1)), jnp.asarray(y.reshape(B, -1)),
                H, W, scale=s2, compute_dtype=jnp.float32,
            )
        ).reshape(B, G, K, C)
        np.testing.assert_allclose(packed, flat, atol=1e-5)

    def test_max_depth_step_displacement_bound(self):
        """The host bound must dominate the actual per-step displacement at
        every pixel/depth of a randomized plane sweep."""
        from aa_rmvsnet_tpu.ops.homography import (
            homography_terms, max_depth_step_displacement, plane_sweep_xy,
        )

        rng = np.random.RandomState(40)
        H, W, D = 12, 16, 16
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
        ref = np.eye(4)
        ref[:3, :4] = K @ np.eye(4)[:3, :4]
        srcs = []
        for _ in range(3):
            E = np.eye(4)
            E[:3, 3] = rng.randn(3) * 2.0
            P = np.eye(4)
            P[:3, :4] = K @ E[:3, :4]
            srcs.append(P)
        depths = np.linspace(40.0, 90.0, D)

        bound = max_depth_step_displacement(np.stack(srcs), ref, depths, H, W)
        rg, tr = homography_terms(
            jnp.asarray(np.stack(srcs), jnp.float32)[:, None].reshape(3, 4, 4)[None].squeeze(0),
            jnp.asarray(np.tile(ref[None], (3, 1, 1)), jnp.float32),
            H, W,
        )
        x, y = plane_sweep_xy(rg, tr, jnp.asarray(np.tile(depths[None], (3, 1)), jnp.float32))
        dx = np.abs(np.diff(np.asarray(x), axis=1)).max()
        dy = np.abs(np.diff(np.asarray(y), axis=1)).max()
        assert max(dx, dy) <= bound * (1 + 1e-5), (dx, dy, bound)

    def test_integer_coords_identity(self):
        from aa_rmvsnet_tpu.ops.patch_sample import build_patch_table, patch_bilinear_sample

        feat = rand(1, 6, 7, 3, seed=22)
        ys, xs = np.meshgrid(np.arange(6), np.arange(7), indexing="ij")
        table = build_patch_table(jnp.asarray(feat))
        out = np.asarray(
            patch_bilinear_sample(
                table,
                jnp.asarray(xs.reshape(1, -1).astype(np.float32)),
                jnp.asarray(ys.reshape(1, -1).astype(np.float32)),
                6, 7,
            )
        ).reshape(1, 6, 7, 3)
        np.testing.assert_allclose(out, feat, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
class TestDeformConvFused:
    def test_patch_table_deform_matches_reference(self):
        """The production tap-accumulated patch-table deform conv must match
        the reference module bit-for-bit (same test setup as the oracle
        sampling test, but through ops.deform_conv)."""
        from oracle import import_reference_module
        from aa_rmvsnet_tpu.ops.deform import deform_conv

        ref_mod = import_reference_module("models.module")
        torch.manual_seed(5)
        B, H, W, C, O = 2, 11, 13, 6, 4
        layer = ref_mod.DeformConv2d(C, O, kernel_size=3, padding=1, stride=1, bias=True)
        with torch.no_grad():
            layer.p_conv.weight.normal_(0, 0.3)  # large offsets: exercise OOB
            layer.m_conv.weight.normal_(0, 0.05)

        x = rand(B, H, W, C, seed=30)
        t_x = torch.from_numpy(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            theirs = layer(t_x).permute(0, 2, 3, 1).numpy()
            offset = layer.p_conv(t_x).permute(0, 2, 3, 1).numpy()
            modulation = torch.sigmoid(layer.m_conv(t_x)).permute(0, 2, 3, 1).numpy()

        kernel = layer.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        bias = layer.conv.bias.detach().numpy()
        ours = np.asarray(deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(modulation),
            jnp.asarray(kernel), jnp.asarray(bias),
        ))
        np.testing.assert_allclose(ours, theirs, atol=1e-4)
