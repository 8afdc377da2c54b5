"""Parity tests: flax blocks vs torch, and the full core network vs the
reference implementation loaded with the shipped 187k-param checkpoint."""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn_t
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aa_rmvsnet_tpu.models import (
    ConvGNReLU,
    DeconvGNReLU,
    ConvLSTMCell,
    ResnetBlockGN,
    SweepConfig,
    forward,
    init_params,
    load_torch_checkpoint,
    count_params,
    probability_volume,
)
from aa_rmvsnet_tpu.models.convert import _conv, _deconv

from conftest import reference_available, REFERENCE_ROOT

CKPT = os.path.join(REFERENCE_ROOT, "checkpoints/model_dtu_v2.ckpt")


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestBlocks:
    def test_convgnrelu_matches_torch(self):
        torch.manual_seed(0)
        C_in, C_out = 16, 32
        conv = nn_t.Conv2d(C_in, C_out, 3, stride=2, padding=1)
        gn = nn_t.GroupNorm(C_out // 8, C_out)
        with torch.no_grad():
            gn.weight.normal_(1, 0.2)
            gn.bias.normal_(0, 0.2)

        x = rand(2, 12, 16, C_in, seed=1)
        with torch.no_grad():
            ref = F.relu(gn(conv(torch.from_numpy(x).permute(0, 3, 1, 2))))
        ref = ref.permute(0, 2, 3, 1).numpy()

        params = {"params": {
            "conv": {"kernel": _conv(conv.weight.detach().numpy()),
                     "bias": conv.bias.detach().numpy()},
            "gn": {"scale": gn.weight.detach().numpy(),
                   "bias": gn.bias.detach().numpy()},
        }}
        ours = np.asarray(ConvGNReLU(C_out, stride=2).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_deconv_matches_torch(self):
        torch.manual_seed(1)
        C = 16
        deconv = nn_t.ConvTranspose2d(C, C, 3, stride=2, padding=1, output_padding=1)
        gn = nn_t.GroupNorm(C // 8, C)
        with torch.no_grad():
            gn.weight.normal_(1, 0.2)

        x = rand(2, 7, 9, C, seed=2)
        with torch.no_grad():
            ref = F.relu(gn(deconv(torch.from_numpy(x).permute(0, 3, 1, 2))))
        ref = ref.permute(0, 2, 3, 1).numpy()
        assert ref.shape[1:3] == (14, 18)

        params = {"params": {
            "kernel": _deconv(deconv.weight.detach().numpy()),
            "bias": deconv.bias.detach().numpy(),
            "gn": {"scale": gn.weight.detach().numpy(),
                   "bias": gn.bias.detach().numpy()},
        }}
        ours = np.asarray(DeconvGNReLU(C).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resnet_block_matches_torch(self):
        torch.manual_seed(2)
        C = 4
        conv_a = nn_t.Conv2d(C, C, 1)
        gn_a = nn_t.GroupNorm(1, C)
        conv_b = nn_t.Conv2d(C, C, 1)
        gn_b = nn_t.GroupNorm(1, C)
        x = rand(3, 6, 5, C, seed=3)
        with torch.no_grad():
            t = torch.from_numpy(x).permute(0, 3, 1, 2)
            ref = F.relu(gn_b(conv_b(F.relu(gn_a(conv_a(t))))) + t)
        ref = ref.permute(0, 2, 3, 1).numpy()

        params = {"params": {
            "stem0": {"conv": {"kernel": _conv(conv_a.weight.detach().numpy()),
                               "bias": conv_a.bias.detach().numpy()},
                      "gn": {"scale": gn_a.weight.detach().numpy(),
                             "bias": gn_a.bias.detach().numpy()}},
            "stem1": {"kernel": _conv(conv_b.weight.detach().numpy()),
                      "bias": conv_b.bias.detach().numpy()},
            "gn": {"scale": gn_b.weight.detach().numpy(),
                   "bias": gn_b.bias.detach().numpy()},
        }}
        ours = np.asarray(ResnetBlockGN(C, kernel=1).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    @pytest.mark.skipif(not reference_available(), reason="reference tree absent")
    def test_convlstm_cell_matches_reference(self):
        from oracle import import_reference_module, patch_cuda_to_cpu

        ref_mod = import_reference_module("models.module")
        torch.manual_seed(3)
        with patch_cuda_to_cpu():
            cell = ref_mod.ConvLSTMCell((8, 8), input_dim=32, hidden_dim=16,
                                        kernel_size=(3, 3), bias=True)
            x = rand(2, 8, 8, 32, seed=4)
            h = rand(2, 8, 8, 16, seed=5)
            c = rand(2, 8, 8, 16, seed=6)
            with torch.no_grad():
                h_t, c_t = cell(
                    torch.from_numpy(x).permute(0, 3, 1, 2),
                    (torch.from_numpy(h).permute(0, 3, 1, 2),
                     torch.from_numpy(c).permute(0, 3, 1, 2)),
                )

        params = {"params": {"conv": {
            "kernel": _conv(cell.conv.weight.detach().numpy()),
            "bias": cell.conv.bias.detach().numpy(),
        }}}
        h_j, c_j = ConvLSTMCell(16).apply(
            params, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c))
        )
        np.testing.assert_allclose(
            np.asarray(h_j), h_t.permute(0, 2, 3, 1).numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_j), c_t.permute(0, 2, 3, 1).numpy(), atol=1e-5
        )


@pytest.mark.skipif(not os.path.exists(CKPT), reason="shipped checkpoint absent")
class TestCheckpointConversion:
    def test_loads_and_counts(self):
        params = load_torch_checkpoint(CKPT)
        assert count_params(params) == 187_203

    def test_shapes_match_fresh_init(self):
        params = load_torch_checkpoint(CKPT)
        fresh = init_params(jax.random.PRNGKey(0))
        conv_shapes = jax.tree.map(lambda x: x.shape, params)
        fresh_shapes = jax.tree.map(lambda x: x.shape, fresh)
        assert conv_shapes == fresh_shapes


def _random_scene(B=1, V=3, H=32, W=32, D=32, seed=0):
    # D=32 so the oracle's evidential head (hard-coded maxdisp=32) can run;
    # we only compare outputs produced before that head.
    """Random multi-view inputs with plausible geometry."""
    rng = np.random.RandomState(seed)
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    projs = []
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    for v in range(V):
        angle = 0.0 if v == 0 else rng.uniform(-0.05, 0.05)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.0 if v == 0 else rng.uniform(-5, 5), 0, 0], np.float32)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3], E[:3, 3] = R, t
        P = E.copy()
        P[:3, :4] = K @ P[:3, :4]
        projs.append(P)
    proj = np.stack(projs)[None].repeat(B, 0)
    depths = np.linspace(400, 600, D).astype(np.float32)[None].repeat(B, 0)
    return imgs, proj, depths


def _rotated_scene(B=1, V=3, H=32, W=32, D=32, seed=0):
    """Look-at rig with 15-18 deg relative rotations and mixed x/y
    baselines: rotation-dominant homographies through the full
    R_src.R_ref^-1 path (reference models/module.py:16-32) that the
    +-0.05 rad `_random_scene` poses barely graze (VERDICT r4 item 2).
    Cameras sit on an arc around a target at the sweep's center depth, so
    the warp stays largely in-frustum (a bare 15 deg yaw at f=300 would
    push the whole image out of bounds and make parity vacuous)."""
    from scenefix import look_at_extrinsics

    rng = np.random.RandomState(seed)
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    r = 500.0
    degs = [0.0, 15.0, -18.0]
    y_off = [0.0, 6.0, -8.0]
    pos = [
        (r * np.sin(np.deg2rad(a)), y, r - r * np.cos(np.deg2rad(a)))
        for a, y in zip(degs, y_off)
    ]
    projs = []
    for E in look_at_extrinsics(pos, target=(0.0, 0.0, r)):
        P = E.copy()
        P[:3, :4] = K @ P[:3, :4]
        projs.append(P)
    proj = np.stack(projs)[None].repeat(B, 0)
    depths = np.linspace(400, 600, D).astype(np.float32)[None].repeat(B, 0)
    return imgs, proj, depths


@pytest.mark.skipif(
    not (reference_available() and os.path.exists(CKPT)),
    reason="reference tree / checkpoint absent",
)
class TestFullNetworkParity:
    """End-to-end parity against the reference network with real weights."""

    @pytest.fixture(scope="class")
    def oracle_model(self):
        from oracle import import_reference_module, patch_cuda_to_cpu

        drmvsnet = import_reference_module("models.drmvsnet")
        with patch_cuda_to_cpu():
            model = drmvsnet.EMVSNet(
                disparity_level=32, image_scale=1.0, max_h=32, max_w=32,
                return_depth=False,
            )
        state = torch.load(CKPT, map_location="cpu", weights_only=True)["model"]
        missing, unexpected = model.load_state_dict(state, strict=False)
        assert not unexpected
        assert all(k.startswith("evidential.") for k in missing)
        model.eval()
        return model

    @pytest.fixture(scope="class")
    def params(self):
        return load_torch_checkpoint(CKPT)

    def test_train_branch_probability_volume(self, oracle_model, params):
        from oracle import patch_cuda_to_cpu, torch11_grid_sample_semantics

        imgs, proj, depths = _random_scene()
        with patch_cuda_to_cpu(), torch11_grid_sample_semantics(), torch.no_grad():
            ref_prob, _, _ = oracle_model(
                torch.from_numpy(imgs).permute(0, 1, 4, 2, 3),
                torch.from_numpy(proj),
                torch.from_numpy(depths),
            )
        ref_prob = ref_prob.numpy()

        out = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                      jnp.asarray(depths), SweepConfig(depth_block=4))
        ours = np.asarray(probability_volume(out["cost_volume"]))
        np.testing.assert_allclose(ours, ref_prob, atol=2e-4)

    def test_train_branch_parity_rotated_rig(self, oracle_model, params):
        """Oracle parity on the look-at rig (15-18 deg relative rotations,
        mixed x/y baselines): rotation-dominant homographies and the
        z-guard path under real rotation (VERDICT r4 item 2)."""
        from oracle import patch_cuda_to_cpu, torch11_grid_sample_semantics

        imgs, proj, depths = _rotated_scene()
        with patch_cuda_to_cpu(), torch11_grid_sample_semantics(), torch.no_grad():
            ref_prob, _, _ = oracle_model(
                torch.from_numpy(imgs).permute(0, 1, 4, 2, 3),
                torch.from_numpy(proj),
                torch.from_numpy(depths),
            )
        ref_prob = ref_prob.numpy()

        out = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                      jnp.asarray(depths), SweepConfig(depth_block=4))
        ours = np.asarray(probability_volume(out["cost_volume"]))
        # Non-vacuous: a meaningful fraction of the warp must be in-frustum
        # (the probability volume is not the uniform all-zero-cost case).
        assert np.asarray(out["photometric_confidence"]).max() > 0.2
        np.testing.assert_allclose(ours, ref_prob, atol=2e-4)

    def test_eval_branch_depth_and_confidence(self, oracle_model, params):
        from oracle import patch_cuda_to_cpu, torch11_grid_sample_semantics

        oracle_model.return_depth = True
        imgs, proj, depths = _random_scene(seed=1)
        try:
            with patch_cuda_to_cpu(), torch11_grid_sample_semantics(), torch.no_grad():
                ref_out = oracle_model(
                    torch.from_numpy(imgs).permute(0, 1, 4, 2, 3),
                    torch.from_numpy(proj),
                    torch.from_numpy(depths),
                )
        finally:
            oracle_model.return_depth = False

        out = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                      jnp.asarray(depths), SweepConfig(depth_block=4))
        np.testing.assert_allclose(
            np.asarray(out["depth"]), ref_out["depth"].numpy(), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["photometric_confidence"]),
            ref_out["photometric_confidence"].numpy(),
            atol=1e-4,
        )

    @pytest.mark.parametrize("table_dtype,packed", [
        ("fp8", False), ("int8", True),
    ])
    def test_quantized_table_sweep_matches_fp32(self, params, table_dtype,
                                                packed):
        """The quantized warp-table perf paths must track the exact sweep:
        depths agree to within one hypothesis bin almost everywhere and the
        probability volumes stay close.  fp8: per-channel-scaled e4m3 (~3
        mantissa bits on each channel's own range).  int8 (packed path
        only — it exists to feed the MXU-native int8 blend): uniform 1/127
        per-channel resolution plus 1/127-grid tent weights — measured
        MORE accurate than fp8 on the same scene."""
        imgs, proj, depths = _random_scene(seed=3)
        dt = jnp.float8_e4m3fn if table_dtype == "fp8" else jnp.int8
        exact = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                        jnp.asarray(depths),
                        SweepConfig(depth_block=4, packed_rows=packed))
        quant = forward(
            params, jnp.asarray(imgs), jnp.asarray(proj), jnp.asarray(depths),
            SweepConfig(depth_block=4, table_dtype=dt, packed_rows=packed),
        )
        bin_w = float(depths[0, 1] - depths[0, 0])
        d_exact = np.asarray(exact["depth"])
        d_quant = np.asarray(quant["depth"])
        within_one_bin = np.abs(d_exact - d_quant) <= bin_w + 1e-6
        assert within_one_bin.mean() >= 0.90, within_one_bin.mean()

        # Random-noise inputs are the worst case for WTA stability (no depth
        # structure -> near-flat cost curves).  The invariant that must hold:
        # fp8 may only flip NEAR-TIES — wherever the chosen depth differs,
        # the exact path's winning probability margin over the bin fp8 chose
        # must be tiny.
        p_exact = np.asarray(probability_volume(exact["cost_volume"]))
        p_quant = np.asarray(probability_volume(quant["cost_volume"]))
        assert np.abs(p_exact - p_quant).max() < 0.05
        i_exact = p_exact.argmax(axis=1)
        i_quant = p_quant.argmax(axis=1)
        top = np.take_along_axis(p_exact, i_exact[:, None], axis=1)[:, 0]
        at_quant = np.take_along_axis(p_exact, i_quant[:, None], axis=1)[:, 0]
        margins = np.where(~within_one_bin, top - at_quant, 0.0)
        assert margins.max() < 0.02, margins.max()

    def test_depth_block_size_invariance(self, params):
        """The blocked sweep must be exactly invariant to block size."""
        imgs, proj, depths = _random_scene(seed=2)
        outs = [
            forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                    jnp.asarray(depths), SweepConfig(depth_block=b))
            for b in (1, 4, 8)
        ]
        for other in outs[1:]:
            np.testing.assert_allclose(
                np.asarray(outs[0]["depth"]), np.asarray(other["depth"]), atol=0
            )
            np.testing.assert_allclose(
                np.asarray(outs[0]["cost_volume"]),
                np.asarray(other["cost_volume"]), atol=1e-5,
            )


class TestOmegaFolded:
    def test_matches_module_for_all_group_sizes(self):
        """omega_folded (grouped-conv channel folding, G-x less lane padding
        on the 4-ch intermediates) is numerically identical to InterViewAA."""
        from aa_rmvsnet_tpu.models.aggregation import InterViewAA, omega_folded

        rng = jax.random.PRNGKey(0)
        m = InterViewAA()
        x = jax.random.normal(rng, (8, 16, 20, 32))
        p = m.init(rng, x)
        ref = np.asarray(m.apply(p, x))

        for G in (1, 2, 4, 8):
            xf = (
                x.reshape(8 // G, G, 16, 20, 32)
                .transpose(0, 2, 3, 1, 4)
                .reshape(8 // G, 16, 20, G * 32)
            )
            wf = omega_folded(p["params"], xf, G)
            back = np.asarray(
                wf.reshape(8 // G, 16, 20, G, 1)
                .transpose(0, 3, 1, 2, 4)
                .reshape(8, 16, 20, 1)
            )
            np.testing.assert_allclose(back, ref, atol=1e-5)

    def test_block_diag_kernel_equals_grouped_conv(self):
        """The dense block-diagonal kernel (round-3 omega implementation)
        must reproduce feature_group_count exactly."""
        from aa_rmvsnet_tpu.models.aggregation import _block_diag_kernel

        rng = np.random.RandomState(0)
        G, cin, cout = 4, 5, 3
        k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
        x = jnp.asarray(rng.randn(2, 8, 9, G * cin).astype(np.float32))

        grouped = jax.lax.conv_general_dilated(
            x, jnp.tile(k, (1, 1, 1, G)), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=G,
        )
        dense = jax.lax.conv_general_dilated(
            x, _block_diag_kernel(k, G), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                                   atol=1e-5)


class TestSweepLevers:
    """The perf levers must be numerically transparent end-to-end: the
    depth-folded cost layout and the Pallas gate kernel change memory
    layout / fusion only, never the math."""

    @pytest.fixture(scope="class")
    def params(self):
        return load_torch_checkpoint(CKPT)

    @pytest.mark.parametrize("mode", [True, "hybrid"])
    def test_fold_omega_matches_default(self, params, mode):
        imgs, proj, depths = _random_scene(seed=4)
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(depth_block=4))
        folded = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                         jnp.asarray(depths),
                         SweepConfig(depth_block=4, fold_omega=mode))
        # cost values are O(30); different reduce order costs ~3e-7 relative
        np.testing.assert_allclose(
            np.asarray(folded["cost_volume"]), np.asarray(base["cost_volume"]),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(folded["depth"]), np.asarray(base["depth"]), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(folded["photometric_confidence"]),
            np.asarray(base["photometric_confidence"]), atol=1e-5,
        )

    @pytest.mark.parametrize("mode", [True, "hybrid"])
    def test_fold_omega_with_fp8_tables(self, params, mode):
        """The folded warp reorder must sample the same quantized table values
        as the default path (same tables, different gather order)."""
        imgs, proj, depths = _random_scene(seed=5)
        cfg = dict(depth_block=4, table_dtype=jnp.float8_e4m3fn)
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(**cfg))
        folded = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                         jnp.asarray(depths),
                         SweepConfig(**cfg, fold_omega=mode))
        np.testing.assert_allclose(
            np.asarray(folded["cost_volume"]), np.asarray(base["cost_volume"]),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(folded["depth"]), np.asarray(base["depth"]), atol=1e-3
        )

    @pytest.mark.parametrize("table_dtype", [None, "fp8"])
    def test_packed_rows_match_default(self, params, table_dtype):
        """One 4x4 row per (view, pixel, depth-block) must reproduce the
        per-depth gather exactly when the host gate passes."""
        from aa_rmvsnet_tpu.models.network import pick_packed_rows

        imgs, proj, depths = _random_scene(seed=7)
        assert pick_packed_rows(proj[0], depths[0], imgs.shape[2],
                                imgs.shape[3], depth_block=4)
        cfg = dict(depth_block=4)
        if table_dtype == "fp8":
            cfg["table_dtype"] = jnp.float8_e4m3fn
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(**cfg))
        packed = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                         jnp.asarray(depths),
                         SweepConfig(**cfg, packed_rows=True))
        np.testing.assert_allclose(
            np.asarray(packed["cost_volume"]), np.asarray(base["cost_volume"]),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(packed["depth"]), np.asarray(base["depth"]), atol=1e-3
        )

    @pytest.mark.parametrize("pack", [2, 4])
    def test_gather_pack_matches_packed(self, params, pack):
        """Super-packed gathers (one row serving pack*block hypotheses,
        consumed by `pack` sub-blocks) must reproduce the packed sweep
        exactly when the super-block gate passes — including the collected
        cost volume's sweep order."""
        from aa_rmvsnet_tpu.models.network import pick_packed_rows

        imgs, proj, depths = _random_scene(seed=7)
        block = 2
        assert pick_packed_rows(proj[0], depths[0], imgs.shape[2],
                                imgs.shape[3], depth_block=block * pack)
        cfg = dict(depth_block=block, packed_rows=True)
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(**cfg))
        sp = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                     jnp.asarray(depths),
                     SweepConfig(**cfg, gather_pack=pack))
        np.testing.assert_allclose(
            np.asarray(sp["cost_volume"]), np.asarray(base["cost_volume"]),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(sp["depth"]), np.asarray(base["depth"]), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(sp["photometric_confidence"]),
            np.asarray(base["photometric_confidence"]), atol=1e-5,
        )

    def test_table_taps6_where_4x4_gate_fails(self, params):
        """6x6 tables extend the packed exactness span to 4 px: on a scene
        whose super-block span is between 2 and 4 px (taps=4 gate FAILS,
        taps=6 passes) the taps=6 packed+super-packed sweep must match the
        exact per-depth path."""
        from aa_rmvsnet_tpu.models.network import pick_packed_rows

        imgs, proj, depths = _random_scene(seed=11)
        H, W = imgs.shape[2], imgs.shape[3]
        block, pack = 4, 2
        # Widen the baselines until the K=8 span crosses 2 px but stays
        # under 4 px.
        proj = proj.copy()
        for mult in (15.0, 20.0, 25.0, 30.0, 40.0):
            p_try = proj.copy()
            p_try[:, 1:, :3, 3] *= mult
            if (not pick_packed_rows(p_try[0], depths[0], H, W,
                                     block * pack, taps=4)
                    and pick_packed_rows(p_try[0], depths[0], H, W,
                                         block * pack, taps=6)):
                proj = p_try
                break
        else:
            pytest.fail("could not construct a (2,4] px span scene")

        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(depth_block=block))
        p6 = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                     jnp.asarray(depths),
                     SweepConfig(depth_block=block, packed_rows=True,
                                 gather_pack=pack, table_taps=6))
        np.testing.assert_allclose(
            np.asarray(p6["cost_volume"]), np.asarray(base["cost_volume"]),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(p6["depth"]), np.asarray(base["depth"]), atol=1e-3
        )

    def test_gather_pack_requires_packed_and_divisibility(self, params):
        imgs, proj, depths = _random_scene(seed=7)
        with pytest.raises(ValueError, match="packed_rows"):
            forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                    jnp.asarray(depths),
                    SweepConfig(depth_block=2, gather_pack=2))
        with pytest.raises(ValueError, match="divisible"):
            forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                    jnp.asarray(depths),
                    SweepConfig(depth_block=2, packed_rows=True,
                                gather_pack=3))

    def test_feature_view_chunk_is_exact(self, params):
        """Chunked FeatNet extraction (the 1920x1056 peak-HBM bound) is
        numerically identical to the all-views batch, including an uneven
        final chunk."""
        from aa_rmvsnet_tpu.models.network import extract_features

        imgs, _, _ = _random_scene(seed=12)
        full = extract_features(params, jnp.asarray(imgs))
        for chunk in (1, 2):
            chunked = extract_features(params, jnp.asarray(imgs),
                                       view_chunk=chunk)
            # batch-size-dependent conv algorithm choice: ~1e-6 jitter
            np.testing.assert_allclose(
                np.asarray(chunked), np.asarray(full), atol=1e-5)

    def test_omega_folded_input_scale_is_exact(self):
        """The kernel-folded dequantization of the fp8 residual lever:
        omega_folded(p, q, G, input_scale=s) == omega_folded(p, q*tile(s), G)
        exactly (the scale rides the conv's linearity)."""
        import jax

        from aa_rmvsnet_tpu.models.aggregation import InterViewAA, omega_folded

        rng = np.random.RandomState(0)
        G, C = 4, 32
        x = jnp.asarray(rng.rand(2, 8, 8, G * C).astype(np.float32))
        scale = jnp.asarray((0.5 + rng.rand(C)).astype(np.float32))
        variables = InterViewAA().init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 8, 8, C)))
        p = variables["params"]
        a = omega_folded(p, x * jnp.tile(scale, (G,)), G)
        b = omega_folded(p, x, G, input_scale=scale)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    def test_omega_int8_chain_close_to_int8_base(self, monkeypatch):
        """AA_RMVSNET_OMEGA_INT8=chain (full int8 omega: stems/rw2 consume
        GN-affine-statically-scaled int8 activations, not just rw0) tracks
        the shipped int8 path on checkpoint weights.  Bars encode the
        measured deviation levels on realistic squared-residual inputs
        (chain vs fp32-exact: mean 0.016 / max 0.14 on the (0, 1) sigmoid
        weights; base int8 is mean 0.008 / max 0.10 — the end-to-end dual
        guardrail above passes with the chain ON at the same 0.99
        confident-pixel bar)."""
        import jax

        from aa_rmvsnet_tpu.models.aggregation import omega_folded

        params = load_torch_checkpoint(CKPT)
        om = jax.tree.map(lambda t: t.astype(jnp.bfloat16),
                          params["params"]["omega"])
        rng = np.random.RandomState(0)
        G = 8
        raw = (rng.randn(2, 24, 32, G * 32) ** 2).astype(np.float32)
        scale = jnp.asarray(
            (np.abs(rng.randn(32)) * 0.1 + 0.05).astype(np.float32))
        xq = jnp.asarray(
            np.clip(np.round(raw / np.tile(np.asarray(scale), G)), 0, 127)
            .astype(np.int8))

        base = omega_folded(om, xq, G, input_scale=scale)
        monkeypatch.setenv("AA_RMVSNET_OMEGA_INT8", "chain")
        chain = omega_folded(om, xq, G, input_scale=scale)
        d = np.abs(np.asarray(base, np.float32) - np.asarray(chain, np.float32))
        assert d.mean() < 0.03, d.mean()
        assert d.max() < 0.25, d.max()

    @pytest.mark.parametrize("res_dtype", ["fp8", "int8", "dual"])
    def test_quantized_residual_close_to_exact(self, params, res_dtype):
        """The quantized residual-storage levers (SweepConfig.residual_dtype)
        are APPROXIMATE (fp8: ~2 significant digits; int8: uniform 1/127
        grid, coarser on the small-residual end but consumed by an
        MXU-native omega conv): on a random-noise scene near-tied costs
        flip freely, so the gate runs on a photoconsistent scene with the
        bf16-guardrail criterion — >=90% of all pixels and >=99% of
        confident pixels (conf > 0.3, what fusion keeps) within one depth
        bin of the exact packed sweep."""
        import tempfile

        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.data.eval_dataset import EvalDataset
        from aa_rmvsnet_tpu.models.network import pick_packed_rows

        tmp = tempfile.mkdtemp(prefix="fp8res_")
        make_plane_scene(tmp, H=128, W=160, num_views=3, focal=600.0)
        listfile = os.path.join(tmp, "list.txt")
        with open(listfile, "w") as f:
            f.write("scan1\n")
        ds = EvalDataset(tmp, listfile, nviews=3, ndepths=32,
                         max_h=128, max_w=160)
        s = ds[0]
        imgs = jnp.asarray(s["imgs"][None])
        proj = jnp.asarray(s["proj_matrices"][None])
        depths = jnp.asarray(s["depth_values"][None])
        bin_w = float(depths[0, 1] - depths[0, 0])
        assert pick_packed_rows(s["proj_matrices"], s["depth_values"],
                                128, 160, 4)

        # int8 is OPT-IN (not the default residual dtype) precisely
        # because it sits just under fp8's confident-pixel bar: measured
        # 98.8% here and 1.04% fused-mask disagreement at the eval-scale
        # gate (vs fp8's 99%+ / 0.34%) — acc/comp themselves BEAT fp32
        # (BENCHMARKS.md r5).  The bars below record those measured
        # levels so a regression in either lever is caught.
        # "dual" (fp8 copy for the variance + int8 copy for omega's
        # MXU conv) restores the fp8-level bar.
        conf_bar = 0.98 if res_dtype == "int8" else 0.99
        rd = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
              "dual": "dual"}[res_dtype]
        cfg = dict(depth_block=4, packed_rows=True, collect_volume=False,
                   table_dtype=jnp.float8_e4m3fn)
        base = forward(params, imgs, proj, depths, SweepConfig(**cfg))
        q = forward(params, imgs, proj, depths,
                    SweepConfig(**cfg, residual_dtype=rd))
        d0, c0 = (np.asarray(base[k]) for k in
                  ("depth", "photometric_confidence"))
        dq = np.asarray(q["depth"])
        within = np.abs(dq - d0) <= bin_w + 1e-6
        assert within.mean() >= 0.90, within.mean()
        confident = c0 > 0.3
        assert confident.mean() > 0.5  # the gate must be non-vacuous
        assert within[confident].mean() >= conf_bar, within[confident].mean()

    def test_fp8_residual_folded_equals_packed(self, params):
        """fold_omega=True + fp8 residual (the minimum-peak-HBM recipe for
        sizes where packed tables do not fit) shares _cost_from_warped with
        the packed path: identical warped inputs -> identical quantized
        outputs."""
        imgs, proj, depths = _random_scene(seed=7)
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths),
                       SweepConfig(depth_block=4, packed_rows=True,
                                   residual_dtype=jnp.float8_e4m3fn))
        folded = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                         jnp.asarray(depths),
                         SweepConfig(depth_block=4, fold_omega=True,
                                     residual_dtype=jnp.float8_e4m3fn))
        np.testing.assert_allclose(
            np.asarray(folded["cost_volume"]),
            np.asarray(base["cost_volume"]), atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(folded["depth"]), np.asarray(base["depth"]), atol=1e-3
        )

    def test_residual_dtype_requires_packed(self, params):
        imgs, proj, depths = _random_scene(seed=9)
        with pytest.raises(ValueError, match="packed_rows"):
            forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                    jnp.asarray(depths),
                    SweepConfig(depth_block=4,
                                residual_dtype=jnp.float8_e4m3fn))

    @pytest.mark.parametrize("pack,res_dtype", [
        (1, None), (1, "fp8"), (2, "fp8"),
    ])
    def test_fused_residual_matches_unfused(self, params, pack, res_dtype):
        """The fused-residual blend epilogue (SweepConfig.fused_residual:
        subtract/square/quantize INSIDE the packed blend tiles, so the
        warped volume never materializes) is bitwise identical to the
        unfused chain — same ops in the same order on the same folded
        layout."""
        imgs, proj, depths = _random_scene(seed=7)
        cfg = dict(depth_block=2 if pack > 1 else 4, packed_rows=True,
                   gather_pack=pack)
        if res_dtype == "fp8":
            cfg["residual_dtype"] = jnp.float8_e4m3fn
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(**cfg))
        fused = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                        jnp.asarray(depths),
                        SweepConfig(**cfg, fused_residual=True))
        np.testing.assert_array_equal(
            np.asarray(fused["cost_volume"]), np.asarray(base["cost_volume"])
        )
        np.testing.assert_array_equal(
            np.asarray(fused["depth"]), np.asarray(base["depth"])
        )

    def test_fused_residual_requires_packed(self, params):
        imgs, proj, depths = _random_scene(seed=9)
        with pytest.raises(ValueError, match="packed_rows"):
            forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                    jnp.asarray(depths),
                    SweepConfig(depth_block=4, fused_residual=True))

    def test_pick_packed_rows_rejects_coarse_sweep(self):
        """A sweep whose per-step displacement is large must be rejected."""
        from aa_rmvsnet_tpu.models.network import pick_packed_rows

        imgs, proj, depths = _random_scene(seed=8, D=4)  # 4 steps over 200mm
        # widen the baseline so per-step displacement clearly exceeds 2 px
        proj = proj.copy()
        proj[:, 1:, 0, 3] += 1e5
        assert not pick_packed_rows(proj[0], depths[0], imgs.shape[2],
                                    imgs.shape[3], depth_block=4)

    def test_pallas_gates_match_default(self, params):
        imgs, proj, depths = _random_scene(seed=6)
        base = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                       jnp.asarray(depths), SweepConfig(depth_block=4))
        fused = forward(params, jnp.asarray(imgs), jnp.asarray(proj),
                        jnp.asarray(depths),
                        SweepConfig(depth_block=4, pallas_gates=True))
        np.testing.assert_allclose(
            np.asarray(fused["cost_volume"]), np.asarray(base["cost_volume"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(fused["depth"]), np.asarray(base["depth"]), atol=1e-3
        )


@pytest.mark.slow
def test_bf16_eval_quality_guardrail():
    """bf16 is the shipped eval default (InferConfig); guardrail vs fp32 at a
    realistic size (256x320, D=128) on a photoconsistent scene: >=95% of all
    pixels and >=99.9% of confident pixels (fp32 conf > 0.3 — what fusion
    keeps, reference fusion.py photo threshold) must agree within one depth
    bin.  Measured round 2: 96.8% overall, 100% of confident pixels
    (BENCHMARKS.md)."""
    import tempfile

    from scenefix import make_plane_scene
    from aa_rmvsnet_tpu.data.eval_dataset import EvalDataset

    tmp = tempfile.mkdtemp(prefix="bf16guard_")
    make_plane_scene(tmp, H=256, W=320, num_views=3, focal=600.0)
    listfile = os.path.join(tmp, "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")
    ds = EvalDataset(tmp, listfile, nviews=3, ndepths=128, max_h=256, max_w=320)
    s = ds[0]
    imgs = jnp.asarray(s["imgs"][None])
    proj = jnp.asarray(s["proj_matrices"][None])
    depths = jnp.asarray(s["depth_values"][None])
    bin_w = float(depths[0, 1] - depths[0, 0])

    params = load_torch_checkpoint(CKPT)
    out = {}
    for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        o = forward(params, imgs, proj, depths,
                    SweepConfig(depth_block=8, collect_volume=False,
                                feature_dtype=dt))
        out[name] = (np.asarray(o["depth"]), np.asarray(o["photometric_confidence"]))

    d32, c32 = out["fp32"]
    d16, _ = out["bf16"]
    within = np.abs(d32 - d16) <= bin_w + 1e-6
    assert within.mean() >= 0.95, within.mean()
    confident = c32 > 0.3
    assert confident.mean() > 0.5  # the scene must actually be confident
    assert within[confident].mean() >= 0.999, within[confident].mean()


@pytest.mark.slow
def test_production_lever_stack_quality_guardrail():
    """The FULL round-4 bench/eval lever stack (bf16 + fp8 tables + 6x6
    packed rows + gather_pack=2 + fp8 residual) vs exact fp32 at a
    realistic size — the same criterion as the bf16 guardrail.  fp8
    residual is an ENABLER of the winning config at the north-star size
    (without it the super-block residual OOMs, BENCHMARKS.md), so its
    quality must hold under the whole stack, not just in isolation."""
    import tempfile

    from scenefix import make_plane_scene
    from aa_rmvsnet_tpu.data.eval_dataset import EvalDataset
    from aa_rmvsnet_tpu.models.network import pick_packed_rows

    tmp = tempfile.mkdtemp(prefix="stackguard_")
    make_plane_scene(tmp, H=256, W=320, num_views=3, focal=600.0)
    listfile = os.path.join(tmp, "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")
    ds = EvalDataset(tmp, listfile, nviews=3, ndepths=128, max_h=256, max_w=320)
    s = ds[0]
    imgs = jnp.asarray(s["imgs"][None])
    proj = jnp.asarray(s["proj_matrices"][None])
    depths = jnp.asarray(s["depth_values"][None])
    bin_w = float(depths[0, 1] - depths[0, 0])
    assert pick_packed_rows(s["proj_matrices"], s["depth_values"], 256, 320,
                            8 * 2, taps=6, margin=0.98)

    params = load_torch_checkpoint(CKPT)
    exact = forward(params, imgs, proj, depths,
                    SweepConfig(depth_block=8, collect_volume=False))
    stack = forward(params, imgs, proj, depths,
                    SweepConfig(depth_block=8, collect_volume=False,
                                feature_dtype=jnp.bfloat16,
                                table_dtype=jnp.float8_e4m3fn,
                                packed_rows=True, gather_pack=2,
                                table_taps=6,
                                residual_dtype=jnp.float8_e4m3fn))
    d32 = np.asarray(exact["depth"])
    c32 = np.asarray(exact["photometric_confidence"])
    dq = np.asarray(stack["depth"])
    within = np.abs(d32 - dq) <= bin_w + 1e-6
    assert within.mean() >= 0.95, within.mean()
    confident = c32 > 0.3
    assert confident.mean() > 0.5
    assert within[confident].mean() >= 0.99, within[confident].mean()
