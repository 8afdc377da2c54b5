"""Evidential head parity vs the reference 3D-CNN NIG module, and loss tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aa_rmvsnet_tpu.models.evidential import (
    EvidentialHead,
    init_evidential,
    loss_emvsnet,
    nig_nll_loss,
    uncertainty_decompositions,
    moe_nig,
)
from aa_rmvsnet_tpu.models.convert import convert_evidential_state_dict

from conftest import reference_available


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
class TestEvidentialParity:
    @pytest.fixture(scope="class")
    def oracle(self):
        from oracle import import_reference_module, patch_cuda_to_cpu

        ev = import_reference_module("evidential.models")
        torch.manual_seed(0)
        with patch_cuda_to_cpu():
            model = ev.EvidentialModule(depth=32)
        # Randomize BN affine + running stats so conversion is fully exercised.
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, torch.nn.BatchNorm3d):
                    m.weight.normal_(1.0, 0.1)
                    m.bias.normal_(0.0, 0.1)
                    m.running_mean.normal_(0.0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)
        model.eval()
        return model

    def test_head_matches_reference(self, oracle):
        rng = np.random.RandomState(0)
        B, D, H, W = 1, 32, 16, 16
        logits = rng.randn(B, D, H, W).astype(np.float32)
        prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        dvals = np.linspace(400, 600, D).astype(np.float32)[None]

        with torch.no_grad():
            ref_ev, ref_prob = oracle(torch.from_numpy(prob), torch.from_numpy(dvals))
        # reference returns cat((u, la, alpha, beta)) over dim 0 -> (4, H, W)
        ref_ev = ref_ev.numpy()
        ref_prob = ref_prob.numpy()

        variables = convert_evidential_state_dict(
            {k: v.numpy() for k, v in oracle.state_dict().items()}
        )
        out = EvidentialHead(maxdisp=32).apply(
            variables, jnp.asarray(prob), jnp.asarray(dvals), train=False
        )
        np.testing.assert_allclose(np.asarray(out["gamma"][0]), ref_ev[0], atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["nu"][0]), ref_ev[1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["alpha"][0]), ref_ev[2], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["beta"][0]), ref_ev[3], atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out["prob_combine"][0]), ref_prob[0], atol=1e-4
        )

    def test_loss_emvsnet_matches_reference(self):
        from oracle import import_reference_module

        ev = import_reference_module("evidential.models")
        rng = np.random.RandomState(1)
        H, W = 8, 9
        gamma = rng.uniform(400, 600, (1, H, W)).astype(np.float32)
        nu = rng.uniform(0.1, 2.0, (1, H, W)).astype(np.float32)
        alpha = rng.uniform(1.1, 3.0, (1, H, W)).astype(np.float32)
        beta = rng.uniform(0.1, 2.0, (1, H, W)).astype(np.float32)
        gt = rng.uniform(400, 600, (1, H, W)).astype(np.float32)
        mask = (rng.rand(1, H, W) > 0.3).astype(np.float32)

        ref = ev.loss_emvsnet(
            torch.from_numpy(gamma), torch.from_numpy(nu), torch.from_numpy(alpha),
            torch.from_numpy(beta), torch.from_numpy(gt), torch.from_numpy(mask),
        )
        ours = loss_emvsnet(
            jnp.asarray(gamma), jnp.asarray(nu), jnp.asarray(alpha),
            jnp.asarray(beta), jnp.asarray(gt), jnp.asarray(mask),
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_nig_nll_matches_reference(self):
        from oracle import import_reference_module

        ev = import_reference_module("evidential.models")
        rng = np.random.RandomState(2)
        H, W = 6, 7
        gamma = rng.uniform(400, 600, (1, H, W)).astype(np.float32)
        nu = rng.uniform(0.1, 2.0, (1, H, W)).astype(np.float32)
        alpha = rng.uniform(1.1, 3.0, (1, H, W)).astype(np.float32)
        beta = rng.uniform(0.1, 2.0, (1, H, W)).astype(np.float32)
        gt = rng.uniform(400, 600, (1, H, W)).astype(np.float32)
        mask = np.ones((1, H, W), np.float32)

        ref = ev.criterion_uncertainty(
            torch.from_numpy(gamma), torch.from_numpy(nu), torch.from_numpy(alpha),
            torch.from_numpy(beta), torch.from_numpy(gt),
            torch.from_numpy(mask),
        )
        ours = nig_nll_loss(
            jnp.asarray(gamma), jnp.asarray(nu), jnp.asarray(alpha),
            jnp.asarray(beta), jnp.asarray(gt), jnp.asarray(mask),
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


class TestEvidentialStandalone:
    def test_init_and_forward_shapes(self):
        variables = init_evidential(jax.random.PRNGKey(0), 16, 16)
        prob = jnp.asarray(np.random.RandomState(0).rand(2, 32, 16, 16).astype(np.float32))
        dvals = jnp.asarray(np.linspace(400, 600, 32, dtype=np.float32)[None].repeat(2, 0))
        out = EvidentialHead().apply(variables, prob, dvals, train=False)
        for k in ("gamma", "nu", "alpha", "beta"):
            assert out[k].shape == (2, 16, 16)
            assert np.isfinite(np.asarray(out[k])).all()
        assert out["prob_combine"].shape == (2, 32, 16, 16)
        assert float(out["alpha"].min()) > 1.0  # alpha = softplus + 1
        assert float(out["nu"].min()) > 0.0

    def test_depth_resampling_for_non32(self):
        """D != 32 works (reference crashes); D == 32 path is the identity."""
        variables = init_evidential(jax.random.PRNGKey(0), 16, 16)
        prob = jnp.asarray(np.random.RandomState(1).rand(1, 48, 16, 16).astype(np.float32))
        dvals = jnp.asarray(np.linspace(400, 600, 48, dtype=np.float32)[None])
        out = EvidentialHead().apply(variables, prob, dvals, train=False)
        assert np.isfinite(np.asarray(out["gamma"])).all()

    def test_uncertainty_decompositions(self):
        nu = jnp.asarray([[1.0]])
        alpha = jnp.asarray([[2.0]])
        beta = jnp.asarray([[3.0]])
        d = uncertainty_decompositions(nu, alpha, beta)
        np.testing.assert_allclose(float(d["aleatoric_2"][0, 0]), 3.0)
        np.testing.assert_allclose(float(d["epistemic_2"][0, 0]), 3.0)
        np.testing.assert_allclose(float(d["epistemic_1"][0, 0]), 1.0)

    def test_moe_nig_symmetry(self):
        u, la, a, b = moe_nig(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
        u2, la2, a2, b2 = moe_nig(5.0, 6.0, 7.0, 8.0, 1.0, 2.0, 3.0, 4.0)
        assert np.allclose([u, la, a, b], [u2, la2, a2, b2])
