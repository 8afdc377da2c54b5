"""Training-step and multi-chip sharding tests (virtual 8-device CPU mesh)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aa_rmvsnet_tpu.models import init_params
from aa_rmvsnet_tpu.models.losses import depth_classification_loss
from aa_rmvsnet_tpu.pipeline.train import TrainConfig, make_optimizer, make_train_step, make_eval_step
from aa_rmvsnet_tpu.parallel.mesh import make_mesh, replicated, shard_train_batch

from conftest import reference_available


def _batch(B=1, V=3, H=16, W=16, D=4, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = v * 2.0
        P = E.copy()
        P[:3, :4] = K @ P[:3, :4]
        projs.append(P)
    return {
        "imgs": jnp.asarray(imgs),
        "proj_matrices": jnp.asarray(np.broadcast_to(np.stack(projs)[None], (B, V, 4, 4)).copy()),
        "depth_values": jnp.asarray(
            np.broadcast_to(np.linspace(400, 600, D, dtype=np.float32)[None], (B, D)).copy()
        ),
        "depth": jnp.asarray(rng.uniform(400, 600, (B, H, W)).astype(np.float32)),
        "mask": jnp.asarray((rng.rand(B, H, W) > 0.2).astype(np.float32)),
    }


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
class TestLossParity:
    def test_cls_loss_matches_reference(self):
        from oracle import import_reference_module

        drmvsnet = import_reference_module("models.drmvsnet")
        rng = np.random.RandomState(0)
        B, D, H, W = 2, 8, 12, 10
        logits = rng.randn(B, D, H, W).astype(np.float32)
        prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        depth_values = np.linspace(400, 600, D).astype(np.float32)[None].repeat(B, 0)
        gt = rng.uniform(380, 620, (B, H, W)).astype(np.float32)
        mask = (rng.rand(B, H, W) > 0.3).astype(np.float32)

        ref_loss, ref_wta = drmvsnet.mvsnet_cls_loss(
            torch.from_numpy(prob), torch.from_numpy(gt), torch.from_numpy(mask),
            torch.from_numpy(depth_values),
        )
        loss, wta = depth_classification_loss(
            jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(depth_values)
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(wta), ref_wta.numpy(), atol=1e-5)


class TestTrainStep:
    def test_loss_decreases_overfitting_one_batch(self):
        config = TrainConfig(learning_rate=3e-3, total_steps=100, depth_block=2)
        tx = make_optimizer(config)
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        opt_state = tx.init(params)
        step = make_train_step(config, tx)
        batch = _batch()

        losses = []
        for _ in range(8):
            params, opt_state, metrics, _ = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], f"no learning: {losses}"

    def test_eval_step_metrics(self):
        config = TrainConfig(depth_block=2)
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        eval_step = make_eval_step(config)
        metrics = eval_step(params, _batch(seed=2))
        for k in ("loss", "abs_depth_error", "thres2mm_error", "thres32mm_error"):
            assert np.isfinite(float(metrics[k])), k
        assert 0.0 <= float(metrics["thres2mm_error"]) <= 1.0

    def test_remat_matches_no_remat_gradients(self):
        from aa_rmvsnet_tpu.pipeline.train import loss_fn
        from aa_rmvsnet_tpu.models.network import SweepConfig

        params = init_params(jax.random.PRNGKey(1), 16, 16)
        batch = _batch(seed=3)
        g_remat = jax.grad(lambda p: loss_fn(p, batch, SweepConfig(depth_block=2, remat=True))[0])(params)
        g_plain = jax.grad(lambda p: loss_fn(p, batch, SweepConfig(depth_block=2, remat=False))[0])(params)
        flat_r = jax.tree.leaves(g_remat)
        flat_p = jax.tree.leaves(g_plain)
        for a, b in zip(flat_r, flat_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestEvidentialTraining:
    """The fork's production loop: core forward -> prob volume -> NIG head
    (train-mode BN) -> loss_emvsnet, one optimizer over core + head
    (reference train.py:120-121, 234-237)."""

    def _setup(self, maxdisp=8):
        from aa_rmvsnet_tpu.models.evidential import init_evidential
        from aa_rmvsnet_tpu.pipeline.train import (
            make_evidential_state, make_evidential_train_step,
        )

        config = TrainConfig(
            learning_rate=1e-3, total_steps=100, depth_block=2,
            evidential=True, maxdisp=maxdisp,
        )
        tx = make_optimizer(config)
        core = init_params(jax.random.PRNGKey(0), 16, 16)
        head = init_evidential(jax.random.PRNGKey(1), 16, 16, maxdisp=maxdisp)
        state = make_evidential_state(core, head)
        opt_state = tx.init({"core": state["core"], "head": state["head"]})
        step = make_evidential_train_step(config, tx)
        return config, state, opt_state, step

    def test_loss_decreases_and_both_subtrees_update(self):
        config, state, opt_state, step = self._setup()
        batch = _batch(D=8, seed=5)
        core0 = jax.tree.map(np.asarray, state["core"])
        head0 = jax.tree.map(np.asarray, state["head"])
        stats0 = jax.tree.map(np.asarray, state["batch_stats"])

        losses = []
        for _ in range(6):
            state, opt_state, metrics, images = step(state, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0], f"no learning: {losses}"

        def changed(before, after):
            return any(
                not np.allclose(a, np.asarray(b))
                for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
            )

        assert changed(core0, state["core"]), "no gradient reached the core"
        assert changed(head0, state["head"]), "no gradient reached the head"
        assert changed(stats0, state["batch_stats"]), "BN stats did not update"
        for k in ("depth_est", "error_map", "alea_1", "epis_1"):
            assert np.isfinite(np.asarray(images[k])).all(), k

    def test_eval_step_metrics(self):
        from aa_rmvsnet_tpu.pipeline.train import make_evidential_eval_step

        config, state, _, _ = self._setup()
        eval_step = make_evidential_eval_step(config)
        metrics = eval_step(state, _batch(D=8, seed=6))
        for k in ("loss", "abs_depth_error", "thres2mm_error", "thres32mm_error"):
            assert np.isfinite(float(metrics[k])), k

    @pytest.mark.skipif(not reference_available(), reason="reference tree absent")
    def test_train_loss_composition_matches_reference(self):
        """Train-mode head + loss_emvsnet == the reference's loss_der
        composition (reference train.py:234-237 -> models.py:517-558) on the
        same prob volume with converted weights."""
        from oracle import import_reference_module, patch_cuda_to_cpu
        from aa_rmvsnet_tpu.models.convert import convert_evidential_state_dict
        from aa_rmvsnet_tpu.models.evidential import EvidentialHead, loss_emvsnet

        ev = import_reference_module("evidential.models")
        torch.manual_seed(0)
        with patch_cuda_to_cpu():
            oracle = ev.EvidentialModule(depth=32)
        oracle.train()

        rng = np.random.RandomState(3)
        B, D, H, W = 1, 32, 16, 16
        logits = rng.randn(B, D, H, W).astype(np.float32)
        prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        dvals = np.linspace(400, 600, D).astype(np.float32)[None]
        gt = rng.uniform(400, 600, (B, H, W)).astype(np.float32)
        mask = (rng.rand(B, H, W) > 0.3).astype(np.float32)

        ref_ev, _ = oracle(torch.from_numpy(prob), torch.from_numpy(dvals))
        outputs = {
            "evidential_prediction": ref_ev,
            "probability_volume": torch.from_numpy(prob),
        }
        ref_loss, _, _ = ev.loss_der(
            outputs, torch.from_numpy(gt), torch.from_numpy(mask),
            torch.from_numpy(dvals),
        )

        variables = convert_evidential_state_dict(
            {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        )
        out, _ = EvidentialHead(maxdisp=32).apply(
            variables, jnp.asarray(prob), jnp.asarray(dvals),
            train=True, mutable=["batch_stats"],
        )
        ours = loss_emvsnet(
            out["gamma"], out["nu"], out["alpha"], out["beta"],
            jnp.asarray(gt), jnp.asarray(mask), 0.1,
        )
        np.testing.assert_allclose(float(ours), float(ref_loss.detach()), rtol=2e-3)


class TestMultiChip:
    def test_mesh_construction(self):
        assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
        mesh = make_mesh(data=4, spatial=2)
        assert dict(mesh.shape) == {"data": 4, "view": 1, "spatial": 2, "depth": 1}

    def test_sharded_train_step_runs_and_matches_single(self):
        from aa_rmvsnet_tpu.pipeline.train import loss_fn
        from aa_rmvsnet_tpu.models.network import SweepConfig

        mesh = make_mesh(data=4, spatial=2)
        config = TrainConfig(total_steps=10, depth_block=2)
        tx = make_optimizer(config)
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        opt_state = tx.init(params)
        step = make_train_step(config, tx)
        batch = _batch(B=4)

        grad_fn = jax.jit(
            jax.grad(lambda p, b: loss_fn(p, b, SweepConfig(depth_block=2, remat=True))[0])
        )
        # Single-device gradients and loss.
        _, _, m1, _ = step(params, opt_state, batch)
        g1 = grad_fn(params, batch)

        # Sharded over a 4x2 (data, spatial) mesh.
        params_s = jax.device_put(params, replicated(mesh))
        opt_s = jax.device_put(opt_state, replicated(mesh))
        batch_s = shard_train_batch(mesh, batch)
        p2, _, m2, _ = step(params_s, opt_s, batch_s)
        jax.block_until_ready(p2)
        g2 = grad_fn(params_s, batch_s)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        # Gradients agree up to conv-reassociation noise from spatial
        # partitioning; post-Adam params would amplify near-zero grad
        # differences to O(lr), so compare gradients, not updated params.
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)

    def test_graft_dryrun(self):
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    def test_graft_entry_compiles(self):
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out["depth"])).all()


class TestViewAxisSharding:
    """The `view` mesh axis (SURVEY §2.2): per-view patch tables pinned to
    the axis, the cost build runs manual-over-view inside shard_map, and the
    view-mean of the variance is one explicit psum per depth block.

    CAVEAT (upstream): combining view>1 AND spatial>1 in a mesh used for
    GRADIENTS double-counts in-scan conv kernel grads by the view-axis size
    (XLA SPMD partitioner bug; minimal repro: scan over a conv with a
    (data, idle-view, spatial) mesh — (data, view) and (data, spatial) are
    both correct).  make_mesh warns about the combination; inference
    (forward-only) is exact on any combination, tested below at (2,2,2).
    """

    def _scalar_loss(self, params, batch, cfg):
        from aa_rmvsnet_tpu.pipeline.train import loss_fn

        return loss_fn(params, batch, cfg)[0]

    def test_forward_matches_single_device(self):
        from aa_rmvsnet_tpu.models.network import SweepConfig, forward

        with pytest.warns(UserWarning, match="view.*spatial"):
            mesh = make_mesh(data=2, view=2, spatial=2)
        batch = _batch(B=2, V=5, H=16, W=16, D=4, seed=7)  # S=4 views % 2 == 0
        params = init_params(jax.random.PRNGKey(0), 16, 16)

        base = forward(params, batch["imgs"], batch["proj_matrices"],
                       batch["depth_values"], SweepConfig(depth_block=2))
        sharded = forward(
            jax.device_put(params, replicated(mesh)),
            *(shard_train_batch(mesh, batch)[k]
              for k in ("imgs", "proj_matrices", "depth_values")),
            SweepConfig(depth_block=2, mesh=mesh),
        )
        np.testing.assert_allclose(
            np.asarray(base["cost_volume"]), np.asarray(sharded["cost_volume"]),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(base["depth"]), np.asarray(sharded["depth"]), atol=1e-3
        )

    def test_grads_match_on_data_view_mesh(self):
        """(data, view) training mesh: loss + gradients agree with
        single-device (shard_map AD psums the parameter cotangents over
        view; tolerance covers fp32 psum reassociation through BPTT)."""
        from aa_rmvsnet_tpu.models.network import SweepConfig

        mesh = make_mesh(data=4, view=2, spatial=1)
        batch = _batch(B=4, V=5, H=16, W=16, D=4, seed=7)
        params = init_params(jax.random.PRNGKey(0), 16, 16)

        cfg1 = SweepConfig(depth_block=2, remat=True, collect_volume=True)
        l1 = jax.jit(self._scalar_loss, static_argnums=2)(params, batch, cfg1)
        g1 = jax.jit(jax.grad(self._scalar_loss), static_argnums=2)(
            params, batch, cfg1)

        cfg2 = SweepConfig(depth_block=2, remat=True, collect_volume=True,
                           mesh=mesh)
        params_s = jax.device_put(params, replicated(mesh))
        batch_s = shard_train_batch(mesh, batch)
        l2 = jax.jit(self._scalar_loss, static_argnums=2)(params_s, batch_s, cfg2)
        g2 = jax.jit(jax.grad(self._scalar_loss), static_argnums=2)(
            params_s, batch_s, cfg2)

        assert np.isfinite(float(l1))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                b, a, atol=max(5e-3 * np.abs(a).max(), 1e-6)
            )

    def test_train_step_refuses_view_and_spatial_mesh(self):
        """Training on view>1 AND spatial>1 silently double-counts
        gradients (the upstream bug above) — the train-step factories must
        hard-error, not warn (round-3; inference stays allowed)."""
        from aa_rmvsnet_tpu.pipeline.train import make_evidential_train_step

        with pytest.warns(UserWarning, match="view.*spatial"):
            mesh = make_mesh(data=2, view=2, spatial=2)
        config = TrainConfig(depth_block=2, total_steps=10, mesh=mesh)
        tx = make_optimizer(config)
        with pytest.raises(ValueError, match="view > 1 AND spatial > 1"):
            make_train_step(config, tx)
        with pytest.raises(ValueError, match="view > 1 AND spatial > 1"):
            make_evidential_train_step(config, tx)

    def test_view_axis_skipped_when_indivisible(self):
        """V-1 not divisible by the view axis -> constraint quietly skipped,
        result still correct."""
        from aa_rmvsnet_tpu.models.network import SweepConfig, forward

        with pytest.warns(UserWarning, match="view.*spatial"):
            mesh = make_mesh(data=2, view=2, spatial=2)
        batch = _batch(B=2, V=4, H=16, W=16, D=4, seed=8)  # S=3 % 2 != 0
        params = init_params(jax.random.PRNGKey(0), 16, 16)

        base = forward(params, batch["imgs"], batch["proj_matrices"],
                       batch["depth_values"], SweepConfig(depth_block=2))
        sharded = forward(
            jax.device_put(params, replicated(mesh)),
            *(shard_train_batch(mesh, batch)[k]
              for k in ("imgs", "proj_matrices", "depth_values")),
            SweepConfig(depth_block=2, mesh=mesh),
        )
        np.testing.assert_allclose(
            np.asarray(base["depth"]), np.asarray(sharded["depth"]), atol=1e-4
        )
