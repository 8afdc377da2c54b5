"""Training driver: jit-compiled train/eval steps with Adam + cosine LR,
per-depth-block rematerialized BPTT, and mesh sharding.

Capability-parity with the reference trainer (reference: train.py:208-404 —
Adam 1e-3, cosine annealing to 2e-6, per-epoch checkpointing, full
validation pass with 2/4/8/16/32 mm threshold metrics), rebuilt TPU-native:
the step is a single pjit program over a ``(data, spatial)`` mesh; gradient
all-reduce and conv halo exchanges are inserted by GSPMD.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.network import SweepConfig, forward, probability_volume
from ..models.losses import depth_classification_loss
from ..models.evidential import (
    EvidentialHead,
    loss_emvsnet,
    uncertainty_decompositions,
)
from ..utils.metrics import threshold_error_rate, abs_depth_error


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    lr_min: float = 2e-6
    total_steps: int = 100_000
    depth_block: int = 16
    feature_dtype: Any = jnp.float32
    grad_clip: float | None = None
    # Evidential (NIG) training — the fork's production loop optimizes the
    # evidential head end-to-end through the probability volume with
    # ``loss_emvsnet`` (reference train.py:234-237 -> loss_der ->
    # evidential/models.py:496-558).
    evidential: bool = False
    maxdisp: int = 32
    evidential_weight_reg: float = 0.1
    fold_omega: Any = False  # False | "hybrid" | True (SweepConfig.fold_omega)
    pallas_gates: bool = False
    # Optional mesh with a ``view`` axis: shards source views in the cost
    # build (one psum per depth block; models/network.py sweep).  Meshes
    # are hashable, so the frozen config stays a valid static jit arg.
    mesh: Any = None

    def sweep(self) -> SweepConfig:
        return SweepConfig(
            depth_block=self.depth_block,
            remat=True,
            collect_volume=True,
            feature_dtype=self.feature_dtype,
            fold_omega=self.fold_omega,
            pallas_gates=self.pallas_gates,
            mesh=self.mesh,
        )


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Adam with cosine annealing to ``lr_min`` (reference train.py:179-214)."""
    schedule = optax.cosine_decay_schedule(
        init_value=config.learning_rate,
        decay_steps=config.total_steps,
        alpha=config.lr_min / config.learning_rate,
    )
    tx = optax.adam(schedule)
    if config.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(config.grad_clip), tx)
    return tx


def loss_fn(params, batch, sweep_config: SweepConfig):
    out = forward(
        params, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        sweep_config,
    )
    prob = probability_volume(out["cost_volume"])
    loss, wta_depth = depth_classification_loss(
        prob, batch["depth"], batch["mask"], batch["depth_values"]
    )
    return loss, wta_depth


def _check_train_mesh(mesh) -> None:
    """Refuse silently-wrong-gradient meshes for TRAINING steps.

    view > 1 combined with spatial > 1 double-counts regularizer gradients
    by the view-axis size (upstream XLA SPMD partitioner bug; minimal repro
    in tests/test_train.py:TestViewAxisSharding).  Inference under the same
    mesh is fine — the check lives here, not in make_mesh.
    """
    if mesh is not None and mesh.shape.get("view", 1) > 1 and mesh.shape.get("spatial", 1) > 1:
        raise ValueError(
            "training with view > 1 AND spatial > 1 produces wrong gradients "
            "(XLA SPMD double-counts the view psum across the spatial axis); "
            "use (data, view) or (data, spatial) for training"
        )


def make_train_step(config: TrainConfig, tx: optax.GradientTransformation):
    _check_train_mesh(config.mesh)
    sweep_config = config.sweep()

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, wta_depth), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, sweep_config
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "abs_depth_error": abs_depth_error(wta_depth, batch["depth"], batch["mask"]),
        }
        # Image-sized summaries the observability loop logs at summary_freq
        # (reference train.py:315-328 "image_outputs"); device arrays stay
        # lazy until the caller fetches them.
        images = {
            "depth_est": wta_depth * batch["mask"],
            "error_map": jnp.abs(wta_depth - batch["depth"]) * batch["mask"],
        }
        return params, opt_state, metrics, images

    return train_step


def make_eval_step(config: TrainConfig):
    sweep_config = dataclasses.replace(config.sweep(), remat=False)

    @jax.jit
    def eval_step(params, batch):
        loss, wta_depth = loss_fn(params, batch, sweep_config)
        metrics = {
            "loss": loss,
            "abs_depth_error": abs_depth_error(wta_depth, batch["depth"], batch["mask"]),
        }
        for tau in (2.0, 4.0, 8.0, 16.0, 32.0):
            metrics[f"thres{int(tau)}mm_error"] = threshold_error_rate(
                wta_depth, batch["depth"], batch["mask"], tau
            )
        return metrics

    return eval_step


# ---------------------------------------------------------------------------
# Evidential (NIG) training — the fork's production loss (reference
# train.py:234-237: forward -> probability volume -> EvidentialModule ->
# loss_der -> loss_emvsnet, one Adam over core + head parameters).
# ---------------------------------------------------------------------------


def make_evidential_state(core_params, head_variables) -> dict:
    """Pack core params + head params + BN running stats into one pytree.

    ``trainable`` for the optimizer is the ``{"core", "head"}`` sub-tree;
    ``batch_stats`` is threaded through each step non-differentiably (flax
    ``mutable=['batch_stats']``).
    """
    return {
        "core": core_params,
        "head": head_variables["params"],
        "batch_stats": head_variables.get("batch_stats", {}),
    }


def evidential_loss_fn(trainable, batch_stats, batch, config: TrainConfig,
                       sweep_config: SweepConfig):
    """Forward the core net, softmax the cost volume, run the evidential head
    in train mode (mutable BN stats), and compute ``loss_emvsnet``."""
    out = forward(
        trainable["core"], batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], sweep_config,
    )
    prob = probability_volume(out["cost_volume"])
    head = EvidentialHead(maxdisp=config.maxdisp)
    ev, mutated = head.apply(
        {"params": trainable["head"], "batch_stats": batch_stats},
        prob, batch["depth_values"], train=True, mutable=["batch_stats"],
    )
    loss = loss_emvsnet(
        ev["gamma"], ev["nu"], ev["alpha"], ev["beta"],
        batch["depth"], batch["mask"], config.evidential_weight_reg,
    )
    return loss, (mutated["batch_stats"], ev)


def _evidential_summaries(ev, batch):
    metrics = {
        "loss_components/nu": jnp.mean(ev["nu"]),
        "loss_components/alpha": jnp.mean(ev["alpha"]),
        "loss_components/beta": jnp.mean(ev["beta"]),
        "abs_depth_error": abs_depth_error(ev["gamma"], batch["depth"], batch["mask"]),
    }
    decomp = uncertainty_decompositions(ev["nu"], ev["alpha"], ev["beta"])
    images = {
        "depth_est": ev["gamma"] * batch["mask"],
        "error_map": jnp.abs(ev["gamma"] - batch["depth"]) * batch["mask"],
        "alea_1": decomp["aleatoric_1"],
        "epis_1": decomp["epistemic_1"],
        "alea_2": decomp["aleatoric_2"],
        "epis_2": decomp["epistemic_2"],
    }
    return metrics, images


def make_evidential_train_step(config: TrainConfig, tx: optax.GradientTransformation):
    _check_train_mesh(config.mesh)
    sweep_config = config.sweep()

    @jax.jit
    def train_step(state, opt_state, batch):
        trainable = {"core": state["core"], "head": state["head"]}
        (loss, (new_stats, ev)), grads = jax.value_and_grad(
            evidential_loss_fn, has_aux=True
        )(trainable, state["batch_stats"], batch, config, sweep_config)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        state = dict(trainable, batch_stats=new_stats)
        metrics, images = _evidential_summaries(ev, batch)
        metrics["loss"] = loss
        return state, opt_state, metrics, images

    return train_step


def make_evidential_eval_step(config: TrainConfig):
    sweep_config = dataclasses.replace(config.sweep(), remat=False)
    head = EvidentialHead(maxdisp=config.maxdisp)

    @jax.jit
    def eval_step(state, batch):
        out = forward(
            state["core"], batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], sweep_config,
        )
        prob = probability_volume(out["cost_volume"])
        ev = head.apply(
            {"params": state["head"], "batch_stats": state["batch_stats"]},
            prob, batch["depth_values"], train=False,
        )
        loss = loss_emvsnet(
            ev["gamma"], ev["nu"], ev["alpha"], ev["beta"],
            batch["depth"], batch["mask"], config.evidential_weight_reg,
        )
        metrics = {
            "loss": loss,
            "abs_depth_error": abs_depth_error(ev["gamma"], batch["depth"], batch["mask"]),
        }
        for tau in (2.0, 4.0, 8.0, 16.0, 32.0):
            metrics[f"thres{int(tau)}mm_error"] = threshold_error_rate(
                ev["gamma"], batch["depth"], batch["mask"], tau
            )
        return metrics

    return eval_step
