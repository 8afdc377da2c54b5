"""Checkpoint save / resume via Orbax.

Capability-parity with the reference's per-epoch ``torch.save({epoch, model,
optimizer})`` + resume-from-highest-index (reference: train.py:186-197,
252-257), with Orbax's atomic, async-friendly, multi-host-safe layout.
The torch-era ``.ckpt`` files remain loadable through
:mod:`aa_rmvsnet_tpu.models.convert` for warm starts.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int | None = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_state(manager: ocp.CheckpointManager, step: int, params, opt_state) -> None:
    manager.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )


def restore_latest(
    manager: ocp.CheckpointManager, params_template, opt_state_template
) -> tuple[int, Any, Any] | None:
    """Restore the highest saved step, or None if the directory is empty."""
    step = manager.latest_step()
    if step is None:
        return None
    restored = manager.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_template),
            opt_state=ocp.args.StandardRestore(opt_state_template),
        ),
    )
    return step, restored["params"], restored["opt_state"]
