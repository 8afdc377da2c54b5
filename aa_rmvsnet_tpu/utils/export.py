"""Model export: serialize the jitted forward to portable StableHLO.

Capability-parity with the reference's dev-time model-export tools
(reference: statistics.py:26-55 exports the two sub-models to ONNX) —
the JAX-native equivalent is ``jax.export``: a versioned, portable
StableHLO artifact runnable from C++/IFRT or re-imported into JAX.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def export_forward(params, input_shape=(1, 3, 64, 80, 3), num_depth: int = 16,
                   depth_block: int = 8):
    """Export the depth-map forward pass.  Returns the serialized bytes and
    the jax.export Exported object."""
    from jax import export as jax_export

    from ..models.network import SweepConfig, forward

    B, V, H, W, C = input_shape
    config = SweepConfig(depth_block=depth_block, collect_volume=False)

    def fn(params, imgs, proj, depths):
        return forward(params, imgs, proj, depths, config)

    args = (
        params,
        jnp.zeros(input_shape, jnp.float32),
        jnp.zeros((B, V, 4, 4), jnp.float32),
        jnp.zeros((B, num_depth), jnp.float32),
    )
    exported = jax_export.export(jax.jit(fn))(*args)
    return exported.serialize(), exported


def export_evidential(variables, input_shape=(1, 32, 64, 80), maxdisp: int = 32):
    """Export the evidential uncertainty head (the reference exports BOTH
    sub-models, statistics.py:26-55 — this completes the pair beside
    :func:`export_forward`).

    The exported function takes ``(variables, cost_volume, depth_values)``
    and returns the head's ``{gamma, nu, alpha, beta}`` dict, with the
    depth-axis softmax folded in (matching the inference driver's
    ``make_evidential_apply``).
    """
    from jax import export as jax_export

    from ..models.evidential import EvidentialHead

    B, D, H, W = input_shape
    head = EvidentialHead(maxdisp=maxdisp)

    def fn(variables, cost_volume, depth_values):
        prob = jax.nn.softmax(cost_volume.astype(jnp.float32), axis=1)
        return head.apply(variables, prob, depth_values, train=False)

    args = (
        variables,
        jnp.zeros(input_shape, jnp.float32),
        jnp.linspace(400.0, 600.0, D, dtype=jnp.float32)[None].repeat(B, 0),
    )
    exported = jax_export.export(jax.jit(fn))(*args)
    return exported.serialize(), exported


def save_exported(path, params, **kwargs) -> int:
    data, _ = export_forward(params, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def save_exported_evidential(path, variables, **kwargs) -> int:
    data, _ = export_evidential(variables, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_and_call(path, params, imgs, proj, depths):
    """Round-trip check: deserialize and call the exported artifact."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call(params, imgs, proj, depths)
