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


def save_exported(path, params, **kwargs) -> int:
    data, _ = export_forward(params, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_and_call(path, params, imgs, proj, depths):
    """Round-trip check: deserialize and call the exported artifact."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call(params, imgs, proj, depths)
