"""Reweighted variance cost-volume construction.

Per depth hypothesis ``d`` the reference accumulates, over source views,
the squared residual between the warped source feature and the reference
feature, reweighted by the inter-view adaptive-aggregation map ``omega``:

    cost(d) = mean_v ( (omega_v + 1) * (warp_v(d) - ref)^2 )

(reference: models/drmvsnet.py:273-285).

TPU-first structure: the per-(view, depth) warp + residual + reweight is
embarrassingly parallel, so we batch *all views and a block of depths* into
one big NHWC batch for the omega convnet — large conv batches keep the MXU
busy — and reduce over views with a single sum.  When views are sharded
across a mesh axis, that sum becomes one ``psum`` over ICI — implemented in
the production sweep via a manual-over-``view`` shard_map
(``models.network.sweep`` with ``SweepConfig.mesh``; tested in
tests/test_train.py:TestViewAxisSharding).

This module is the *reference semantic* of the cost build — the shape the
parity tests and the verify driver exercise directly; the production sweep
fuses the same math with the 128-lane patch-table warp
(``models/network.py:_build_cost_block``).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def reweighted_variance_slice(
    ref_feat: jnp.ndarray,
    warped: jnp.ndarray,
    omega_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Build the variance cost for a block of depths.

    Args:
      ref_feat: ``(B, H, W, C)`` reference-view features.
      warped: ``(V, B, D, H, W, C)`` source features warped to each of the D
        hypothesis planes (V = number of source views).
      omega_fn: the inter-view AA network applied to an ``(N, H, W, C)``
        batch of residual volumes, returning ``(N, H, W, 1)`` weights.

    Returns:
      ``(B, D, H, W, C)`` reweighted variance cost block.
    """
    V, B, D, H, W, C = warped.shape
    residual_sq = (warped - ref_feat[None, :, None]) ** 2

    flat = residual_sq.reshape(V * B * D, H, W, C)
    weights = omega_fn(flat).reshape(V, B, D, H, W, 1)

    acc = jnp.sum((weights + 1.0) * residual_sq, axis=0)
    return acc / V
