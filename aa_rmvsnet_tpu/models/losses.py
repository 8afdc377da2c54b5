"""Training losses for the core network.

The canonical loss is the masked one-hot cross-entropy over the depth
probability volume — the loss that produced the shipped checkpoints
(reference: models/drmvsnet.py:347-381, ``mvsnet_cls_loss``).  The
evidential NIG losses live with the evidential head in
:mod:`aa_rmvsnet_tpu.models.evidential`.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_classification_loss(
    prob_volume: jnp.ndarray,
    depth_gt: jnp.ndarray,
    mask: jnp.ndarray,
    depth_values: jnp.ndarray,
    eps: float = 1e-12,
):
    """Masked cross-entropy against the nearest-hypothesis one-hot bin.

    Args:
      prob_volume: ``(B, D, H, W)`` softmax probability volume.
      depth_gt: ``(B, H, W)`` ground-truth depth.
      mask: ``(B, H, W)`` float validity mask (1 = supervised).
      depth_values: ``(B, D)`` hypothesis depths (sweep order).

    Returns:
      ``(loss, wta_depth)`` — scalar mean masked CE and the ``(B, H, W)``
      winner-take-all depth map.

    Matches the reference semantics (drmvsnet.py:347-376): the GT bin is
    ``argmin |d_k - gt|``; masked-out pixels are forced to bin 0 (they
    contribute nothing to the loss); per-image sums are normalized by the
    valid-pixel count then averaged over the batch.
    """
    B, D, H, W = prob_volume.shape
    dvals = depth_values[:, :, None, None]  # (B, D, 1, 1)

    gt_index = jnp.argmin(jnp.abs(dvals - depth_gt[:, None]), axis=1)  # (B, H, W)
    gt_index = jnp.round(mask * gt_index).astype(jnp.int32)

    gt_prob = jnp.take_along_axis(prob_volume, gt_index[:, None], axis=1)[:, 0]
    ce = -jnp.log(gt_prob + eps)

    valid = jnp.sum(mask, axis=(1, 2)) + 1e-6
    loss = jnp.mean(jnp.sum(mask * ce, axis=(1, 2)) / valid)

    wta_index = jnp.argmax(prob_volume, axis=1)
    wta_depth = jnp.take_along_axis(
        jnp.broadcast_to(dvals, prob_volume.shape), wta_index[:, None], axis=1
    )[:, 0]
    return loss, wta_depth
