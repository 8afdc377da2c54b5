"""Depth-map quality metrics (reference: utils.py:125-175).

All metrics are masked means computed per batch:
- ``threshold_error_rate``: fraction of valid pixels with |err| > tau
  (the reference's ``Thres_metrics``; evaluated at 2/4/8/16/32 mm during
  validation, train.py:274-280).
- ``abs_depth_error``: masked MAE.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def threshold_error_rate(depth_est, depth_gt, mask, threshold: float):
    err = jnp.abs(depth_est - depth_gt)
    bad = (err > threshold) & (mask > 0.5)
    return jnp.sum(bad) / jnp.maximum(jnp.sum(mask > 0.5), 1)


def abs_depth_error(depth_est, depth_gt, mask):
    err = jnp.abs(depth_est - depth_gt) * (mask > 0.5)
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask > 0.5), 1)


def std_prob(prob_volume, axis: int = 1):
    """Standard deviation of the probability volume over the depth axis — a
    cheap confidence proxy (reference: statistics.py:11-16)."""
    return jnp.std(prob_volume, axis=axis)


def interval_threshold_error_rate(depth_est, depth_gt, mask, depth_interval,
                                  threshold_in_intervals: float):
    """Fraction of valid pixels with |err| > k * depth_interval — the
    reference's interval-relative variant (utils.py ``Thres_metrics_tfversion``)."""
    tau = depth_interval * threshold_in_intervals
    err = jnp.abs(depth_est - depth_gt)
    bad = (err > tau[..., None, None]) & (mask > 0.5)
    return jnp.sum(bad) / jnp.maximum(jnp.sum(mask > 0.5), 1)


class MeterDict:
    """Running mean of scalar metric dicts (reference utils.py:102-121)."""

    def __init__(self):
        self._sums: dict[str, float] = {}
        self._count = 0

    def update(self, scalars: dict):
        self._count += 1
        for k, v in scalars.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(np.asarray(v))

    def mean(self) -> dict:
        return {k: v / max(self._count, 1) for k, v in self._sums.items()}

    @property
    def count(self) -> int:
        return self._count
