"""Separable align-corners=True linear resize (bilinear / trilinear).

The reference up/downsamples with ``F.interpolate(..., align_corners=True)``
(bilinear in IntraViewAA, reference models/drmvsnet.py:22-23; trilinear in
the evidential head, evidential/models.py:383-393, 407-408).
``jax.image.resize`` only implements half-pixel-centers semantics, so we
provide an exact align-corners resize here.

Align-corners linear interpolation is separable, so an N-D resize is a
composition of 1-D resizes; each 1-D resize is expressed as a dense
``(out, in)`` interpolation-matrix contraction — a small matmul that maps
straight onto the MXU instead of a gather.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense ``(out, in)`` align-corners linear interpolation weights."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        # align_corners maps the single sample to position 0.
        m[:, 0] = 1.0
        return m
    pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.floor(pos).astype(np.int64)
    i0 = np.minimum(i0, in_size - 2)
    frac = (pos - i0).astype(np.float32)
    rows = np.arange(out_size)
    m[rows, i0] = 1.0 - frac
    m[rows, i0 + 1] = frac
    return m


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_interp_matrix(in_size, out_size))
    moved = jnp.moveaxis(x, axis, -1)
    out = moved @ m.T
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int, h_axis: int = 1, w_axis: int = 2
) -> jnp.ndarray:
    """Align-corners bilinear resize of the (h_axis, w_axis) plane (NHWC default)."""
    return _resize_axis(_resize_axis(x, h_axis, out_h), w_axis, out_w)


def resize_trilinear_align_corners(
    x: jnp.ndarray,
    out_d: int,
    out_h: int,
    out_w: int,
    d_axis: int = 1,
    h_axis: int = 2,
    w_axis: int = 3,
) -> jnp.ndarray:
    """Align-corners trilinear resize of a (D, H, W) volume (NDHWC default)."""
    x = _resize_axis(x, d_axis, out_d)
    x = _resize_axis(x, h_axis, out_h)
    return _resize_axis(x, w_axis, out_w)
