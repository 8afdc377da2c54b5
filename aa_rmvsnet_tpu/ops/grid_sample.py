"""Bilinear image sampling with zero out-of-bounds padding (NHWC).

Semantics match torch-1.1 ``F.grid_sample(mode='bilinear',
padding_mode='zeros')`` which behaves as ``align_corners=True`` — the
convention the reference warp relies on (reference: models/module.py:31-37,
normalizing pixel coordinates with ``(size-1)/2``).  We sample directly in
*pixel* coordinates (the normalize→denormalize round-trip of the reference
is the identity under align_corners=True), which saves work and keeps the
op layout-friendly.

Each output point blends the 4 integer-corner texels; corners that fall
outside the image contribute zero (weights are computed from the
*unclamped* position, matching torch's zero-padding behavior).

The gather is expressed as ``take_along_axis`` over the flattened H*W axis
so XLA lowers it to a single row-gather per corner — the rows are C
contiguous channels, which keeps the access pattern lane-friendly on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` at fractional pixel coordinates.

    Args:
      feat: ``(B, H, W, C)`` feature map.
      coords: ``(B, ..., 2)`` pixel coordinates ``(x, y)`` where ``x`` indexes
        width and ``y`` height; ``(0, 0)`` is the center of the top-left texel.

    Returns:
      ``(B, ..., C)`` sampled values, zero where all corners are out of bounds.

    Prefer :func:`bilinear_sample_xy` in performance code: a trailing
    size-2 coordinate axis is lane-padded 64x by TPU tiling.
    """
    B = feat.shape[0]
    C = feat.shape[-1]
    out_shape = coords.shape[:-1] + (C,)
    xy = coords.reshape(B, -1, 2)
    out = bilinear_sample_xy(feat, xy[..., 0], xy[..., 1])
    return out.reshape(out_shape)


def bilinear_sample_xy(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` ``(B, H, W, C)`` at separate coordinate arrays
    ``x``/``y`` of shape ``(B, N)``.  Returns ``(B, N, C)``."""
    B, H, W, C = feat.shape

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    flat = feat.reshape(B, H * W, C)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = yc * W + xc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * (w * valid)[..., None]

    return (
        corner(x0, y0, (1.0 - fx) * (1.0 - fy))
        + corner(x0 + 1.0, y0, fx * (1.0 - fy))
        + corner(x0, y0 + 1.0, (1.0 - fx) * fy)
        + corner(x0 + 1.0, y0 + 1.0, fx * fy)
    )


def bilinear_sample_normalized(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample with grid in torch's normalized ``[-1, 1]`` convention
    (align_corners=True): ``-1`` maps to pixel 0 and ``+1`` to ``size-1``.

    Provided for direct parity testing against ``F.grid_sample``.
    """
    _, H, W, _ = feat.shape
    x = (grid[..., 0] + 1.0) * ((W - 1) / 2.0)
    y = (grid[..., 1] + 1.0) * ((H - 1) / 2.0)
    return bilinear_sample(feat, jnp.stack([x, y], axis=-1))
