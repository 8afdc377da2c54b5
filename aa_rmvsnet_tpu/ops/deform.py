"""Modulated deformable-convolution (v2) sampling.

Gathers, for every output pixel, the k*k kernel taps at learned fractional
offsets with learned sigmoid modulation, bilinearly interpolated from the
zero-padded input.  Numerics replicate the reference's pure-PyTorch
implementation exactly (reference: models/module.py:105-243), including its
edge behavior: sample positions and the four interpolation corners are
clamped to the *padded* image bounds before computing bilinear weights, so
out-of-range taps blend border/padding texels instead of returning zero.

The sampling grid lives in padded coordinates: output pixel ``(i, j)`` has
base position ``(i+1, j+1)`` (reference module.py:201-209 builds the base
grid from 1), plus the kernel tap ``(dr, dc)`` in row-major {-1,0,1}^2,
plus the learned offset (channels 0..8 = row offsets, 9..17 = col offsets).

The follow-up k x k convolution over the gathered taps collapses to a
single ``(k*k*C_in) -> C_out`` contraction per pixel — one clean MXU matmul
(the reference reaches the same math by re-tiling to ``kH x kW`` and
running a stride-k conv, module.py:237-243).
"""

from __future__ import annotations

import jax.numpy as jnp


def deform_sample(x: jnp.ndarray, offset: jnp.ndarray, modulation: jnp.ndarray) -> jnp.ndarray:
    """Gather modulated bilinear samples for a 3x3 deformable kernel.

    Args:
      x: ``(B, H, W, C)`` input features (unpadded).
      offset: ``(B, H, W, 18)`` learned offsets; channels ``[:9]`` shift rows,
        ``[9:]`` shift columns, tap order row-major over {-1,0,1}^2.
      modulation: ``(B, H, W, 9)`` sigmoid modulation scalars per tap.

    Returns:
      ``(B, H, W, 9, C)`` modulated samples, tap axis in row-major order.
    """
    B, H, W, C = x.shape
    K = 9
    Hp, Wp = H + 2, W + 2
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # Base grid in padded coordinates plus kernel taps.
    rows = jnp.arange(1, H + 1, dtype=offset.dtype)
    cols = jnp.arange(1, W + 1, dtype=offset.dtype)
    dr = jnp.repeat(jnp.arange(-1, 2, dtype=offset.dtype), 3)  # (9,) row-major taps
    dc = jnp.tile(jnp.arange(-1, 2, dtype=offset.dtype), 3)

    p_r = rows[None, :, None, None] + dr + offset[..., :K]  # (B, H, W, 9)
    p_c = cols[None, None, :, None] + dc + offset[..., K:]

    # Corners, clamped to padded bounds (reference module.py:153-159).
    r0 = jnp.clip(jnp.floor(p_r), 0, Hp - 1)
    c0 = jnp.clip(jnp.floor(p_c), 0, Wp - 1)
    r1 = jnp.clip(jnp.floor(p_r) + 1, 0, Hp - 1)
    c1 = jnp.clip(jnp.floor(p_c) + 1, 0, Wp - 1)
    p_r = jnp.clip(p_r, 0, Hp - 1)
    p_c = jnp.clip(p_c, 0, Wp - 1)

    # Bilinear weights from clamped corners/positions (module.py:162-165).
    g_lt = (1 + (r0 - p_r)) * (1 + (c0 - p_c))
    g_rb = (1 - (r1 - p_r)) * (1 - (c1 - p_c))
    g_lb = (1 + (r0 - p_r)) * (1 - (c1 - p_c))
    g_rt = (1 - (r1 - p_r)) * (1 + (c0 - p_c))

    flat = x_pad.reshape(B, Hp * Wp, C)

    def gather(rr, cc, g):
        idx = (rr.astype(jnp.int32) * Wp + cc.astype(jnp.int32)).reshape(B, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, K, C)
        return vals * g[..., None]

    samples = (
        gather(r0, c0, g_lt)
        + gather(r1, c1, g_rb)
        + gather(r0, c1, g_lb)
        + gather(r1, c0, g_rt)
    )
    return samples * modulation[..., None]


def deform_conv_apply(
    samples: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Contract gathered taps with a conv kernel.

    Args:
      samples: ``(B, H, W, 9, C)`` from :func:`deform_sample`.
      kernel: ``(3, 3, C, O)`` HWIO conv weights (tap ``n`` = ``(n//3, n%3)``).
      bias: optional ``(O,)``.

    Returns:
      ``(B, H, W, O)``.
    """
    B, H, W, K, C = samples.shape
    out = samples.reshape(B, H, W, K * C) @ kernel.reshape(K * C, -1)
    if bias is not None:
        out = out + bias
    return out
