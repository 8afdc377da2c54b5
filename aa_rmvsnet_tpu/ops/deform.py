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

import numpy as np

import jax.numpy as jnp


def _tap_geometry(x_pad_shape, offset):
    """Per-tap sample positions / corners / bilinear weights.

    Returns, for each of the 9 taps, the clamped corner coordinates and the
    reference's bilinear weights (module.py:153-165), all ``(B, H, W, 9)``.
    """
    _, Hp, Wp, _ = x_pad_shape
    H, W = Hp - 2, Wp - 2
    K = 9
    rows = jnp.arange(1, H + 1, dtype=offset.dtype)
    cols = jnp.arange(1, W + 1, dtype=offset.dtype)
    dr = jnp.repeat(jnp.arange(-1, 2, dtype=offset.dtype), 3)  # row-major taps
    dc = jnp.tile(jnp.arange(-1, 2, dtype=offset.dtype), 3)

    p_r = rows[None, :, None, None] + dr + offset[..., :K]
    p_c = cols[None, None, :, None] + dc + offset[..., K:]

    r0 = jnp.clip(jnp.floor(p_r), 0, Hp - 1)
    c0 = jnp.clip(jnp.floor(p_c), 0, Wp - 1)
    r1 = jnp.clip(jnp.floor(p_r) + 1, 0, Hp - 1)
    c1 = jnp.clip(jnp.floor(p_c) + 1, 0, Wp - 1)
    p_r = jnp.clip(p_r, 0, Hp - 1)
    p_c = jnp.clip(p_c, 0, Wp - 1)

    g_lt = (1 + (r0 - p_r)) * (1 + (c0 - p_c))
    g_rb = (1 - (r1 - p_r)) * (1 - (c1 - p_c))
    g_lb = (1 + (r0 - p_r)) * (1 - (c1 - p_c))
    g_rt = (1 - (r1 - p_r)) * (1 + (c0 - p_c))
    return (r0, c0, r1, c1), (g_lt, g_rb, g_lb, g_rt)


def deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    modulation: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Modulated deformable 3x3 conv: gather + tap contraction, accumulated
    tap-by-tap.

    Args:
      x: ``(B, H, W, C)`` input features (unpadded).
      offset: ``(B, H, W, 18)``; channels ``[:9]`` shift rows, ``[9:]``
        columns, tap order row-major over {-1,0,1}^2.
      modulation: ``(B, H, W, 9)`` sigmoid modulation scalars.
      kernel: ``(3, 3, C, O)`` HWIO conv weights (tap ``n`` = ``(n//3, n%3)``).
      bias: optional ``(O,)``.

    Returns:
      ``(B, H, W, O)``.

    Memory note: accumulating per tap keeps peak HBM at O(H*W*C) instead of
    materializing the ``(B, H, W, 9, C)`` sample tensor, whose 32-channel
    lanes would be padded 4x by TPU tiling (observed 22.9 GB at 1152x864).
    """
    from .patch_sample import build_patch_table, patch_bilinear_sample

    B, H, W, C = x.shape
    O = kernel.shape[-1]
    Hp, Wp = H + 2, W + 2
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # One 2x2 patch table over the padded image: each tap sample is a single
    # 128-lane gather row + tent-weight blend.  Because the reference clamps
    # sample positions into the zero-pad ring (module.py:153-159), its
    # clamp-to-border semantics coincide with the tent/zero semantics here —
    # every clamped-out position lands on zero texels either way.
    table = build_patch_table(x_pad)

    # Tap geometry in fp32 regardless of compute dtype: at H > 256 the base
    # row positions are not representable in bf16 (integer step 2-4), which
    # would shift every sample near the image bottom by pixels.
    K = 9
    offset32 = offset.astype(jnp.float32)
    rows = jnp.arange(1, H + 1, dtype=jnp.float32)
    cols = jnp.arange(1, W + 1, dtype=jnp.float32)
    dr = np.repeat(np.arange(-1, 2), 3).tolist()
    dc = np.tile(np.arange(-1, 2), 3).tolist()

    w_kernel = kernel.reshape(9, C, O)
    out = jnp.zeros((B, H, W, O), x.dtype)
    for n in range(9):
        # Per-tap coordinates computed INSIDE the loop: a stacked
        # (B, H, W, 9) fp32 coordinate tensor carries a minor-9 axis that
        # TPU tiling pads ~14x (observed 2 GB per tensor at 1920x1056 —
        # the round-4 TnT OOM); per-tap (B, H, W) maps stay unpadded.
        p_r = rows[None, :, None] + (dr[n] + offset32[..., n])  # (B, H, W)
        p_c = cols[None, None, :] + (dc[n] + offset32[..., K + n])
        tap = patch_bilinear_sample(
            table,
            p_c.reshape(B, -1),
            p_r.reshape(B, -1),
            Hp, Wp,
        ).reshape(B, H, W, C)
        tap = tap * modulation[..., n, None]
        out = out + tap @ w_kernel[n]
    if bias is not None:
        out = out + bias
    return out


def deform_sample(x: jnp.ndarray, offset: jnp.ndarray, modulation: jnp.ndarray) -> jnp.ndarray:
    """Reference-shaped sampler: ``(B, H, W, 9, C)`` modulated samples.

    Kept as the slow oracle for tests; production code uses
    :func:`deform_conv` which never materializes the tap axis.
    """
    B, H, W, C = x.shape
    Hp, Wp = H + 2, W + 2
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = x_pad.reshape(B, Hp * Wp, C)
    (r0, c0, r1, c1), (g_lt, g_rb, g_lb, g_rt) = _tap_geometry(x_pad.shape, offset)

    def gather(rr, cc, g):
        idx = (rr.astype(jnp.int32) * Wp + cc.astype(jnp.int32)).reshape(B, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, 9, C)
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
    """Contract gathered taps with a conv kernel (oracle-path companion to
    :func:`deform_sample`)."""
    B, H, W, K, C = samples.shape
    out = samples.reshape(B, H, W, K * C) @ kernel.reshape(K * C, -1)
    if bias is not None:
        out = out + bias
    return out
