"""Inter-view adaptive aggregation ("omega"): a tiny pixel-wise reweighting
network applied to each warped residual volume, producing a sigmoid weight
map used as ``(omega + 1) * residual`` (reference: models/drmvsnet.py:27-38,
applied at drmvsnet.py:279-283).

Two equivalent execution forms:

- :class:`InterViewAA` — the canonical flax module on an ``(N, H, W, 32)``
  batch.  Its hidden width is 4 channels, which TPU tiling pads to 128
  lanes: every materialized intermediate costs 32x its real bytes in HBM.
- :func:`omega_folded` — the same parameters applied as grouped convs with
  ``G`` residual volumes folded into the channel axis (``(N/G, H, W,
  G*32)``), so intermediates carry ``G*4`` channels and the lane padding
  shrinks by ``G``x.  Numerically identical (tiled weights, per-group
  normalization); parity-tested in ``tests/test_models.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvGNReLU, ResnetBlockGN


class InterViewAA(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvGNReLU(4, name="rw0")(x)
        x = ResnetBlockGN(4, kernel=1, name="rw1")(x)
        x = nn.Conv(1, (1, 1), name="rw2")(x)
        return nn.sigmoid(x)


def _gn1(x, scale, bias, eps=1e-5):
    """GroupNorm(num_groups=1): stats per image over (H, W, C)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
    norm = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return norm * scale.astype(x.dtype) + bias.astype(x.dtype)


def omega_folded(params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Apply the omega network with ``groups`` volumes folded into channels.

    Implementation note (round-3): this runs an UNROLLED Python loop over
    the G folded volumes, each a plain dense-conv application of the omega
    net on that volume's ``(N, H, W, 32)`` channel slice.  The earlier
    grouped-conv form (``feature_group_count=G``) is mathematically the
    same but XLA's TPU lowering materializes layout-constrained copies of
    the conv operands in a 5D ``(N, H, W, G, 4)`` minor-4 shape — 32x lane
    padding, observed 2 x 7.6 GB HLO temps at the north-star config
    (864x1152, G=8), an OOM.  Per-group slices keep every intermediate in
    a 2D-tiled layout XLA handles without padded copies, and the unrolled
    tiny convs fuse/overlap freely.

    Args:
      params: the ``omega`` parameter subtree (as produced by
        ``AARMVSNetCore`` init / the checkpoint converter).
      x: ``(N, H, W, groups*32)`` folded residual volumes.
      groups: number of folded volumes G.

    Returns:
      ``(N, H, W, groups)`` sigmoid weight maps (one channel per volume).
    """
    dtype = x.dtype
    C = x.shape[-1] // groups

    def conv(x, kernel, bias, pad):
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dtype)

    rw0, rw1, rw2 = params["rw0"], params["rw1"], params["rw2"]

    outs = []
    for g in range(groups):
        xg = x[..., g * C : (g + 1) * C]
        y = conv(xg, rw0["conv"]["kernel"], rw0["conv"]["bias"], pad=1)
        y = nn.relu(_gn1(y, rw0["gn"]["scale"], rw0["gn"]["bias"]))

        z = conv(y, rw1["stem0"]["conv"]["kernel"],
                 rw1["stem0"]["conv"]["bias"], pad=0)
        z = nn.relu(_gn1(z, rw1["stem0"]["gn"]["scale"],
                         rw1["stem0"]["gn"]["bias"]))
        z = conv(z, rw1["stem1"]["kernel"], rw1["stem1"]["bias"], pad=0)
        z = _gn1(z, rw1["gn"]["scale"], rw1["gn"]["bias"])
        y = nn.relu(z + y)

        w = conv(y, rw2["kernel"], rw2["bias"], pad=0)
        outs.append(nn.sigmoid(w[..., 0]))  # (N, H, W)
    return jnp.stack(outs, axis=-1)
