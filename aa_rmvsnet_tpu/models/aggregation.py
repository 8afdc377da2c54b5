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


def _group_norm_folded(x, scale, bias, groups: int, channels: int, eps=1e-5):
    """GroupNorm(num_groups=1 per volume) on a G-folded channel axis: stats
    are per (image, folded-volume) over (H, W, channels).

    Every H x W-sized tensor stays in the folded ``(N, H, W, G*C)`` layout:
    reshaping to ``(N, H, W, G, C)`` for the stats would materialize a
    minor-C=4 tensor that TPU tiling pads 32x (observed 7.6 GB HLO temps
    at the north-star config).  Only the (N, G*C)-shaped moment vectors are
    ever reshaped to split groups.

    Moments: on the bf16 perf path they are ONE-PASS (fp32 E[x], E[x^2] in
    a single fused read of x; var = E[x^2] - E[x]^2) — each GN stage then
    reads its 128-lane-padded input twice instead of three times, cutting
    the omega stage's dominant HBM stream (the cost block's x's are O(1-10)
    post-conv, so the fp32 cancellation error ~1e-5 relative sits far
    below bf16 resolution).  fp32 inputs keep the exact two-pass form —
    the parity contract (oracle tests run fp32).
    """
    N, H, W, GC = x.shape
    x32 = x.astype(jnp.float32)
    if x.dtype == jnp.float32:
        # Two-pass moments: per-channel means over (H, W), then the
        # per-group mean of those (equal counts -> exact group mean).
        mu_c = jnp.mean(x32, axis=(1, 2))  # (N, GC)
        mu_g = jnp.mean(mu_c.reshape(N, groups, channels), axis=2)  # (N, G)
        mean = jnp.repeat(mu_g, channels, axis=1)[:, None, None, :]
        d = x32 - mean
        var_c = jnp.mean(jnp.square(d), axis=(1, 2))  # (N, GC)
        var_g = jnp.mean(var_c.reshape(N, groups, channels), axis=2)
        inv = jnp.repeat(jax.lax.rsqrt(var_g + eps), channels, axis=1)
        norm = (d * inv[:, None, None, :]).astype(x.dtype)
        return norm * scale.astype(x.dtype) + bias.astype(x.dtype)
    mu_c = jnp.mean(x32, axis=(1, 2))           # (N, GC)  — one fused read
    m2_c = jnp.mean(jnp.square(x32), axis=(1, 2))
    mu_g = jnp.mean(mu_c.reshape(N, groups, channels), axis=2)  # (N, G)
    m2_g = jnp.mean(m2_c.reshape(N, groups, channels), axis=2)
    var_g = jnp.maximum(m2_g - jnp.square(mu_g), 0.0)
    mean = jnp.repeat(mu_g, channels, axis=1)[:, None, None, :]
    inv = jnp.repeat(jax.lax.rsqrt(var_g + eps), channels, axis=1)
    norm = ((x32 - mean) * inv[:, None, None, :]).astype(x.dtype)
    return norm * scale.astype(x.dtype) + bias.astype(x.dtype)


def _block_diag_kernel(kernel: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Tile a ``(kh, kw, Cin, Cout)`` kernel into a block-diagonal
    ``(kh, kw, G*Cin, G*Cout)`` one: a DENSE conv with it equals the
    G-grouped conv exactly (off-diagonal blocks are zero)."""
    kh, kw, cin, cout = kernel.shape
    eye = jnp.eye(groups, dtype=kernel.dtype)  # (G, G)
    # (kh, kw, G, Cin, G, Cout) with zeros off the group diagonal.
    bd = jnp.einsum("hwio,gk->hwgiko", kernel, eye)
    return bd.reshape(kh, kw, groups * cin, groups * cout)


def omega_folded(params, x: jnp.ndarray, groups: int,
                 input_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply the omega network with ``groups`` volumes folded into channels.

    Implementation note (round-3): the G-grouped convs run as DENSE convs
    with block-diagonal kernels.  Rationale, in order of what failed:

    - ``feature_group_count=G`` convs: XLA's TPU lowering materializes
      layout-constrained 5D ``(N, H, W, G, 4)`` minor-4 copies — 32x lane
      padding, 2 x 7.6 GB HLO temps at the north-star config (OOM).
    - an unrolled per-group loop: every group's ``(N, H, W, 4)``
      intermediate pads to 128 lanes — the SAME padded bytes as an
      all-groups ``(N, H, W, G*4)`` tensor, so the loop pays the padded
      HBM stream G times over (~18 s/map of the round-3 bench's 36 s).
    - block-diagonal dense convs keep ONE ``(N, H, W, G*4)`` stream per
      stage (G=8: 32 lanes, 4x padding instead of 32x) and spend the G-fold
      FLOP waste on conv throughput this chip has idle (measured ~8 TFLOPS
      effective on the ConvLSTM vs the sweep being HBM-limited here).

    Numerically identical to the canonical module (off-diagonal zeros
    contribute nothing; parity-tested).

    Args:
      params: the ``omega`` parameter subtree (as produced by
        ``AARMVSNetCore`` init / the checkpoint converter).
      x: ``(N, H, W, groups*32)`` folded residual volumes.
      groups: number of folded volumes G.

    Returns:
      ``(N, H, W, groups)`` sigmoid weight maps (one channel per volume).

    ``input_scale``: optional per-channel ``(C,)`` dequantization factors
    for a quantized ``x`` (the fp8 residual-storage lever,
    ``SweepConfig.residual_dtype``): folded into rw0's kernel input rows, so
    ``omega_folded(p, q, G, s) == omega_folded(p, q * tile(s), G)`` exactly
    without ever materializing the dequantized residual stream.
    """
    int8_in = x.dtype == jnp.int8
    dtype = jnp.bfloat16 if int8_in else x.dtype
    tile_vec = lambda v: jnp.tile(v.astype(dtype), (groups,))

    rw0_kernel = params["rw0"]["conv"]["kernel"]
    if input_scale is not None:
        rw0_kernel = rw0_kernel * input_scale.astype(rw0_kernel.dtype)[
            None, None, :, None
        ]

    # Lever-matrix knob (VERDICT r4 item 4): AA_RMVSNET_OMEGA_FORM=grouped
    # runs the G-grouped convs as real feature_group_count convs (no FLOP
    # waste) instead of block-diagonal dense ones.  Measured r3: OOM at the
    # north-star config (XLA's TPU lowering materializes 32x-lane-padded
    # 5D copies); kept selectable so smaller configs can be measured.
    import os

    grouped = os.environ.get("AA_RMVSNET_OMEGA_FORM") == "grouped"

    def conv(x, kernel, bias, pad):
        if grouped:
            y = jax.lax.conv_general_dilated(
                x, jnp.tile(kernel.astype(dtype), (1, 1, 1, groups)),
                (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, _block_diag_kernel(kernel.astype(dtype), groups), (1, 1),
                ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + tile_vec(bias)

    rw0, rw1, rw2 = params["rw0"], params["rw1"], params["rw2"]

    # Round-5 experiment (AA_RMVSNET_OMEGA_INT8=chain, int8 input only):
    # run the WHOLE omega chain on the MXU int8 path — stems/rw2 consume
    # int8-quantized activations, not just rw0.  Activation scales are
    # STATIC, derived from each stage's GN affine parameters: the GN output
    # is scale_c * x_norm + bias_c with x_norm zero-mean unit-variance, so
    # |out_c| <= |scale_c| * SB + |bias_c| for a sigma clip bound SB (8 —
    # ~1e6-sample Gaussian tails stay under it; resolution is then
    # bound/127 ~ 0.06 sigma).  Per-input-channel act scales fold into the
    # next kernel before its own per-output-channel 1/127 quantization —
    # the same two-scale algebra as the existing rw0 int8 conv.  Wins
    # 1.24x MXU rate (scripts/probe_int8_rate.py) on the stem/rw2 FLOPs
    # AND halves the GN-output/conv-operand streams (int8 vs bf16).
    chain8 = int8_in and os.environ.get("AA_RMVSNET_OMEGA_INT8") == "chain"

    def _quant_kernel(kernel, a_in=None):
        """Block-diag int8 kernel + per-output-channel dequant scale; folds
        optional per-input-channel activation scales first."""
        k = kernel.astype(jnp.float32)
        if a_in is not None:
            k = k * a_in[None, None, :, None]
        kmax = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12)
        bdq = _block_diag_kernel(
            jnp.clip(jnp.round(k / kmax * 127.0), -127, 127), groups
        ).astype(jnp.int8)
        return bdq, kmax / 127.0  # per-block (cout,); _conv8 tiles it

    def _conv8(xq, bdq, co_scale, bias, pad):
        y32 = jax.lax.conv_general_dilated(
            xq, bdq, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y32.astype(dtype) * jnp.tile(co_scale.astype(dtype), (groups,)
                                            ) + tile_vec(bias)

    if chain8:
        sb = 8.0

        def gn_bound(gn):  # (4,) upper bound of |GN output| per channel
            return (jnp.abs(gn["scale"].astype(jnp.float32)) * sb
                    + jnp.abs(gn["bias"].astype(jnp.float32)))

        def quant_act(xf, a4):  # xf >= 0 (post-relu); a4: (4,) fp32 scales
            a = jnp.tile((a4 / 127.0).astype(dtype), (groups,))
            return jnp.clip(jnp.round(xf / a), 0, 127).astype(jnp.int8)

        def gn(t, stage):
            return _group_norm_folded(
                t, tile_vec(stage["scale"]), tile_vec(stage["bias"]),
                groups, 4)

        b1 = gn_bound(rw0["gn"])
        y = _conv8(x, *_quant_kernel(rw0_kernel), rw0["conv"]["bias"], 1)
        yq = quant_act(nn.relu(gn(y, rw0["gn"])), b1)  # the only live y

        b2 = gn_bound(rw1["stem0"]["gn"])
        z = _conv8(yq, *_quant_kernel(rw1["stem0"]["conv"]["kernel"],
                                      b1 / 127.0),
                   rw1["stem0"]["conv"]["bias"], 0)
        zq = quant_act(nn.relu(gn(z, rw1["stem0"]["gn"])), b2)

        z = _conv8(zq, *_quant_kernel(rw1["stem1"]["kernel"], b2 / 127.0),
                   rw1["stem1"]["bias"], 0)
        z = gn(z, rw1["gn"])
        # residual add: dequantize yq inside the elementwise chain
        y_deq = yq.astype(dtype) * jnp.tile((b1 / 127.0).astype(dtype),
                                            (groups,))
        b3 = gn_bound(rw1["gn"]) + b1  # bound of relu(z + y)
        sq = quant_act(nn.relu(z + y_deq), b3)

        w = _conv8(sq, *_quant_kernel(rw2["kernel"], b3 / 127.0),
                   rw2["bias"], 0)
        return nn.sigmoid(w)

    if int8_in:
        # int8 residual input (SweepConfig.residual_dtype=int8): run rw0
        # as an MXU-native int8 conv so the quantized residual is consumed
        # DIRECTLY — the fp8 residual lever's fp8->bf16 convert was
        # observed to re-materialize the whole residual stream (~261
        # GB/map at the north-star config, BENCHMARKS.md r4/r5).  The
        # per-channel input scale is already folded into rw0_kernel above;
        # the folded kernel is then quantized per OUTPUT channel onto a
        # 1/127 grid (weights-only quantization, ~0.4% — the same grid
        # the int8 blend uses) and the two scales ride the small conv
        # output.
        bd = _block_diag_kernel(rw0_kernel.astype(jnp.float32), groups)
        kmax = jnp.maximum(jnp.max(jnp.abs(bd), axis=(0, 1, 2)), 1e-12)
        bd_q = jnp.clip(jnp.round(bd / kmax * 127.0), -127, 127).astype(
            jnp.int8)
        y32 = jax.lax.conv_general_dilated(
            x, bd_q, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y32.astype(dtype) * (kmax / 127.0).astype(dtype)
        y = y + tile_vec(rw0["conv"]["bias"])
    else:
        y = conv(x, rw0_kernel, rw0["conv"]["bias"], pad=1)
    y = _group_norm_folded(y, tile_vec(rw0["gn"]["scale"]),
                           tile_vec(rw0["gn"]["bias"]), groups, 4)
    y = nn.relu(y)

    z = conv(y, rw1["stem0"]["conv"]["kernel"], rw1["stem0"]["conv"]["bias"], pad=0)
    z = _group_norm_folded(z, tile_vec(rw1["stem0"]["gn"]["scale"]),
                           tile_vec(rw1["stem0"]["gn"]["bias"]), groups, 4)
    z = nn.relu(z)
    z = conv(z, rw1["stem1"]["kernel"], rw1["stem1"]["bias"], pad=0)
    z = _group_norm_folded(z, tile_vec(rw1["gn"]["scale"]),
                           tile_vec(rw1["gn"]["bias"]), groups, 4)
    y = nn.relu(z + y)

    w = conv(y, rw2["kernel"], rw2["bias"], pad=0)  # (N, H, W, G)
    return nn.sigmoid(w)
