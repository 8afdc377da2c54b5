"""Building-block flax modules: Conv+GroupNorm+ReLU stacks, residual blocks,
transposed-conv upsampling, ConvLSTM cells, and modulated deformable convs.

Numerics mirror the reference primitives (reference: models/module.py):
- GroupNorm uses ``max(1, C/8)`` groups, eps 1e-5, affine (module.py:98-103);
- convs carry bias and use torch-style symmetric explicit padding
  (XLA ``SAME`` pads asymmetrically for stride 2, which would diverge);
- the ConvLSTM gate conv maps ``concat(x, h)`` to 4*hidden channels split
  as (i, f, o, g) (module.py:76-92);
- transposed conv (k=3, s=2, p=1, output_padding=1) is expressed as an
  input-dilated forward conv — ``lhs_dilation=2`` with (1, 2) padding —
  which XLA fuses like any other conv.

Layout is NHWC throughout (TPU-native).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform import deform_conv


def group_count(channels: int, group_channel: int = 8) -> int:
    return max(1, channels // group_channel)


class ConvGNReLU(nn.Module):
    """3x3 (default) conv + GroupNorm(C/8) + ReLU (reference module.py:98-103)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel - 1) // 2) * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=group_count(self.features), epsilon=1e-5, name="gn")(x)
        return nn.relu(x)


class ResnetBlockGN(nn.Module):
    """conv-gn-relu → conv-gn residual block + relu (reference module.py:252-267)."""

    features: int
    kernel: int = 3
    dilation: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        y = ConvGNReLU(self.features, self.kernel, dilation=self.dilation[0], name="stem0")(x)
        pad = ((self.kernel - 1) // 2) * self.dilation[1]
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation[1], self.dilation[1]),
            name="stem1",
        )(y)
        y = nn.GroupNorm(num_groups=group_count(self.features), epsilon=1e-5, name="gn")(y)
        return nn.relu(y + x)


class DeconvGNReLU(nn.Module):
    """2x-upsampling transposed conv (k=3, s=2, p=1, op=1) + GroupNorm + ReLU
    (reference module.py:269-287), expressed as an input-dilated conv.

    The stored kernel is the HWIO kernel of the *equivalent forward conv*
    (the torch transposed-conv weight spatially flipped with in/out swapped);
    the checkpoint converter performs that transform.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias
        y = nn.GroupNorm(num_groups=group_count(self.features), epsilon=1e-5, name="gn")(y)
        return nn.relu(y)


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell: one 3x3 conv over concat(x, h) producing the
    four gates (reference module.py:40-92).

    With ``use_pallas=True`` (plumbed from ``SweepConfig.pallas_gates``) the
    elementwise gate math runs through the fused 128-lane Pallas kernel
    (:mod:`aa_rmvsnet_tpu.ops.pallas.gates`) instead of the XLA-fused chain.
    ``AA_RMVSNET_PALLAS=1`` remains as an env fallback, but being read at
    trace time it is NOT part of any jit cache key — set it before the first
    compile or prefer the config field.
    """

    hidden: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, state):
        from ..ops.pallas.gates import fused_lstm_gates, pallas_gates_enabled

        h, c = state
        z = nn.Conv(
            4 * self.hidden, (3, 3), padding=((1, 1), (1, 1)), name="conv"
        )(jnp.concatenate([x, h], axis=-1))
        if self.use_pallas or pallas_gates_enabled():
            return fused_lstm_gates(z, c)
        i, f, o, g = jnp.split(z, 4, axis=-1)
        c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return h_next, c_next

    @staticmethod
    def zero_state(batch: int, height: int, width: int, hidden: int, dtype=jnp.float32):
        shape = (batch, height, width, hidden)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


class DeformConv(nn.Module):
    """Modulated deformable conv v2 (3x3): learned offset (18ch) and sigmoid
    modulation (9ch) branches, zero-initialized so the op starts as a
    0.5-scaled ordinary conv (reference module.py:105-189).

    The gather is :func:`aa_rmvsnet_tpu.ops.deform.deform_sample`; the tap
    contraction is a single (9*C -> O) matmul on the MXU.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        offset = nn.Conv(
            18, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros_init(), name="p_conv",
        )(x)
        modulation = nn.sigmoid(
            nn.Conv(
                9, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=nn.initializers.zeros_init(), name="m_conv",
            )(x)
        )
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return deform_conv(x, offset, modulation, kernel, bias)


class DeformConvGNReLU(nn.Module):
    """DeformConv + GroupNorm(C/8) + ReLU (reference module.py:245-250)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = DeformConv(self.features, name="deform")(x)
        x = nn.GroupNorm(num_groups=group_count(self.features), epsilon=1e-5, name="gn")(x)
        return nn.relu(x)
