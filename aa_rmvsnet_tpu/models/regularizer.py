"""Recurrent cost regularization: a 5-cell ConvLSTM U-Net applied once per
depth hypothesis, threading hidden state along the sweep.

Topology per depth step (reference: models/drmvsnet.py:66-218):

    cell0 @ full res (32 -> 16) ── pool ── cell1 @ 1/2 (16 -> 16) ── pool ──
    cell2 @ 1/4 (16 -> 16) ── deconv ── cat(h1) ── cell3 @ 1/2 (32 -> 16) ──
    deconv ── cat(h0) ── cell4 @ full (32 -> 8) ── 3x3 conv ── 1-ch cost

The recurrence over depth is what gives the engine O(1)-in-D activation
memory at inference; the sweep itself is a ``lax.scan`` in the network
driver, this module is the per-step body.
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from .blocks import ConvLSTMCell, DeconvGNReLU

HIDDEN_DIMS = (16, 16, 16, 16, 8)


class UNetConvLSTM(nn.Module):
    """One depth-step of the recurrent regularizer.

    ``__call__(x, states) -> (cost, new_states)`` where ``x`` is the negated
    variance cost slice ``(B, H, W, 32)`` (H, W divisible by 4) and
    ``states`` is a 5-tuple of ``(h, c)`` pairs at resolutions
    (1, 1/2, 1/4, 1/2, 1).

    ``pallas_gates`` routes every cell's gate math through the fused Pallas
    kernel (hyperparameter only — the parameter tree is unchanged).
    """

    pallas_gates: bool = False

    @nn.compact
    def __call__(self, x, states):
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        cell = lambda hidden, name: ConvLSTMCell(
            hidden, use_pallas=self.pallas_gates, name=name
        )

        s0 = cell(16, "cell0")(x, states[0])
        h0 = s0[0]
        s1 = cell(16, "cell1")(pool(h0), states[1])
        h1 = s1[0]
        s2 = cell(16, "cell2")(pool(h1), states[2])
        h2 = s2[0]

        u2 = DeconvGNReLU(16, name="deconv0")(h2)
        s3 = cell(16, "cell3")(jnp.concatenate([u2, h1], -1), states[3])
        h3 = s3[0]
        u3 = DeconvGNReLU(16, name="deconv1")(h3)
        s4 = cell(8, "cell4")(jnp.concatenate([u3, h0], -1), states[4])
        h4 = s4[0]

        cost = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="conv_out")(h4)
        return cost, (s0, s1, s2, s3, s4)


def init_states(batch: int, height: int, width: int, dtype=jnp.float32):
    """Zero hidden state for the 5-cell U-Net (reference drmvsnet.py:133-134,
    202-206: zeros at the first depth step)."""
    if height % 4 or width % 4:
        raise ValueError(f"feature size ({height},{width}) must be divisible by 4")
    sizes = [
        (height, width, 16),
        (height // 2, width // 2, 16),
        (height // 4, width // 4, 16),
        (height // 2, width // 2, 16),
        (height, width, 8),
    ]
    return tuple(
        ConvLSTMCell.zero_state(batch, h, w, c, dtype) for (h, w, c) in sizes
    )
