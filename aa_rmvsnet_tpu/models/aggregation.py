"""Inter-view adaptive aggregation ("omega"): a tiny pixel-wise reweighting
network applied to each warped residual volume, producing a sigmoid weight
map used as ``(omega + 1) * residual`` (reference: models/drmvsnet.py:27-38,
applied at drmvsnet.py:279-283)."""

from __future__ import annotations

from flax import linen as nn

from .blocks import ConvGNReLU, ResnetBlockGN


class InterViewAA(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvGNReLU(4, name="rw0")(x)
        x = ResnetBlockGN(4, kernel=1, name="rw1")(x)
        x = nn.Conv(1, (1, 1), name="rw2")(x)
        return nn.sigmoid(x)
