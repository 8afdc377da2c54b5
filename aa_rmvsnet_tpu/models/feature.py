"""Per-view 2D feature extraction with intra-view adaptive aggregation.

A shallow three-scale pyramid (stride 1 / 2 / 4) whose scales are each
refined by a modulated deformable conv, channel-compressed (16/8/8),
upsampled back to full resolution with align-corners bilinear, and
concatenated into a 32-channel full-resolution feature map
(reference: models/drmvsnet.py:7-24, 41-63).
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from .blocks import ConvGNReLU, DeformConvGNReLU
from ..ops.resize import resize_bilinear_align_corners


class IntraViewAA(nn.Module):
    """Deformable refinement + multi-scale fuse (reference drmvsnet.py:7-24)."""

    @nn.compact
    def __call__(self, x0, x1, x2):
        m0 = ConvGNReLU(16, kernel=1, name="conv0")(
            DeformConvGNReLU(32, name="deformconv0")(x0)
        )
        m1 = ConvGNReLU(8, kernel=1, name="conv1")(
            DeformConvGNReLU(32, name="deformconv1")(x1)
        )
        m2 = ConvGNReLU(8, kernel=1, name="conv2")(
            DeformConvGNReLU(32, name="deformconv2")(x2)
        )
        h, w = x0.shape[1], x0.shape[2]
        m1 = resize_bilinear_align_corners(m1, m1.shape[1] * 2, m1.shape[2] * 2)
        m2 = resize_bilinear_align_corners(m2, m2.shape[1] * 4, m2.shape[2] * 4)
        assert m1.shape[1:3] == (h, w) and m2.shape[1:3] == (h, w), (
            "input H,W must be divisible by 4 so the pyramid re-aligns"
        )
        return jnp.concatenate([m0, m1, m2], axis=-1)


class FeatNet(nn.Module):
    """Feature extractor: 2-conv stem, 3-scale pyramid, intra-view AA fuse
    (reference drmvsnet.py:41-63).  In: (B, H, W, 3) standardized images;
    out: (B, H, W, 32) features at full input resolution."""

    @nn.compact
    def __call__(self, x):
        x = ConvGNReLU(8, name="init_conv0")(x)
        x = ConvGNReLU(16, name="init_conv1")(x)
        x0 = ConvGNReLU(32, name="conv0")(x)
        x1 = ConvGNReLU(32, stride=2, name="conv1")(x0)
        x2 = ConvGNReLU(32, stride=2, name="conv2")(x1)
        return IntraViewAA(name="intraAA")(x0, x1, x2)
