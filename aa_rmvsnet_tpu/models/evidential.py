"""Evidential (NIG) uncertainty head and losses.

A 3D-CNN hourglass stack over the depth probability volume predicting
Normal-Inverse-Gamma parameters (gamma, nu, alpha, beta) per pixel, fused
from three scales by an analytic mixture-of-NIG rule, plus the associated
training losses and aleatoric/epistemic decompositions (reference:
evidential/models.py:183-558, "ELFNet inspired" path).

Faithful-to-reference numerics with two documented deviations (both from
the quirk ledger, SURVEY §7.4):

1. The reference's third input volume is softmaxed over the *batch* axis
   (evidential/models.py:393), which with its batch-1 assumption collapses
   to an all-ones volume; we replicate that exact behavior (softmax over a
   size-1 axis) so a converted reference checkpoint reproduces outputs
   bit-for-bit, batched over B properly.
2. ``disparity_regression`` requires exactly ``maxdisp`` depth hypotheses
   (the reference crashes for D != 32); we resample ``depth_values`` to
   ``maxdisp`` with the same align-corners mapping applied to the volume,
   which is the identity when D == maxdisp.

Layout is NDHWC (TPU-native 3D convs).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_trilinear_align_corners, _interp_matrix


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvBN3d(nn.Module):
    """Conv3d (no bias) + BatchNorm3d (reference evidential/models.py:10-13)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel,) * 3,
            strides=(self.stride,) * 3,
            padding=((self.pad, self.pad),) * 3,
            use_bias=False,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)


class Conv3dStride2(nn.Module):
    """Bare strided Conv3d, no BN/bias (HourGlassUp's conv1/conv3)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (3, 3, 3), strides=(2, 2, 2),
            padding=((1, 1),) * 3, use_bias=False, name="conv",
        )(x)


class Deconv3dBN(nn.Module):
    """ConvTranspose3d (k3, s2, p1, op1, no bias) + BN, as an input-dilated
    conv (reference evidential/models.py:85-93, 144-152)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, in_c, self.features)
        )
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=((1, 2),) * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(y)


class HourGlass(nn.Module):
    """Two-level 3D hourglass with skip redirections
    (reference evidential/models.py:128-169)."""

    features: int  # = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        F = self.features
        conv1 = mish(ConvBN3d(F * 2, stride=2, name="conv1")(x, train))
        conv2 = mish(ConvBN3d(F * 2, name="conv2")(conv1, train))
        conv3 = mish(ConvBN3d(F * 4, stride=2, name="conv3")(conv2, train))
        conv4 = mish(ConvBN3d(F * 4, name="conv4")(conv3, train))
        conv5 = mish(
            Deconv3dBN(F * 2, name="conv5")(conv4, train)
            + ConvBN3d(F * 2, kernel=1, pad=0, name="redir2")(conv2, train)
        )
        conv6 = mish(
            Deconv3dBN(F, name="conv6")(conv5, train)
            + ConvBN3d(F, kernel=1, pad=0, name="redir1")(x, train)
        )
        return conv6


class HourGlassUp(nn.Module):
    """Hourglass that merges two lower-scale feature volumes on the way down
    (reference evidential/models.py:55-125)."""

    features: int  # = 32

    @nn.compact
    def __call__(self, x, feat4, feat5, train: bool = False):
        F = self.features
        conv1 = Conv3dStride2(F * 2, name="conv1")(x)
        conv1 = jnp.concatenate([conv1, feat4], axis=-1)
        conv1 = mish(ConvBN3d(F * 2, name="combine1")(conv1, train))
        conv2 = mish(ConvBN3d(F * 2, name="conv2")(conv1, train))

        conv3 = Conv3dStride2(F * 4, name="conv3")(conv2)
        conv3 = jnp.concatenate([conv3, feat5], axis=-1)
        conv3 = mish(ConvBN3d(F * 4, name="combine2")(conv3, train))
        conv4 = mish(ConvBN3d(F * 4, name="conv4")(conv3, train))

        conv7 = mish(ConvBN3d(F * 4, kernel=1, pad=0, name="redir3")(conv4, train))
        conv8 = mish(
            Deconv3dBN(F * 2, name="conv8")(conv7, train)
            + ConvBN3d(F * 2, kernel=1, pad=0, name="redir2")(conv2, train)
        )
        conv9 = mish(
            Deconv3dBN(F, name="conv9")(conv8, train)
            + ConvBN3d(F, kernel=1, pad=0, name="redir1")(x, train)
        )
        return conv9


def moe_nig(u1, la1, a1, b1, u2, la2, a2, b2):
    """Mixture of two NIG estimates, Eq. 9 (reference models.py:287-295)."""
    la = la1 + la2
    u = (la1 * u1 + la2 * u2) / la
    alpha = a1 + a2 + 0.5
    beta = b1 + b2 + 0.5 * (la1 * (u1 - u) ** 2 + la2 * (u2 - u) ** 2)
    return u, la, alpha, beta


class EvidentialHead(nn.Module):
    """NIG parameter head over the probability volume.

    ``__call__(prob_volume (B, D, H, W), depth_values (B, D))`` returns a
    dict with ``gamma/nu/alpha/beta`` each ``(B, H, W)`` plus the averaged
    three-scale probability volume ``prob_combine`` ``(B, maxdisp, H, W)``.
    H, W must be divisible by 4.
    """

    maxdisp: int = 32

    @nn.compact
    def __call__(self, prob_volume, depth_values, train: bool = False):
        B, D, H, W = prob_volume.shape
        M = self.maxdisp
        x = prob_volume[..., None]  # (B, D, H, W, 1) NDHWC

        vol1 = resize_trilinear_align_corners(x, M, H, W)
        vol1 = jax.nn.softmax(vol1, axis=1)
        vol2 = resize_trilinear_align_corners(x, M // 2, H // 2, W // 2)
        vol2 = jax.nn.softmax(vol2, axis=1)
        # Reference softmaxes its third volume over the (size-1) batch-as-
        # channel axis -> identically ones (models.py:393); replicated here.
        vol3 = resize_trilinear_align_corners(x, M // 4, H // 4, W // 4)
        vol3 = jnp.ones_like(vol3)

        cost0 = mish(ConvBN3d(32, name="dres0_0")(vol1, train))
        cost0 = mish(ConvBN3d(32, name="dres0_1")(cost0, train))
        res = mish(ConvBN3d(32, name="dres1_0")(cost0, train))
        res = mish(ConvBN3d(32, name="dres1_1")(res, train))
        cost0 = res + cost0

        v2 = mish(ConvBN3d(32, name="conv_vol2_0")(vol2, train))
        v2 = ConvBN3d(32, name="conv_vol2_1")(v2, train)
        v3 = mish(ConvBN3d(32, name="conv_vol3_0")(vol3, train))
        v3 = ConvBN3d(32, name="conv_vol3_1")(v3, train)

        combine = HourGlassUp(32, name="combine1")(cost0, v2, v3, train)
        out1 = HourGlass(32, name="dres2")(combine, train)
        out2 = HourGlass(32, name="dres3")(out1, train)

        # Depth hypotheses resampled onto the maxdisp grid (identity when
        # D == maxdisp; the reference requires D == 32, models.py:40-45).
        interp = jnp.asarray(_interp_matrix(D, M))  # (M, D)
        dvals = depth_values @ interp.T  # (B, M)

        def classify(name, feat):
            out = mish(ConvBN3d(32, name=f"{name}_0")(feat, train))
            out = nn.Conv(4, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                          name=f"{name}_1")(out)
            # (B, M, H, W, 4) -> per-channel (B, M, H, W)
            cost, logla, logalpha, logbeta = (out[..., i] for i in range(4))
            prob = jax.nn.softmax(cost, axis=1)
            pred = jnp.sum(prob * dvals[:, :, None, None], axis=1)
            weight = lambda logits: jnp.sum(logits * prob, axis=1)
            la = jax.nn.softplus(weight(logla))
            alpha = jax.nn.softplus(weight(logalpha)) + 1.0
            beta = jax.nn.softplus(weight(logbeta))
            return (pred, la, alpha, beta), prob

        est0, prob0 = classify("classif0", cost0)
        est1, prob1 = classify("classif1", out1)
        est2, prob2 = classify("classif2", out2)

        u, la, alpha, beta = moe_nig(*est0, *est1)
        u, la, alpha, beta = moe_nig(u, la, alpha, beta, *est2)

        return {
            "gamma": u,
            "nu": la,
            "alpha": alpha,
            "beta": beta,
            "prob_combine": (prob0 + prob1 + prob2) / 3.0,
        }


def init_evidential(rng, height: int = 32, width: int = 32, maxdisp: int = 32):
    head = EvidentialHead(maxdisp=maxdisp)
    prob = jnp.zeros((1, maxdisp, height, width))
    dvals = jnp.linspace(400.0, 600.0, maxdisp)[None]
    return head.init(rng, prob, dvals)


def make_evidential_apply(variables, maxdisp: int = 32):
    """Jitted eval-mode application for the inference driver."""
    head = EvidentialHead(maxdisp=maxdisp)

    @jax.jit
    def apply(cost_volume, depth_values):
        prob = jax.nn.softmax(cost_volume.astype(jnp.float32), axis=1)
        return head.apply(variables, prob, depth_values, train=False)

    return apply


# ---------------------------------------------------------------------------
# Losses & uncertainty decompositions (reference evidential/models.py:462-558)
# ---------------------------------------------------------------------------


def loss_emvsnet(gamma, nu, alpha, beta, depth_gt, mask, weight_reg: float = 0.1):
    """The fork's production loss: masked ``log(var) + (1 + w*nu) err^2/var``
    with ``var = beta/nu`` (reference models.py:496-504)."""
    valid = mask > 0.5
    err = gamma - depth_gt
    var = beta / nu
    per_px = jnp.log(var) + (1.0 + weight_reg * nu) * err**2 / var
    return jnp.sum(jnp.where(valid, per_px, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def nig_nll_loss(gamma, nu, alpha, beta, depth_gt, mask, weight_reg: float = 0.1):
    """Full NIG negative log-likelihood + |err|-scaled evidence regularizer
    (reference ``criterion_uncertainty``, models.py:462-477)."""
    valid = mask > 0.5
    om = 2.0 * beta * (1.0 + nu)
    err = gamma - depth_gt
    nll = (
        0.5 * jnp.log(jnp.pi / nu)
        - alpha * jnp.log(om)
        + (alpha + 0.5) * jnp.log(nu * err**2 + om)
        + jax.lax.lgamma(alpha)
        - jax.lax.lgamma(alpha + 0.5)
    )
    reg = jnp.abs(err) * (2.0 * nu + alpha)
    count = jnp.maximum(jnp.sum(valid), 1)
    return (
        jnp.sum(jnp.where(valid, nll, 0.0)) / count
        + weight_reg * jnp.sum(jnp.where(valid, reg, 0.0)) / count
    )


def uncertainty_decompositions(nu, alpha, beta):
    """Both decompositions the reference derives (models.py:537-544)."""
    return {
        "aleatoric_1": jnp.sqrt(beta * (nu + 1.0) / nu / alpha),
        "epistemic_1": 1.0 / jnp.sqrt(nu),
        "aleatoric_2": beta / (alpha - 1.0),
        "epistemic_2": beta / (alpha - 1.0) / nu,
    }
