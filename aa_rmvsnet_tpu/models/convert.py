"""Torch-checkpoint → flax parameter conversion.

Loads the reference's released checkpoints (``model_dtu_v2.ckpt`` /
``model_blended_v2.ckpt``: 90 tensors, 187,203 params under the
``feature`` / ``omega`` / ``cost_regularization`` prefixes — the shipped
files carry no ``evidential.*`` keys) into this framework's parameter tree.

Weight-layout transforms:
- Conv2d ``OIHW`` → flax ``HWIO`` (transpose 2,3,1,0),
- ConvTranspose2d ``(I, O, kh, kw)`` → the HWIO kernel of the equivalent
  input-dilated forward conv (spatial flip + transpose), matching
  :class:`aa_rmvsnet_tpu.models.blocks.DeconvGNReLU`,
- GroupNorm ``weight``/``bias`` → ``scale``/``bias``.

The optimizer state and epoch in the torch file are ignored.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _deconv(w):  # (I, O, kh, kw) -> equivalent forward-conv HWIO
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


# torch module prefix -> (flax path, kind). kind: conv | deconv | gn
_DEFORM = lambda k: [
    (f"feature.intraAA.deformconv{k}.0.conv", (f"feature/intraAA/deformconv{k}/deform", "deform")),
    (f"feature.intraAA.deformconv{k}.0.p_conv", (f"feature/intraAA/deformconv{k}/deform/p_conv", "conv")),
    (f"feature.intraAA.deformconv{k}.0.m_conv", (f"feature/intraAA/deformconv{k}/deform/m_conv", "conv")),
    (f"feature.intraAA.deformconv{k}.1", (f"feature/intraAA/deformconv{k}/gn", "gn")),
    (f"feature.intraAA.conv{k}.0", (f"feature/intraAA/conv{k}/conv", "conv")),
    (f"feature.intraAA.conv{k}.1", (f"feature/intraAA/conv{k}/gn", "gn")),
]

_RULES: list[tuple[str, tuple[str, str]]] = (
    [
        ("feature.init_conv.0.0", ("feature/init_conv0/conv", "conv")),
        ("feature.init_conv.0.1", ("feature/init_conv0/gn", "gn")),
        ("feature.init_conv.1.0", ("feature/init_conv1/conv", "conv")),
        ("feature.init_conv.1.1", ("feature/init_conv1/gn", "gn")),
        ("feature.conv0.0", ("feature/conv0/conv", "conv")),
        ("feature.conv0.1", ("feature/conv0/gn", "gn")),
        ("feature.conv1.0", ("feature/conv1/conv", "conv")),
        ("feature.conv1.1", ("feature/conv1/gn", "gn")),
        ("feature.conv2.0", ("feature/conv2/conv", "conv")),
        ("feature.conv2.1", ("feature/conv2/gn", "gn")),
    ]
    + _DEFORM(0)
    + _DEFORM(1)
    + _DEFORM(2)
    + [
        ("omega.reweight_network.0.0", ("omega/rw0/conv", "conv")),
        ("omega.reweight_network.0.1", ("omega/rw0/gn", "gn")),
        ("omega.reweight_network.1.stem.0.0", ("omega/rw1/stem0/conv", "conv")),
        ("omega.reweight_network.1.stem.0.1", ("omega/rw1/stem0/gn", "gn")),
        ("omega.reweight_network.1.stem.1", ("omega/rw1/stem1", "conv")),
        ("omega.reweight_network.1.stem.2", ("omega/rw1/gn", "gn")),
        ("omega.reweight_network.2", ("omega/rw2", "conv")),
        ("cost_regularization.cell_list.0.conv", ("cost_regularization/cell0/conv", "conv")),
        ("cost_regularization.cell_list.1.conv", ("cost_regularization/cell1/conv", "conv")),
        ("cost_regularization.cell_list.2.conv", ("cost_regularization/cell2/conv", "conv")),
        ("cost_regularization.cell_list.3.conv", ("cost_regularization/cell3/conv", "conv")),
        ("cost_regularization.cell_list.4.conv", ("cost_regularization/cell4/conv", "conv")),
        ("cost_regularization.deconv_0.conv", ("cost_regularization/deconv0", "deconv")),
        ("cost_regularization.deconv_0.gn", ("cost_regularization/deconv0/gn", "gn")),
        ("cost_regularization.deconv_1.conv", ("cost_regularization/deconv1", "deconv")),
        ("cost_regularization.deconv_1.gn", ("cost_regularization/deconv1/gn", "gn")),
        ("cost_regularization.conv_0", ("cost_regularization/conv_out", "conv")),
    ]
)


def _set(tree: dict, path: str, leaf_name: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def convert_state_dict(state: Mapping[str, "np.ndarray"]) -> dict:
    """Convert a torch ``state_dict``-like mapping (name -> array) into the
    flax parameter tree ``{'params': ...}``.

    DataParallel ``module.`` prefixes are stripped (reference: train.py:154-176,
    eval.py:87-98 do the same normalization).
    """
    arrays = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v, dtype=np.float32)
        for k, v in state.items()
    }
    rules = dict(_RULES)

    tree: dict = {}
    consumed = set()
    for torch_prefix, (flax_path, kind) in rules.items():
        w_key, b_key = torch_prefix + ".weight", torch_prefix + ".bias"
        if w_key not in arrays:
            raise KeyError(f"checkpoint missing {w_key}")
        w = arrays[w_key]
        consumed.add(w_key)
        if kind in ("conv", "deform"):
            kernel = _conv(w)
            leaf = "kernel"
        elif kind == "deconv":
            kernel = _deconv(w)
            leaf = "kernel"
        elif kind == "gn":
            _set(tree, flax_path, "scale", w)
            if b_key in arrays:
                _set(tree, flax_path, "bias", arrays[b_key])
                consumed.add(b_key)
            continue
        else:
            raise ValueError(kind)
        _set(tree, flax_path, leaf, kernel)
        if b_key in arrays:
            _set(tree, flax_path, "bias", arrays[b_key])
            consumed.add(b_key)

    leftovers = [k for k in arrays if k not in consumed and not k.startswith("evidential.")]
    if leftovers:
        raise ValueError(f"unmapped checkpoint tensors: {sorted(leftovers)[:8]} ...")
    return {"params": tree}


def load_torch_checkpoint(path) -> dict:
    """Load a reference ``.ckpt`` file (``{'epoch', 'model', 'optimizer'}``)
    and return flax params for :class:`AARMVSNetCore`."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    state = payload["model"] if "model" in payload else payload
    return convert_state_dict({k: v.numpy() for k, v in state.items()})


# ---------------------------------------------------------------------------
# Evidential head conversion (reference evidential/models.py:183-459)
# ---------------------------------------------------------------------------


def _conv3d(w):  # OIDHW -> DHWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _deconv3d(w):  # (I, O, kd, kh, kw) -> equivalent forward-conv DHWIO
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)))


def _evidential_rules() -> list[tuple[str, str, str]]:
    """(torch prefix, flax path, kind) for the evidential head.

    torch layout notes: ``convbn_3d`` is Sequential(conv, bn) so a block at
    prefix ``p`` has keys ``p.0.weight`` (conv) and ``p.1.*`` (bn);
    mish-wrapped stacks add another ``.0``; transposed-conv+BN pairs are
    ``p.0`` / ``p.1``.
    """
    rules: list[tuple[str, str, str]] = []

    def convbn(tp, fp):
        rules.append((tp + ".0", fp + "/conv", "conv3d"))
        rules.append((tp + ".1", fp + "/bn", "bn"))

    def deconvbn(tp, fp):
        rules.append((tp + ".0", fp, "deconv3d"))
        rules.append((tp + ".1", fp + "/bn", "bn"))

    for name, fp0, fp1 in (
        ("dres0", "dres0_0", "dres0_1"),
        ("dres1", "dres1_0", "dres1_1"),
        ("conv_vol2", "conv_vol2_0", "conv_vol2_1"),
        ("conv_vol3", "conv_vol3_0", "conv_vol3_1"),
    ):
        convbn(f"{name}.0", fp0)
        convbn(f"{name}.2", fp1)

    # HourGlassUp ("combine1")
    rules.append(("combine1.conv1", "combine1/conv1/conv", "conv3d"))
    convbn("combine1.conv2.0", "combine1/conv2")
    rules.append(("combine1.conv3", "combine1/conv3/conv", "conv3d"))
    convbn("combine1.conv4.0", "combine1/conv4")
    deconvbn("combine1.conv8", "combine1/conv8")
    deconvbn("combine1.conv9", "combine1/conv9")
    convbn("combine1.combine1.0", "combine1/combine1")
    convbn("combine1.combine2.0", "combine1/combine2")
    for r in ("redir1", "redir2", "redir3"):
        convbn(f"combine1.{r}", f"combine1/{r}")

    # HourGlass x2 ("dres2", "dres3")
    for hg in ("dres2", "dres3"):
        for c in ("conv1", "conv2", "conv3", "conv4"):
            convbn(f"{hg}.{c}.0", f"{hg}/{c}")
        deconvbn(f"{hg}.conv5", f"{hg}/conv5")
        deconvbn(f"{hg}.conv6", f"{hg}/conv6")
        convbn(f"{hg}.redir1", f"{hg}/redir1")
        convbn(f"{hg}.redir2", f"{hg}/redir2")

    for k in range(3):
        convbn(f"classif{k}.0", f"classif{k}_0")
        rules.append((f"classif{k}.2", f"classif{k}_1", "conv3d"))
    return rules


def convert_evidential_state_dict(state: Mapping[str, "np.ndarray"]) -> dict:
    """Convert a torch state_dict of the reference ``EvidentialModule`` (keys
    optionally under an ``evidential.`` / ``module.`` prefix) into flax
    variables ``{'params': ..., 'batch_stats': ...}``."""
    arrays = {}
    for k, v in state.items():
        k = k[7:] if k.startswith("module.") else k
        if k.startswith("evidential."):
            k = k[len("evidential."):]
        arrays[k] = np.asarray(v, dtype=np.float32)

    params: dict = {}
    stats: dict = {}
    consumed = set()
    for torch_prefix, flax_path, kind in _evidential_rules():
        if kind == "conv3d":
            w_key = torch_prefix + ".weight"
            _set(params, flax_path, "kernel", _conv3d(arrays[w_key]))
            consumed.add(w_key)
        elif kind == "deconv3d":
            w_key = torch_prefix + ".weight"
            _set(params, flax_path, "kernel", _deconv3d(arrays[w_key]))
            consumed.add(w_key)
        elif kind == "bn":
            _set(params, flax_path, "scale", arrays[torch_prefix + ".weight"])
            _set(params, flax_path, "bias", arrays[torch_prefix + ".bias"])
            _set(stats, flax_path, "mean", arrays[torch_prefix + ".running_mean"])
            _set(stats, flax_path, "var", arrays[torch_prefix + ".running_var"])
            consumed |= {
                torch_prefix + s
                for s in (".weight", ".bias", ".running_mean", ".running_var")
            }
    leftovers = [
        k for k in arrays if k not in consumed and "num_batches_tracked" not in k
    ]
    if leftovers:
        raise ValueError(f"unmapped evidential tensors: {sorted(leftovers)[:8]} ...")
    return {"params": params, "batch_stats": stats}


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
