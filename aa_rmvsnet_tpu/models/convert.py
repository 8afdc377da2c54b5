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


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
