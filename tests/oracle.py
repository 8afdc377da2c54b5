"""Helpers for using the read-only upstream reference as a numerical oracle.

The reference is CUDA-only in a few places (hard-coded ``.cuda()`` calls);
:func:`patch_cuda_to_cpu` makes those no-ops so the oracle can run on CPU.
Nothing from the reference is copied into the framework — tests import it
in-place purely to compare outputs.
"""

from __future__ import annotations

import contextlib
import importlib
import sys

from conftest import REFERENCE_ROOT


@contextlib.contextmanager
def patch_cuda_to_cpu():
    import torch

    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_tensor_cuda
        torch.nn.Module.cuda = orig_module_cuda


@contextlib.contextmanager
def torch11_grid_sample_semantics():
    """Make F.grid_sample behave as under torch 1.1 (align_corners=True).

    The reference pins torch 1.1 (README.md:28) and calls grid_sample with
    no align_corners argument (models/module.py:36); modern torch defaults
    that to False, which would silently change the oracle's semantics.
    """
    import torch.nn.functional as F

    orig = F.grid_sample

    def patched(input, grid, mode="bilinear", padding_mode="zeros", align_corners=None):
        if align_corners is None:
            align_corners = True
        return orig(input, grid, mode=mode, padding_mode=padding_mode,
                    align_corners=align_corners)

    F.grid_sample = patched
    try:
        yield
    finally:
        F.grid_sample = orig


@contextlib.contextmanager
def reference_on_path():
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        yield
    finally:
        sys.path.remove(REFERENCE_ROOT)


def import_reference_module(name: str):
    """Import e.g. ``models.module`` from the reference tree."""
    with reference_on_path():
        mod = importlib.import_module(name)
    return mod
