"""Run the reference's actual binaries (eval.py / fusion.py) CPU-patched.

Launched as: python reference_shim.py {eval|fusion} <binary argv...>

The reference binaries assume a CUDA device, torch-1.1 grid_sample
semantics, and (for fusion) the ``plyfile`` package; this shim provides all
three so the whole-binary oracle-parity test (tests/test_wholebinary.py)
can diff the binaries' on-disk outputs against our CLI's.  Only the
execution *environment* is patched — the reference code paths run verbatim
(reference eval.py:56-171, fusion.py:135-273).
"""

import os
import sys
import types

REF = "/root/reference"

mode = sys.argv[1]
argv = sys.argv[2:]

sys.path.insert(0, REF)

# The reference targets numpy<1.24 (torch-1.1 era); restore the removed
# scalar aliases it uses (e.g. ``array.dtype == np.object`` in
# data_io.save_png:90).
import numpy as np  # noqa: E402

for _name, _alias in (("object", object), ("float", float), ("int", int),
                      ("bool", bool)):
    if not hasattr(np, _name):
        setattr(np, _name, _alias)

# Headless matplotlib for the PNG previews.
os.environ.setdefault("MPLBACKEND", "Agg")

# torchvision is absent in this image; reference utils.py imports
# torchvision.utils at module top but the eval/fusion code paths never call
# it (only the TB image-grid helper does) — stub it.
_tv = types.ModuleType("torchvision")
_tvu = types.ModuleType("torchvision.utils")


def _no_tv(*a, **k):
    raise RuntimeError("torchvision stub: not available in this image")


_tvu.make_grid = _no_tv
_tv.utils = _tvu
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.utils", _tvu)

if mode == "eval":
    import torch
    import torch.nn.functional as F

    # CUDA no-ops (the tensors just stay on CPU).
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False
    torch.cuda.synchronize = lambda *a, **k: None

    # torch-1.1 grid_sample defaulted align_corners=True (tests/oracle.py).
    _grid_sample = F.grid_sample

    def grid_sample(input, grid, mode="bilinear", padding_mode="zeros",
                    align_corners=None):
        if align_corners is None:
            align_corners = True
        return _grid_sample(input, grid, mode=mode, padding_mode=padding_mode,
                            align_corners=align_corners)

    F.grid_sample = grid_sample

elif mode in ("fusion", "fusion_padding"):
    # Minimal plyfile stand-in (package absent in this image): preserves the
    # structured array verbatim as a binary little-endian PLY.
    _PLY_TYPES = {"f4": "float", "u1": "uchar"}

    class PlyElement:
        def __init__(self, data):
            self.data = data

        @staticmethod
        def describe(data, name):
            return PlyElement(data)

    class PlyData:
        def __init__(self, elements):
            self.elements = elements

        def write(self, path):
            v = self.elements[0].data
            props = "".join(
                f"property {_PLY_TYPES[v.dtype[n].str[1:]]} {n}\n"
                for n in v.dtype.names
            )
            with open(path, "wb") as f:
                f.write(
                    (
                        "ply\nformat binary_little_endian 1.0\n"
                        f"element vertex {len(v)}\n{props}end_header\n"
                    ).encode()
                )
                f.write(v.tobytes())

    plyfile = types.ModuleType("plyfile")
    plyfile.PlyData = PlyData
    plyfile.PlyElement = PlyElement
    sys.modules["plyfile"] = plyfile
else:
    raise SystemExit(f"unknown mode {mode}")

sys.argv = [f"{mode}.py"] + argv
import runpy  # noqa: E402

runpy.run_path(os.path.join(REF, f"{mode}.py"), run_name="__main__")
