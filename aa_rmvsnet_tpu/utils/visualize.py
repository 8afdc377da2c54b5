"""Colormapped PNG previews of depth / uncertainty maps
(reference: datasets/data_io.py:77-128 renders jet-colormapped previews)."""

from __future__ import annotations

import numpy as np


def save_depth_png(path, array: np.ndarray, mode: str = "depth") -> None:
    """Write a jet-colormapped preview.  ``mode='depth'`` inverts values
    (near = warm); ``mode='relative'`` min-max normalizes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(array, dtype=np.float32)
    valid = np.isfinite(arr)
    vmin = float(arr[valid].min()) if valid.any() else 0.0
    vmax = float(arr[valid].max()) if valid.any() else 1.0
    if mode == "depth":
        arr = np.where(valid, (vmax - arr) + vmin, 0.0)
    else:
        arr = np.where(valid, (arr - vmin) / max(vmax - vmin, 1e-12), 0.0)

    plt.imsave(path, arr, cmap="jet")
