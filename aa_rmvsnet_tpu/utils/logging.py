"""Training observability: TensorBoard scalars/images and tensor dumps.

Capability-parity with the reference's logging stack (reference:
utils.py:69-99 ``save_scalars``/``save_images``, evidential/save.py:39-56
``save_pytorch`` .pt dumps for offline analysis), using tensorboardX and
``.npz`` dumps.
"""

from __future__ import annotations

import os

import numpy as np


class TrainLogger:
    """TensorBoard writer + periodic array dumps for offline analytics."""

    def __init__(self, logdir: str, dump_arrays: bool = True):
        from tensorboardX import SummaryWriter

        self.logdir = logdir
        self.writer = SummaryWriter(logdir)
        self.dump_arrays = dump_arrays

    def scalars(self, mode: str, scalars: dict, step: int) -> None:
        for key, value in scalars.items():
            self.writer.add_scalar(f"{mode}/{key}", float(np.asarray(value)), step)

    def images(self, mode: str, images: dict, step: int) -> None:
        """Log ``(H, W)`` or ``(H, W, 3)`` arrays, min-max normalized
        (reference utils.py:81-99 normalizes per image)."""
        for key, img in images.items():
            img = np.asarray(img, dtype=np.float32)
            if img.ndim == 2:
                img = img[..., None].repeat(3, -1)
            lo, hi = np.nanmin(img), np.nanmax(img)
            img = (img - lo) / max(hi - lo, 1e-12)
            self.writer.add_image(f"{mode}/{key}", img, step, dataformats="HWC")

    def dump(self, mode: str, arrays: dict, step: int) -> str | None:
        """Dump arrays for the offline analysis suite
        (:mod:`aa_rmvsnet_tpu.utils.analysis`), mirroring the reference's
        ``logdir/results/{train,test}/<step>.pt`` layout with .npz."""
        if not self.dump_arrays:
            return None
        out_dir = os.path.join(self.logdir, "results", mode)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{step}.npz")
        np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
        return path

    def flush(self) -> None:
        self.writer.flush()

    def close(self) -> None:
        self.writer.close()
