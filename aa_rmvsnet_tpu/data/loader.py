"""Async host-side sample prefetching and batching.

Replaces the reference's ``DataLoader(num_workers=12, prefetch_factor=5)``
(reference: train.py:115-117) with a thread-pool prefetcher: image decode
(cv2) and PFM reads release the GIL, so threads overlap host IO with TPU
compute without process-spawn overhead.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterable, Iterator, Sequence

import numpy as np


def prefetch_samples(
    dataset,
    indices: Iterable[int] | None = None,
    num_workers: int = 8,
    lookahead: int = 16,
) -> Iterator[dict]:
    """Yield ``dataset[i]`` in order with a sliding prefetch window."""
    if indices is None:
        indices = range(len(dataset))
    indices = list(indices)
    if num_workers <= 0:
        # Same failure contract as the threaded path: loader errors are
        # YIELDED as Exception objects, not raised — resilient_samples /
        # the inference driver depend on it (num_workers=0 is an exposed
        # CLI setting).
        for i in indices:
            try:
                yield dataset[i]
            except Exception as exc:
                yield exc
        return

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = []
        it = iter(indices)
        for _ in range(min(lookahead, len(indices))):
            pending.append(pool.submit(dataset.__getitem__, next(it)))
        while pending:
            fut = pending.pop(0)
            try:
                out = fut.result()
            except Exception as exc:  # surfaced to the consumer, run continues
                out = exc
            try:
                pending.append(pool.submit(dataset.__getitem__, next(it)))
            except StopIteration:
                pass
            yield out


def resilient_samples(
    dataset,
    indices: Iterable[int] | None = None,
    num_workers: int = 8,
    lookahead: int = 16,
    on_skip=None,
) -> Iterator[dict]:
    """Fault-tolerant training stream: yield EXACTLY ``len(indices)``
    good samples even when some loads fail.

    A loader failure (corrupt image, missing cam file) is replaced by the
    most recent good sample; failures before the first good sample are
    back-filled as soon as one arrives.  The fixed yield count is the
    multi-host safety property: every host takes the same number of steps
    per epoch, so a corrupt file on one host's shard cannot desynchronize
    the collectives (the reference merely swallowed bad batches,
    train.py:226-247, which shrinks the epoch on the affected host).

    ``on_skip(exc)`` is called for every replaced failure (skip counters /
    logging).  Raises RuntimeError if NO sample in the epoch loads.
    """
    owed = 0
    last: dict | None = None
    for out in prefetch_samples(dataset, indices, num_workers, lookahead):
        if isinstance(out, Exception):
            if on_skip is not None:
                on_skip(out)
            if last is None:
                owed += 1
            else:
                yield last
            continue
        last = out
        for _ in range(owed):
            yield out
        owed = 0
        yield out
    if owed:
        raise RuntimeError(
            f"resilient_samples: all {owed} sample load(s) failed — no good "
            "sample available to substitute"
        )


def batch_samples(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into a batch (arrays gain a leading axis;
    non-array fields become lists)."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def batched(iterator: Iterator[dict], batch_size: int, drop_last: bool = False) -> Iterator[dict]:
    buf = []
    for sample in iterator:
        buf.append(sample)
        if len(buf) == batch_size:
            yield batch_samples(buf)
            buf = []
    if buf and not drop_last:
        yield batch_samples(buf)
