"""Host-side dataset pipelines (CPU: decode, standardize, geometry prep).

Datasets produce numpy sample dicts; batching/prefetch is in
:mod:`aa_rmvsnet_tpu.data.loader`.  Per-host sharding for multi-host runs
slices the meta list (``shard(host_id, num_hosts)``).
"""

import functools

from .dtu import DTUTrainDataset
from .eval_dataset import EvalDataset
from .loader import prefetch_samples, batch_samples

# Name-based dataset lookup, API-compatible in spirit with the reference's
# ``find_dataset_def`` registry (reference: datasets/__init__.py:5-8), with
# the reference's module names as aliases.
_REGISTRY = {
    "dtu": DTUTrainDataset,
    "dtu_yao": DTUTrainDataset,
    "eval": EvalDataset,
    "data_eval_transform": EvalDataset,
    "data_eval_transform_padding": functools.partial(EvalDataset, pad_vertical=True),
}


def find_dataset_def(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
