"""Host-side dataset pipelines (CPU: decode, standardize, geometry prep).

Datasets produce numpy sample dicts; batching/prefetch is in
:mod:`aa_rmvsnet_tpu.data.loader`.  Per-host sharding for multi-host runs
slices the meta list (``shard(host_id, num_hosts)``).
"""

from .dtu import DTUTrainDataset
from .eval_dataset import EvalDataset
from .loader import prefetch_samples, batch_samples
