"""Device-mesh construction and sharding rules.

The reference is a single-GPU, single-process program (no torch.distributed
anywhere — SURVEY §2.2); all parallelism here is new TPU-native scope:

- ``data`` axis: batch data-parallelism (gradient all-reduce inserted by
  XLA's GSPMD partitioner).
- ``view`` axis: source views of the plane sweep.  The cost build's
  view-mean becomes one psum per depth block over ICI
  (``models.network.sweep`` constrains the per-view patch tables to this
  axis when ``SweepConfig.mesh`` carries it).
- ``spatial`` axis: height-wise spatial partitioning of feature maps.
  GSPMD inserts halo exchanges for the convolutions automatically; the
  plane-sweep gather induces an all-gather of the (small) source feature
  maps, which rides ICI.

The depth-hypothesis axis is deliberately *not* sharded by default: the
ConvLSTM carry makes it sequential (SURVEY §7.3) — depth-block sharding
would be pipelining, not parallelism; batch/spatial sharding fills chips
with no pipeline bubbles.

Multi-host: call :func:`initialize_distributed` first (jax.distributed);
meshes built here span all global devices, with the ``data`` axis laid out
across hosts (DCN) and ``spatial`` within hosts (ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host slice (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data: int | None = None,
    spatial: int = 1,
    view: int = 1,
    depth: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, view, spatial, depth)`` mesh over the available
    devices.

    ``data`` defaults to ``num_devices // (view * spatial * depth)``.  The
    data axis varies slowest so it maps across hosts (DCN) while
    view/spatial/depth stay within a host (ICI) under the default device
    enumeration; ``depth`` varies fastest so the pipeline's per-tick
    ppermute carry handoff (``parallel.depth_pipeline``) rides neighboring
    ICI links.
    """
    if view > 1 and spatial > 1:
        import warnings

        warnings.warn(
            "view > 1 combined with spatial > 1: fine for inference, but "
            "GRADIENTS under this mesh are double-counted by the view-axis "
            "size (upstream XLA SPMD partitioner bug — minimal repro in "
            "tests/test_train.py:TestViewAxisSharding).  For training use "
            "(data, view) or (data, spatial).",
            UserWarning,
            stacklevel=2,
        )
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    inner = view * spatial * depth
    if data is None:
        if n % inner:
            raise ValueError(
                f"{n} devices not divisible by view*spatial*depth={inner}"
            )
        data = n // inner
    if data * inner != n:
        raise ValueError(f"mesh {data}x{view}x{spatial}x{depth} != {n} devices")
    return Mesh(
        devices.reshape(data, view, spatial, depth),
        axis_names=("data", "view", "spatial", "depth"),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, spatial_axis: int | None = None) -> NamedSharding:
    """Shard axis 0 over ``data`` and optionally one axis over ``spatial``."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None:
        spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def _train_batch_specs(mesh: Mesh) -> dict:
    """imgs ``(B, V, H, W, 3)``: batch over ``data``, H over ``spatial``;
    proj ``(B, V, 4, 4)`` and depth_values ``(B, D)``: batch over ``data``;
    depth/mask ``(B, H, W)``: batch over ``data``, H over ``spatial``."""
    return {
        "imgs": batch_sharding(mesh, 5, spatial_axis=2),
        "proj_matrices": batch_sharding(mesh, 4),
        "depth_values": batch_sharding(mesh, 2),
        "depth": batch_sharding(mesh, 3, spatial_axis=1),
        "mask": batch_sharding(mesh, 3, spatial_axis=1),
    }


def shard_train_batch(mesh: Mesh, batch: dict) -> dict:
    """Shard a (process-local = global) training batch onto the mesh."""
    specs = _train_batch_specs(mesh)
    return {
        k: jax.device_put(v, specs[k]) if k in specs else v for k, v in batch.items()
    }


def form_global_batch(mesh: Mesh, host_batch: dict) -> dict:
    """Assemble each process's local batch rows into the global sharded batch.

    Every process holds ``B_local`` consecutive rows of the global batch
    (the per-host dataset shard, ``Dataset.shard``); the global batch axis is
    ``B_local * process_count``, laid out over the ``data`` mesh axis.  With
    one process this reduces to :func:`shard_train_batch`.
    """
    if jax.process_count() == 1:
        return shard_train_batch(mesh, batch={k: np.asarray(v) if not hasattr(v, "sharding") else v for k, v in host_batch.items()})
    specs = _train_batch_specs(mesh)
    out = {}
    for k, v in host_batch.items():
        if k not in specs:
            out[k] = v
            continue
        v = np.asarray(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(specs[k], v, global_shape)
    return out
