"""Worker for the multi-host (multi-process) distributed training test.

Launched as: python multihost_worker.py <process_id> <num_processes> <port>
             [--cli <dtu_root> <listfile> <logdir>]

Each process contributes 4 virtual CPU devices; together they form a
(num_processes*4)-device global mesh.  Default mode runs one sharded
training step with per-process local batch shards and prints the loss
(must agree across processes — the gradient all-reduce crosses the process
boundary).  ``--cli`` mode instead drives the production entry point
(``cli train --coordinator ...``) end-to-end on a synthetic DTU tree:
dataset host-sharding, global-batch assembly, sharded steps, and a
distributed orbax checkpoint.
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

if len(sys.argv) > 4 and sys.argv[4] == "--cli":
    dtu_root, listfile, logdir = sys.argv[5:8]
    from aa_rmvsnet_tpu.cli import main

    # Full epoch (no --max_steps): every shard sample is visited, so the
    # poisoned-PNG samples the test plants are guaranteed to be hit and
    # substituted on BOTH hosts without desynchronizing the step counts.
    main([
        "train", "--trainpath", dtu_root, "--trainlist", listfile,
        "--logdir", logdir, "--epochs", "1", "--numdepth", "4",
        "--view_num", "3", "--image_scale", "0.25",
        "--batch_size", "4", "--summary_freq", "1", "--num_workers", "2",
        "--coordinator", f"localhost:{port}",
        "--num_processes", str(nprocs), "--process_id", str(pid),
    ])
    print(f"WORKER {pid} CLI OK", flush=True)
    sys.exit(0)

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from aa_rmvsnet_tpu.models.network import init_params
from aa_rmvsnet_tpu.parallel.mesh import make_mesh, replicated
from aa_rmvsnet_tpu.pipeline.train import TrainConfig, make_optimizer, make_train_step

assert len(jax.devices()) == nprocs * 4, jax.devices()

mesh = make_mesh(data=nprocs * 2, spatial=2)

B, V, H, W, D = nprocs * 2, 3, 16, 16, 4
rng = np.random.RandomState(0)  # same seed everywhere: identical global batch
imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
projs = []
for v in range(V):
    E = np.eye(4, dtype=np.float32)
    E[0, 3] = v * 2.0
    Pm = E.copy()
    Pm[:3, :4] = K @ Pm[:3, :4]
    projs.append(Pm)
proj = np.broadcast_to(np.stack(projs)[None], (B, V, 4, 4)).copy()
depths = np.broadcast_to(np.linspace(400, 600, D, dtype=np.float32)[None], (B, D)).copy()
gt = rng.uniform(400, 600, (B, H, W)).astype(np.float32)
mask = np.ones((B, H, W), np.float32)

specs = {
    "imgs": P("data", None, "spatial"),
    "proj_matrices": P("data"),
    "depth_values": P("data"),
    "depth": P("data", "spatial"),
    "mask": P("data", "spatial"),
}
# Each process owns data-axis rows [pid*2, (pid+1)*2) of the global batch
# (devices enumerate process-major), so feed only the local slice.
lo, hi = pid * 2, (pid + 1) * 2
host_batch = {"imgs": imgs[lo:hi], "proj_matrices": proj[lo:hi],
              "depth_values": depths[lo:hi], "depth": gt[lo:hi],
              "mask": mask[lo:hi]}
batch = {
    k: jax.make_array_from_process_local_data(
        NamedSharding(mesh, specs[k]), v,
        global_shape=(B,) + v.shape[1:],
    )
    for k, v in host_batch.items()
}

config = TrainConfig(total_steps=10, depth_block=2)
tx = make_optimizer(config)
params = jax.device_put(init_params(jax.random.PRNGKey(0), 16, 16), replicated(mesh))
opt_state = jax.device_put(tx.init(params), replicated(mesh))
step = make_train_step(config, tx)

params, opt_state, metrics, _ = step(params, opt_state, batch)
jax.block_until_ready(params)
loss = float(metrics["loss"])
assert np.isfinite(loss)
print(f"WORKER {pid} OK loss={loss:.6f}", flush=True)
