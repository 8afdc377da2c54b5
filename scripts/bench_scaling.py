"""Weak-scaling efficiency of the training step over the available devices.

Measures the jitted train-step wall time at global batch = 1 on one device
vs global batch = N sharded over an N-device ``data`` mesh; weak-scaling
efficiency = t(1) / t(N) (1.0 = perfect, BASELINE.md targets >= 0.80 on a
2-host slice).  Prints ONE JSON line.

On this build host only one TPU chip is attached, so real-chip numbers
need a multi-chip slice; for plumbing validation run on the virtual CPU
mesh (the efficiency number there reflects shared host cores, not ICI —
the JSON records the platform so the two are never conflated):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    BENCH_FORCE_CPU=1 python scripts/bench_scaling.py

Env: BENCH_SIZE (default 64x80), BENCH_DEPTH (16), BENCH_VIEWS (3),
BENCH_ITERS (4), BENCH_SPATIAL (1: spatial axis size for the N-device mesh).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from aa_rmvsnet_tpu.models.network import init_params
    from aa_rmvsnet_tpu.parallel.mesh import make_mesh, replicated, shard_train_batch
    from aa_rmvsnet_tpu.pipeline.train import TrainConfig, make_optimizer, make_train_step

    size = os.environ.get("BENCH_SIZE", "64x80")
    H, W = (int(t) for t in size.split("x"))
    D = int(os.environ.get("BENCH_DEPTH", 16))
    V = int(os.environ.get("BENCH_VIEWS", 3))
    iters = int(os.environ.get("BENCH_ITERS", 4))
    spatial = int(os.environ.get("BENCH_SPATIAL", 1))

    devices = jax.devices()
    n = len(devices)

    config = TrainConfig(total_steps=10, depth_block=8 if D % 8 == 0 else D)
    tx = make_optimizer(config)
    train_step = make_train_step(config, tx)

    def batch_for(B, seed=0):
        rng = np.random.RandomState(seed)
        imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
        K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
        projs = []
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = v * 2.0
            P = E.copy()
            P[:3, :4] = K @ P[:3, :4]
            projs.append(P)
        return {
            "imgs": jnp.asarray(imgs),
            "proj_matrices": jnp.asarray(
                np.broadcast_to(np.stack(projs)[None], (B, V, 4, 4)).copy()),
            "depth_values": jnp.asarray(np.broadcast_to(
                np.linspace(400.0, 600.0, D, dtype=np.float32)[None], (B, D)).copy()),
            "depth": jnp.asarray(rng.uniform(400, 600, (B, H, W)).astype(np.float32)),
            "mask": jnp.ones((B, H, W), jnp.float32),
        }

    def time_step(mesh, B):
        params = jax.device_put(init_params(jax.random.PRNGKey(0)), replicated(mesh))
        opt_state = jax.device_put(tx.init(params), replicated(mesh))
        batch = shard_train_batch(mesh, batch_for(B))
        # warmup/compile (scalar fetch: the tunnel's block_until_ready
        # returns without waiting)
        p, o, metrics, _ = train_step(params, opt_state, batch)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, metrics, _ = train_step(p, o, batch)
            _ = float(metrics["loss"])
        return (time.perf_counter() - t0) / iters

    t1 = time_step(make_mesh(data=1, devices=devices[:1]), 1)
    record = {
        "metric": f"weak_scaling_efficiency_{H}x{W}_D{D}_V{V}",
        "platform": devices[0].platform,
        "n_devices": n,
        "t_1dev_s": round(t1, 4),
    }
    if n > 1:
        data = n // spatial
        tn = time_step(make_mesh(data=data, spatial=spatial), data)
        record.update(
            t_ndev_s=round(tn, 4),
            global_batch=data,
            mesh={"data": data, "spatial": spatial},
            value=round(t1 / tn, 4),
            unit="weak-scaling efficiency (t1/tN, 1.0 = perfect)",
        )
    else:
        record.update(
            value=None,
            note="single device attached; efficiency needs a multi-chip slice",
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
