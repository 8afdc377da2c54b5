"""Benchmark: depth-maps/sec/chip at the north-star config.

Config (BASELINE.md): 1152x864 input, 512 depth hypotheses, 5 views, one
chip — the reference's DTU eval geometry at full scale.  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no V100 latency (BASELINE.md §6.1 —
eval.py only prints per-forward time at runtime).  We anchor on the
documented estimate below and state it explicitly:

  V100_BASELINE_MAPS_PER_S = 0.10  (≈10 s per 1152x864x512-hyp depth map)

Derivation (compute-bound lower bound for the reference at this config):
the ConvLSTM U-Net costs ~48k MAC/px/step -> 49 TFLOP over 1M px x 512
steps; at an optimistic 6 TFLOPS sustained fp32 on V100 that alone is
~8 s, plus plane-sweep warps and omega reweighting for 4 source views
(~2-3 s) -> ~11 s ignoring the reference's per-depth Python-loop kernel
launch overhead (512 x 4 iterations), which in practice makes it slower.
0.10 maps/s is therefore a generous estimate of the reference; the >=3x
north-star target corresponds to >=0.30 maps/s/chip.

NOTE: the attached tunnel chip measures ~115 GB/s / ~3 TFLOPS (see
BENCHMARKS.md), a fraction of v5e spec, so absolute numbers here reflect
the tunnel host, not the framework's ceiling on real hardware.

Flags via env:
  BENCH_SIZE=HxW (default 864x1152), BENCH_DEPTH (512), BENCH_VIEWS (5),
  BENCH_BLOCK (8), BENCH_ITERS (4), BENCH_DTYPE (bfloat16|float32),
  BENCH_TABLE_DTYPE (fp8|none, default fp8: fp8-quantized warp tables —
  half the bytes on the dominant gather stream, see ops/patch_sample.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V100_BASELINE_MAPS_PER_S = 0.10


def main():
    import jax
    import jax.numpy as jnp

    from aa_rmvsnet_tpu.models.network import SweepConfig, forward, init_params
    from aa_rmvsnet_tpu.models.convert import load_torch_checkpoint

    size = os.environ.get("BENCH_SIZE", "864x1152")
    H, W = (int(t) for t in size.split("x"))
    D = int(os.environ.get("BENCH_DEPTH", 512))
    V = int(os.environ.get("BENCH_VIEWS", 5))
    block = int(os.environ.get("BENCH_BLOCK", 8))
    iters = int(os.environ.get("BENCH_ITERS", 4))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    table_dtype = (
        jnp.float8_e4m3fn
        if os.environ.get("BENCH_TABLE_DTYPE", "fp8") == "fp8"
        else None
    )

    ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
    if os.path.exists(ckpt):
        params = load_torch_checkpoint(ckpt)
    else:
        params = init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    imgs = rng.randn(1, V, H, W, 3).astype(np.float32)
    K = np.array([[2892.0, 0, W / 2], [0, 2892.0, H / 2], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = v * 4.0
        P = E.copy()
        P[:3, :4] = K @ P[:3, :4]
        projs.append(P)
    proj = np.stack(projs)[None]
    depths = np.linspace(425.0, 933.8, D, dtype=np.float32)[None]

    config = SweepConfig(
        depth_block=block, collect_volume=False, feature_dtype=dtype,
        table_dtype=table_dtype,
    )

    @jax.jit
    def run(params, imgs, proj, depths):
        return forward(params, imgs, proj, depths, config)

    args = (params, jnp.asarray(imgs), jnp.asarray(proj), jnp.asarray(depths))
    # NOTE: the axon TPU tunnel's block_until_ready returns without waiting,
    # so every timing point forces a device-to-host scalar fetch instead.
    out = run(*args)  # compile + warmup
    _ = float(out["depth"][0, 0, 0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
        _ = float(out["depth"][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters

    maps_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"depth_maps_per_sec_per_chip_{H}x{W}_D{D}_V{V}",
                "value": round(maps_per_s, 4),
                "unit": "depth-maps/s/chip",
                "vs_baseline": round(maps_per_s / V100_BASELINE_MAPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
