"""Decisive microbench for the int8-ConvLSTM question: does THIS chip run
int8 MXU convs/matmuls materially faster than bf16?

v5e spec is 394 int8 TOPS vs 197 bf16 TFLOPS (2x).  The ConvLSTM scan is
the sweep's compute-bound bucket (6.56 s/map at the measured ~9.3 TFLOPS
conv-effective bf16 rate, BENCHMARKS.md round-5 stage table); an int8 gate
path is only worth building if the tunnel chip shows a real int8 speedup.

Usage: python scripts/probe_int8_rate.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/aa_rmvsnet_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass


def timeit(fn, *args, iters=5, warmup=2):
    # Scalar fetch via a DEVICE-side slice: block_until_ready does not wait
    # on the tunnel, and np.asarray would pull the whole output over it.
    fetch = lambda out: float(jax.tree.leaves(out)[0].ravel()[0])
    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)

    # --- chained matmuls, 2048^3 (the BENCHMARKS.md calibration shape) ---
    n, chain = 2048, 16
    a16 = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    b16 = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)

    @jax.jit
    def mm_bf16(a, b):
        x = a
        for _ in range(chain):
            x = jnp.dot(x, b)
            x = (x * 1e-3).astype(jnp.bfloat16)
        return x

    @jax.jit
    def mm_int8(a, b):
        x = a
        for _ in range(chain):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize so the chain stays int8 (shift keeps it cheap)
            x = jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return x

    flops = 2 * n**3 * chain
    t = timeit(mm_bf16, a16, b16)
    print(f"matmul bf16 : {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TFLOPS")
    t = timeit(mm_int8, a8, b8)
    print(f"matmul int8 : {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TOPS")

    # --- 3x3 convs at the ConvLSTM's working shape (B, H, W, 32->32) ---
    B, H, W, C = 4, 864, 1152, 32
    x16 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    k16 = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
    k8 = jnp.asarray(rng.randint(-127, 127, (3, 3, C, C)), jnp.int8)
    dn = ("NHWC", "HWIO", "NHWC")
    reps = 8

    @jax.jit
    def conv_bf16(x, k):
        for _ in range(reps):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            x = (x * 1e-2).astype(jnp.bfloat16)
        return x

    @jax.jit
    def conv_int8(x, k):
        for _ in range(reps):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            x = jnp.clip(y >> 10, -127, 127).astype(jnp.int8)
        return x

    cflops = 2 * B * H * W * 9 * C * C * reps
    t = timeit(conv_bf16, x16, k16)
    print(f"conv3x3 bf16: {t*1e3:8.2f} ms  {cflops/t/1e12:6.2f} TFLOPS")
    t = timeit(conv_int8, x8, k8)
    print(f"conv3x3 int8: {t*1e3:8.2f} ms  {cflops/t/1e12:6.2f} TOPS")


if __name__ == "__main__":
    main()
