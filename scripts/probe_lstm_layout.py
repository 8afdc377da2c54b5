"""Measure the ConvLSTM regularizer scan in NHWC vs NCHW layout
(VERDICT r3 item 9: measure a ConvLSTM lever with data, don't paper-reject).

Hypothesis: the U-Net's state/activation tensors carry 8/16-channel minor
axes, which TPU tiling pads to 128 lanes (8-16x HBM waste on every
materialized buffer); an NCHW layout pays only W-padding (576 -> 640, 11%).
Counter-hypothesis: the measured 12.2 ms/step at the north-star config
matches the pure FLOP time at the conv-effective ~8.6 TFLOPS, i.e. the scan
is compute-bound and layout is irrelevant.

Runs the bare regularizer scan (no warp/omega) at 432x576 / D=128 on the
attached chip, both layouts from the SAME parameters, checks outputs agree,
prints per-step times.  BENCH_FORCE_CPU=1 runs a small CPU contract check.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("BENCH_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/aa_rmvsnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from aa_rmvsnet_tpu.models.regularizer import UNetConvLSTM, init_states

H = int(os.environ.get("PROBE_H", 432))
W = int(os.environ.get("PROBE_W", 576))
D = int(os.environ.get("PROBE_D", 128))
DTYPE = jnp.bfloat16 if os.environ.get("PROBE_DTYPE", "bf16") == "bf16" else jnp.float32


def _gn_nchw(x, scale, bias, groups, eps=1e-5):
    """GroupNorm on (B, C, H, W) matching nn.GroupNorm's NHWC semantics."""
    B, C, Hh, Ww = x.shape
    x32 = x.astype(jnp.float32).reshape(B, groups, C // groups, Hh, Ww)
    mean = x32.mean(axis=(2, 3, 4), keepdims=True)
    var = jnp.square(x32 - mean).mean(axis=(2, 3, 4), keepdims=True)
    norm = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(B, C, Hh, Ww)
    out = norm * scale[None, :, None, None] + bias[None, :, None, None]
    return out.astype(x.dtype)


def _cell_nchw(cell_params, x, state):
    """ConvLSTMCell forward in NCHW from the canonical NHWC parameters."""
    h, c = state
    kernel = cell_params["conv"]["kernel"].astype(x.dtype)  # (3,3,cin,4h)
    bias = cell_params["conv"]["bias"].astype(x.dtype)
    z = jax.lax.conv_general_dilated(
        jnp.concatenate([x, h], axis=1), kernel, (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ) + bias[None, :, None, None]
    i, f, o, g = jnp.split(z, 4, axis=1)
    c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
    return h_next, c_next


def _deconv_nchw(p, x, groups):
    kernel = p["kernel"].astype(x.dtype)
    bias = p["bias"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ) + bias[None, :, None, None]
    y = _gn_nchw(y, p["gn"]["scale"].astype(jnp.float32),
                 p["gn"]["bias"].astype(jnp.float32), groups)
    return jax.nn.relu(y)


def _pool_nchw(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def step_nchw(params, x, states):
    """One U-Net depth step, all tensors (B, C, H, W)."""
    p = params["params"]["cost_regularization"]
    s0 = _cell_nchw(p["cell0"], x, states[0])
    s1 = _cell_nchw(p["cell1"], _pool_nchw(s0[0]), states[1])
    s2 = _cell_nchw(p["cell2"], _pool_nchw(s1[0]), states[2])
    u2 = _deconv_nchw(p["deconv0"], s2[0], groups=2)
    s3 = _cell_nchw(p["cell3"], jnp.concatenate([u2, s1[0]], axis=1), states[3])
    u3 = _deconv_nchw(p["deconv1"], s3[0], groups=2)
    s4 = _cell_nchw(p["cell4"], jnp.concatenate([u3, s0[0]], axis=1), states[4])
    kernel = p["conv_out"]["kernel"].astype(x.dtype)
    bias = p["conv_out"]["bias"].astype(x.dtype)
    cost = jax.lax.conv_general_dilated(
        s4[0], kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ) + bias[None, :, None, None]
    return cost[:, 0], (s0, s1, s2, s3, s4)


def main():
    from flax import linen as nn

    model = UNetConvLSTM()
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 32, 32, 32), jnp.float32)
    variables = {"params": {"cost_regularization": model.init(
        rng, x0, init_states(1, 32, 32))["params"]}}
    if DTYPE != jnp.float32:
        variables = jax.tree.map(lambda a: a.astype(DTYPE)
                                 if a.dtype == jnp.float32 else a, variables)

    xs = jax.random.normal(jax.random.PRNGKey(1), (D, 1, H, W, 32), DTYPE)

    def scan_nhwc(variables, xs):
        def body(states, x):
            cost, states = model.apply(
                {"params": variables["params"]["cost_regularization"]},
                x, states)
            return states, cost[..., 0]
        return jax.lax.scan(body, init_states(1, H, W, DTYPE), xs)[1]

    def scan_nchw(variables, xs):
        def body(states, x):
            cost, states = step_nchw(variables, x.transpose(0, 3, 1, 2), states)
            return states, cost
        init = tuple(
            (h.transpose(0, 3, 1, 2), c.transpose(0, 3, 1, 2))
            for h, c in init_states(1, H, W, DTYPE)
        )
        return jax.lax.scan(body, init, xs)[1]

    f_nhwc = jax.jit(scan_nhwc)
    f_nchw = jax.jit(scan_nchw)

    def timed(f, tag):
        t0 = time.perf_counter()
        out = f(variables, xs)
        _ = float(out[0, 0, 0, 0])  # tunnel: force host fetch
        print(f"{tag}: warmup+compile {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(variables, xs)
            _ = float(out[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        return out, dt

    out_a, t_a = timed(f_nhwc, "nhwc")
    out_b, t_b = timed(f_nchw, "nchw")
    err = float(jnp.max(jnp.abs(out_a.astype(jnp.float32)
                                - out_b.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(out_a.astype(jnp.float32))))
    print(f"max |nhwc - nchw| = {err:.5f} (scale {scale:.2f})")
    assert err < max(2e-2 * scale, 1e-3), "layouts disagree"
    print(f"nhwc: {t_a:.3f}s ({1e3 * t_a / D:.2f} ms/step)  "
          f"nchw: {t_b:.3f}s ({1e3 * t_b / D:.2f} ms/step)  "
          f"speedup x{t_a / t_b:.2f}")


if __name__ == "__main__":
    main()
