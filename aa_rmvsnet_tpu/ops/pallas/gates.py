"""Fused ConvLSTM gate kernel (Pallas TPU).

The recurrent regularizer applies, once per depth hypothesis and per U-Net
cell, the elementwise LSTM gate math on the gate-conv output ``z`` split
into (i, f, o, g) (reference models/module.py:76-92):

    c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')

XLA fuses this chain well on its own; the Pallas version exists to (a) pin
the fusion (one VMEM pass, no materialized intermediates) independent of
fusion heuristics, and (b) fix the memory layout: the hidden sizes are 16
and 8 channels, which as trailing dims of NHWC tensors tile to 128 lanes at
8x/16x padding waste.  Because the gate math is purely elementwise, we
flatten every operand to a ``(rows, 128)`` layout first — full lane
utilization for any hidden size — and let the kernel stream row blocks.

Enable in the sweep via the ``AA_RMVSNET_PALLAS=1`` environment variable
(checked at trace time by ``ConvLSTMCell``); on non-TPU backends the kernel
runs in interpret mode so CPU tests exercise the identical code.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
_BLOCK_ROWS = 256


def pallas_gates_enabled() -> bool:
    """Whether ConvLSTM cells should route gate math through the kernel."""
    return os.environ.get("AA_RMVSNET_PALLAS", "0") == "1"


def _gate_kernel(i_ref, f_ref, o_ref, g_ref, c_ref, h_out, c_out):
    # Compute in fp32 regardless of storage dtype: Mosaic rejects mixed
    # f32-scalar/bf16-vector broadcasts inside transcendentals, and the
    # fp32 math is also what the XLA path effectively does.
    i = jax.nn.sigmoid(i_ref[...].astype(jnp.float32))
    f = jax.nn.sigmoid(f_ref[...].astype(jnp.float32))
    o = jax.nn.sigmoid(o_ref[...].astype(jnp.float32))
    g = jnp.tanh(g_ref[...].astype(jnp.float32))
    c_next = f * c_ref[...].astype(jnp.float32) + i * g
    h_out[...] = (o * jnp.tanh(c_next)).astype(h_out.dtype)
    c_out[...] = c_next.astype(c_out.dtype)


def _gate_bwd_kernel(
    i_ref, f_ref, o_ref, g_ref, c_ref, dh_ref, dcn_ref,
    di_out, df_out, do_out, dg_out, dc_out,
):
    # Recompute the (cheap) activations instead of storing them — the
    # backward pass then reads exactly the forward inputs plus the two
    # cotangents, one VMEM pass total.  fp32 math (see _gate_kernel).
    i = jax.nn.sigmoid(i_ref[...].astype(jnp.float32))
    f = jax.nn.sigmoid(f_ref[...].astype(jnp.float32))
    o = jax.nn.sigmoid(o_ref[...].astype(jnp.float32))
    g = jnp.tanh(g_ref[...].astype(jnp.float32))
    c = c_ref[...].astype(jnp.float32)
    tc = jnp.tanh(f * c + i * g)
    dh = dh_ref[...].astype(jnp.float32)
    dcp = dcn_ref[...].astype(jnp.float32) + dh * o * (1.0 - tc * tc)
    do_out[...] = (dh * tc * o * (1.0 - o)).astype(do_out.dtype)
    df_out[...] = (dcp * c * f * (1.0 - f)).astype(df_out.dtype)
    di_out[...] = (dcp * g * i * (1.0 - i)).astype(di_out.dtype)
    dg_out[...] = (dcp * i * (1.0 - g * g)).astype(dg_out.dtype)
    dc_out[...] = (dcp * f).astype(dc_out.dtype)


def _to_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    flat = x.reshape(-1)
    pad = rows * _LANES - flat.size
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(rows, _LANES)


def _row_geometry(n: int):
    rows = -(-n // _LANES)
    grid = -(-rows // _BLOCK_ROWS)
    return grid, grid * _BLOCK_ROWS


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused(i, f, o, g, c, interpret: bool):
    n = c.size
    grid, rows = _row_geometry(n)
    args = [_to_rows(t, rows) for t in (i, f, o, g, c)]
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda r: (r, 0))
    h2, c2 = pl.pallas_call(
        _gate_kernel,
        grid=(grid,),
        in_specs=[spec] * 5,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), c.dtype)] * 2,
        interpret=interpret,
    )(*args)
    return (
        h2.reshape(-1)[:n].reshape(c.shape),
        c2.reshape(-1)[:n].reshape(c.shape),
    )


def _fused_fwd(i, f, o, g, c, interpret: bool):
    return _fused(i, f, o, g, c, interpret), (i, f, o, g, c)


def _fused_bwd(interpret: bool, residuals, cotangents):
    i, f, o, g, c = residuals
    dh, dcn = cotangents
    n = c.size
    grid, rows = _row_geometry(n)
    args = [_to_rows(t, rows) for t in (i, f, o, g, c, dh, dcn)]
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda r: (r, 0))
    outs = pl.pallas_call(
        _gate_bwd_kernel,
        grid=(grid,),
        in_specs=[spec] * 7,
        out_specs=[spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), c.dtype)] * 5,
        interpret=interpret,
    )(*args)
    shapes = (i.shape, f.shape, o.shape, g.shape, c.shape)
    return tuple(
        t.reshape(-1)[:n].reshape(s) for t, s in zip(outs, shapes)
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_lstm_gates(z: jnp.ndarray, c: jnp.ndarray, interpret: bool | None = None):
    """Apply the LSTM gate math in one fused VMEM pass.

    Args:
      z: ``(..., 4*hidden)`` gate-conv output, channel order (i, f, o, g)
        (reference models/module.py:83-92).
      c: ``(..., hidden)`` previous cell state.
      interpret: force Pallas interpret mode; defaults to automatic (native
        on TPU, interpret elsewhere).

    Returns:
      ``(h_next, c_next)``, both shaped/typed like ``c``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i, f, o, g = jnp.split(z, 4, axis=-1)
    return _fused(i, f, o, g, c, interpret)
