"""Pallas kernel parity tests (interpret mode on the CPU backend).

The kernels must be numerically identical to the pure-XLA paths they
replace; on TPU the same code compiles natively via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aa_rmvsnet_tpu.ops.pallas.gates import fused_lstm_gates


def _xla_gates(z, c):
    i, f, o, g = jnp.split(z, 4, axis=-1)
    c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c_next), c_next


@pytest.mark.parametrize("hidden", [16, 8])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gate_kernel_matches_xla(hidden, dtype):
    rng = np.random.RandomState(0)
    shape = (2, 9, 13, hidden)  # odd sizes: exercises the flat-row padding
    z = jnp.asarray(rng.randn(*shape[:-1], 4 * hidden), dtype)
    c = jnp.asarray(rng.randn(*shape), dtype)

    h_ref, c_ref = _xla_gates(z, c)
    h_out, c_out = fused_lstm_gates(z, c)

    assert h_out.shape == c.shape and h_out.dtype == c.dtype
    # The kernel computes in fp32 internally (Mosaic requirement, also more
    # accurate); in bf16 the reference chain rounds at each step, so the
    # tolerance is one bf16 ulp of the O(1) gate outputs.
    atol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(h_out, np.float32),
                               np.asarray(h_ref, np.float32), atol=atol)
    np.testing.assert_allclose(np.asarray(c_out, np.float32),
                               np.asarray(c_ref, np.float32), atol=atol)


def test_gate_kernel_in_cell(monkeypatch):
    """ConvLSTMCell output is bit-identical with the kernel enabled."""
    from aa_rmvsnet_tpu.models.blocks import ConvLSTMCell

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 12, 32))
    state = ConvLSTMCell.zero_state(1, 8, 12, 16)
    cell = ConvLSTMCell(16)
    params = cell.init(rng, x, state)

    h0, c0 = cell.apply(params, x, state)
    monkeypatch.setenv("AA_RMVSNET_PALLAS", "1")
    h1, c1 = cell.apply(params, x, state)

    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-6)


def test_gate_kernel_gradients():
    """The kernel is differentiable (BPTT path in training)."""
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(64, 64), jnp.float32)
    c = jnp.asarray(rng.randn(64, 16), jnp.float32)

    def loss_pl(z, c):
        h, cn = fused_lstm_gates(z, c)
        return jnp.sum(h**2) + jnp.sum(cn**2)

    def loss_xla(z, c):
        h, cn = _xla_gates(z, c)
        return jnp.sum(h**2) + jnp.sum(cn**2)

    gz_p, gc_p = jax.grad(loss_pl, argnums=(0, 1))(z, c)
    gz_x, gc_x = jax.grad(loss_xla, argnums=(0, 1))(z, c)
    np.testing.assert_allclose(np.asarray(gz_p), np.asarray(gz_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_x), atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gate_kernel_gradients_dtypes(dtype):
    """Backward-kernel parity in both training dtypes (bf16 is the perf
    path; its tolerance reflects 8-bit mantissas, not kernel error)."""
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(64, 64), dtype)
    c = jnp.asarray(rng.randn(64, 16), dtype)

    def loss_pl(z, c):
        h, cn = fused_lstm_gates(z, c)
        return jnp.sum(h.astype(jnp.float32) ** 2) + jnp.sum(cn.astype(jnp.float32) ** 2)

    def loss_xla(z, c):
        h, cn = _xla_gates(z, c)
        return jnp.sum(h.astype(jnp.float32) ** 2) + jnp.sum(cn.astype(jnp.float32) ** 2)

    gz_p, gc_p = jax.grad(loss_pl, argnums=(0, 1))(z, c)
    gz_x, gc_x = jax.grad(loss_xla, argnums=(0, 1))(z, c)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(gz_p, np.float32),
                               np.asarray(gz_x, np.float32), atol=atol)
    np.testing.assert_allclose(np.asarray(gc_p, np.float32),
                               np.asarray(gc_x, np.float32), atol=atol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradients_through_cell_scan_remat(dtype):
    """The actual training configuration: kernel inside a ConvLSTMCell
    driven by lax.scan under jax.checkpoint, gradients vs the XLA cell."""
    from aa_rmvsnet_tpu.models.blocks import ConvLSTMCell

    rng = jax.random.PRNGKey(0)
    B, H, W, C, T = 1, 8, 12, 32, 3
    xs = jax.random.normal(rng, (T, B, H, W, C), dtype)
    state0 = ConvLSTMCell.zero_state(B, H, W, 16, dtype)
    params = ConvLSTMCell(16).init(jax.random.PRNGKey(1),
                                   xs[0].astype(jnp.float32),
                                   ConvLSTMCell.zero_state(B, H, W, 16))
    params = jax.tree.map(lambda a: a.astype(dtype), params)

    def total(params, use_pallas):
        cell = ConvLSTMCell(16, use_pallas=use_pallas)

        @jax.checkpoint
        def body(state, x):
            h, c = cell.apply(params, x, state)
            return (h, c), jnp.sum(h.astype(jnp.float32) ** 2)

        _, losses = jax.lax.scan(body, state0, xs)
        return jnp.sum(losses)

    g_pl = jax.grad(lambda p: total(p, True))(params)
    g_xla = jax.grad(lambda p: total(p, False))(params)
    atol = 1e-4 if dtype == jnp.float32 else 1e-1
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=atol)
