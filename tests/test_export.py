"""StableHLO export round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from aa_rmvsnet_tpu.models import init_params
from aa_rmvsnet_tpu.utils.export import save_exported, load_and_call


def test_export_evidential_roundtrip(tmp_path):
    """The exported evidential head reproduces EvidentialHead.apply
    (completes the reference's two-sub-model export, statistics.py:26-55)."""
    from jax import export as jax_export

    from aa_rmvsnet_tpu.models.evidential import (
        EvidentialHead, init_evidential,
    )
    from aa_rmvsnet_tpu.utils.export import save_exported_evidential

    variables = init_evidential(jax.random.PRNGKey(1), 16, 16, maxdisp=8)
    path = tmp_path / "evidential.stablehlo"
    n = save_exported_evidential(
        str(path), variables, input_shape=(1, 8, 16, 16), maxdisp=8
    )
    assert n > 0

    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    depths = jnp.asarray(np.linspace(400, 600, 8, dtype=np.float32)[None])
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    out = exported.call(variables, vol, depths)

    head = EvidentialHead(maxdisp=8)
    prob = jax.nn.softmax(vol, axis=1)
    want = head.apply(variables, prob, depths, train=False)
    for key in ("gamma", "nu", "alpha", "beta"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(want[key]), rtol=1e-5, atol=1e-5
        )


def test_export_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), 16, 16)
    path = tmp_path / "model.stablehlo"
    n = save_exported(str(path), params, input_shape=(1, 3, 16, 16, 3),
                      num_depth=4, depth_block=2)
    assert n > 0

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(1, 3, 16, 16, 3).astype(np.float32))
    proj = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (1, 3, 4, 4)).copy())
    depths = jnp.asarray(np.linspace(1, 2, 4, dtype=np.float32)[None])
    out = load_and_call(str(path), params, imgs, proj, depths)
    assert np.isfinite(np.asarray(out["depth"])).all()
