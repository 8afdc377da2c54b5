"""StableHLO export round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from aa_rmvsnet_tpu.models import init_params
from aa_rmvsnet_tpu.utils.export import save_exported, load_and_call


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
