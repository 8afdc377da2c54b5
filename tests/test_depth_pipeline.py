"""Depth-block pipelining over the ``depth`` mesh axis (virtual 8-device
CPU mesh): per-chunk LSTM-carry handoff via ppermute must reproduce the
single-device sweep exactly.

Reference anchor: the sequential per-depth regularization loop at
/root/reference/models/drmvsnet.py:273-287 is the state being handed off;
the online argmax at drmvsnet.py:327-333 is the tie-breaking the
cross-chunk merge must preserve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_rmvsnet_tpu.models import init_params
from aa_rmvsnet_tpu.models.network import SweepConfig, forward
from aa_rmvsnet_tpu.parallel.depth_pipeline import (
    pipeline_forward,
    sweep_depth_pipelined,
)
from aa_rmvsnet_tpu.parallel.mesh import make_mesh


def _map_stack(M=3, B=1, V=3, H=16, W=16, D=8, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(M, B, V, H, W, 3).astype(np.float32)
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    projs = []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = v * 2.0
        P = E.copy()
        P[:3, :4] = K @ P[:3, :4]
        projs.append(P)
    proj = np.broadcast_to(np.stack(projs)[None, None], (M, B, V, 4, 4)).copy()
    # Per-map depth ranges differ so a mixed-up pipeline would be caught.
    depths = np.stack(
        [
            np.linspace(400.0 + 10 * m, 600.0 + 10 * m, D, dtype=np.float32)
            for m in range(M)
        ]
    )[:, None].repeat(B, axis=1)
    return jnp.asarray(imgs), jnp.asarray(proj), jnp.asarray(depths)


class TestDepthPipeline:
    def test_matches_single_device_sweep(self):
        """4-stage pipeline, 3 maps: depth maps bit-equal per map to the
        serial sweep; confidence equal up to logsumexp reassociation."""
        mesh = make_mesh(data=2, depth=4)
        imgs, proj, depths = _map_stack(M=3, D=8)
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        cfg = SweepConfig(depth_block=2, collect_volume=False)

        out = jax.jit(
            lambda p, i, pr, d: pipeline_forward(p, i, pr, d, mesh, cfg)
        )(params, imgs, proj, depths)

        for m in range(3):
            ref = forward(params, imgs[m], proj[m], depths[m], cfg)
            np.testing.assert_array_equal(
                np.asarray(out["depth"][m]), np.asarray(ref["depth"])
            )
            np.testing.assert_allclose(
                np.asarray(out["photometric_confidence"][m]),
                np.asarray(ref["photometric_confidence"]),
                atol=1e-5,
            )

    def test_matches_with_fp8_tables_and_more_maps_than_stages(self):
        """M > P (pipeline drains and refills) with quantized tables."""
        mesh = make_mesh(data=4, depth=2)
        imgs, proj, depths = _map_stack(M=5, D=8, seed=3)
        params = init_params(jax.random.PRNGKey(1), 16, 16)
        cfg = SweepConfig(
            depth_block=2, collect_volume=False,
            table_dtype=jnp.float8_e4m3fn,
        )

        out = jax.jit(
            lambda p, i, pr, d: pipeline_forward(p, i, pr, d, mesh, cfg)
        )(params, imgs, proj, depths)

        for m in range(5):
            ref = forward(params, imgs[m], proj[m], depths[m], cfg)
            np.testing.assert_array_equal(
                np.asarray(out["depth"][m]), np.asarray(ref["depth"])
            )

    def test_matches_with_packed_rows(self):
        """The packed 4x4-row build inside the pipeline stages (the
        _select_build dispatch) is bit-exact vs the serial packed sweep."""
        from aa_rmvsnet_tpu.models.network import pick_packed_rows

        mesh = make_mesh(data=4, depth=2)
        imgs, proj, depths = _map_stack(M=2, D=8, seed=5)
        # ~0.2 px/step at this geometry: the block-2 packed gate passes.
        assert pick_packed_rows(np.asarray(proj[0, 0]),
                                np.asarray(depths[0, 0]), 16, 16, 2)
        params = init_params(jax.random.PRNGKey(2), 16, 16)
        cfg = SweepConfig(depth_block=2, collect_volume=False,
                          packed_rows=True)

        out = jax.jit(
            lambda p, i, pr, d: pipeline_forward(p, i, pr, d, mesh, cfg)
        )(params, imgs, proj, depths)
        for m in range(2):
            ref = forward(params, imgs[m], proj[m], depths[m], cfg)
            np.testing.assert_array_equal(
                np.asarray(out["depth"][m]), np.asarray(ref["depth"])
            )

    def test_rejects_collect_volume_and_bad_depth_split(self):
        mesh = make_mesh(data=2, depth=4)
        imgs, proj, depths = _map_stack(M=1, D=8)
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        feats = jnp.zeros((1, 3, 1, 16, 16, 32))
        with pytest.raises(ValueError, match="collect_volume"):
            sweep_depth_pipelined(
                params, feats, proj, depths, mesh,
                SweepConfig(collect_volume=True),
            )
        with pytest.raises(ValueError, match="not divisible"):
            sweep_depth_pipelined(
                params, feats, proj, depths[:, :, :6], mesh,
                SweepConfig(depth_block=2, collect_volume=False),
            )
