"""Depth-hypothesis block pipelining over a ``depth`` mesh axis.

The recurrent regularizer makes the depth sweep sequential (the 5x(h, c)
ConvLSTM carry — reference: models/drmvsnet.py:273-287 is the loop whose
state is handed off here), so sharding the depth axis is *pipelining*, not
data parallelism: device ``p`` owns depth chunk ``p`` and a stream of M
reference-view maps fills the pipeline.  At tick ``t`` device ``p``
processes map ``t - p``'s chunk, then hands the LSTM carry to device
``p + 1`` over ICI with one ``lax.ppermute`` — after ``P - 1`` fill ticks
every device is busy, so M maps complete in ``(M + P - 1)`` chunk-times
instead of ``M * P``: per-map latency drops ~Px for large-scene inference
(TnT advanced, D=512) where the per-chip batch is 1 and nothing else can
cut single-map latency (SURVEY §2.2/§7.3, BASELINE "depth-hypothesis
block" scope).

Winner-take-all / logsumexp across chunks is an associative combine, so
each device emits per-(map, chunk) partials and the cross-chunk merge runs
once at the end on the host program side (first-max-wins `argmax` over the
chunk axis preserves the reference's running-argmax tie-breaking,
drmvsnet.py:327-333, because chunks are ordered by depth).

Memory: every device holds the patch tables of all M in-flight maps
(the classic pipeline trade) — choose M ~ P; the LSTM carry transfer is
5 x 2 x (B, H, W, C) per tick and rides ICI.

``collect_volume`` is not supported here: the pipeline targets inference
latency; training/evidential paths use the single-device sweep with the
``data``/``view``/``spatial`` axes instead.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.network import (
    AARMVSNetCore,
    SweepConfig,
    _build_cost_block,
    _build_cost_block_folded,
    _build_cost_block_packed,
    extract_features,
    pick_depth_block,
)
from ..models.regularizer import init_states
from ..ops.homography import homography_terms
from ..ops.patch_sample import (
    build_patch_table,
    build_patch_table_packed,
    build_patch_table_packed_quant,
    build_patch_table_quant,
)


def _select_build(config: SweepConfig):
    if config.gather_pack > 1 or config.residual_dtype is not None:
        raise ValueError(
            "gather_pack / residual_dtype are not supported in the "
            "depth-pipelined sweep (single-mesh sweep levers only)"
        )
    if config.packed_rows:
        return functools.partial(
            _build_cost_block_packed, table_taps=config.table_taps)
    if config.fold_omega == "hybrid":
        return functools.partial(_build_cost_block, hybrid_omega=True)
    if config.fold_omega:
        return _build_cost_block_folded
    return _build_cost_block


def sweep_depth_pipelined(
    params,
    features: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    depth_values: jnp.ndarray,
    mesh,
    config: SweepConfig = SweepConfig(),
):
    """Pipelined plane-sweep of M maps over the mesh's ``depth`` axis.

    Args:
      features: ``(M, V, B, H, W, C)`` per-map, per-view features
        (view 0 = reference), e.g. from :func:`pipeline_forward`.
      proj_matrices: ``(M, B, V, 4, 4)``.
      depth_values: ``(M, B, D)``; D must divide into
        ``mesh.shape['depth']`` equal chunks, each a multiple of the
        depth block.
      mesh: a ``jax.sharding.Mesh`` carrying a ``depth`` axis of size > 1.

    Returns dict with ``depth`` / ``photometric_confidence`` of shape
    ``(M, B, H, W)`` — identical (up to logsumexp reassociation in the
    confidence) to running :func:`..models.network.sweep` per map.
    """
    if config.collect_volume:
        raise ValueError("collect_volume is not supported by the depth pipeline")
    M, V, B, H, W, C = features.shape
    D = depth_values.shape[2]
    num_stages = int(mesh.shape["depth"])
    if D % num_stages:
        raise ValueError(f"D={D} not divisible by depth axis {num_stages}")
    chunk = D // num_stages
    block = pick_depth_block(chunk, config.depth_block)
    blocks_per_chunk = chunk // block

    dtype = config.feature_dtype
    features = features.astype(dtype)
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )

    ref_feats = features[:, 0]  # (M, B, H, W, C)
    src_feats = features[:, 1:].transpose(1, 0, 2, 3, 4, 5)  # (S, M, B, ...)
    S = V - 1
    sm_feats = src_feats.reshape(S * M, B, H, W, C)

    if config.packed_rows:
        build_table = functools.partial(
            build_patch_table_packed, taps=config.table_taps)
        build_table_quant = lambda f, dt: build_patch_table_packed_quant(
            f, dt, taps=config.table_taps)
    else:
        build_table = build_patch_table
        build_table_quant = build_patch_table_quant
    if config.table_dtype is not None and config.table_dtype != dtype:
        tables, scales = jax.vmap(
            lambda f: build_table_quant(f, config.table_dtype)
        )(sm_feats)
        tables = tables.reshape(S, M, *tables.shape[1:]).transpose(1, 0, 2, 3, 4)
        scales = scales.reshape(S, M, *scales.shape[1:]).transpose(1, 0, 2, 3, 4)
    else:
        tables = jax.vmap(build_table)(sm_feats)
        tables = tables.reshape(S, M, *tables.shape[1:]).transpose(1, 0, 2, 3, 4)
        scales = None

    ref_projs = proj_matrices[:, :, 0].reshape(M * B, 4, 4)
    # (S, M*B, 4, 4) source projections against their map's reference.
    src_projs = proj_matrices[:, :, 1:].transpose(2, 0, 1, 3, 4).reshape(
        S, M * B, 4, 4
    )
    rot_grids, transes = jax.vmap(
        lambda sp: homography_terms(sp, ref_projs, H, W)
    )(src_projs)
    rot_grids = rot_grids.reshape(S, M, B, 3, H * W).transpose(1, 0, 2, 3, 4)
    transes = transes.reshape(S, M, B, 3, 1).transpose(1, 0, 2, 3, 4)

    build = _select_build(config)

    def regularize(states, cost_block):
        def body(states, slice_):
            cost, states = AARMVSNetCore(pallas_gates=config.pallas_gates).apply(
                params, slice_, states, method=AARMVSNetCore.regularize
            )
            return states, cost[..., 0]

        return jax.lax.scan(body, states, cost_block)

    T = M + num_stages - 1
    fwd_perm = [(i, i + 1) for i in range(num_stages - 1)]
    has_scales = scales is not None

    def stage_fn(params, ref_feats, tables, rot_grids, transes, depth_stack,
                 scales):
        stage = jax.lax.axis_index("depth")
        init = init_states(B, H, W, dtype=dtype)

        def tick(carry, t):
            states_in, depth_buf, max_buf, lse_buf = carry
            m = t - stage
            valid = jnp.logical_and(m >= 0, m < M)
            mc = jnp.clip(m, 0, M - 1)

            # Device 0 starts a fresh map every tick; everyone else resumes
            # the carry handed over from the previous chunk of map m.
            states = jax.tree.map(
                lambda i, s: jnp.where(stage == 0, i, s.astype(i.dtype)),
                init, states_in,
            )

            take = lambda a: jax.lax.dynamic_index_in_dim(a, mc, 0, keepdims=False)
            dvals_full = take(depth_stack)  # (B, D)
            dvals = jax.lax.dynamic_slice_in_dim(
                dvals_full, stage * chunk, chunk, axis=1
            )
            depth_blocks = dvals.T.reshape(blocks_per_chunk, block, B).transpose(
                0, 2, 1
            )
            ref_feat = take(ref_feats)
            tbl, rg, tr = take(tables), take(rot_grids), take(transes)
            sc = take(scales) if has_scales else None

            def block_step(bcarry, dblock):
                states, depth_img, max_cost, lse = bcarry
                cost_block = build(params, ref_feat, tbl, rg, tr, dblock, sc)
                states, costs = regularize(states, cost_block)
                costs = costs.astype(jnp.float32)
                block_best = jnp.argmax(costs, axis=0)
                block_max = jnp.max(costs, axis=0)
                block_depth = jnp.take_along_axis(
                    jnp.broadcast_to(
                        dblock.T[:, :, None, None], costs.shape
                    ),
                    block_best[None], axis=0,
                )[0]
                take_new = block_max > max_cost
                depth_img = jnp.where(take_new, block_depth, depth_img)
                max_cost = jnp.maximum(max_cost, block_max)
                lse = jnp.logaddexp(lse, jax.nn.logsumexp(costs, axis=0))
                return (states, depth_img, max_cost, lse), None

            vary = lambda a: jax.lax.pcast(a, ("depth",), to="varying")
            chunk_init = (
                states,
                vary(jnp.zeros((B, H, W), jnp.float32)),
                vary(jnp.full((B, H, W), -jnp.inf, jnp.float32)),
                vary(jnp.full((B, H, W), -jnp.inf, jnp.float32)),
            )
            (states_out, d_img, m_cost, lse), _ = jax.lax.scan(
                block_step, chunk_init, depth_blocks
            )

            def upd(buf, val):
                cur = jax.lax.dynamic_index_in_dim(buf, mc, 0, keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, val, cur), mc, 0
                )

            depth_buf = upd(depth_buf, d_img)
            max_buf = upd(max_buf, m_cost)
            lse_buf = upd(lse_buf, lse)

            # Hand the carry to the next pipeline stage (ICI neighbor).
            # The last stage's carry is dropped; stage 0 receives zeros and
            # overwrites them with fresh init states next tick anyway.
            states_next = jax.tree.map(
                lambda s: jax.lax.ppermute(s, "depth", fwd_perm), states_out
            )
            return (states_next, depth_buf, max_buf, lse_buf), None

        bufs = (
            init,
            jnp.zeros((M, B, H, W), jnp.float32),
            jnp.full((M, B, H, W), -jnp.inf, jnp.float32),
            jnp.full((M, B, H, W), -jnp.inf, jnp.float32),
        )
        # The tick body's outputs are device-varying (they depend on
        # axis_index / ppermute); the replicated init carry must be cast to
        # the same varying type or shard_map's scan typechecking rejects it.
        bufs = jax.tree.map(
            lambda a: jax.lax.pcast(a, ("depth",), to="varying"), bufs
        )
        (_, depth_buf, max_buf, lse_buf), _ = jax.lax.scan(
            tick, bufs, jnp.arange(T)
        )
        # Leading singleton -> the global ``depth``-sharded chunk axis.
        return depth_buf[None], max_buf[None], lse_buf[None]

    spec_r = P()
    stage_map = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(spec_r,) * 7,
        out_specs=(P("depth"), P("depth"), P("depth")),
        axis_names=frozenset({"depth"}),
    )
    depth_parts, max_parts, lse_parts = stage_map(
        params, ref_feats, tables, rot_grids, transes, depth_values,
        scales if scales is not None else jnp.zeros((M,), jnp.float32),
    )

    # Cross-chunk merge (chunks ordered by depth; first max wins, matching
    # the reference's running argmax).
    best = jnp.argmax(max_parts, axis=0)
    depth = jnp.take_along_axis(depth_parts, best[None], axis=0)[0]
    max_cost = jnp.max(max_parts, axis=0)
    lse = functools.reduce(
        jnp.logaddexp, [lse_parts[i] for i in range(num_stages)]
    )
    return {
        "depth": depth,
        "photometric_confidence": jnp.exp(max_cost - lse),
    }


def pipeline_forward(
    params,
    imgs: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    depth_values: jnp.ndarray,
    mesh,
    config: SweepConfig = SweepConfig(),
):
    """Features + pipelined sweep for a stack of M maps.

    ``imgs``: ``(M, B, V, H, W, 3)``; returns ``(M, B, H, W)`` outputs.
    """
    M, B, V, H, W, _ = imgs.shape
    feats = extract_features(
        params, imgs.reshape(M * B, V, H, W, 3), dtype=config.feature_dtype
    )  # (V, M*B, H, W, C)
    feats = feats.reshape(V, M, B, H, W, -1).transpose(1, 0, 2, 3, 4, 5)
    return sweep_depth_pipelined(
        params, feats, proj_matrices, depth_values, mesh, config
    )
