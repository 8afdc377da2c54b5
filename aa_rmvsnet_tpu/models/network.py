"""The core MVS network: feature extraction + plane-sweep reweighted variance
cost volume + recurrent ConvLSTM regularization + depth regression.

Capability-parity with the reference ``EMVSNet`` core (reference:
models/drmvsnet.py:234-345; 90 tensors / 187,203 params under the
``feature`` / ``omega`` / ``cost_regularization`` prefixes), re-architected
for TPU:

- **Views are batched, not looped**: all V views go through FeatNet as one
  NHWC batch; all (src-view, depth-in-block) warps/omega applications run
  as one big conv batch (MXU-friendly), with a single sum over the view
  axis (a ``psum`` when views are sharded).
- **The depth sweep is a ``lax.scan`` over depth blocks**: cost-volume
  construction inside a block is fully parallel; only the ConvLSTM carry is
  sequential.  Inference keeps O(block) activation memory via an online
  winner-take-all / online-logsumexp carry (the reference's running-argmax
  trick, drmvsnet.py:300-339, done stably).
- **Training** rematerializes each depth block (``jax.checkpoint``) so BPTT
  over D steps needs O(block + D/block) memory instead of O(D).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .feature import FeatNet
from .aggregation import InterViewAA, omega_folded
from .regularizer import UNetConvLSTM, init_states
from ..ops.homography import homography_terms, max_depth_step_displacement, plane_sweep_xy
from ..ops.patch_sample import (
    build_patch_table,
    build_patch_table_packed,
    build_patch_table_packed_quant,
    build_patch_table_quant,
    patch_bilinear_sample,
    patch_bilinear_sample_packed,
)


class AARMVSNetCore(nn.Module):
    """Parameter container for the 187k-param core network.

    Exposes the three sub-networks as methods so the sweep driver can apply
    them independently inside ``lax.scan`` bodies.
    """

    pallas_gates: bool = False

    def setup(self):
        self.feature = FeatNet()
        self.omega = InterViewAA()
        self.cost_regularization = UNetConvLSTM(pallas_gates=self.pallas_gates)

    def features(self, imgs):
        return self.feature(imgs)

    def omega_weights(self, residual):
        return self.omega(residual)

    def regularize(self, cost_slice, states):
        return self.cost_regularization(cost_slice, states)

    def __call__(self, imgs, states):
        """Init-only path touching every submodule once."""
        f = self.feature(imgs)
        w = self.omega(f)
        c, s = self.cost_regularization(f, states)
        return f, w, c, s


def init_params(rng, height: int = 32, width: int = 32):
    """Initialize a full parameter tree at any (divisible-by-4) size; the
    network is fully convolutional so the size only affects init shapes."""
    model = AARMVSNetCore()
    imgs = jnp.zeros((1, height, width, 3))
    states = init_states(1, height, width)
    return model.init(rng, imgs, states)


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Depth-sweep execution knobs.

    depth_block: hypotheses per scan step (cost build is parallel inside a
      block).  Must divide D; ``pick_depth_block`` helps choose.
    fold_omega: cost-block lane-padding lever, three settings:
      ``False`` (default) — depth-major warp gather, omega batched over
      ``(B*S*Db, H, W, 4)`` (its 4-ch intermediates pad to 128 lanes, 32x).
      ``"hybrid"`` — same fast depth-major gather, but omega applied in the
      depth-folded grouped-conv form (Db*4-lane intermediates) on a
      transposed view of the residual; one extra transpose buys a
      ~4*Db-fold cut of the block's dominant HBM stream.
      ``True`` — fully folded layout: pixel-major gather rows, every
      intermediate carries ``Db*32`` lanes, variance reduces folded
      (measured slower than default on the tunnel chip — the pixel-major
      gather order loses more than the folding gains; kept as a lever).
      All three are numerically identical (parity-tested).
    packed_rows: ONE 4x4-patch gather row per (view, pixel) serves the
      whole depth block — the row-count lever for gather-row-rate-limited
      backends (~Db/1.6x fewer row issues; BENCHMARKS.md round-2).  Exact
      ONLY when every pixel's per-block warp span is <= 2 px; gate with
      :func:`pick_packed_rows` on the host (fine depth sampling — e.g. the
      DTU eval sweep at ~0.03 px/step — always qualifies).  Overrides
      fold_omega (the packed layout is already depth-folded).
    remat: rematerialize each block in the backward pass (training).
    collect_volume: also return the full (B, D, H, W) regularized cost
      volume (needed for the training softmax / evidential head).
    feature_dtype: dtype for features and cost math (bfloat16 halves HBM
      traffic at matched quality; fp32 for strict parity).
    table_dtype: storage dtype for the warp patch tables.  The warp gather
      is the dominant HBM stream of the sweep; ``jnp.float8_e4m3fn`` halves
      it (per-channel-scaled quantization, see
      ``ops.patch_sample.build_patch_table_quant``).  ``None`` stores the
      tables in ``feature_dtype`` (exact).
    pallas_gates: route every ConvLSTM cell's gate math through the fused
      Pallas kernel (``ops/pallas/gates.py``).  Unlike the legacy
      ``AA_RMVSNET_PALLAS`` env var this is part of the traced program, so
      toggling it always takes effect.
    mesh: optional ``jax.sharding.Mesh``.  When it carries a ``view`` axis
      of size > 1 (and the source-view count divides it), the per-view
      patch tables / homography terms are sharding-constrained to that
      axis, so each device warps only its views and the view-mean of the
      variance becomes one psum per depth block over ICI
      (``parallel/mesh.py``; SURVEY §2.2).
    """

    depth_block: int = 16
    remat: bool = False
    collect_volume: bool = True
    feature_dtype: Any = jnp.float32
    table_dtype: Any = None
    fold_omega: Any = False  # False | "hybrid" | True
    packed_rows: bool = False
    pallas_gates: bool = False
    mesh: Any = None
    # Gather super-packing (packed path only): ONE packed gather row serves
    # ``gather_pack * depth_block`` hypotheses, consumed by ``gather_pack``
    # successive regularizer sub-blocks inside each scan step.  Cuts the
    # binding gather-row count a further ``gather_pack``-fold WITHOUT
    # growing the per-sub-block cost program (the depth_block=16 program
    # SIGKILLs the remote compile helper on the tunnel; this reaches the
    # same row count with the proven block-8 body).  Exactness contract:
    # the SUPER block's warp span must pass the 2 px gate — gate with
    # ``pick_packed_rows(..., depth_block=gather_pack * depth_block)``.
    gather_pack: int = 1
    # Packed-table window size per axis (4 or 6).  taps=6 stores a
    # 36-tap/2.25x-HBM table whose exactness span limit is 4 px instead of
    # 2 px — i.e. ~2x the hypotheses per gather row at the same geometry
    # (pairs with gather_pack when the 4 px gate passes where 2 px fails).
    table_taps: int = 4
    # FeatNet view chunking (0 = all views in one batch): bounds feature
    # extraction's peak HBM at big sizes (the 18/9-channel deform offset
    # maps pad to 128 lanes) — the TnT 1920x1056 single-chip enabler.
    feature_view_chunk: int = 0
    # fp8 residual-storage lever (packed path only): store the squared
    # residual — the cost block's dominant non-gather HBM stream, written
    # once and read twice — in this dtype (e.g. jnp.float8_e4m3fn) with a
    # shared per-channel scale derived from the feature amax bound
    # ((2*amax)^2/448).  The dequantization never materializes: omega folds
    # the scale into its first conv kernel, the variance sum fuses it into
    # its elementwise chain.  Approximate (fp8 has ~2 significant digits);
    # gate with the quality tests before production use.
    residual_dtype: Any = None
    # Fused-residual lever (packed path): compute the squared residual
    # (and its fp8 quantization when residual_dtype is set) INSIDE the
    # packed blend tiles, so the bf16 warped volume — ~131 GB/map of
    # write+read HBM traffic at the north-star config, the sweep's largest
    # non-gather stream — never materializes.  Bitwise identical to the
    # unfused chain (the subtraction runs on the K*C-folded layout; the
    # round-3 in-tile-residual dead end subtracted on the minor-C=32
    # pre-fold layout, which re-introduced a 4x-padded temp).
    fused_residual: bool = False


def pick_depth_block(num_depth: int, target: int) -> int:
    """Largest divisor of ``num_depth`` that is <= ``target``."""
    for block in range(min(target, num_depth), 0, -1):
        if num_depth % block == 0:
            return block
    return 1


def extract_features(params, imgs: jnp.ndarray, dtype=jnp.float32,
                     view_chunk: int = 0) -> jnp.ndarray:
    """Run FeatNet on every view as one batch.

    Args:
      imgs: ``(B, V, H, W, 3)`` standardized images.
      dtype: compute dtype (bfloat16 halves HBM traffic in the deformable
        gathers; fp32 for strict parity).
      view_chunk: process views in sequential chunks of this size (0 = all
        at once).  The deformable-conv offset/modulation maps carry 18/9
        channels which TPU tiling pads to 128 lanes — at 1920x1056 x 7
        views that is ~7 GB of live temps; chunking bounds FeatNet's peak
        HBM at identical numerics (the per-view compute is independent).

    Returns:
      ``(V, B, H, W, 32)`` features (view-major for the sweep).
    """
    B, V, H, W, C = imgs.shape
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )
        imgs = imgs.astype(dtype)
    apply = lambda flat: AARMVSNetCore().apply(
        params, flat, method=AARMVSNetCore.features)
    if view_chunk and view_chunk < V:
        chunks = []
        for i in range(0, V, view_chunk):
            k = min(view_chunk, V - i)
            out = apply(imgs[:, i : i + k].reshape(B * k, H, W, C))
            chunks.append(out.reshape(B, k, H, W, out.shape[-1]))
        feats = jnp.concatenate(chunks, axis=1)
    else:
        feats = apply(imgs.reshape(B * V, H, W, C)).reshape(B, V, H, W, -1)
    return feats.transpose(1, 0, 2, 3, 4)


def _build_cost_block(
    params,
    ref_feat: jnp.ndarray,
    src_tables: jnp.ndarray,
    rot_grids: jnp.ndarray,
    transes: jnp.ndarray,
    depth_block: jnp.ndarray,
    table_scales: jnp.ndarray | None = None,
    hybrid_omega: bool = False,
) -> jnp.ndarray:
    """Warp + squared residual + omega reweight + view mean for one block.

    Args:
      ref_feat: ``(B, H, W, C)``.
      src_tables: ``(S, B, H*W, 4C)`` patch tables of the source features
        (:func:`build_patch_table`) — one 128-lane gather row per sample.
      rot_grids: ``(S, B, 3, H*W)``; transes: ``(S, B, 3, 1)``.
      depth_block: ``(B, Db)``.
      table_scales: ``(S, B, 1, 4C)`` dequantization factors when the tables
        are fp8-quantized (``build_patch_table_quant``), else None.
      hybrid_omega: apply omega in the depth-folded grouped-conv form
        (:func:`..models.aggregation.omega_folded`) on a transposed view of
        the residual, while keeping this path's depth-major warp gather.
        Omega's 4-channel intermediates are the single biggest HBM stream
        of the block (32x lane padding); folding Db volumes into channels
        shrinks that to 32/(4*Db)x for one extra transpose of the residual.
        Numerically identical.

    Returns:
      ``(Db, B, H, W, C)`` negated variance cost slices (regularizer input).
    """
    S, B, HW, C4 = src_tables.shape
    _, H, W, C = ref_feat.shape
    Db = depth_block.shape[1]

    def warp_one_view(table, rot_grid, trans, scale):
        x, y = plane_sweep_xy(rot_grid, trans, depth_block)  # (B, Db, H*W)
        out = patch_bilinear_sample(
            table, x.reshape(B, -1), y.reshape(B, -1), H, W,
            scale=scale, compute_dtype=ref_feat.dtype,
        )
        return out.reshape(B, Db, H, W, C)

    if table_scales is None:
        warp = lambda t, r, tr: warp_one_view(t, r, tr, None)
        warped = jax.vmap(warp)(src_tables, rot_grids, transes)
    else:
        warped = jax.vmap(warp_one_view)(
            src_tables, rot_grids, transes, table_scales
        )  # (S,B,Db,H,W,C)
    residual_sq = (warped - ref_feat[None, :, None]) ** 2

    if hybrid_omega:
        # Fold the Db axis into channels for the omega application only:
        # intermediates carry Db*4 lanes instead of 4 (32x lane padding ->
        # 32/(4*Db)x).  B stays outermost in the merged batch (see note
        # below).
        flat = residual_sq.transpose(1, 0, 3, 4, 2, 5).reshape(
            B * S, H, W, Db * C
        )
        weights = omega_folded(params["params"]["omega"], flat, Db)
        # (S, B, Db, H, W): no trailing size-1 axis — a materialized
        # (..., 1) tensor is lane-padded 128x; broadcast in the multiply.
        weights = weights.reshape(B, S, H, W, Db).transpose(1, 0, 4, 2, 3)
    else:
        # Batch omega over (B, S, Db) with the data-sharded B axis OUTERMOST
        # in the merged conv batch: merging a sharded axis inside a merged
        # dimension ((S*B*Db)) makes GSPMD replicate the conv and psum
        # duplicate gradient contributions (observed: omega grads scaled by
        # the data-axis size); B-major merge keeps the merged axis cleanly
        # sharded.
        flat = residual_sq.transpose(1, 0, 2, 3, 4, 5).reshape(B * S * Db, H, W, C)
        weights = AARMVSNetCore().apply(
            params, flat, method=AARMVSNetCore.omega_weights
        )
        weights = weights[..., 0].reshape(B, S, Db, H, W).transpose(1, 0, 2, 3, 4)

    variance = (
        jnp.sum((weights[..., None] + 1.0) * residual_sq, axis=0) / S
    )  # (B, Db, H, W, C)
    return -variance.transpose(1, 0, 2, 3, 4)


def _build_cost_block_folded(
    params,
    ref_feat: jnp.ndarray,
    src_tables: jnp.ndarray,
    rot_grids: jnp.ndarray,
    transes: jnp.ndarray,
    depth_block: jnp.ndarray,
    table_scales: jnp.ndarray | None = None,
    residual_scale: jnp.ndarray | None = None,
    residual_dtype: Any = None,
) -> jnp.ndarray:
    """Depth-folded variant of :func:`_build_cost_block`.

    Every intermediate keeps a ``Db*32``-lane channel axis: the warp gather
    emits rows in pixel-major order so its output reshapes directly to
    ``(B, H, W, Db*C)`` (no lane padding for Db >= 4), and omega runs on
    the folded layout.  Same math, same result; the residual/omega/variance
    stage is shared with the packed path (:func:`_cost_from_warped`), so
    the fp8 residual-storage lever applies here too — the
    minimum-peak-HBM recipe for sizes where packed tables do not fit
    (TnT 1920x1056 x 7 views, BENCHMARKS.md round-4).
    """
    S, B, HW, C4 = src_tables.shape
    _, H, W, C = ref_feat.shape
    Db = depth_block.shape[1]

    def warp_one_view(table, rot_grid, trans, scale):
        x, y = plane_sweep_xy(rot_grid, trans, depth_block)  # (B, Db, H*W)
        xt = x.transpose(0, 2, 1).reshape(B, -1)  # pixel-major (B, H*W*Db)
        yt = y.transpose(0, 2, 1).reshape(B, -1)
        out = patch_bilinear_sample(
            table, xt, yt, H, W, scale=scale, compute_dtype=ref_feat.dtype
        )  # (B, H*W*Db, C)
        return out.reshape(B, H, W, Db * C)

    if table_scales is None:
        warped = jax.vmap(lambda t, r, tr: warp_one_view(t, r, tr, None))(
            src_tables, rot_grids, transes
        )
    else:
        warped = jax.vmap(warp_one_view)(src_tables, rot_grids, transes, table_scales)

    return _cost_from_warped(
        params, ref_feat, warped, residual_scale, residual_dtype
    )


def _build_cost_block_packed(
    params,
    ref_feat: jnp.ndarray,
    src_tables: jnp.ndarray,
    rot_grids: jnp.ndarray,
    transes: jnp.ndarray,
    depth_block: jnp.ndarray,
    table_scales: jnp.ndarray | None = None,
    residual_scale: jnp.ndarray | None = None,
    residual_dtype: Any = None,
    table_taps: int = 4,
    fused_residual: bool = False,
) -> jnp.ndarray:
    """Packed-row variant: ONE taps x taps-patch gather row per
    (view, pixel) serves the whole depth block.

    On gather-row-rate-limited backends this cuts the binding resource of
    the sweep ~Db/1.6-fold (BENCHMARKS.md round-2).  The packed sample
    emits pixel-major ``(B, H*W, Db, C)``, so omega and the variance run
    in the depth-folded layout with no extra transpose.

    EXACT only when every pixel's Db warp positions span <= 2 px per axis;
    callers gate on ``ops.homography.max_depth_step_displacement`` (see
    ``pick_packed_rows``).

    ``residual_scale``/``residual_dtype``: the fp8 residual-storage lever
    (``SweepConfig.residual_dtype``).  The squared residual — read TWICE
    (omega conv input + variance sum), the block's dominant non-gather HBM
    stream — is stored quantized with the shared per-channel scale; the
    dequantization never materializes: omega folds the scale into its first
    conv kernel (:func:`..models.aggregation.omega_folded` ``input_scale``)
    and the variance sum fuses it into its elementwise chain.
    """
    if fused_residual:
        B, H, W, C = ref_feat.shape
        residual = _warp_packed(
            src_tables, rot_grids, transes, depth_block, table_scales,
            ref_feat.dtype, H, W, taps=table_taps,
            ref_flat=ref_feat.reshape(B, H * W, C),
            residual_scale=residual_scale, residual_dtype=residual_dtype,
        )
        return _cost_from_residual(
            params, residual, C, ref_feat.dtype, residual_scale,
            residual_dtype,
        )
    warped = _warp_packed(
        src_tables, rot_grids, transes, depth_block, table_scales,
        ref_feat.dtype, ref_feat.shape[1], ref_feat.shape[2],
        taps=table_taps,
    )
    return _cost_from_warped(
        params, ref_feat, warped, residual_scale, residual_dtype
    )


def _warp_packed(
    src_tables, rot_grids, transes, depth_block, table_scales,
    compute_dtype, H: int, W: int, taps: int = 4,
    ref_flat: jnp.ndarray | None = None,
    residual_scale: jnp.ndarray | None = None,
    residual_dtype: Any = None,
) -> jnp.ndarray:
    """Packed warp of ``K = depth_block.shape[1]`` hypotheses per gather
    row; returns the folded ``(S, B, H, W, K*C)`` warped volume.

    When ``ref_flat`` (``(B, H*W, C)`` reference features) is given, the
    blend tiles emit the (optionally fp8-quantized) SQUARED RESIDUAL
    instead — the warped volume never materializes in HBM
    (``SweepConfig.fused_residual``; bitwise identical to the unfused
    subtract/square/quantize chain in :func:`_cost_from_warped`)."""
    S, B, HW, CT = src_tables.shape
    K = depth_block.shape[1]
    inv_scale = None
    if ref_flat is not None and residual_scale is not None:
        inv_scale = 1.0 / residual_scale  # fp32; cast in the tile epilogue

    def warp_one_view(table, rot_grid, trans, scale):
        x, y = plane_sweep_xy(rot_grid, trans, depth_block)  # (B, K, H*W)
        xg = x.transpose(0, 2, 1)  # (B, H*W, K): groups = pixels
        yg = y.transpose(0, 2, 1)
        out = patch_bilinear_sample_packed(
            table, xg, yg, H, W, scale=scale, compute_dtype=compute_dtype,
            folded_out=True, taps=taps, ref=ref_flat,
            residual_inv_scale=inv_scale,
            residual_dtype=residual_dtype if ref_flat is not None else None,
        )  # (B, H*W, K*C) — folded layout straight out of the tile blend
        # ("dual" residual mode emits an (fp8, int8) pair).
        return jax.tree.map(lambda o: o.reshape(B, H, W, -1), out)

    if table_scales is None:
        return jax.vmap(lambda t, r, tr: warp_one_view(t, r, tr, None))(
            src_tables, rot_grids, transes
        )
    return jax.vmap(warp_one_view)(src_tables, rot_grids, transes, table_scales)


def _cost_from_warped(
    params,
    ref_feat: jnp.ndarray,
    warped: jnp.ndarray,
    residual_scale: jnp.ndarray | None = None,
    residual_dtype: Any = None,
) -> jnp.ndarray:
    """Residual + omega reweight + view-mean variance on a folded
    ``(S, B, H, W, Db*C)`` warped volume -> ``(Db, B, H, W, C)`` cost."""
    S, B, H, W, DbC = warped.shape
    C = ref_feat.shape[-1]
    Db = DbC // C

    ref_tiled = jnp.tile(ref_feat, (1, 1, 1, Db))  # (B, H, W, Db*C)
    residual_sq = (warped - ref_tiled[None]) ** 2  # (S, B, H, W, Db*C)

    if residual_dtype is not None:
        # Quantize the residual ONCE (sub/square/scale/cast fuse into one
        # pass over `warped`); both consumers read the quantized tensor.
        inv = (1.0 / residual_scale).astype(ref_feat.dtype)
        scaled = residual_sq * jnp.tile(inv, (Db,))
        if residual_dtype == "dual":
            i8 = jnp.clip(
                jnp.round(scaled.astype(jnp.float32) * (127.0 / 448.0)),
                0, 127,
            ).astype(jnp.int8)
            residual_sq = (scaled.astype(jnp.float8_e4m3fn), i8)
        else:
            if residual_dtype == jnp.int8:
                scaled = jnp.clip(
                    jnp.round(scaled.astype(jnp.float32)), 0, 127)
            residual_sq = scaled.astype(residual_dtype)

    return _cost_from_residual(
        params, residual_sq, C, ref_feat.dtype, residual_scale, residual_dtype
    )


def _cost_from_residual(
    params,
    residual_sq: jnp.ndarray,
    C: int,
    compute_dtype,
    residual_scale: jnp.ndarray | None = None,
    residual_dtype: Any = None,
) -> jnp.ndarray:
    """Omega reweight + view-mean variance on a folded (and possibly
    quantized) ``(S, B, H, W, Db*C)`` squared residual ->
    ``(Db, B, H, W, C)`` cost.

    ``residual_dtype="dual"``: ``residual_sq`` is an ``(fp8, int8)`` pair
    — omega's MXU-native int8 conv consumes the int8 copy (no bf16
    convert rematerialization) while the variance keeps the fp8 copy's
    precision profile."""
    if residual_dtype == "dual":
        r_var, r_omega = residual_sq
    else:
        r_var = r_omega = residual_sq
    S, B, H, W, DbC = r_var.shape
    Db = DbC // C

    flat = r_omega.transpose(1, 0, 2, 3, 4).reshape(B * S, H, W, Db * C)
    if residual_dtype == "dual":
        weights = omega_folded(
            params["params"]["omega"], flat, Db,
            input_scale=residual_scale * (448.0 / 127.0),
        )
    elif residual_dtype == jnp.int8:
        # omega consumes the int8 residual DIRECTLY (MXU-native int8 rw0
        # conv inside omega_folded) — no bf16 convert materialization.
        weights = omega_folded(
            params["params"]["omega"], flat, Db, input_scale=residual_scale,
        )
    elif residual_dtype is not None:
        weights = omega_folded(
            params["params"]["omega"], flat.astype(compute_dtype), Db,
            input_scale=residual_scale,
        )
    else:
        weights = omega_folded(params["params"]["omega"], flat, Db)
    weights = weights.reshape(B, S, H, W, Db).transpose(1, 0, 2, 3, 4)

    r6 = r_var.reshape(S, B, H, W, Db, C)
    if residual_dtype is not None:
        r6 = r6.astype(compute_dtype) * residual_scale.astype(compute_dtype)
    variance = jnp.sum((weights[..., None] + 1.0) * r6, axis=0) / S
    return -variance.transpose(3, 0, 1, 2, 4)  # (Db, B, H, W, C)


def pick_packed_rows(
    proj_matrices, depth_values, height: int, width: int, depth_block: int,
    margin: float = 0.95, taps: int = 4,
) -> bool:
    """Host-side gate for ``SweepConfig.packed_rows``: True iff every
    depth block's warp positions are guaranteed to span <= ``taps - 2`` px
    per pixel (the packed row's exactness contract), with a safety
    ``margin``.  Gate with ``depth_block = gather_pack * depth_block`` when
    super-packing.

    Args:
      proj_matrices: ``(V, 4, 4)`` or ``(B, V, 4, 4)`` numpy/array.
      depth_values: ``(D,)`` or ``(B, D)`` sweep depths.
    """
    import numpy as np

    pm = np.asarray(proj_matrices)
    dv = np.asarray(depth_values)
    if pm.ndim == 3:
        pm = pm[None]
    if dv.ndim == 1:
        dv = dv[None]
    for b in range(pm.shape[0]):
        step = max_depth_step_displacement(
            pm[b, 1:], pm[b, 0], dv[b], height, width
        )
        if (depth_block - 1) * step > (taps - 2.0) * margin:
            return False
    return True


def sweep(
    params,
    features: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    depth_values: jnp.ndarray,
    config: SweepConfig = SweepConfig(),
):
    """Run the full plane-sweep + recurrent regularization.

    Args:
      params: parameter tree from :func:`init_params` / the converter.
      features: ``(V, B, H, W, C)`` per-view features (view 0 = reference).
      proj_matrices: ``(B, V, 4, 4)``.
      depth_values: ``(B, D)`` hypothesis depths in sweep order.

    Returns dict with:
      ``depth``: ``(B, H, W)`` winner-take-all depth.
      ``photometric_confidence``: ``(B, H, W)`` softmax probability of the
        winning hypothesis.
      ``cost_volume``: ``(B, D, H, W)`` regularized cost volume (only if
        ``config.collect_volume``); ``softmax(cost_volume, axis=1)`` is the
        reference's probability volume.
    """
    V, B, H, W, C = features.shape
    D = depth_values.shape[1]
    block = pick_depth_block(D, config.depth_block)
    num_blocks = D // block

    dtype = config.feature_dtype
    features = features.astype(dtype)
    if dtype != jnp.float32:
        # Low-precision sweep: cast parameters once so convs / LSTM gates /
        # omega all stay in the compute dtype (halves HBM traffic; WTA and
        # softmax accumulators below remain fp32).  fp32 master params are
        # untouched outside.
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )
    ref_feat, src_feats = features[0], features[1:]
    # One patch table per source view: each warp sample becomes a single
    # 128-lane gather row (see ops/patch_sample.py).  Optionally stored in
    # fp8 with per-channel scales — half the bytes on the dominant stream.
    if config.packed_rows:
        build_table = functools.partial(
            build_patch_table_packed, taps=config.table_taps)
        build_table_quant = lambda f, dt: build_patch_table_packed_quant(
            f, dt, taps=config.table_taps)
    else:
        build_table = build_patch_table
        build_table_quant = build_patch_table_quant
    if config.table_dtype is not None and config.table_dtype != dtype:
        src_tables, table_scales = jax.vmap(
            lambda f: build_table_quant(f, config.table_dtype)
        )(src_feats)
    else:
        src_tables = jax.vmap(build_table)(src_feats)
        table_scales = None

    ref_proj = proj_matrices[:, 0]
    src_projs = proj_matrices[:, 1:].transpose(1, 0, 2, 3)  # (S, B, 4, 4)
    rot_grids, transes = jax.vmap(
        lambda sp: homography_terms(sp, ref_proj, H, W)
    )(src_projs)

    # View-axis sharding: pin the per-view tables/terms to the mesh's
    # ``view`` axis so each device group warps only its source views.
    mesh = config.mesh
    view_parallel = (
        mesh is not None
        and "view" in mesh.shape
        and mesh.shape["view"] > 1
        and (V - 1) % mesh.shape["view"] == 0
    )
    if view_parallel:
        from jax.sharding import NamedSharding, PartitionSpec

        view0 = NamedSharding(mesh, PartitionSpec("view"))
        src_tables = jax.lax.with_sharding_constraint(src_tables, view0)
        rot_grids = jax.lax.with_sharding_constraint(rot_grids, view0)
        transes = jax.lax.with_sharding_constraint(transes, view0)
        if table_scales is not None:
            table_scales = jax.lax.with_sharding_constraint(table_scales, view0)

    # Gather super-packing: ONE packed gather serves pack*block hypotheses
    # (SweepConfig.gather_pack); the scan runs over super blocks, each
    # consumed by `pack` unrolled regularizer sub-blocks.
    pack = config.gather_pack if config.packed_rows else 1
    if config.gather_pack > 1 and not config.packed_rows:
        raise ValueError("gather_pack > 1 requires packed_rows")
    if config.fused_residual and not config.packed_rows:
        raise ValueError("fused_residual requires packed_rows")
    if pack > 1 and view_parallel:
        raise ValueError("gather_pack > 1 is not supported on a view-sharded mesh")
    if D % (block * pack):
        raise ValueError(
            f"num_depth {D} not divisible by depth_block*gather_pack "
            f"{block}*{pack}"
        )
    num_super = D // (block * pack)
    # (num_super, B, pack*block) sweep-ordered depth super blocks.
    depth_blocks = (
        depth_values.T.reshape(num_super, block * pack, B).transpose(0, 2, 1)
    )

    def regularize_block(states, cost_block):
        def body(states, slice_):
            cost, states = AARMVSNetCore(pallas_gates=config.pallas_gates).apply(
                params, slice_, states, method=AARMVSNetCore.regularize
            )
            return states, cost[..., 0]  # (B, H, W)

        return jax.lax.scan(body, states, cost_block)

    residual_scale = None
    if config.residual_dtype is not None:
        if not (config.packed_rows or config.fold_omega is True):
            raise ValueError(
                "residual_dtype requires packed_rows or fold_omega=True "
                "(the folded cost layouts)"
            )
        # Shared (max over views + ref) per-channel quantization scale so
        # one scale serves every view's residual (kernel-foldable in
        # omega).  fp8 e4m3 maps onto +-448; int8 onto [0, 127] (the
        # squared residual is non-negative).
        a = jnp.maximum(
            jnp.max(jnp.abs(src_feats.astype(jnp.float32)), axis=(0, 1, 2, 3)),
            jnp.max(jnp.abs(ref_feat.astype(jnp.float32)), axis=(0, 1, 2)),
        )
        qmax = 127.0 if config.residual_dtype == jnp.int8 else 448.0
        residual_scale = jnp.maximum((2.0 * a) ** 2 / qmax, 1e-12)
    if config.packed_rows:
        build = functools.partial(
            _build_cost_block_packed, table_taps=config.table_taps,
            residual_scale=residual_scale,
            residual_dtype=config.residual_dtype,
            fused_residual=config.fused_residual,
        )
    elif config.fold_omega == "hybrid":
        build = functools.partial(_build_cost_block, hybrid_omega=True)
    elif config.fold_omega:
        build = functools.partial(
            _build_cost_block_folded,
            residual_scale=residual_scale,
            residual_dtype=config.residual_dtype,
        )
    else:
        build = _build_cost_block

    if view_parallel and config.residual_dtype is not None:
        raise ValueError(
            "residual_dtype is not supported on a view-sharded mesh (the "
            "shared residual scale would be closed over by shard_map)"
        )
    if view_parallel:
        # Manual over the view axis only (data/spatial stay GSPMD-auto):
        # each view group builds the variance over ITS source views; one
        # explicit psum per depth block merges them.  shard_map (not a bare
        # sharding constraint) because jax-level AD then also psums the
        # omega/feature parameter cotangents over view — GSPMD's backward
        # propagation double-counted the regularizer gradients by the view
        # axis size when the same program was expressed with constraints
        # alone (observed on the 8-device CPU mesh; same bug family as the
        # B-major omega merge note below).
        from jax.sharding import PartitionSpec as P

        k = mesh.shape["view"]

        def _view_build(params, ref_feat, tables, rots, trs, dblock, scales):
            local = build(params, ref_feat, tables, rots, trs, dblock, scales)
            return jax.lax.psum(local, "view") / k

        in_specs = (
            P(), P(), P("view"), P("view"), P("view"), P(),
            P("view") if table_scales is not None else P(),
        )
        view_build = jax.shard_map(
            _view_build, mesh=mesh, in_specs=in_specs, out_specs=P(),
            axis_names=frozenset({"view"}),
        )
        build_block = lambda dblock: view_build(
            params, ref_feat, src_tables, rot_grids, transes, dblock,
            table_scales,
        )
    else:
        build_block = lambda dblock: build(
            params, ref_feat, src_tables, rot_grids, transes, dblock,
            table_scales,
        )

    def consume_block(carry, cost_block, depth_block_values):
        """Regularize one sub-block and fold it into the online WTA +
        logsumexp carry (strict > keeps the first maximum, matching the
        reference's running argmax, drmvsnet.py:327-333)."""
        states, depth_img, max_cost, lse = carry
        states, costs = regularize_block(states, cost_block)  # (block,B,H,W)
        costs = costs.astype(jnp.float32)

        block_best = jnp.argmax(costs, axis=0)  # (B, H, W), first max in block
        block_max = jnp.max(costs, axis=0)
        block_depth = jnp.take_along_axis(
            jnp.broadcast_to(depth_block_values.T[:, :, None, None], costs.shape),
            block_best[None], axis=0,
        )[0]
        take_new = block_max > max_cost
        depth_img = jnp.where(take_new, block_depth, depth_img)
        max_cost = jnp.maximum(max_cost, block_max)
        lse = jnp.logaddexp(lse, jax.nn.logsumexp(costs, axis=0))
        return (states, depth_img, max_cost, lse), costs

    def block_step(carry, depth_super):
        if pack == 1:
            cost_block = build_block(depth_super)
            carry, costs = consume_block(carry, cost_block, depth_super)
            ys = costs if config.collect_volume else jnp.zeros((), jnp.float32)
            return carry, ys

        # One packed gather for the whole super block; each sub-block
        # slices its folded (..., block*C) columns (k-major layout).
        if config.fused_residual:
            warped_super = _warp_packed(
                src_tables, rot_grids, transes, depth_super, table_scales,
                dtype, H, W, taps=config.table_taps,
                ref_flat=ref_feat.reshape(B, H * W, C),
                residual_scale=residual_scale,
                residual_dtype=config.residual_dtype,
            )  # (S, B, H, W, pack*block*C) squared residual
        else:
            warped_super = _warp_packed(
                src_tables, rot_grids, transes, depth_super, table_scales,
                dtype, H, W, taps=config.table_taps,
            )  # (S, B, H, W, pack*block*C)
        ys_list = []
        for i in range(pack):
            w_i = jax.tree.map(
                lambda a: jax.lax.slice_in_dim(
                    a, i * block * C, (i + 1) * block * C, axis=4
                ),
                warped_super,
            )
            if config.fused_residual:
                cost_block = _cost_from_residual(
                    params, w_i, C, dtype, residual_scale,
                    config.residual_dtype,
                )
            else:
                cost_block = _cost_from_warped(
                    params, ref_feat, w_i, residual_scale,
                    config.residual_dtype,
                )
            dvals = jax.lax.slice_in_dim(
                depth_super, i * block, (i + 1) * block, axis=1
            )
            carry, costs = consume_block(carry, cost_block, dvals)
            if config.collect_volume:
                ys_list.append(costs)
        ys = (
            jnp.concatenate(ys_list, axis=0) if config.collect_volume
            else jnp.zeros((), jnp.float32)
        )
        return carry, ys

    if config.remat:
        block_step = jax.checkpoint(block_step)

    init_carry = (
        init_states(B, H, W, dtype=dtype),
        jnp.zeros((B, H, W), jnp.float32),
        jnp.full((B, H, W), -jnp.inf, jnp.float32),
        jnp.full((B, H, W), -jnp.inf, jnp.float32),
    )
    (states, depth_img, max_cost, lse), ys = jax.lax.scan(
        block_step, init_carry, depth_blocks
    )

    out = {
        "depth": depth_img,
        "photometric_confidence": jnp.exp(max_cost - lse),
    }
    if config.collect_volume:
        # ys: (num_blocks, block, B, H, W) -> (B, D, H, W)
        out["cost_volume"] = ys.reshape(D, B, H, W).transpose(1, 0, 2, 3)
    return out


def forward(
    params,
    imgs: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    depth_values: jnp.ndarray,
    config: SweepConfig = SweepConfig(),
):
    """Full forward: features + sweep.  ``imgs``: ``(B, V, H, W, 3)``."""
    features = extract_features(params, imgs, dtype=config.feature_dtype,
                                view_chunk=config.feature_view_chunk)
    return sweep(params, features, proj_matrices, depth_values, config)


def probability_volume(cost_volume: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the depth axis (reference drmvsnet.py:291)."""
    return jax.nn.softmax(cost_volume, axis=1)
