"""Patch-table bilinear sampling — the TPU-fast warp gather.

Naive bilinear sampling performs 4 row-gathers of C=32 channels per sample;
on TPU each 32-lane row is padded to 128 lanes, so 75% of every gathered
byte is padding and the op runs at random-access latency (measured: the
cost-volume build at 432x576 spent ~220 ms *per depth hypothesis* in these
gathers).

This module instead precomputes, once per source view, a **patch table**:
row ``p = y*W + x`` holds the 2x2 neighborhood ``[f(y,x), f(y,x+1),
f(y+1,x), f(y+1,x+1)]`` flattened to ``4C = 128`` lanes — exactly one TPU
vector register row, zero padding waste.  Each warp sample then costs ONE
gather row, and the bilinear blend is a lane-wise tent-weight multiply +
4-group reduction.

Zero-padding semantics (torch grid_sample ``padding_mode='zeros'``,
align_corners=True — reference models/module.py:36) fall out naturally:
the table is built from a zero-padded feature map, and the tent weights
``max(0, 1-|coord - corner|)`` evaluate to the correct bilinear weights for
every clamping case (in-bounds, straddling the border, fully outside).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

#: max finite magnitude of float8_e4m3fn — quantization scales map each
#: channel's abs-max onto this.
_F8_MAX = 448.0


def build_patch_table(feat: jnp.ndarray) -> jnp.ndarray:
    """Precompute the 2x2-neighborhood table for a feature map.

    Args:
      feat: ``(B, H, W, C)``.

    Returns:
      ``(B, H*W, 4*C)`` table; row ``y*W + x`` is the flattened
      ``[(y,x), (y,x+1), (y+1,x), (y+1,x+1)]`` neighborhood, with
      out-of-image texels equal to zero.
    """
    B, H, W, C = feat.shape
    padded = jnp.pad(feat, ((0, 0), (0, 1), (0, 1), (0, 0)))
    table = jnp.concatenate(
        [
            padded[:, :H, :W],
            padded[:, :H, 1 : W + 1],
            padded[:, 1 : H + 1, :W],
            padded[:, 1 : H + 1, 1 : W + 1],
        ],
        axis=-1,
    )
    return table.reshape(B, H * W, 4 * C)


def build_patch_table_quant(feat: jnp.ndarray, dtype=jnp.float8_e4m3fn):
    """Quantized patch table: half (vs bf16) the gather bytes per sample.

    The warp gather is HBM-bandwidth-bound (BENCHMARKS.md), so storing the
    table in fp8 directly halves the dominant byte stream of the cost-volume
    build.  e4m3 has 3 mantissa bits; to spend them on each channel's own
    dynamic range we quantize with a **per-channel scale** (abs-max over
    H, W mapped onto the fp8 max) and dequantize after the gather — one
    lane-wise multiply on the gathered row.

    Args:
      feat: ``(B, H, W, C)`` feature map (any float dtype).

    Returns:
      ``(table, scale)``: ``table`` is ``(B, H*W, 4C)`` in ``dtype``;
      ``scale`` is ``(B, 1, 4C)`` fp32 dequantization factors (the
      per-channel scale tiled over the 4 patch corners), for the ``scale=``
      argument of :func:`patch_bilinear_sample`.
    """
    B, H, W, C = feat.shape
    feat32 = feat.astype(jnp.float32)
    amax = jnp.max(jnp.abs(feat32), axis=(1, 2), keepdims=True)  # (B,1,1,C)
    if dtype == jnp.int8:
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(feat32 / scale), -127, 127).astype(dtype)
    else:
        scale = jnp.maximum(amax / _F8_MAX, 1e-12)
        q = (feat32 / scale).astype(dtype)
    table = build_patch_table(q)
    return table, jnp.tile(scale.reshape(B, 1, C), (1, 1, 4))


def patch_bilinear_sample(
    table: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    height: int,
    width: int,
    scale: jnp.ndarray | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Bilinear-sample using a precomputed patch table.

    Args:
      table: ``(B, H*W, 4C)`` from :func:`build_patch_table` (or the
        quantized variant).
      x, y: ``(B, N)`` fractional pixel coordinates (fp32).
      height, width: source image size (table geometry).
      scale: optional ``(B, 1, 4C)`` dequantization factors from
        :func:`build_patch_table_quant`.
      compute_dtype: dtype of the blend & output; defaults to the table
        dtype (required when the table is fp8 — fp8 arithmetic is
        storage-only).

    Returns:
      ``(B, N, C)`` samples in ``compute_dtype``; zero where out of bounds.
    """
    B, HW, C4 = table.shape
    C = C4 // 4
    out_dtype = compute_dtype or table.dtype

    # Coordinate / index math MUST be fp32: bf16 integers step by 2 above
    # 256 and by 4 above 512, so low-precision coordinates silently gather
    # the wrong row (or out of bounds) on any image taller than 256 px.
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xb = jnp.clip(jnp.floor(x), 0, width - 1)
    yb = jnp.clip(jnp.floor(y), 0, height - 1)
    idx = (yb * width + xb).astype(jnp.int32)

    rows = jnp.take_along_axis(table, idx[..., None], axis=1)  # (B, N, 4C)
    rows = rows.astype(out_dtype)
    if scale is not None:
        rows = rows * scale.astype(out_dtype)

    tent = lambda d: jnp.maximum(0.0, 1.0 - jnp.abs(d))
    tx0, tx1 = tent(x - xb), tent(x - (xb + 1.0))
    ty0, ty1 = tent(y - yb), tent(y - (yb + 1.0))
    w4 = jnp.stack([ty0 * tx0, ty0 * tx1, ty1 * tx0, ty1 * tx1], axis=-1)

    patches = rows.reshape(B, -1, 4, C)
    return jnp.sum(patches * w4.astype(out_dtype)[..., None], axis=2)


def build_patch_table4(feat: jnp.ndarray) -> jnp.ndarray:
    """4x4-neighborhood table: row ``y*W + x`` holds the 16 texels
    ``[(y..y+3) x (x..x+3)]`` flattened to ``16*C = 512`` lanes (for C=32:
    four full TPU vector rows, zero lane-padding waste).

    One row serves a GROUP of samples whose bilinear footprints all fit in
    the 4x4 window — in the plane sweep, several consecutive depth
    hypotheses at the same pixel (see :func:`patch_bilinear_sample_packed`).
    On gather-row-rate-limited backends (BENCHMARKS.md round-2: ~38 Mrows/s
    at 128 lanes vs ~25 Mrows/s at 512 on the tunnel chip) serving K depths
    per row cuts warp-gather time ~K/1.6-fold.

    HBM COST: the 16-tap table materializes a 16x copy of each source
    feature map (vs 4x for the 2x2 table) — at the north-star config
    (1152x864, C=32, 4 src views) that is ~2 GB bf16 / ~500 MB fp8 of
    tables vs ~500 MB / ~127 MB for the 2x2 variant.  Budget for it before
    enabling packed mode on memory-tight configs (e.g. large spatial tiles
    with collect_volume=True).
    """
    return build_patch_table_packed(feat, taps=4)


def build_patch_table_packed(feat: jnp.ndarray, taps: int = 4) -> jnp.ndarray:
    """``taps x taps``-neighborhood table: row ``y*W + x`` holds the
    ``taps^2`` texels ``[(y..y+taps-1) x (x..x+taps-1)]`` flattened to
    ``taps^2 * C`` lanes (zero lane-padding for C=32 and taps in {2,4,6}:
    128/512/1152 lanes are all multiples of 128).

    One row serves a GROUP of samples whose bilinear footprints fit the
    window — span limit ``taps - 2`` px per axis.  taps=6 trades 2.25x the
    table HBM of taps=4 for a 4 px span, i.e. K~2x more depth hypotheses
    per gather row at the same scene geometry (the round-3 '6x6 tables'
    lever, affordable now that ``gather_pack`` keeps the per-sub-block
    program at the proven block-8 size)."""
    B, H, W, C = feat.shape
    padded = jnp.pad(feat, ((0, 0), (0, taps - 1), (0, taps - 1), (0, 0)))
    views = [
        padded[:, dy : H + dy, dx : W + dx]
        for dy in range(taps)
        for dx in range(taps)
    ]
    return jnp.concatenate(views, axis=-1).reshape(B, H * W, taps * taps * C)


def build_patch_table4_quant(feat: jnp.ndarray, dtype=jnp.float8_e4m3fn):
    """fp8 variant of :func:`build_patch_table4` (per-channel scales as in
    :func:`build_patch_table_quant`).  Returns ``(table, scale)`` with
    ``scale`` shaped ``(B, 1, 16C)``."""
    return build_patch_table_packed_quant(feat, dtype, taps=4)


def build_patch_table_packed_quant(
    feat: jnp.ndarray, dtype=jnp.float8_e4m3fn, taps: int = 4
):
    """Quantized variant of :func:`build_patch_table_packed`; ``scale`` is
    ``(B, 1, taps^2 * C)``.

    ``dtype=jnp.int8`` stores the table as per-channel-amax-scaled int8
    (uniform 1/127 resolution — comparable to e4m3's ~3 mantissa bits on
    post-GN features, and it unlocks the MXU-native int8 blend path in
    :func:`patch_bilinear_sample_packed`: the dot consumes the int8 rows
    DIRECTLY, so the bf16 dequantized-patches temp — the blend's largest
    HBM stream, scripts/probe_cost_block.py — never materializes)."""
    B, H, W, C = feat.shape
    feat32 = feat.astype(jnp.float32)
    amax = jnp.max(jnp.abs(feat32), axis=(1, 2), keepdims=True)
    if dtype == jnp.int8:
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(feat32 / scale), -127, 127).astype(dtype)
    else:
        scale = jnp.maximum(amax / _F8_MAX, 1e-12)
        q = (feat32 / scale).astype(dtype)
    table = build_patch_table_packed(q, taps=taps)
    return table, jnp.tile(scale.reshape(B, 1, C), (1, 1, taps * taps))


#: default per-tile budget for the packed blend's padded temporaries;
#: overridable for experiments via AA_RMVSNET_TILE_MB.  Round-5 sweep at
#: the north-star config (maps/s): 8 MB 0.0363, 32 MB 0.0382, **64 MB
#: 0.0385 (default)**, 96 MB 0.0370, 128 MB 0.0373, 512 MB 0.0346 —
#: smaller tiles keep the blend's dequantized-patch and tent-weight temps
#: closer to VMEM (the cost-block attribution probe showed those temps,
#: not the blend output, are the stream: scripts/probe_cost_block.py),
#: until loop overhead dominates below ~16 MB.
#: The budget is PER SOURCE VIEW: the blend runs under ``jax.vmap`` over S
#: views in the cost build, so total live padded temps are ~S x this
#: value.  The batch axis B *is* folded into the estimate.
_TILE_TARGET_BYTES = int(os.environ.get("AA_RMVSNET_TILE_MB", "64")) * 2**20


def _packed_tile_pixels(G: int, K: int, out_itemsize: int,
                        target_bytes: int | None = None,
                        batch: int = 1, row_lanes: int = 512) -> int:
    """Largest divisor of G whose per-tile blend intermediates stay under
    ``target_bytes`` (estimated at the TPU-padded size: the gathered-row
    temp carries ``row_lanes = taps^2 * C`` lanes per (pixel, K)).
    ``target_bytes`` is a per-source-view budget (see
    ``_TILE_TARGET_BYTES``)."""
    if target_bytes is None:
        target_bytes = _TILE_TARGET_BYTES
    per_px = batch * K * row_lanes * out_itemsize
    max_gt = max(1, target_bytes // per_px)
    if G <= max_gt:
        return G
    for d in range(int(max_gt), 0, -1):
        if G % d == 0:
            return d
    return 1


def patch_bilinear_sample_packed(
    table: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    height: int,
    width: int,
    scale: jnp.ndarray | None = None,
    compute_dtype=None,
    folded_out: bool = False,
    tile_target_bytes: int | None = None,
    taps: int = 4,
    ref: jnp.ndarray | None = None,
    residual_inv_scale: jnp.ndarray | None = None,
    residual_dtype=None,
) -> jnp.ndarray:
    """Bilinear-sample K grouped coordinates per ONE ``taps x taps``-patch
    gather row.

    Args:
      table: ``(B, H*W, taps^2 * C)`` from :func:`build_patch_table_packed`.
      x, y: ``(B, G, K)`` fractional pixel coordinates; the K samples of a
        group share one gather (in the sweep: one pixel, K consecutive
        depth hypotheses).
      scale: optional ``(B, 1, taps^2 * C)`` dequantization factors.
      taps: window size per axis (4 or 6); the exactness span limit is
        ``taps - 2`` px.
      folded_out: return ``(B, G, K*C)`` (the depth-folded layout the cost
        build consumes, minor axis ``K*C`` lanes — no padding for K*C a
        multiple of 128/dtype-tile) instead of ``(B, G, K, C)``.
      ref: optional ``(B, G, C)`` reference features per group (in the
        sweep: the reference-view feature at the group's pixel).  When
        given, the tile emits the **squared residual** ``(blend - ref)**2``
        instead of the raw samples — the full-frame warped volume then
        never exists in HBM (at the north-star config it is ~131 GB/map of
        write+read traffic, the sweep's largest non-gather stream).  The
        subtraction runs on the K*C-folded layout (no padded minor-C temp —
        the round-3 in-tile-residual dead end subtracted BEFORE folding).
        Requires ``folded_out=True``.
      residual_inv_scale: optional ``(C,)`` inverse quantization scale for
        the residual (``1 / SweepConfig residual scale``), applied in
        ``compute_dtype`` exactly like the unfused path.
      residual_dtype: optional storage dtype for the emitted residual
        (e.g. fp8); applied after ``residual_inv_scale``.

    Returns:
      ``(B, G, K, C)`` samples (``(B, G, K*C)`` when ``folded_out``).

    MEMORY: the blend runs over PIXEL TILES (``lax.map``) sized so the
    per-tile einsum temporaries stay ~128 MB at their TPU-padded size —
    a full-frame blend at the north-star config would materialize
    (S, 1M, K, 4, 32) temps whose 32-lane minor axis pads 4-16x (observed
    15 GB + 7.6 GB HLO temps -> OOM).  Tiling is invisible numerically.

    EXACTNESS CONTRACT: results equal per-sample bilinear (torch
    grid_sample zeros / align_corners=True semantics) iff every group's
    coordinate span satisfies ``max-min <= taps - 2`` px in both axes —
    then each sample's 2x2 footprint lies inside the window anchored at
    the group-min floor (out-of-image texels are zero in the table, and
    taps farther than 1 px get zero tent weight, reproducing every border
    case).  The caller must guarantee the span bound — in the plane sweep
    it follows from ``(K-1) * max per-depth-step displacement <= taps-2``,
    checked on host by ``models.network.max_depth_step_displacement``.
    Groups violating the bound silently lose taps; do not use without the
    check.
    """
    import jax

    B, G, K = x.shape
    _, HW, CT = table.shape
    T = taps
    C = CT // (T * T)
    out_dtype = compute_dtype or table.dtype
    if ref is not None and not folded_out:
        raise ValueError("ref (fused residual) requires folded_out=True")

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    gt = _packed_tile_pixels(G, K, jnp.dtype(out_dtype).itemsize,
                             tile_target_bytes, batch=B, row_lanes=T * T * C)
    num_tiles = G // gt
    tap_pos = jnp.arange(float(T))
    tent = lambda d: jnp.maximum(0.0, 1.0 - jnp.abs(d))
    inv_kc = (
        None if residual_inv_scale is None
        else jnp.tile(residual_inv_scale.astype(out_dtype), (K,))
    )

    def blend_tile(args):
        if ref is None:
            xt, yt = args  # (B, gt, K)
            rt = None
        else:
            xt, yt, rt = args  # rt: (B, gt, C)
        # Group anchor: min floor, clipped into the image like the 2x2
        # path — every clamping case again falls out of zero-padding +
        # tent weights.
        ax = jnp.clip(jnp.floor(jnp.min(xt, axis=2)), 0, width - 1)  # (B, gt)
        ay = jnp.clip(jnp.floor(jnp.min(yt, axis=2)), 0, height - 1)
        idx = (ay * width + ax).astype(jnp.int32)

        rows = jnp.take_along_axis(table, idx[..., None], axis=1)  # (B,gt,T*T*C)

        # Per-sample tent weights over the T patch rows / cols, combined
        # into ONE (B, gt, K, T^2) tap-weight tensor so the whole blend is
        # a single batched (K x T^2) @ (T^2 x C) contraction — the
        # two-stage separable form materialized a (B, gt, K, T, C) minor-C
        # temp whose 4x lane padding made the blend HBM-bound (~0.3 s/block
        # at the north-star config).
        wx = tent(xt[..., None] - (ax[:, :, None, None] + tap_pos))  # (B,gt,K,T)
        wy = tent(yt[..., None] - (ay[:, :, None, None] + tap_pos))
        w16 = (wy[..., :, None] * wx[..., None, :]).reshape(B, gt, K, T * T)

        if table.dtype == jnp.int8:
            # MXU-native int8 blend: the dot consumes the gathered int8
            # rows DIRECTLY (no bf16 dequantized-patches temp — the
            # blend's largest HBM stream) and the tent weights are
            # quantized onto a 1/127 grid (error <= 0.4% per tap; exact
            # zeros stay zero, preserving the padding semantics).  The
            # per-channel table scale and the 1/127 weight step fold into
            # ONE multiply on the small (K*C) output.
            patches = rows.reshape(B, gt, T * T, C)
            w16q = jnp.clip(jnp.round(w16 * 127.0), 0, 127).astype(jnp.int8)
            out32 = jnp.einsum(
                "bgkt,bgtc->bgkc", w16q, patches,
                preferred_element_type=jnp.int32,
            )
            s_c = scale[:, :, :C].astype(out_dtype) / 127.0  # (B, 1, C)
            out = out32.astype(out_dtype) * s_c[:, :, None, :]
        else:
            rows = rows.astype(out_dtype)
            if scale is not None:
                rows = rows * scale.astype(out_dtype)
            patches = rows.reshape(B, gt, T * T, C)  # (B, gt, tap, C)
            out = jnp.einsum(
                "bgkt,bgtc->bgkc", w16.astype(out_dtype), patches
            )
        # Fold (K, C) -> K*C inside the tile: the stacked full-frame result
        # then never exists in a 32-lane-minor layout.
        out = out.reshape(B, gt, K * C)
        if rt is not None:
            # Fused residual epilogue on the folded layout — same op order
            # as the unfused path (subtract, square, inv-scale multiply in
            # compute dtype, cast — round+clip for int8), so results are
            # bitwise identical to it.
            out = (out - jnp.tile(rt.astype(out_dtype), (1, 1, K))) ** 2
            if inv_kc is not None:
                out = out * inv_kc
            if residual_dtype == "dual":
                # Dual-output: fp8 for the variance (keeps its precision
                # profile) + an int8 copy for omega's MXU-native conv.
                # The fp8-scaled value spans [0, 448]; x 127/448 maps its
                # amax onto the int8 grid (dequant scale = s8 * 448/127).
                i8 = jnp.clip(
                    jnp.round(out.astype(jnp.float32) * (127.0 / 448.0)),
                    0, 127,
                ).astype(jnp.int8)
                return out.astype(jnp.float8_e4m3fn), i8
            if residual_dtype == jnp.int8:
                out = jnp.clip(jnp.round(out.astype(jnp.float32)), 0, 127)
            if residual_dtype is not None:
                out = out.astype(residual_dtype)
        return out

    if num_tiles == 1:
        out = blend_tile((x, y) if ref is None else (x, y, ref))
    else:
        xs = (
            x.reshape(B, num_tiles, gt, K).transpose(1, 0, 2, 3),
            y.reshape(B, num_tiles, gt, K).transpose(1, 0, 2, 3),
        )
        if ref is not None:
            xs = xs + (
                ref.reshape(B, num_tiles, gt, C).transpose(1, 0, 2, 3),
            )
        out = jax.lax.map(blend_tile, xs)  # (T, B, gt, K*C) (or a tuple)
        out = jax.tree.map(
            lambda o: o.transpose(1, 0, 2, 3).reshape(B, G, K * C), out
        )
    if folded_out:
        return out
    return jax.tree.map(lambda o: o.reshape(B, G, K, C), out)
