"""Inference driver: generate per-view depth / confidence maps for a scene
list and write them in the reference's on-disk layout so the fusion stage
is drop-in compatible.

Output layout (reference: eval.py:130-147)::

    <out_root>/<scan>/depth_est_0/<ref_view:08d>.pfm
    <out_root>/<scan>/confidence_0/<ref_view:08d>.pfm
    [<out_root>/<scan>/{epistemic_0,aleatoric_0}/<ref_view:08d>.pfm]

By default the depth map is the winner-take-all depth from the core
network — the path that produced the published DTU/TnT numbers
(reference drmvsnet.py:300-339) — NOT the fork's evidential γ
(quirk ledger, SURVEY §7.4).  With an evidential head attached,
``depth_source="evidential"`` reproduces the fork's behavior and the
uncertainty maps are written alongside.

TPU notes: one jit cache entry per input shape — scenes are processed
grouped by shape (the eval datasets produce one shape per scene family);
the sweep runs with ``collect_volume=False`` so HBM stays O(depth_block).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..core.pfm import save_pfm
from ..models.network import SweepConfig, forward
from ..data.loader import prefetch_samples


@dataclass
class InferConfig:
    out_root: str
    depth_block: int = 8
    feature_dtype: Any = jnp.bfloat16
    depth_source: str = "wta"  # "wta" | "evidential"
    evidential_params: Any = None  # optional evidential head params
    save_png_previews: bool = False
    num_workers: int = 8
    fold_omega: Any = False  # False | "hybrid" | True (SweepConfig.fold_omega)
    # "auto" resolves per sample via the pick_packed_rows exactness gate
    # (one 4x4 row per (view, pixel) serving the whole depth block; the
    # gather-row-count lever, SweepConfig.packed_rows).
    packed_rows: Any = "auto"  # "auto" | True | False
    pallas_gates: bool = False  # fused ConvLSTM gate kernel
    table_dtype: Any = None  # e.g. jnp.float8_e4m3fn for fp8 warp tables
    # Gather super-packing + window size + fp8 residual storage (the
    # round-4 packed-path levers; SweepConfig docstrings).  gather_pack /
    # table_taps take effect only where the packed exactness gate passes
    # at span (taps-2) px for gather_pack*depth_block hypotheses —
    # resolve_packed() gates per sample.
    gather_pack: int = 1
    table_taps: int = 4
    residual_dtype: Any = None  # e.g. jnp.float8_e4m3fn (approximate!)
    # Fused-residual blend epilogue (SweepConfig.fused_residual): bitwise
    # identical to the unfused chain on packed samples; no-op elsewhere.
    fused_residual: bool = True
    pack_margin: float = 0.95
    # FeatNet view chunking (0 = all views at once): bounds feature
    # extraction's peak HBM at big sizes (SweepConfig.feature_view_chunk).
    feature_view_chunk: int = 0
    # Multi-device fan-out: with a mesh whose ``data`` axis is > 1, samples
    # are bucketed by shape into batches of that size and sharded across
    # the axis — one jit cache entry per (shape, batch) instead of a strict
    # serial B=1 loop.  Ragged tails are padded by repeating the last
    # sample (the padded outputs are dropped before saving).
    # With a ``spatial`` axis > 1, each sample's image rows are additionally
    # sharded across it (GSPMD inserts conv halo exchanges), so ONE map can
    # span several chips' HBM — the tiled high-res inference path
    # (BASELINE north-star: "halo exchange for tiled high-res inference").
    # H must divide by the spatial axis size.
    # With a ``depth`` axis > 1 (exclusive with data/spatial fan-out and
    # with an evidential head), batches of same-shape samples stream
    # through the depth-block pipeline (parallel/depth_pipeline.py): each
    # device owns one depth chunk, the ConvLSTM carry crosses devices via
    # ppermute, and per-map latency drops ~Px once the pipeline fills.
    mesh: Any = None
    # Maps per pipeline launch when the mesh has a depth axis; more maps
    # amortize the P-1 fill/drain bubble but hold more patch tables in
    # HBM.  Default 2*P.
    pipeline_maps: int | None = None


def _jitted_forward(config: InferConfig, with_volume: bool,
                    mode=(False, 1, 4)):
    packed, gather_pack, table_taps = mode
    # fp8 residual storage applies on the folded cost layouts: packed rows
    # OR fold_omega=True (the minimum-peak-HBM recipe for sizes where
    # packed tables don't fit) — a sample degraded to the unpacked path
    # keeps the lever when fold_omega=True instead of silently dropping it
    # (ADVICE r4).
    residual_dtype = (
        config.residual_dtype if (packed or config.fold_omega is True)
        else None
    )
    if config.residual_dtype is not None and residual_dtype is None:
        print(
            "WARNING: fp8 residual storage dropped for an unpacked sample "
            "(requires packed rows or --fold_omega=1)", flush=True,
        )
    sweep_config = SweepConfig(
        depth_block=config.depth_block,
        collect_volume=with_volume,
        feature_dtype=config.feature_dtype,
        fold_omega=config.fold_omega,
        pallas_gates=config.pallas_gates,
        table_dtype=config.table_dtype,
        packed_rows=packed,
        gather_pack=gather_pack if packed else 1,
        table_taps=table_taps if packed else 4,
        residual_dtype=residual_dtype,
        fused_residual=config.fused_residual and packed,
        feature_view_chunk=config.feature_view_chunk,
    )

    @jax.jit
    def run(params, imgs, proj, depths):
        return forward(params, imgs, proj, depths, sweep_config)

    return run


def save_outputs(out_dir: str, ref_view: int, depth: np.ndarray, confidence: np.ndarray,
                 uncertainty: dict | None = None, save_png: bool = False):
    name = f"{ref_view:08d}"
    os.makedirs(os.path.join(out_dir, "depth_est_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "confidence_0"), exist_ok=True)
    save_pfm(os.path.join(out_dir, "depth_est_0", name + ".pfm"), depth.astype(np.float32))
    save_pfm(os.path.join(out_dir, "confidence_0", name + ".pfm"), confidence.astype(np.float32))
    if uncertainty:
        for key, arr in uncertainty.items():  # e.g. epistemic_0 / aleatoric_0
            os.makedirs(os.path.join(out_dir, key), exist_ok=True)
            save_pfm(os.path.join(out_dir, key, name + ".pfm"), arr.astype(np.float32))
    if save_png:
        # PNG previews for EVERY map family the PFMs are written for
        # (reference eval.py:158-160 writes depth/confidence/uncertainty
        # previews via datasets/data_io.py:77-128): depth uses the inverted
        # jet colormap, confidence/uncertainty the min-max "relative" mode.
        from ..utils.visualize import save_depth_png

        os.makedirs(os.path.join(out_dir, "depth_png_0"), exist_ok=True)
        save_depth_png(os.path.join(out_dir, "depth_png_0", name + ".png"), depth)
        os.makedirs(os.path.join(out_dir, "confidence_png_0"), exist_ok=True)
        save_depth_png(
            os.path.join(out_dir, "confidence_png_0", name + ".png"),
            confidence, mode="relative",
        )
        if uncertainty:
            for key, arr in uncertainty.items():
                png_dir = os.path.join(out_dir, key.replace("_0", "_png_0"))
                os.makedirs(png_dir, exist_ok=True)
                save_depth_png(
                    os.path.join(png_dir, name + ".png"), arr, mode="relative"
                )


def resolve_packed_mode(sample, config: InferConfig):
    """Resolve the packed-execution mode ``(packed, gather_pack, taps)``
    for one sample: the requested lever set where its exactness gate (and
    the depth-count divisibility the sweep requires) passes, degrading
    through plain-packed at the SAME window size (a (2, 4] px span fails
    the super-pack gate but still earns the 6x6 packed speedup, ADVICE
    r4), then plain packed 4x4, then the exact per-depth path.
    ``(gather_pack, 4)`` is provably redundant in the chain: its gate is
    strictly tighter than the already-failed ``(gather_pack, 6)`` one.
    ``packed_rows=True`` forces the packed PATH but the super-pack levers
    stay gated (an ungated gather_pack silently loses bilinear taps —
    patch_sample.py exactness contract)."""
    from ..models.network import pick_depth_block, pick_packed_rows

    H, W = sample["imgs"].shape[1:3]
    D = sample["depth_values"].shape[-1]
    block = pick_depth_block(D, config.depth_block)

    def gate(gp, taps):
        return D % (block * gp) == 0 and pick_packed_rows(
            sample["proj_matrices"], sample["depth_values"], H, W,
            block * gp, margin=config.pack_margin, taps=taps,
        )

    # Mode preference at equal exactness: the 4x4 window BEFORE the 6x6
    # one at each pack level — same row count but 512-lane rows gather
    # 1.6x faster than 1152-lane ones and the tables cost 2.25x less HBM
    # (53.2 vs 32.5 Mrows/s, BENCHMARKS.md row-rate calibration; the r5
    # preset matrix measured the TnT 544x1024 geometry 3% slower when the
    # chain picked 6x6 where 4x4 sufficed).  config.table_taps acts as
    # the window-size CAP.
    modes = []
    for gp in (config.gather_pack, 1):
        for taps in (4, config.table_taps):
            if (gp, taps) not in modes:
                modes.append((gp, taps))
    if config.packed_rows != "auto":
        if not config.packed_rows:
            return (False, 1, 4)
        for gp, taps in modes:
            if (gp, taps) == (1, 4) or gate(gp, taps):
                return (True, gp, taps)
    for gp, taps in modes:
        if gate(gp, taps):
            return (True, gp, taps)
    return (False, 1, 4)


def run_inference(
    params,
    dataset,
    config: InferConfig,
    progress: bool = True,
) -> dict:
    """Generate depth maps for every meta in ``dataset``.

    Returns timing stats ``{count, total_s, maps_per_s}``.
    """
    if config.depth_source == "evidential" and config.evidential_params is None:
        raise ValueError("depth_source='evidential' requires evidential_params")
    # With a head attached, uncertainty maps are always written (reference
    # eval.py:129-169 writes all four PFM dirs); depth_source only decides
    # whether the depth PFM is the WTA depth or the evidential gamma.
    need_volume = config.evidential_params is not None
    # One compiled variant per packed-rows decision ("auto" resolves per
    # sample; scenes in one run usually share geometry, so this stays at a
    # single cache entry in practice).
    _runs: dict = {}

    def get_run(mode):
        if mode not in _runs:
            _runs[mode] = _jitted_forward(
                config, with_volume=need_volume, mode=mode
            )
        return _runs[mode]

    def resolve_packed(sample):
        return resolve_packed_mode(sample, config)

    evidential_apply = None
    if need_volume:
        from ..models.evidential import make_evidential_apply

        evidential_apply = make_evidential_apply(config.evidential_params)

    mesh = config.mesh
    depth_stages = (
        int(mesh.shape.get("depth", 1)) if mesh is not None else 1
    )
    if depth_stages > 1:
        if need_volume:
            raise ValueError(
                "the depth-block pipeline cannot collect the cost volume; "
                "run evidential inference on a data/spatial mesh"
            )
        if mesh.shape.get("data", 1) > 1 or mesh.shape.get("spatial", 1) > 1:
            raise ValueError(
                "depth-pipelined inference uses the depth axis exclusively; "
                "build the mesh with data=1, spatial=1"
            )
        return _run_inference_depth_pipeline(params, dataset, config, progress)

    fanout = 1
    imgs_sharding = flat_sharding = None
    if mesh is not None and (
        mesh.shape.get("data", 1) > 1 or mesh.shape.get("spatial", 1) > 1
    ):
        from jax.sharding import NamedSharding, PartitionSpec

        fanout = int(mesh.shape.get("data", 1))
        # imgs (N, V, H, W, 3): batch over data, image rows over spatial —
        # GSPMD propagates the row sharding through FeatNet / the sweep and
        # inserts conv halo exchanges, so one map may exceed one chip's HBM.
        spatial = "spatial" if mesh.shape.get("spatial", 1) > 1 else None
        imgs_sharding = NamedSharding(
            mesh, PartitionSpec("data", None, spatial)
        )
        flat_sharding = NamedSharding(mesh, PartitionSpec("data"))
        replicated = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, jax.tree.map(lambda _: replicated, params))

    count = 0
    total = 0.0
    failures: list[str] = []

    def flush(group: list, mode) -> float:
        """Run one (possibly padded) batch and save its outputs."""
        nonlocal count
        run = get_run(mode)
        n_real = len(group)
        padded = group + [group[-1]] * (fanout - n_real)
        imgs = jnp.asarray(np.stack([s["imgs"] for s in padded]))
        proj = jnp.asarray(np.stack([s["proj_matrices"] for s in padded]))
        depths = jnp.asarray(np.stack([s["depth_values"] for s in padded]))
        if imgs_sharding is not None:
            imgs = jax.device_put(imgs, imgs_sharding)
            proj, depths = (
                jax.device_put(x, flat_sharding) for x in (proj, depths)
            )

        # The axon TPU tunnel's block_until_ready returns WITHOUT waiting
        # (CLAUDE.md); the timing point must force a device-to-host fetch.
        # np.asarray pulls the whole depth AND confidence batches — both
        # fetches are part of the map's delivery cost, so both sit inside
        # the timed region.
        t0 = time.perf_counter()
        out = run(params, imgs, proj, depths)
        depth_b = np.asarray(out["depth"])
        conf_b = np.asarray(out["photometric_confidence"])
        dt = time.perf_counter() - t0
        ev = None
        if need_volume:
            ev = {k: np.asarray(v) for k, v in
                  evidential_apply(out["cost_volume"], depths).items()}
        for i, sample in enumerate(group):
            depth, conf = depth_b[i], conf_b[i]
            uncertainty = None
            if ev is not None:
                gamma, nu, alpha, beta = (ev[k][i] for k in ("gamma", "nu", "alpha", "beta"))
                uncertainty = {
                    "aleatoric_0": np.sqrt(beta * (nu + 1) / nu / alpha),
                    "epistemic_0": 1.0 / np.sqrt(nu),
                }
                if config.depth_source == "evidential":
                    depth = gamma
            out_dir = os.path.join(config.out_root, sample["scan"])
            save_outputs(out_dir, sample["ref_view"], depth, conf, uncertainty,
                         config.save_png_previews)
            count += 1
            if progress:
                print(f"[{count}/{len(dataset)}] {sample['scan']}/"
                      f"{sample['ref_view']:08d}  {dt / n_real:.3f}s", flush=True)
        return dt

    # Shape-bucketed streaming: scenes come in shape families (the eval
    # datasets emit one shape per family), so bucketing by shape keeps one
    # jit cache entry per family while filling the fan-out batch.
    buckets: dict = {}
    for sample in prefetch_samples(dataset, num_workers=config.num_workers):
        if isinstance(sample, Exception):
            # Loader-side failure (corrupt image, missing cam): skip the
            # view, keep the run alive, and report at the end — unlike the
            # reference's silent bare-except (eval.py:170, quirk ledger).
            failures.append(str(sample))
            print(f"SKIP (load failure): {sample}", flush=True)
            continue
        key = (sample["imgs"].shape, sample["depth_values"].shape,
               resolve_packed(sample))
        bucket = buckets.setdefault(key, [])
        bucket.append(sample)
        if len(bucket) == fanout:
            total += flush(bucket, mode=key[2])
            buckets[key] = []
    for key, bucket in buckets.items():  # ragged tails
        if bucket:
            total += flush(bucket, mode=key[2])

    if failures:
        print(f"run_inference: {len(failures)} sample(s) skipped due to load failures")
    return {
        "count": count,
        "total_s": total,
        "maps_per_s": count / max(total, 1e-9),
        "failures": failures,
    }


def _run_inference_depth_pipeline(params, dataset, config: InferConfig,
                                  progress: bool) -> dict:
    """Depth-pipelined inference: batches of M same-shape maps stream
    through the mesh's ``depth`` axis (parallel/depth_pipeline.py) — the
    single-map-latency path for large scenes (D=512, per-chip batch 1)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from ..models.network import SweepConfig
    from ..parallel.depth_pipeline import pipeline_forward

    mesh = config.mesh
    stages = int(mesh.shape["depth"])
    M = config.pipeline_maps or 2 * stages
    if config.gather_pack > 1 or config.residual_dtype is not None:
        # Surface the dropped levers loudly — a silent drop would make a
        # user benchmark the wrong configuration.
        print(
            "WARNING: --depth_stages pipelining ignores gather_pack / "
            "fp8-residual (single-mesh sweep levers); running without them",
            flush=True,
        )

    params = jax.device_put(
        params, jax.tree.map(
            lambda _: NamedSharding(mesh, PartitionSpec()), params)
    )

    _runs: dict = {}

    def get_run(packed: bool):
        if packed not in _runs:
            sweep_config = SweepConfig(
                depth_block=config.depth_block, collect_volume=False,
                feature_dtype=config.feature_dtype,
                fold_omega=config.fold_omega,
                pallas_gates=config.pallas_gates,
                table_dtype=config.table_dtype, packed_rows=packed,
                # gather_pack / residual_dtype are single-mesh levers; the
                # pipelined sweep takes only the window size.
                table_taps=config.table_taps if packed else 4,
            )
            _runs[packed] = jax.jit(
                lambda p, i, pr, d: pipeline_forward(p, i, pr, d, mesh,
                                                     sweep_config)
            )
        return _runs[packed]

    count = 0
    total = 0.0
    failures: list[str] = []

    def flush(group: list, packed: bool) -> float:
        nonlocal count
        run = get_run(packed)
        padded = group + [group[-1]] * (M - len(group))
        imgs = jnp.asarray(np.stack([s["imgs"] for s in padded]))[:, None]
        proj = jnp.asarray(np.stack([s["proj_matrices"] for s in padded]))[:, None]
        depths = jnp.asarray(np.stack([s["depth_values"] for s in padded]))[:, None]

        t0 = time.perf_counter()
        out = run(params, imgs, proj, depths)
        depth_b = np.asarray(out["depth"])  # host fetches = the timing point
        conf_b = np.asarray(out["photometric_confidence"])
        dt = time.perf_counter() - t0

        for i, sample in enumerate(group):
            save_outputs(
                os.path.join(config.out_root, sample["scan"]),
                sample["ref_view"], depth_b[i, 0], conf_b[i, 0],
                None, config.save_png_previews,
            )
            count += 1
            if progress:
                print(f"[{count}/{len(dataset)}] {sample['scan']}/"
                      f"{sample['ref_view']:08d}  {dt / len(group):.3f}s "
                      f"(pipeline x{stages})", flush=True)
        return dt

    def resolve_packed(sample) -> bool:
        if config.packed_rows != "auto":
            return bool(config.packed_rows)
        from ..models.network import pick_packed_rows

        H, W = sample["imgs"].shape[1:3]
        # The pipelined sweep does not super-pack gathers: gate at
        # depth_block (window size still applies).
        return pick_packed_rows(
            sample["proj_matrices"], sample["depth_values"], H, W,
            config.depth_block,
            margin=config.pack_margin, taps=config.table_taps,
        )

    buckets: dict = {}
    for sample in prefetch_samples(dataset, num_workers=config.num_workers):
        if isinstance(sample, Exception):
            failures.append(str(sample))
            print(f"SKIP (load failure): {sample}", flush=True)
            continue
        key = (sample["imgs"].shape, sample["depth_values"].shape,
               resolve_packed(sample))
        bucket = buckets.setdefault(key, [])
        bucket.append(sample)
        if len(bucket) == M:
            total += flush(bucket, packed=key[2])
            buckets[key] = []
    for key, bucket in buckets.items():
        if bucket:
            total += flush(bucket, packed=key[2])

    if failures:
        print(f"run_inference: {len(failures)} sample(s) skipped due to load failures")
    return {
        "count": count,
        "total_s": total,
        "maps_per_s": count / max(total, 1e-9),
        "failures": failures,
    }
