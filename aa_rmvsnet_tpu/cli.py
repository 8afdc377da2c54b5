"""Command-line entry points: ``python -m aa_rmvsnet_tpu.cli <cmd>``.

Subcommands mirror the reference's three executables (train.py, eval.py,
fusion.py) plus checkpoint conversion and offline analytics:

  eval     generate depth/confidence(/uncertainty) maps for a scene list
  fuse     filter + fuse depth maps into PLY point clouds
  train    train the core network on DTU (``--evidential`` adds the NIG head)
  convert  torch .ckpt -> orbax params directory
  analyze  offline uncertainty analytics over a train logdir's dumps
  quality  point-cloud accuracy/completeness vs a ground-truth cloud
"""

from __future__ import annotations

import argparse
import os
import sys


def _fold_omega_arg(s: str):
    """Strict parser for --fold_omega: {0, 1, hybrid} only — a typo like
    'hybird' must fail loudly, not silently select the slowest path."""
    table = {"0": False, "1": True, "hybrid": "hybrid"}
    if s not in table:
        raise argparse.ArgumentTypeError(
            f"--fold_omega must be 0, 1 or 'hybrid' (got {s!r})"
        )
    return table[s]


def _packed_rows_arg(s: str):
    table = {"0": False, "1": True, "auto": "auto"}
    if s not in table:
        raise argparse.ArgumentTypeError(
            f"--packed_rows must be 0, 1 or 'auto' (got {s!r})"
        )
    return table[s]


def _add_eval(sub):
    p = sub.add_parser("eval", help="generate depth maps")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True, help="file with one scan per line")
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--preset", default="dtu_eval")
    p.add_argument("--loadckpt", help="torch .ckpt or orbax dir (required "
                                      "unless --dry_check)")
    p.add_argument("--dry_check", action="store_true",
                   help="validate the dataset root's structure (pair.txt / "
                        "cams / images, cam-file shapes) and exit without "
                        "running the model")
    p.add_argument("--view_num", type=int)
    p.add_argument("--numdepth", type=int)
    p.add_argument("--max_h", type=int)
    p.add_argument("--max_w", type=int)
    p.add_argument("--depth_block", type=lambda s: s if s == "auto" else int(s),
                   help="hypotheses per scan step, or 'auto' to derive the "
                        "largest block whose HBM estimate fits the chip "
                        "(utils.config.derive_depth_block)")
    p.add_argument("--interval_scale", type=float,
                   help="depth interval scale (reference eval.py default 1.0)")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--inverse_depth", action="store_true",
                   help="open-ended inverse-depth sweep from each cam's "
                        "depth_min (reference eval.py:20)")
    p.add_argument("--evidential_ckpt",
                   help="evidential head weights (torch .ckpt or orbax dir); "
                        "writes epistemic_0/aleatoric_0 maps (reference eval.py:129-169)")
    p.add_argument("--depth_source", choices=["wta", "evidential"],
                   help="depth map source; defaults to 'evidential' when "
                        "--evidential_ckpt is given, else the core WTA depth")
    p.add_argument("--save_png", action="store_true", help="PNG previews")
    p.add_argument("--fold_omega", nargs="?", const=True, default=False,
                   type=_fold_omega_arg,
                   help="cost-block lane-padding lever: bare flag / '1' = "
                        "fully depth-folded layout, 'hybrid' = depth-major "
                        "gather + folded omega only (numerically identical; "
                        "see SweepConfig.fold_omega)")
    p.add_argument("--pallas_gates", action="store_true",
                   help="fused Pallas ConvLSTM gate kernel")
    p.add_argument("--packed_rows", default="auto",
                   type=_packed_rows_arg,
                   help="one 4x4 warp row per (view, pixel) serving the "
                        "whole depth block (gather-row-count lever); "
                        "'auto' (default) enables it per sample when the "
                        "2 px exactness gate passes, 1/0 force on/off")
    p.add_argument("--gather_pack", type=int, default=1,
                   help="ONE packed gather row serves gather_pack*"
                        "depth_block hypotheses (exactness-gated per "
                        "sample; round-4 gather-row lever)")
    p.add_argument("--table_taps", type=int, default=4, choices=[4, 6],
                   help="packed-table window size: 6 stores 2.25x the "
                        "table HBM for a 4 px exactness span (pairs with "
                        "--gather_pack)")
    p.add_argument("--feat_chunk", type=int, default=0,
                   help="FeatNet view-chunk size (0 = all views at once); "
                        "bounds feature-extraction peak HBM at big sizes")
    p.add_argument("--fp8_residual", action="store_true",
                   help="store the squared residual in fp8 (APPROXIMATE; "
                        "see the quality gate in tests/test_models.py)")
    p.add_argument("--dual_residual", action="store_true",
                   help="store the squared residual TWICE: an fp8 copy "
                        "for the variance (its precision profile) + an "
                        "int8 copy consumed by omega's MXU-native conv — "
                        "the quality-safe int8-residual variant "
                        "(fp8-level guardrails, ~1% faster than fp8)")
    p.add_argument("--int8_residual", action="store_true",
                   help="store the squared residual in int8 and feed "
                        "omega's rw0 conv the quantized tensor directly "
                        "(MXU-native int8 conv, no bf16 convert; ~3% "
                        "faster than fp8 residual but LOSSIER on the "
                        "small-residual end — gate with "
                        "scripts/eval_scale_gate.py before production)")
    p.add_argument("--no_fused_residual", action="store_true",
                   help="disable the fused-residual blend epilogue on "
                        "packed samples (bitwise-identical lever that "
                        "avoids materializing the warped volume; on by "
                        "default)")
    p.add_argument("--fp8_tables", action="store_true",
                   help="fp8-quantized warp patch tables (half the bytes on "
                        "the dominant gather stream)")
    p.add_argument("--int8_tables", action="store_true",
                   help="int8-quantized warp patch tables + MXU-native "
                        "int8 blend on packed samples (same bytes as fp8, "
                        "no bf16 dequantized-patches temp; measured MORE "
                        "accurate than fp8 — tests/test_models.py)")
    p.add_argument("--fanout", type=int, default=1,
                   help="shard batches of N same-shape samples across a "
                        "data mesh axis of N devices (eval fleet mode)")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard each map's image rows across N devices "
                        "(halo-exchange tiled inference: one map may "
                        "exceed one chip's HBM; H must divide by N)")
    p.add_argument("--depth_stages", type=int, default=1,
                   help="pipeline depth chunks across N devices (ConvLSTM "
                        "carry handed over via ppermute; exclusive with "
                        "--fanout/--spatial and --evidential_ckpt)")
    p.add_argument("--pipeline_maps", type=int, default=None,
                   help="maps per depth-pipeline launch (default 2x stages)")
    return p


def _add_fuse(sub):
    p = sub.add_parser("fuse", help="consistency filter + point-cloud fusion")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--test_dataset", choices=["dtu", "tnt", "tnt_padded"], default="dtu")
    p.add_argument("--photo_threshold", type=float)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--host_id", type=int, default=0, help="scan-shard index")
    p.add_argument("--view_block", type=int, default=None,
                   help="fuse only this contiguous ref-view block of each "
                        "scan (0-based; distributes ONE large scan — e.g. "
                        "a 300+-view TnT-advanced scene — across hosts). "
                        "Writes <ply>.block<I>of<N>; run 'fuse' once more "
                        "with --merge_blocks after all blocks finish")
    p.add_argument("--num_view_blocks", type=int, default=1,
                   help="total ref-view blocks per scan")
    p.add_argument("--merge_blocks", action="store_true",
                   help="merge previously written per-view-block PLYs into "
                        "the final per-scan cloud (vertex order identical "
                        "to a single-host fuse)")
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--display", action="store_true",
                   help="interactively show ref image + photo/geo/final "
                        "masks per view (reference fusion.py:238-244); "
                        "needs a GUI — headless hosts get the same masks "
                        "as PNGs via save_masks")
    p.add_argument("--save_masks", action="store_true",
                   help="write photo/geo/final masks as PNGs under "
                        "<outdir>/<scan>/mask/")
    return p


def _add_train(sub):
    p = sub.add_parser("train", help="train the core network on DTU")
    p.add_argument("--trainpath", required=True)
    p.add_argument("--trainlist", required=True)
    p.add_argument("--vallist")
    p.add_argument("--logdir", default="checkpoints_tpu")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=1,
                   help="PER-PROCESS batch size (global = this x num_processes)")
    p.add_argument("--view_num", type=int, default=5)
    p.add_argument("--numdepth", type=int, default=128)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--image_scale", type=float, default=0.25)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--loadckpt")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_steps", type=int, help="early stop (smoke tests)")
    p.add_argument("--summary_freq", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=8)
    # Evidential (NIG) head training — the fork's production loss
    # (reference train.py:120-121, 234-237).
    p.add_argument("--evidential", action="store_true",
                   help="attach the evidential head and train with loss_emvsnet")
    p.add_argument("--head_ckpt",
                   help="warm-start head weights (torch .ckpt or orbax dir)")
    p.add_argument("--maxdisp", type=int, default=32)
    # Multi-chip / multi-host: build a (data, spatial) mesh over all global
    # devices; new TPU-native scope (the reference is single-GPU, SURVEY §2.2).
    p.add_argument("--coordinator", help="host:port of process 0 (multi-host)")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial (height) mesh axis size; data axis = "
                        "num_devices / spatial")
    p.add_argument("--single_device", action="store_true",
                   help="skip mesh construction even with multiple devices")
    return p


def _add_convert(sub):
    p = sub.add_parser("convert", help="torch .ckpt -> orbax params directory")
    p.add_argument("--ckpt", required=True, help="reference torch .ckpt")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--evidential", action="store_true",
                   help="convert the evidential.* head tensors instead of the core")
    return p


def _add_analyze(sub):
    p = sub.add_parser("analyze", help="offline uncertainty analytics over "
                                       "a train logdir's .npz dumps")
    p.add_argument("--logdir", required=True)
    p.add_argument("--mode", default="train", choices=["train", "fulltest"])
    p.add_argument("--out", help="report directory (default <logdir>/analysis)")
    p.add_argument("--error_threshold", type=float, default=2.0,
                   help="depth-error threshold (mm) for ROC/PR labels")
    return p


def _add_viz(sub):
    p = sub.add_parser("viz", help="model-graph visualization: flax tabulate "
                                   "summary + graphviz DOT of the module "
                                   "hierarchy (analog of the reference's "
                                   "evidential/visu.py dev visualizer)")
    p.add_argument("--out", default="viz", help="output directory")
    p.add_argument("--loadckpt", help="optional checkpoint whose parameter "
                                      "tree is graphed (default: fresh init)")
    p.add_argument("--maxdisp", type=int, default=32)
    return p


def _add_quality(sub):
    p = sub.add_parser("quality", help="accuracy/completeness of a fused PLY "
                                       "vs a ground-truth point cloud")
    p.add_argument("--ply", required=True, help="predicted point cloud (.ply)")
    p.add_argument("--gt", required=True, help="ground-truth point cloud (.ply)")
    p.add_argument("--max_dist", type=float, default=20.0,
                   help="outlier clamp distance (DTU convention: 20 mm)")
    p.add_argument("--downsample", type=float, default=0.2,
                   help="voxel size for pre-filter downsampling (0 = off)")
    return p


def _load_params(path: str):
    from .models.convert import load_torch_checkpoint

    if path.endswith(".ckpt"):
        return load_torch_checkpoint(path)
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def _load_evidential(path: str):
    """Load evidential-head variables from a torch .ckpt (``evidential.*``
    keys, reference eval.py:87-98) or an orbax directory."""
    if path.endswith(".ckpt"):
        import torch

        from .models.convert import convert_evidential_state_dict

        payload = torch.load(path, map_location="cpu", weights_only=True)
        state = payload["model"] if "model" in payload else payload
        arrays = {k: v.numpy() for k, v in state.items()}
        # A full-model checkpoint carries core tensors too; keep the head's.
        head_only = {
            k: v for k, v in arrays.items()
            if k.removeprefix("module.").startswith("evidential.")
        }
        return convert_evidential_state_dict(head_only or arrays)
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def cmd_eval(args):
    import jax.numpy as jnp

    from .data.eval_dataset import EvalDataset
    from .pipeline.infer import InferConfig, run_inference
    from .utils.config import eval_preset

    overrides = {
        k: v
        for k, v in (
            ("nviews", args.view_num), ("ndepths", args.numdepth),
            ("max_h", args.max_h), ("max_w", args.max_w),
            ("depth_block", args.depth_block),
            ("interval_scale", args.interval_scale),
            ("inverse_depth", True if args.inverse_depth else None),
        )
        if v is not None
    }
    cfg = eval_preset(args.preset, **overrides)
    if args.dry_check:
        from .data.validate import check_dataset_root

        with open(args.testlist) as f:
            scans = [line.strip() for line in f if line.strip()]
        report = check_dataset_root(args.testpath, scans,
                                    padded=cfg.pad_vertical)
        print(report.summary())
        if not report.ok:
            raise SystemExit(1)
        return
    if not args.loadckpt:
        raise SystemExit("--loadckpt is required (or use --dry_check)")
    ds = EvalDataset(
        args.testpath, args.testlist, nviews=cfg.nviews, ndepths=cfg.ndepths,
        interval_scale=cfg.interval_scale, inverse_depth=cfg.inverse_depth,
        max_h=cfg.max_h, max_w=cfg.max_w, pad_vertical=cfg.pad_vertical,
    )
    params = _load_params(args.loadckpt)
    ev_params = _load_evidential(args.evidential_ckpt) if args.evidential_ckpt else None
    depth_source = args.depth_source or (
        "evidential" if ev_params is not None else "wta"
    )
    if depth_source == "evidential" and ev_params is None:
        raise SystemExit("--depth_source evidential requires --evidential_ckpt")
    mesh = None
    if args.fanout > 1 or args.spatial > 1 or args.depth_stages > 1:
        import jax

        from .parallel.mesh import make_mesh

        if args.depth_stages > 1 and (args.fanout > 1 or args.spatial > 1):
            raise SystemExit(
                "--depth_stages is exclusive with --fanout/--spatial"
            )
        n = args.fanout * args.spatial * args.depth_stages
        mesh = make_mesh(data=args.fanout, spatial=args.spatial,
                         depth=args.depth_stages, devices=jax.devices()[:n])
    stats = run_inference(
        params, ds,
        InferConfig(
            out_root=args.outdir, depth_block=cfg.depth_block,
            feature_dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
            depth_source=depth_source, evidential_params=ev_params,
            save_png_previews=args.save_png,
            fold_omega=args.fold_omega, pallas_gates=args.pallas_gates,
            packed_rows=args.packed_rows,
            table_dtype=(
                jnp.int8 if args.int8_tables
                else jnp.float8_e4m3fn if args.fp8_tables else None
            ),
            gather_pack=args.gather_pack, table_taps=args.table_taps,
            residual_dtype=(
                "dual" if args.dual_residual
                else jnp.int8 if args.int8_residual
                else jnp.float8_e4m3fn if args.fp8_residual else None
            ),
            fused_residual=not args.no_fused_residual,
            feature_view_chunk=args.feat_chunk,
            mesh=mesh, pipeline_maps=args.pipeline_maps,
        ),
    )
    print(f"eval done: {stats['count']} maps, {stats['maps_per_s']:.3f} maps/s")


def cmd_fuse(args):
    from .pipeline.fuse import (
        FuseConfig, fuse_scan, fuse_scan_padded, merge_ply_blocks,
    )

    block = None
    if args.view_block is not None:
        block = (args.view_block, args.num_view_blocks)
    block_path = lambda ply, i: f"{ply}.block{i}of{args.num_view_blocks}"

    with open(args.testlist) as f:
        scans = [line.strip() for line in f if line.strip()]
    scans = scans[args.host_id :: args.num_hosts]
    for scan in scans:
        scan_folder = os.path.join(args.testpath, scan)
        depth_folder = os.path.join(args.outdir, scan)
        if args.test_dataset == "dtu":
            thr = args.photo_threshold if args.photo_threshold is not None else 0.35
            scan_id = int("".join(c for c in scan if c.isdigit()) or 0)
            ply = os.path.join(args.outdir, f"mvsnet_{scan_id:03d}_l3.ply")
        else:
            ply = os.path.join(args.outdir, scan + ".ply")

        if args.merge_blocks:
            n = merge_ply_blocks(
                [block_path(ply, i) for i in range(args.num_view_blocks)], ply
            )
            print(f"{scan}: merged {args.num_view_blocks} blocks, "
                  f"{n} points -> {ply}")
            continue

        out = ply if block is None else block_path(ply, args.view_block)
        if args.display and args.test_dataset == "tnt_padded":
            print("WARNING: --display is not supported by the padded "
                  "fusion (matching the reference, whose fusion_padding.py "
                  "has no display path); ignoring", flush=True)
        if args.test_dataset == "dtu":
            n = fuse_scan(scan_folder, depth_folder, out,
                          FuseConfig(photo_threshold=thr, num_workers=args.num_workers),
                          view_block=block, save_masks=args.save_masks,
                          display=args.display)
        elif args.test_dataset == "tnt":
            thr = args.photo_threshold if args.photo_threshold is not None else 0.2
            n = fuse_scan(scan_folder, depth_folder, out,
                          FuseConfig(photo_threshold=thr, num_workers=args.num_workers),
                          view_block=block, save_masks=args.save_masks,
                          display=args.display)
        else:
            n = fuse_scan_padded(scan_folder, depth_folder, out,
                                 num_workers=args.num_workers, view_block=block)
        print(f"{scan}: {n} points -> {out}")


def cmd_train(args):
    from .parallel.mesh import (
        initialize_distributed, make_mesh, replicated, form_global_batch,
    )

    # Must run before the first device query (multi-host no-op otherwise).
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    import itertools

    import jax
    import numpy as np

    from .data.dtu import DTUTrainDataset
    from .data.loader import resilient_samples, batched
    from .models.network import init_params
    from .models.convert import load_torch_checkpoint
    from .pipeline.train import (
        TrainConfig, make_optimizer, make_train_step, make_eval_step,
        make_evidential_state, make_evidential_train_step,
        make_evidential_eval_step,
    )
    from .pipeline.checkpoint import make_manager, save_state, restore_latest
    from .utils.metrics import MeterDict
    from .utils.logging import TrainLogger

    nproc = jax.process_count()
    is_main = jax.process_index() == 0

    ds = DTUTrainDataset(
        args.trainpath, args.trainlist, nviews=args.view_num,
        ndepths=args.numdepth, interval_scale=args.interval_scale,
        image_scale=args.image_scale,
    )
    val_ds = None
    if args.vallist:
        val_ds = DTUTrainDataset(
            args.trainpath, args.vallist, nviews=args.view_num,
            ndepths=args.numdepth, interval_scale=args.interval_scale,
            image_scale=args.image_scale, light_idx=3, both=False,
        )
    # Per-host meta shards; every host must run the same number of steps per
    # epoch, so steps_per_epoch uses the GLOBAL length floor-divided first.
    full_len, full_val_len = len(ds), len(val_ds) if val_ds else 0
    if nproc > 1:
        ds = ds.shard(jax.process_index(), nproc)
        if val_ds is not None:
            val_ds = val_ds.shard(jax.process_index(), nproc)
    steps_per_epoch = max((full_len // nproc) // args.batch_size, 1)
    val_steps = (full_val_len // nproc) // args.batch_size

    mesh = None
    if not args.single_device and (len(jax.devices()) > 1 or args.spatial > 1):
        global_batch = args.batch_size * nproc
        data_size = len(jax.devices()) // args.spatial
        if global_batch % data_size == 0:
            mesh = make_mesh(spatial=args.spatial)
            if is_main:
                print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} "
                      f"devices, global batch {global_batch}", flush=True)
        elif args.spatial > 1 or nproc > 1:
            raise SystemExit(
                f"global batch {global_batch} (= {args.batch_size} x {nproc} "
                f"processes) must be divisible by the data mesh axis "
                f"({data_size} = {len(jax.devices())} devices / spatial "
                f"{args.spatial})"
            )
        elif is_main:
            print(f"note: global batch {global_batch} not divisible by "
                  f"{data_size} devices; running single-device (pass "
                  f"--spatial/--batch_size to shard)", flush=True)

    logger = TrainLogger(args.logdir) if is_main else None
    config = TrainConfig(
        learning_rate=args.lr, total_steps=args.epochs * steps_per_epoch,
        evidential=args.evidential, maxdisp=args.maxdisp,
    )
    tx = make_optimizer(config)
    if args.loadckpt:
        params = load_torch_checkpoint(args.loadckpt)
    else:
        params = init_params(jax.random.PRNGKey(0))

    if args.evidential:
        from .models.evidential import init_evidential

        if args.head_ckpt:
            head_vars = _load_evidential(args.head_ckpt)
        else:
            head_vars = init_evidential(jax.random.PRNGKey(1), maxdisp=args.maxdisp)
        state = make_evidential_state(params, head_vars)
        opt_state = tx.init({"core": state["core"], "head": state["head"]})
        step_fn = make_evidential_train_step(config, tx)
        eval_fn = make_evidential_eval_step(config)
    else:
        state = params
        opt_state = tx.init(params)
        step_fn = make_train_step(config, tx)
        eval_fn = make_eval_step(config)

    manager = make_manager(args.logdir)
    start_step = 0
    if args.resume:
        restored = restore_latest(manager, state, opt_state)
        if restored:
            start_step, state, opt_state = restored
            if is_main:
                print(f"resumed from step {start_step}")

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))

    def summarize(mode, images, host_batch, step):
        """TB images + .npz dump for the offline analytics suite (reference
        train.py:236-239: save_images + save_pytorch every summary_freq).

        Multi-host (VERDICT r4 item 6): the step outputs are GLOBAL sharded
        arrays, so host 0 dumps its first ADDRESSABLE sample — with the
        data axis laid out host-major by form_global_batch, that is global
        sample 0, which pairs with this host's ``host_batch[...][0]``.
        Spatially-sharded multi-host samples are not host-assemblable and
        keep the skip."""
        if logger is None:
            return
        if mesh is not None and nproc > 1 and args.spatial > 1:
            return

        def first_sample(v):
            if nproc > 1 and hasattr(v, "addressable_shards"):
                shard = min(v.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
                return np.asarray(shard.data)[0]
            return np.asarray(v)[0]

        arrays = {k: first_sample(v) for k, v in images.items()}
        arrays["depth_gt"] = np.asarray(host_batch["depth"])[0]
        arrays["mask"] = np.asarray(host_batch["mask"])[0]
        arrays["ref_img"] = np.asarray(host_batch["imgs"])[0, 0]
        logger.images(mode, arrays, step)
        logger.dump(mode, arrays, step)

    rng = np.random.RandomState(jax.process_index())
    step = start_step
    meter = MeterDict()
    skips = {"n": 0}

    def on_skip(exc):
        # Loader failure: the sample is substituted (resilient_samples keeps
        # the per-host step count fixed — multi-host safety), counted, and
        # reported so a silently rotting dataset is visible in the logs.
        skips["n"] += 1
        print(f"SKIP (train load failure #{skips['n']}): {exc}", flush=True)

    for epoch in range(start_step // steps_per_epoch, args.epochs):
        order = rng.permutation(len(ds))
        it = batched(
            resilient_samples(ds, order, num_workers=args.num_workers,
                              on_skip=on_skip),
            args.batch_size, drop_last=True,
        )
        for batch in itertools.islice(it, steps_per_epoch):
            host_batch = {k: v for k, v in batch.items() if k not in ("name",)}
            dev_batch = (
                form_global_batch(mesh, host_batch) if mesh is not None
                else host_batch
            )
            state, opt_state, metrics, images = step_fn(state, opt_state, dev_batch)
            meter.update(metrics)
            step += 1
            if step % args.summary_freq == 0:
                m = meter.mean()
                if logger is not None:
                    logger.scalars("train", m, step)
                summarize("train", images, host_batch, step)
                if is_main:
                    print(f"epoch {epoch} step {step}: " +
                          " ".join(f"{k}={v:.4f}" for k, v in m.items()), flush=True)
                meter = MeterDict()
            if args.max_steps and step - start_step >= args.max_steps:
                save_state(manager, step, state, opt_state)
                manager.wait_until_finished()
                if is_main:
                    print("max_steps reached")
                return
        save_state(manager, step, state, opt_state)
        if is_main:
            print(f"epoch {epoch} checkpointed at step {step}")

        # Per-epoch validation pass with threshold metrics (reference
        # train.py:262-285 runs its "fulltest" sweep every epoch).
        if val_ds is not None and val_steps:
            vmeter = MeterDict()
            vit = batched(
                resilient_samples(val_ds, num_workers=args.num_workers,
                                  on_skip=on_skip),
                args.batch_size, drop_last=True,
            )
            for vbatch in itertools.islice(vit, val_steps):
                vbatch = {k: v for k, v in vbatch.items() if k != "name"}
                if mesh is not None:
                    vbatch = form_global_batch(mesh, vbatch)
                vmeter.update(eval_fn(state, vbatch))
            vm = vmeter.mean()
            if logger is not None:
                logger.scalars("fulltest", vm, step)
            if is_main:
                print(f"epoch {epoch} fulltest: " +
                      " ".join(f"{k}={v:.4f}" for k, v in vm.items()), flush=True)
    manager.wait_until_finished()
    if skips["n"]:
        print(f"training finished with {skips['n']} substituted load "
              f"failure(s)", flush=True)
    if logger is not None:
        logger.close()


def cmd_convert(args):
    import jax
    import orbax.checkpoint as ocp

    if args.evidential:
        tree = _load_evidential(args.ckpt)
    else:
        tree = _load_params(args.ckpt)
    # StandardCheckpointer.save is async; block so the checkpoint is
    # committed before we report success (and before any same-process read).
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), tree, force=True)
    ckptr.wait_until_finished()
    n = sum(int(x.size) for x in jax.tree.leaves(tree))
    print(f"converted {args.ckpt} -> {args.out} ({n} params)")


def cmd_analyze(args):
    """Feed a train logdir's .npz dumps through the analytics suite
    (the reference's researcher loop: save_pytorch dumps ->
    evidential/statistics.py figures, reference train.py:229-239)."""
    import glob
    import json

    import numpy as np

    from .utils import analysis

    dump_dir = os.path.join(args.logdir, "results", args.mode)
    paths = sorted(glob.glob(os.path.join(dump_dir, "*.npz")),
                   key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
    if not paths:
        raise SystemExit(f"no dumps under {dump_dir} (train with --summary_freq)")
    out_dir = args.out or os.path.join(args.logdir, "analysis")
    os.makedirs(out_dir, exist_ok=True)

    report = {}
    for path in paths:
        step = os.path.splitext(os.path.basename(path))[0]
        d = np.load(path)
        if not {"depth_est", "depth_gt", "mask"} <= set(d.files):
            continue
        error = d["depth_est"] - d["depth_gt"]
        entry = {"error": analysis.summarize(error, np.abs(error), d["mask"])}
        if "alea_1" in d.files and "epis_1" in d.files:
            unc = d["alea_1"] + d["epis_1"]
            entry["uncertainty"] = analysis.summarize(error, unc, d["mask"])
            roc = analysis.uncertainty_roc(error, unc, d["mask"], args.error_threshold)
            pr = analysis.uncertainty_precision_recall(
                error, unc, d["mask"], args.error_threshold)
            spars = analysis.sparsification_curve(error, unc, d["mask"])
            cal = analysis.calibration_curve(error, unc, d["mask"])
            entry["roc_auc"] = roc["auc"]
            entry["average_precision"] = pr["average_precision"]
            entry["ause"] = spars["ause"]
            entry["calibration"] = {
                "bin_uncertainty": cal["bin_uncertainty"],
                "bin_abs_error": cal["bin_abs_error"],
            }
            entry["regression"] = analysis.regression_fit(error, unc, d["mask"])
            prsweep = analysis.precision_recall_vs_threshold(
                error, unc, d["mask"], args.error_threshold)
            entry["pr_vs_threshold"] = {
                "precision": prsweep["precision"],
                "recall": prsweep["recall"],
                "fraction_kept": prsweep["fraction_kept"],
            }
            analysis.plot_density(
                os.path.join(out_dir, f"density_{step}.png"),
                error, unc, d["mask"],
            )
            analysis.plot_report(
                os.path.join(out_dir, f"report_{step}.png"),
                d["ref_img"] if "ref_img" in d.files else np.zeros_like(d["depth_gt"]),
                d["depth_est"], d["depth_gt"], d["mask"],
                d["alea_1"], d["epis_1"],
            )
        if "alea_1" in d.files and "epis_1" in d.files:
            m = d["mask"] > 0.5
            entry["means"] = {
                "aleatoric": float(d["alea_1"][m].mean()) if m.any() else 0.0,
                "epistemic": float(d["epis_1"][m].mean()) if m.any() else 0.0,
            }
        report[step] = entry

    # Cross-dump means comparison (reference statistics.py:1352-1365 does
    # this across scenes; here the entries are training steps).
    means = {s: e["means"] for s, e in report.items() if "means" in e}
    if means:
        analysis.plot_means_comparison(
            os.path.join(out_dir, "means_comparison.png"), means
        )

    report_path = os.path.join(out_dir, "report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(f"analyzed {len(report)} dumps -> {report_path}")


def cmd_quality(args):
    import json

    from .core.ply import read_ply
    from .utils.quality import accuracy_completeness

    pred_xyz, _ = read_ply(args.ply)
    gt_xyz, _ = read_ply(args.gt)
    metrics = accuracy_completeness(
        pred_xyz, gt_xyz, max_dist=args.max_dist, downsample=args.downsample
    )
    print(json.dumps(metrics, indent=2))


def cmd_viz(args):
    """Render the real network's module summary + parameter-tree graph
    (analog of the reference's evidential/visu.py / dataset_comparison.py
    torchviz dev scratch, but on the ACTUAL modules)."""
    import jax

    from .models.network import init_params
    from .utils.visualize import model_graph_dot, model_summary

    os.makedirs(args.out, exist_ok=True)
    summary_path = os.path.join(args.out, "model_summary.txt")
    with open(summary_path, "w") as f:
        f.write(model_summary(maxdisp=args.maxdisp))

    params = (_load_params(args.loadckpt) if args.loadckpt
              else init_params(jax.random.PRNGKey(0)))
    dot_path = os.path.join(args.out, "model_graph.dot")
    with open(dot_path, "w") as f:
        f.write(model_graph_dot(params))
    print(f"wrote {summary_path} and {dot_path}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="aa_rmvsnet_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_eval(sub)
    _add_fuse(sub)
    _add_train(sub)
    _add_convert(sub)
    _add_analyze(sub)
    _add_quality(sub)
    _add_viz(sub)
    args = parser.parse_args(argv)
    dispatch = {
        "eval": cmd_eval,
        "fuse": cmd_fuse,
        "train": cmd_train,
        "convert": cmd_convert,
        "analyze": cmd_analyze,
        "quality": cmd_quality,
        "viz": cmd_viz,
    }
    dispatch[args.cmd](args)


if __name__ == "__main__":
    main()
