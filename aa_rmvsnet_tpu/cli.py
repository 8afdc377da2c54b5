"""Command-line entry points: ``python -m aa_rmvsnet_tpu.cli <cmd>``.

Subcommands mirror the reference's three executables (train.py, eval.py,
fusion.py) plus checkpoint conversion:

  eval     generate depth/confidence maps for a scene list
  fuse     filter + fuse depth maps into PLY point clouds
  train    train the core network on DTU
  convert  torch .ckpt -> orbax params directory
"""

from __future__ import annotations

import argparse
import os
import sys


def _add_eval(sub):
    p = sub.add_parser("eval", help="generate depth maps")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True, help="file with one scan per line")
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--preset", default="dtu_eval")
    p.add_argument("--loadckpt", required=True, help="torch .ckpt or orbax dir")
    p.add_argument("--view_num", type=int)
    p.add_argument("--numdepth", type=int)
    p.add_argument("--max_h", type=int)
    p.add_argument("--max_w", type=int)
    p.add_argument("--depth_block", type=int)
    p.add_argument("--fp32", action="store_true")
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
    p.add_argument("--num_hosts", type=int, default=1)
    return p


def _add_train(sub):
    p = sub.add_parser("train", help="train the core network on DTU")
    p.add_argument("--trainpath", required=True)
    p.add_argument("--trainlist", required=True)
    p.add_argument("--vallist")
    p.add_argument("--logdir", default="checkpoints_tpu")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--view_num", type=int, default=5)
    p.add_argument("--numdepth", type=int, default=128)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--image_scale", type=float, default=0.25)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--loadckpt")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_steps", type=int, help="early stop (smoke tests)")
    return p


def _load_params(path: str):
    from .models.convert import load_torch_checkpoint

    if path.endswith(".ckpt"):
        return load_torch_checkpoint(path)
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
        )
        if v is not None
    }
    cfg = eval_preset(args.preset, **overrides)
    ds = EvalDataset(
        args.testpath, args.testlist, nviews=cfg.nviews, ndepths=cfg.ndepths,
        interval_scale=cfg.interval_scale, inverse_depth=cfg.inverse_depth,
        max_h=cfg.max_h, max_w=cfg.max_w, pad_vertical=cfg.pad_vertical,
    )
    params = _load_params(args.loadckpt)
    stats = run_inference(
        params, ds,
        InferConfig(
            out_root=args.outdir, depth_block=cfg.depth_block,
            feature_dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        ),
    )
    print(f"eval done: {stats['count']} maps, {stats['maps_per_s']:.3f} maps/s")


def cmd_fuse(args):
    from .pipeline.fuse import FuseConfig, fuse_scan, fuse_scan_padded

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
            n = fuse_scan(scan_folder, depth_folder, ply,
                          FuseConfig(photo_threshold=thr, num_workers=args.num_workers))
        elif args.test_dataset == "tnt":
            thr = args.photo_threshold if args.photo_threshold is not None else 0.2
            ply = os.path.join(args.outdir, scan + ".ply")
            n = fuse_scan(scan_folder, depth_folder, ply,
                          FuseConfig(photo_threshold=thr, num_workers=args.num_workers))
        else:
            ply = os.path.join(args.outdir, scan + ".ply")
            n = fuse_scan_padded(scan_folder, depth_folder, ply,
                                 num_workers=args.num_workers)
        print(f"{scan}: {n} points -> {ply}")


def cmd_train(args):
    import jax
    import numpy as np

    from .data.dtu import DTUTrainDataset
    from .data.loader import prefetch_samples, batched
    from .models.network import init_params
    from .models.convert import load_torch_checkpoint
    from .pipeline.train import TrainConfig, make_optimizer, make_train_step, make_eval_step
    from .pipeline.checkpoint import make_manager, save_state, restore_latest
    from .utils.metrics import MeterDict

    from .utils.logging import TrainLogger

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
    logger = TrainLogger(args.logdir)
    steps_per_epoch = max(len(ds) // args.batch_size, 1)
    config = TrainConfig(
        learning_rate=args.lr, total_steps=args.epochs * steps_per_epoch,
    )
    tx = make_optimizer(config)
    if args.loadckpt:
        params = load_torch_checkpoint(args.loadckpt)
    else:
        params = init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    step_fn = make_train_step(config, tx)
    eval_fn = make_eval_step(config)

    manager = make_manager(args.logdir)
    start_step = 0
    if args.resume:
        restored = restore_latest(manager, params, opt_state)
        if restored:
            start_step, params, opt_state = restored
            print(f"resumed from step {start_step}")

    rng = np.random.RandomState(0)
    step = start_step
    meter = MeterDict()
    for epoch in range(start_step // steps_per_epoch, args.epochs):
        order = rng.permutation(len(ds))
        it = batched(prefetch_samples(ds, order, num_workers=8), args.batch_size,
                     drop_last=True)
        for batch in it:
            batch = {k: v for k, v in batch.items() if k not in ("name",)}
            params, opt_state, metrics = step_fn(params, opt_state, batch)
            meter.update(metrics)
            step += 1
            if step % 20 == 0:
                m = meter.mean()
                logger.scalars("train", m, step)
                print(f"epoch {epoch} step {step}: " +
                      " ".join(f"{k}={v:.4f}" for k, v in m.items()), flush=True)
                meter = MeterDict()
            if args.max_steps and step - start_step >= args.max_steps:
                save_state(manager, step, params, opt_state)
                manager.wait_until_finished()
                print("max_steps reached")
                return
        save_state(manager, step, params, opt_state)
        print(f"epoch {epoch} checkpointed at step {step}")

        # Per-epoch validation pass with threshold metrics (reference
        # train.py:262-285 runs its "fulltest" sweep every epoch).
        if val_ds is not None:
            vmeter = MeterDict()
            vit = batched(
                prefetch_samples(val_ds, num_workers=8), args.batch_size,
                drop_last=True,
            )
            for vbatch in vit:
                vbatch = {k: v for k, v in vbatch.items() if k != "name"}
                vmeter.update(eval_fn(params, vbatch))
            vm = vmeter.mean()
            logger.scalars("fulltest", vm, step)
            print(f"epoch {epoch} fulltest: " +
                  " ".join(f"{k}={v:.4f}" for k, v in vm.items()), flush=True)
    manager.wait_until_finished()
    logger.close()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="aa_rmvsnet_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_eval(sub)
    _add_fuse(sub)
    _add_train(sub)
    args = parser.parse_args(argv)
    if args.cmd == "eval":
        cmd_eval(args)
    elif args.cmd == "fuse":
        cmd_fuse(args)
    elif args.cmd == "train":
        cmd_train(args)


if __name__ == "__main__":
    main()
