"""CLI, config-preset, and orbax checkpoint round-trip tests."""

import os

import numpy as np
import pytest

import jax

from aa_rmvsnet_tpu.utils.config import eval_preset, train_preset, EVAL_PRESETS
from aa_rmvsnet_tpu.models import init_params
from aa_rmvsnet_tpu.pipeline.train import TrainConfig, make_optimizer
from aa_rmvsnet_tpu.pipeline.checkpoint import make_manager, save_state, restore_latest

from scenefix import make_plane_scene


class TestConfig:
    def test_presets_exist(self):
        for name in ("dtu_eval_smoke", "dtu_eval", "tnt_intermediate"):
            cfg = eval_preset(name)
            assert cfg.ndepths > 0

    def test_smoke_preset_is_cpu_friendly(self):
        cfg = eval_preset("dtu_eval_smoke")
        assert (cfg.max_h, cfg.max_w) == (296, 400)
        assert cfg.ndepths == 192 and cfg.nviews == 3
        assert not cfg.use_bfloat16

    def test_override(self):
        cfg = eval_preset("dtu_eval", ndepths=64)
        assert cfg.ndepths == 64

    def test_unknown_preset(self):
        with pytest.raises(KeyError):
            eval_preset("nope")
        with pytest.raises(KeyError):
            train_preset("nope")

    def test_tnt_presets_match_reference_buckets(self):
        # eval_tnt.sh splits scenes into 1024- and 960-wide buckets.
        assert EVAL_PRESETS["tnt_intermediate"]["max_w"] == 1024
        assert EVAL_PRESETS["tnt_intermediate_960"]["max_w"] == 960


class TestHBMDerivation:
    def test_estimate_monotonic_and_block_derivation(self):
        """sweep_hbm_bytes grows with size/views/block; derive_depth_block
        picks the largest candidate that fits and respects divisibility."""
        from aa_rmvsnet_tpu.utils.config import (
            derive_depth_block, sweep_hbm_bytes,
        )

        base = sweep_hbm_bytes(864, 1152, 5, 8)
        assert sweep_hbm_bytes(864, 1152, 5, 16) > base
        assert sweep_hbm_bytes(1056, 1920, 5, 8) > base
        assert sweep_hbm_bytes(864, 1152, 7, 8) > base
        # The proven north-star config (packed db=8) must fit the budget —
        # it runs on the chip (BENCHMARKS.md), so the estimate may not
        # exclude it.
        assert derive_depth_block(864, 1152, 5) >= 8
        # A huge budget picks the largest candidate — capped at 8, the
        # proven block size: depth_block=16 is a measured compile-SIGKILL
        # dead end the HBM estimate cannot see (ADVICE r4).
        assert derive_depth_block(864, 1152, 5, budget=1e18) == 8
        # Divisibility: ndepths=12 cannot take block 8.
        assert derive_depth_block(864, 1152, 5, ndepths=12, budget=1e18) == 4

    def test_preset_auto_depth_block(self):
        from aa_rmvsnet_tpu.utils.config import eval_preset

        cfg = eval_preset("dtu_eval", depth_block="auto")
        assert cfg.depth_block == 8


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        config = TrainConfig(total_steps=10)
        tx = make_optimizer(config)
        opt_state = tx.init(params)

        mgr = make_manager(str(tmp_path / "ckpts"))
        save_state(mgr, 3, params, opt_state)
        mgr.wait_until_finished()

        restored = restore_latest(mgr, params, opt_state)
        assert restored is not None
        step, p2, o2 = restored
        assert step == 3
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_empty_returns_none(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        tx = make_optimizer(TrainConfig(total_steps=10))
        mgr = make_manager(str(tmp_path / "empty"))
        assert restore_latest(mgr, params, tx.init(params)) is None

    def test_latest_wins(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), 16, 16)
        tx = make_optimizer(TrainConfig(total_steps=10))
        opt_state = tx.init(params)
        mgr = make_manager(str(tmp_path / "ck"))
        save_state(mgr, 1, params, opt_state)
        bumped = jax.tree.map(lambda x: x + 1.0, params)
        save_state(mgr, 7, bumped, opt_state)
        mgr.wait_until_finished()
        step, p2, _ = restore_latest(mgr, params, opt_state)
        assert step == 7
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(p2)[0]),
            np.asarray(jax.tree.leaves(bumped)[0]),
        )


class TestCLI:
    def test_eval_cli_on_synthetic_scene(self, tmp_path):
        """End-to-end: CLI eval with a torch checkpoint on a synthetic scene."""
        ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("shipped checkpoint absent")
        make_plane_scene(tmp_path, H=32, W=40, num_views=3, focal=200.0)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")

        from aa_rmvsnet_tpu.cli import main

        out = str(tmp_path / "outputs")
        main([
            "eval", "--testpath", str(tmp_path), "--testlist", str(listfile),
            "--outdir", out, "--preset", "dtu_eval_smoke", "--loadckpt", ckpt,
            "--numdepth", "8", "--max_h", "32", "--max_w", "40", "--fp32",
        ])
        assert os.path.exists(os.path.join(out, "scan1/depth_est_0/00000000.pfm"))

        # fuse the produced maps through the CLI as well
        main([
            "fuse", "--testpath", str(tmp_path), "--testlist", str(listfile),
            "--outdir", out, "--test_dataset", "dtu", "--photo_threshold", "0.0",
            "--num_workers", "2",
        ])
        ply = os.path.join(out, "mvsnet_001_l3.ply")
        assert os.path.exists(ply)

        # distributed ref-view-block fuse: two blocks + merge == single run
        from aa_rmvsnet_tpu.core.ply import read_ply

        single_xyz, _ = read_ply(ply)
        for b in range(2):
            main([
                "fuse", "--testpath", str(tmp_path), "--testlist", str(listfile),
                "--outdir", out, "--test_dataset", "dtu",
                "--photo_threshold", "0.0", "--num_workers", "2",
                "--view_block", str(b), "--num_view_blocks", "2",
            ])
        main([
            "fuse", "--testpath", str(tmp_path), "--testlist", str(listfile),
            "--outdir", out, "--test_dataset", "dtu", "--photo_threshold", "0.0",
            "--num_view_blocks", "2", "--merge_blocks",
        ])
        merged_xyz, _ = read_ply(ply)
        np.testing.assert_array_equal(merged_xyz, single_xyz)

    def test_eval_cli_spatial_and_depth_stage_meshes(self, tmp_path):
        """--spatial (halo-tiled maps) and --depth_stages (pipelined depth
        chunks) produce the same PFMs as the serial CLI eval."""
        ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("shipped checkpoint absent")
        from aa_rmvsnet_tpu.cli import main
        from aa_rmvsnet_tpu.core.pfm import read_pfm

        make_plane_scene(tmp_path, H=32, W=40, num_views=3, focal=200.0)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        common = [
            "eval", "--testpath", str(tmp_path), "--testlist", str(listfile),
            "--preset", "dtu_eval_smoke", "--loadckpt", ckpt,
            "--numdepth", "8", "--max_h", "32", "--max_w", "40", "--fp32",
            "--depth_block", "4",
        ]
        serial = str(tmp_path / "serial")
        main([*common, "--outdir", serial])
        spatial = str(tmp_path / "spatial")
        main([*common, "--outdir", spatial, "--spatial", "2"])
        piped = str(tmp_path / "piped")
        main([*common, "--outdir", piped, "--depth_stages", "2"])

        for v in range(3):
            ref = read_pfm(os.path.join(serial, f"scan1/depth_est_0/{v:08d}.pfm"))[0]
            for out, tol in ((spatial, 1e-4), (piped, 0.0)):
                got = read_pfm(os.path.join(out, f"scan1/depth_est_0/{v:08d}.pfm"))[0]
                if tol:
                    np.testing.assert_allclose(got, ref, atol=tol)
                else:
                    np.testing.assert_array_equal(got, ref)

        with pytest.raises(SystemExit, match="exclusive"):
            main([*common, "--outdir", str(tmp_path / "bad"),
                  "--depth_stages", "2", "--spatial", "2"])


class TestDryCheck:
    def test_dry_check_passes_on_good_tree(self, tmp_path, capsys):
        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.cli import main

        make_plane_scene(tmp_path, H=32, W=32, num_views=3)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        main(["eval", "--dry_check", "--testpath", str(tmp_path),
              "--testlist", str(listfile), "--preset", "dtu_eval_smoke"])
        out = capsys.readouterr().out
        assert "dataset check OK" in out

    def test_dry_check_catches_broken_tree(self, tmp_path, capsys):
        """Missing cam file, unreadable image, and (padded preset) a
        missing depth_end must each produce a named error + exit 1."""
        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.cli import main

        make_plane_scene(tmp_path, H=32, W=32, num_views=3)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        os.remove(tmp_path / "scan1/cams/00000002_cam.txt")
        (tmp_path / "scan1/images/00000001.jpg").write_bytes(b"not a jpeg")

        with pytest.raises(SystemExit):
            main(["eval", "--dry_check", "--testpath", str(tmp_path),
                  "--testlist", str(listfile), "--preset", "dtu_eval_smoke"])
        out = capsys.readouterr().out
        assert "cam file missing for view 2" in out
        assert "image unreadable for view 1" in out

        # The padded (TnT) preset additionally requires depth_end — the
        # plane scene's cams lack the 4-token depth line.
        (tmp_path / "scan1/images/00000001.jpg").unlink()
        with pytest.raises(SystemExit):
            main(["eval", "--dry_check", "--testpath", str(tmp_path),
                  "--testlist", str(listfile), "--preset", "tnt_intermediate"])
        out = capsys.readouterr().out
        assert "lacks depth_end" in out
        assert "image missing for view 1" in out

    def test_eval_without_ckpt_fails_loudly(self, tmp_path):
        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.cli import main

        make_plane_scene(tmp_path, H=32, W=32, num_views=3)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        with pytest.raises(SystemExit, match="loadckpt"):
            main(["eval", "--testpath", str(tmp_path),
                  "--testlist", str(listfile), "--preset", "dtu_eval_smoke"])


class TestVizCLI:
    def test_viz_writes_summary_and_dot(self, tmp_path):
        """`cli viz` — the model-graph visualizer analog (reference
        evidential/visu.py / dataset_comparison.py render torchviz graphs
        of toy stand-ins; ours tabulates + graphs the REAL modules)."""
        from aa_rmvsnet_tpu.cli import main

        out = str(tmp_path / "viz")
        main(["viz", "--out", out])
        summary = open(os.path.join(out, "model_summary.txt")).read()
        for name in ("AARMVSNetCore", "EvidentialHead", "cost_regularization"):
            assert name in summary, name
        dot = open(os.path.join(out, "model_graph.dot")).read()
        assert dot.startswith("digraph model")
        for node in ("feature", "omega", "cell0", "conv_out"):
            assert node in dot, node
        # total params of the core tree appear on the root children
        assert "18,432 params" in dot  # cell kernel, checkpoint-known size


class TestTnTHighRes:
    @pytest.mark.slow
    def test_1920x1056_preset_shapes_hold_together(self, tmp_path):
        """BASELINE config #3 (TnT intermediate, 7 views, 1920x1056): the
        padded dataset must emit that geometry from 1080p inputs and the
        full sweep program must TRACE at it (jax.eval_shape — validates
        every shape/layout constraint of the network without paying the
        2-Mpx x D=512 compute on CPU)."""
        import jax.numpy as jnp

        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.utils.config import eval_preset
        from aa_rmvsnet_tpu.models.network import SweepConfig, forward

        cfg = eval_preset("tnt_intermediate_1920")
        assert (cfg.max_h, cfg.max_w, cfg.nviews, cfg.ndepths) == (1056, 1920, 7, 512)
        assert cfg.inverse_depth and cfg.pad_vertical

        make_plane_scene(tmp_path, H=1080, W=1920, num_views=3, focal=2000.0,
                         with_depth_end=True)
        from aa_rmvsnet_tpu.data import EvalDataset

        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3,
                         ndepths=cfg.ndepths, inverse_depth=cfg.inverse_depth,
                         max_h=cfg.max_h, max_w=cfg.max_w,
                         pad_vertical=cfg.pad_vertical)
        s = ds[0]
        assert s["imgs"].shape == (3, 1056, 1920, 3), s["imgs"].shape
        assert s["depth_values"].shape == (512,)
        assert np.all(np.diff(s["depth_values"]) > 0)

        params = init_params(jax.random.PRNGKey(0), 32, 32)
        out = jax.eval_shape(
            lambda p, i, pr, d: forward(
                p, i, pr, d,
                SweepConfig(depth_block=cfg.depth_block, collect_volume=False,
                            feature_dtype=jnp.bfloat16,
                            table_dtype=jnp.float8_e4m3fn),
            ),
            params,
            jax.ShapeDtypeStruct((1, 3, 1056, 1920, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 3, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, 512), jnp.float32),
        )
        assert out["depth"].shape == (1, 1056, 1920)
        assert out["photometric_confidence"].shape == (1, 1056, 1920)


class TestTrainCLI:
    def test_train_smoke_with_validation(self, tmp_path):
        """Two training steps + checkpoint + resume on a synthetic DTU tree."""
        from test_pipeline import TestDTUTrainDataset

        listfile = TestDTUTrainDataset()._make_dtu(str(tmp_path), H=16, W=16)
        from aa_rmvsnet_tpu.cli import main

        logdir = str(tmp_path / "logs")
        main([
            "train", "--trainpath", str(tmp_path), "--trainlist", listfile,
            "--vallist", listfile, "--logdir", logdir,
            "--epochs", "1", "--numdepth", "4", "--view_num", "3",
            "--image_scale", "0.25", "--max_steps", "2",
        ])
        import os

        assert any(d.isdigit() for d in os.listdir(logdir)), os.listdir(logdir)
        # resume picks up the saved step
        main([
            "train", "--trainpath", str(tmp_path), "--trainlist", listfile,
            "--logdir", logdir, "--epochs", "1", "--numdepth", "4",
            "--view_num", "3", "--image_scale", "0.25", "--max_steps", "1",
            "--resume",
        ])


    def test_train_survives_poisoned_dataset(self, tmp_path, capsys):
        """A corrupt image must not kill (or shrink) the training run: the
        affected samples are substituted and counted (resilient_samples) —
        better than the reference's swallow-everything except
        (train.py:226-247), which silently shrank the epoch."""
        from test_pipeline import TestDTUTrainDataset

        listfile = TestDTUTrainDataset()._make_dtu(str(tmp_path), H=16, W=16)
        # Corrupt one view's light-3 image: 6 of the 42 metas now fail.
        with open(
            tmp_path / "Rectified/scan1_train/rect_001_3_r5000.png", "wb"
        ) as f:
            f.write(b"garbage, not a png")
        from aa_rmvsnet_tpu.cli import main

        logdir = str(tmp_path / "logs_poison")
        # Full epoch (no --max_steps): the poisoned metas are guaranteed
        # to be drawn.
        main([
            "train", "--trainpath", str(tmp_path), "--trainlist", listfile,
            "--logdir", logdir, "--epochs", "1", "--numdepth", "4",
            "--view_num", "3", "--image_scale", "0.25", "--batch_size", "4",
            "--summary_freq", "5", "--num_workers", "2",
        ])
        out = capsys.readouterr().out
        assert "SKIP (train load failure" in out
        assert "substituted load failure(s)" in out
        assert any(d.isdigit() for d in os.listdir(logdir)), os.listdir(logdir)


class TestTrainCLIMultichip:
    def test_train_two_steps_on_virtual_mesh(self, tmp_path):
        """`cli train` builds the (data, spatial) mesh over the 8 virtual
        devices and runs sharded steps — the production multi-chip path
        (new TPU-native scope; the reference is single-GPU, SURVEY §2.2)."""
        from test_pipeline import TestDTUTrainDataset

        listfile = TestDTUTrainDataset()._make_dtu(str(tmp_path), H=16, W=16)
        from aa_rmvsnet_tpu.cli import main

        logdir = str(tmp_path / "logs_mesh")
        main([
            "train", "--trainpath", str(tmp_path), "--trainlist", listfile,
            "--logdir", logdir, "--epochs", "1", "--numdepth", "4",
            "--view_num", "3", "--image_scale", "0.25", "--max_steps", "2",
            "--batch_size", "4", "--spatial", "2", "--summary_freq", "1",
            "--num_workers", "2",
        ])
        assert any(d.isdigit() for d in os.listdir(logdir)), os.listdir(logdir)

    def test_indivisible_batch_with_spatial_fails_loudly(self, tmp_path):
        from test_pipeline import TestDTUTrainDataset

        listfile = TestDTUTrainDataset()._make_dtu(str(tmp_path), H=16, W=16)
        from aa_rmvsnet_tpu.cli import main

        with pytest.raises(SystemExit):
            main([
                "train", "--trainpath", str(tmp_path), "--trainlist", listfile,
                "--logdir", str(tmp_path / "lg"), "--epochs", "1",
                "--numdepth", "4", "--view_num", "3", "--image_scale", "0.25",
                "--max_steps", "1", "--batch_size", "3", "--spatial", "2",
            ])


class TestEvidentialCLI:
    def test_train_evidential_dumps_and_analyze(self, tmp_path):
        """Observability loop end-to-end: evidential train -> .npz dumps ->
        `cli analyze` report (reference train.py:229-239 save_images +
        save_pytorch -> statistics.py figures)."""
        from test_pipeline import TestDTUTrainDataset

        listfile = TestDTUTrainDataset()._make_dtu(str(tmp_path), H=16, W=16)
        from aa_rmvsnet_tpu.cli import main

        logdir = str(tmp_path / "logs_ev")
        main([
            "train", "--trainpath", str(tmp_path), "--trainlist", listfile,
            "--logdir", logdir, "--epochs", "1", "--numdepth", "4",
            "--view_num", "3", "--image_scale", "0.25", "--max_steps", "2",
            "--evidential", "--maxdisp", "4", "--summary_freq", "1",
            "--num_workers", "2", "--single_device",
        ])
        dumps = os.listdir(os.path.join(logdir, "results", "train"))
        assert dumps, "no .npz dumps written at summary_freq"
        d = np.load(os.path.join(logdir, "results", "train", dumps[0]))
        for key in ("depth_est", "depth_gt", "mask", "alea_1", "epis_1", "ref_img"):
            assert key in d.files, (key, d.files)

        main(["analyze", "--logdir", logdir])
        import json

        with open(os.path.join(logdir, "analysis", "report.json")) as f:
            report = json.load(f)
        assert report
        entry = next(iter(report.values()))
        assert "uncertainty" in entry and "ause" in entry, entry.keys()
        assert "regression" in entry and "linear" in entry["regression"]
        assert "pr_vs_threshold" in entry
        import glob as _glob
        assert _glob.glob(os.path.join(logdir, "analysis", "density_*.png"))
        assert "means" in entry and "aleatoric" in entry["means"]
        assert os.path.exists(
            os.path.join(logdir, "analysis", "means_comparison.png")
        )

    def test_eval_evidential_writes_four_pfm_dirs(self, tmp_path):
        """`cli eval --evidential_ckpt` writes depth/confidence/epistemic/
        aleatoric maps in the reference layout (reference eval.py:129-169)."""
        ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("shipped checkpoint absent")
        import orbax.checkpoint as ocp

        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.models.evidential import init_evidential
        from aa_rmvsnet_tpu.cli import main
        from aa_rmvsnet_tpu.core.pfm import read_pfm

        # The hourglass needs volume dims divisible by 4 (the reference
        # crashes identically on W/4 % 4 != 0), so use a 32x32 scene.
        make_plane_scene(tmp_path, H=32, W=32, num_views=3, focal=200.0)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")

        head_vars = init_evidential(jax.random.PRNGKey(0), 8, 8, maxdisp=32)
        head_dir = str(tmp_path / "head_ckpt")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(head_dir, head_vars)
        ckptr.wait_until_finished()  # async save: commit before restore

        out = str(tmp_path / "outputs")
        main([
            "eval", "--testpath", str(tmp_path), "--testlist", str(listfile),
            "--outdir", out, "--preset", "dtu_eval_smoke", "--loadckpt", ckpt,
            "--numdepth", "8", "--max_h", "32", "--max_w", "32", "--fp32",
            "--evidential_ckpt", head_dir, "--save_png",
        ])
        for sub in ("depth_est_0", "confidence_0", "epistemic_0", "aleatoric_0"):
            path = os.path.join(out, "scan1", sub, "00000000.pfm")
            assert os.path.exists(path), sub
            arr = read_pfm(path)[0]
            assert np.isfinite(arr).all(), sub
        # --save_png writes previews for EVERY map family it writes PFMs
        # for (reference eval.py:158-160).
        for sub in ("depth_png_0", "confidence_png_0", "epistemic_png_0",
                    "aleatoric_png_0"):
            assert os.path.exists(
                os.path.join(out, "scan1", sub, "00000000.png")
            ), sub

    def test_eval_with_committed_trained_head_artifact(self, tmp_path):
        """The SHIPPED trained evidential artifact (VERDICT r4 item 5:
        checkpoints/evidential_head, produced by
        scripts/train_evidential_head.py — the fork's eval flow expects a
        trained head ckpt, reference scripts/eval_tnt.sh:8) loads through
        `eval --evidential_ckpt` and writes all four PFM families +
        previews with finite, plausible values."""
        ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
        head_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "checkpoints", "evidential_head")
        if not os.path.exists(ckpt):
            pytest.skip("shipped checkpoint absent")
        if not os.path.exists(head_dir):
            pytest.skip("trained head artifact absent")

        from scenefix import make_plane_scene
        from aa_rmvsnet_tpu.cli import main
        from aa_rmvsnet_tpu.core.pfm import read_pfm

        make_plane_scene(tmp_path, H=32, W=32, num_views=3, focal=2000.0,
                         plane_depth=470.0, dmin=425.0, dint=2.75)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        out = str(tmp_path / "outputs")
        main([
            "eval", "--testpath", str(tmp_path), "--testlist", str(listfile),
            "--outdir", out, "--preset", "dtu_eval_smoke", "--loadckpt", ckpt,
            "--numdepth", "32", "--interval_scale", "1.0",
            "--max_h", "32", "--max_w", "32", "--fp32",
            "--evidential_ckpt", head_dir, "--save_png",
        ])
        png_dir = {"depth_est_0": "depth_png_0",
                   "confidence_0": "confidence_png_0",
                   "epistemic_0": "epistemic_png_0",
                   "aleatoric_0": "aleatoric_png_0"}
        for sub in png_dir:
            arr = read_pfm(os.path.join(out, "scan1", sub,
                                        "00000000.pfm"))[0]
            assert np.isfinite(arr).all(), sub
            assert os.path.exists(os.path.join(
                out, "scan1", png_dir[sub], "00000000.png")), sub
        # The trained head's gamma (the eval depth under
        # depth_source=evidential) must localize the plane: the scene is
        # the family the artifact was trained/gated on.
        depth = read_pfm(os.path.join(out, "scan1", "depth_est_0",
                                      "00000000.pfm"))[0]
        assert abs(np.median(depth) - 470.0) < 30.0, np.median(depth)


class TestQualityCLI:
    def test_accuracy_completeness_roundtrip(self, tmp_path, capsys):
        from aa_rmvsnet_tpu.core import write_ply
        from aa_rmvsnet_tpu.cli import main

        rng = np.random.RandomState(0)
        gt = rng.rand(1500, 3).astype(np.float32) * 50
        pred = gt + rng.randn(1500, 3).astype(np.float32) * 0.3
        rgb = np.zeros_like(gt, dtype=np.uint8)
        p_pred, p_gt = str(tmp_path / "p.ply"), str(tmp_path / "g.ply")
        write_ply(p_pred, pred, rgb)
        write_ply(p_gt, gt, rgb)

        main(["quality", "--ply", p_pred, "--gt", p_gt, "--downsample", "0"])
        import json

        metrics = json.loads(capsys.readouterr().out)
        # noise sigma 0.3 -> mean 3D distance ~ sigma * sqrt(8/pi) ~ 0.48
        assert 0.2 < metrics["accuracy_mean"] < 1.0
        assert 0.2 < metrics["completeness_mean"] < 1.0
        assert metrics["inlier_fraction_pred"] == 1.0

    def test_identical_clouds_are_perfect(self, tmp_path, capsys):
        from aa_rmvsnet_tpu.utils.quality import accuracy_completeness

        pts = np.random.RandomState(1).rand(500, 3) * 10
        m = accuracy_completeness(pts, pts)
        assert m["accuracy_mean"] == 0.0 and m["completeness_mean"] == 0.0
        assert m["overall"] == 0.0
