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
        assert os.path.exists(os.path.join(out, "mvsnet_001_l3.ply"))


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
