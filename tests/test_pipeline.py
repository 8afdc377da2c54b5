"""Dataset, inference-driver, and fusion tests on synthetic scenes."""

import os

import numpy as np
import pytest

import jax

from aa_rmvsnet_tpu.core.pfm import read_pfm
from aa_rmvsnet_tpu.core.ply import read_ply
from aa_rmvsnet_tpu.data import EvalDataset, DTUTrainDataset, prefetch_samples
from aa_rmvsnet_tpu.data.loader import batched
from aa_rmvsnet_tpu.models import init_params
from aa_rmvsnet_tpu.pipeline.infer import InferConfig, run_inference
from aa_rmvsnet_tpu.pipeline.fuse import FuseConfig, fuse_scan, graduated_consistency

from scenefix import make_plane_scene, write_prediction, write_cam


class TestEvalDataset:
    def test_sample_contents(self, tmp_path):
        make_plane_scene(tmp_path, H=64, W=80)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=16,
                         max_h=64, max_w=80)
        assert len(ds) == 4
        s = ds[0]
        assert s["imgs"].shape == (3, 64, 80, 3)
        assert s["proj_matrices"].shape == (3, 4, 4)
        assert s["depth_values"].shape == (16,)
        assert s["depth_values"][0] == pytest.approx(425.0)
        assert s["filename"] == "scan1/{}/00000000{}"
        # standardized images
        np.testing.assert_allclose(s["imgs"][0].mean(), 0, atol=1e-4)

    def test_adaptive_downscale_adjusts_intrinsics(self, tmp_path):
        make_plane_scene(tmp_path, H=64, W=80)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=8,
                         max_h=32, max_w=40)
        s = ds[0]
        assert s["imgs"].shape[1:3] == (32, 40)
        # focal scaled by 0.5: K = proj[:3,:3] @ inv(E)... E = identity for view 0
        assert s["proj_matrices"][0][0, 0] == pytest.approx(400.0 * 0.5, rel=1e-5)

    def test_inverse_depth_and_padding_variant(self, tmp_path):
        make_plane_scene(tmp_path, H=64, W=80, with_depth_end=True)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=8,
                         max_h=72, max_w=80, pad_vertical=True)
        s = ds[0]
        assert s["imgs"].shape[1:3] == (72, 80)  # 64 + 8 pad rows
        d = s["depth_values"]
        assert d[0] == pytest.approx(425.0)
        assert np.all(np.diff(d) > 0) and d[-1] < 935.0  # bounded inverse


class TestDTUTrainDataset:
    def _make_dtu(self, root, scans=("scan1",), H=64, W=80):
        os.makedirs(os.path.join(root, "Cameras/train"), exist_ok=True)
        import cv2

        K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
        with open(os.path.join(root, "Cameras/pair.txt"), "w") as f:
            f.write("3\n")
            for v in range(3):
                srcs = [s for s in range(3) if s != v]
                f.write(f"{v}\n2 " + " ".join(f"{s} {5 - i}" for i, s in enumerate(srcs)) + "\n")
        for v in range(3):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = v * 1.0
            write_cam(os.path.join(root, f"Cameras/train/{v:08d}_cam.txt"), K, E, 425.0, 2.5)
        rng = np.random.RandomState(0)
        for scan in scans:
            os.makedirs(os.path.join(root, f"Rectified/{scan}_train"), exist_ok=True)
            os.makedirs(os.path.join(root, f"Depths/{scan}_train"), exist_ok=True)
            for v in range(3):
                for light in range(7):
                    img = (rng.rand(H * 4, W * 4, 3) * 255).astype(np.uint8)
                    cv2.imwrite(
                        os.path.join(root, f"Rectified/{scan}_train/rect_{v + 1:03d}_{light}_r5000.png"),
                        img,
                    )
                from aa_rmvsnet_tpu.core.pfm import save_pfm

                save_pfm(
                    os.path.join(root, f"Depths/{scan}_train/depth_map_{v:04d}.pfm"),
                    rng.uniform(400, 900, (H, W)).astype(np.float32),
                )
        listfile = os.path.join(root, "train.txt")
        with open(listfile, "w") as f:
            f.write("\n".join(scans) + "\n")
        return listfile

    def test_metas_and_sample(self, tmp_path):
        listfile = self._make_dtu(str(tmp_path))
        ds = DTUTrainDataset(str(tmp_path), listfile, nviews=3, ndepths=8,
                             image_scale=0.25)
        # 1 scan x 3 ref views x 7 lights x 2 (both) = 42
        assert len(ds) == 42
        s = ds[0]
        assert s["imgs"].shape == (3, 64, 80, 3)
        assert s["depth"].shape == (64, 80)
        assert s["mask"].shape == (64, 80)
        assert s["depth_values"].shape == (8,)
        assert set(np.unique(s["mask"])) <= {0.0, 1.0}
        # both=True: first meta flipped, second not
        assert ds.metas[0][4] is True and ds.metas[1][4] is False
        assert ds[1]["depth_values"][0] == pytest.approx(425.0)
        assert s["depth_values"][0] == pytest.approx(425.0 + 2.5 * 1.06 * 7, rel=1e-4)

    def test_sharding(self, tmp_path):
        listfile = self._make_dtu(str(tmp_path))
        ds = DTUTrainDataset(str(tmp_path), listfile, nviews=3, ndepths=8)
        a, b = ds.shard(0, 2), ds.shard(1, 2)
        assert len(a) + len(b) == len(ds)
        key = lambda m: (m[0], m[1], m[2], tuple(m[3]), m[4])
        assert not (set(map(key, a.metas)) & set(map(key, b.metas)))

    def test_prefetch_loader(self, tmp_path):
        listfile = self._make_dtu(str(tmp_path))
        ds = DTUTrainDataset(str(tmp_path), listfile, nviews=3, ndepths=8)
        seq = list(prefetch_samples(ds, range(4), num_workers=4))
        assert len(seq) == 4
        for got, idx in zip(seq, range(4)):
            np.testing.assert_array_equal(got["imgs"], ds[idx]["imgs"])
        batches = list(batched(iter(seq), 2))
        assert batches[0]["imgs"].shape[0] == 2

    def test_resilient_samples_substitutes_failures(self):
        """Failures anywhere (start / middle / end) are substituted by a
        neighboring good sample and the yield COUNT is preserved — the
        multi-host step-count safety property."""
        from aa_rmvsnet_tpu.data.loader import resilient_samples

        class FlakyDS:
            def __init__(self, bad):
                self.bad = set(bad)

            def __len__(self):
                return 6

            def __getitem__(self, i):
                if i in self.bad:
                    raise IOError(f"corrupt sample {i}")
                return {"x": np.full((2,), float(i))}

        skips = []
        # Failures at the start (0), middle (3), and end (5).
        out = list(resilient_samples(
            FlakyDS({0, 3, 5}), num_workers=2, on_skip=skips.append,
        ))
        assert len(out) == 6 and len(skips) == 3
        vals = [o["x"][0] for o in out]
        # 0 back-filled by the first good sample; 3 and 5 by the previous.
        assert vals == [1.0, 1.0, 2.0, 2.0, 4.0, 4.0]

        # All-fail epochs raise instead of silently yielding nothing.
        with pytest.raises(RuntimeError):
            list(resilient_samples(FlakyDS(range(6)), num_workers=2))

        # The synchronous (num_workers=0) path must honor the same
        # contract — a corrupt file is substituted, not raised.
        skips0 = []
        out0 = list(resilient_samples(
            FlakyDS({3}), num_workers=0, on_skip=skips0.append,
        ))
        assert len(out0) == 6 and len(skips0) == 1
        assert [o["x"][0] for o in out0] == [0.0, 1.0, 2.0, 2.0, 4.0, 5.0]


class TestFusion:
    def test_consistent_plane_survives(self, tmp_path):
        scene, gt, K, Es = make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        out_dir = os.path.join(tmp_path, "out", "scan1")
        for v in range(4):
            write_prediction(out_dir, v, gt, np.full_like(gt, 0.9))
        ply = os.path.join(tmp_path, "fused.ply")
        n = fuse_scan(scene, out_dir, ply, FuseConfig(num_workers=2))
        assert n > 0.8 * 4 * 64 * 80  # most pixels survive in every view
        xyz, rgb = read_ply(ply)
        np.testing.assert_allclose(xyz[:, 2], 500.0, atol=1.0)

    def test_inconsistent_depth_rejected(self, tmp_path):
        scene, gt, K, Es = make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        out_dir = os.path.join(tmp_path, "out", "scan1")
        rng = np.random.RandomState(0)
        for v in range(4):
            noisy = gt + rng.uniform(50, 150, gt.shape).astype(np.float32) * rng.choice([-1, 1])
            write_prediction(out_dir, v, noisy, np.full_like(gt, 0.9))
        try:
            n = fuse_scan(scene, out_dir, os.path.join(tmp_path, "f.ply"),
                          FuseConfig(num_workers=2))
        except RuntimeError:
            n = 0  # nothing survived at all
        # vs ~80% survival for the consistent plane: noise kills the cloud
        assert n < 0.05 * 4 * 64 * 80, n

    def test_low_confidence_rejected(self, tmp_path):
        scene, gt, K, Es = make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        out_dir = os.path.join(tmp_path, "out", "scan1")
        for v in range(4):
            write_prediction(out_dir, v, gt, np.full_like(gt, 0.1))  # < 0.35
        try:
            n = fuse_scan(scene, out_dir, os.path.join(tmp_path, "f.ply"),
                          FuseConfig(num_workers=2))
        except RuntimeError:
            n = 0
        assert n == 0

    def test_view_block_merge_matches_single_host(self, tmp_path):
        """Ref-view-block distributed fusion (SURVEY §7.1.6): fusing one
        scan in contiguous blocks on separate 'hosts' and merging the
        per-block PLYs must reproduce the single-host cloud exactly,
        including vertex order."""
        from aa_rmvsnet_tpu.pipeline.fuse import merge_ply_blocks

        scene, gt, K, Es = make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        out_dir = os.path.join(tmp_path, "out", "scan1")
        for v in range(4):
            write_prediction(out_dir, v, gt, np.full_like(gt, 0.9))

        single = os.path.join(tmp_path, "single.ply")
        n_single = fuse_scan(scene, out_dir, single, FuseConfig(num_workers=2))

        blocks = []
        n_blocks = 0
        for b in range(2):
            path = os.path.join(tmp_path, f"part.block{b}of2.ply")
            n_blocks += fuse_scan(scene, out_dir, path,
                                  FuseConfig(num_workers=2), view_block=(b, 2))
            blocks.append(path)
        merged = os.path.join(tmp_path, "merged.ply")
        n_merged = merge_ply_blocks(blocks, merged)

        assert n_merged == n_blocks == n_single
        ax, ac = read_ply(single)
        bx, bc = read_ply(merged)
        np.testing.assert_array_equal(bx, ax)
        np.testing.assert_array_equal(bc, ac)

    def test_padded_variant_fuses_plane_and_view_blocks(self, tmp_path):
        """fuse_scan_padded (TnT row-padding pipeline, reference
        fusion_padding.py): half-res predictions with 4 pad rows fuse onto
        the GT plane, and view-block + merge reproduces the single run."""
        from aa_rmvsnet_tpu.pipeline.fuse import (
            FuseConfig, fuse_scan_padded, merge_ply_blocks,
        )

        # Full-res scene 64x80; predictions at half-res (32x40) + 4 pad
        # rows = 36 rows (the variant crops 2 top/bottom before use).
        scene, _, K, Es = make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        out_dir = os.path.join(tmp_path, "out", "scan1")
        half_gt = np.full((32, 40), 500.0, np.float32)
        padded = np.pad(half_gt, ((2, 2), (0, 0)))
        conf = np.pad(np.full((32, 40), 0.9, np.float32), ((2, 2), (0, 0)))
        for v in range(4):
            write_prediction(out_dir, v, padded, conf)

        single = os.path.join(tmp_path, "single.ply")
        n = fuse_scan_padded(scene, out_dir, single, num_workers=2)
        assert n > 0.5 * 4 * 32 * 40, n
        xyz, _ = read_ply(single)
        np.testing.assert_allclose(xyz[:, 2], 500.0, atol=1.0)

        blocks = []
        for b in range(2):
            path = os.path.join(tmp_path, f"p.block{b}of2.ply")
            fuse_scan_padded(scene, out_dir, path, num_workers=2,
                             view_block=(b, 2))
            blocks.append(path)
        merged = os.path.join(tmp_path, "merged.ply")
        n_merged = merge_ply_blocks(blocks, merged)
        assert n_merged == n
        np.testing.assert_array_equal(read_ply(merged)[0], xyz)

    def test_graduated_consistency_perfect_geometry(self, tmp_path):
        _, gt, K, Es = make_plane_scene(tmp_path, H=32, W=40, num_views=2)
        masks, reproj = graduated_consistency(
            gt, K.astype(np.float64), Es[0].astype(np.float64),
            gt, K.astype(np.float64), Es[1].astype(np.float64), FuseConfig()
        )
        # Perfectly consistent plane: every level passes away from borders.
        inner = (slice(2, -2), slice(2, -2))
        for m in masks:
            assert m[inner].all()
        np.testing.assert_allclose(reproj[inner], 500.0, atol=1e-3)


class TestInferenceDriver:
    def test_end_to_end_depth_generation_and_fusion(self, tmp_path):
        """Full pipeline: scene -> dataset -> inference -> PFM -> fusion."""
        scene, gt, K, Es = make_plane_scene(tmp_path, H=32, W=40, num_views=3,
                                            focal=200.0)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=8,
                         max_h=32, max_w=40)
        params = init_params(jax.random.PRNGKey(0), 32, 40)
        out_root = os.path.join(tmp_path, "outputs")
        stats = run_inference(
            params, ds,
            InferConfig(out_root=out_root, depth_block=4,
                        feature_dtype=np.float32, num_workers=2),
            progress=False,
        )
        assert stats["count"] == 3
        for v in range(3):
            d, _ = read_pfm(os.path.join(out_root, f"scan1/depth_est_0/{v:08d}.pfm"))
            c, _ = read_pfm(os.path.join(out_root, f"scan1/confidence_0/{v:08d}.pfm"))
            assert d.shape == (32, 40) and np.isfinite(d).all()
            assert (c >= 0).all() and (c <= 1.0001).all()


class TestInferencePackedLevers:
    def test_gather_pack_taps6_matches_default_eval(self, tmp_path):
        """run_inference with the round-4 packed levers (gather_pack=2,
        6x6 tables) writes the same depth maps as the default path when
        the per-sample gate passes."""
        import jax.numpy as jnp

        from aa_rmvsnet_tpu.core.pfm import read_pfm
        from aa_rmvsnet_tpu.models import init_params
        from aa_rmvsnet_tpu.pipeline.infer import InferConfig, run_inference

        make_plane_scene(tmp_path, H=32, W=32, num_views=3, focal=200.0)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        ds = EvalDataset(str(tmp_path), str(listfile), nviews=3, ndepths=8,
                         max_h=32, max_w=32)
        import jax

        params = init_params(jax.random.PRNGKey(0), 32, 32)

        outs = {}
        for tag, kwargs in (
            ("base", {}),
            ("packed", dict(gather_pack=2, table_taps=6, packed_rows=True)),
        ):
            out_root = str(tmp_path / f"out_{tag}")
            run_inference(params, ds, InferConfig(
                out_root=out_root, depth_block=4,
                feature_dtype=jnp.float32, num_workers=0, **kwargs,
            ), progress=False)
            outs[tag] = read_pfm(
                os.path.join(out_root, "scan1/depth_est_0/00000000.pfm"))[0]
        np.testing.assert_allclose(outs["packed"], outs["base"], atol=1e-3)

    def test_int8_dual_levers_through_infer_driver(self, tmp_path):
        """The round-5 production levers (int8 tables + MXU blend, dual
        residual, fused epilogue) through run_inference: outputs stay
        within one depth bin of the unquantized driver output almost
        everywhere on a photoconsistent scene."""
        import jax
        import jax.numpy as jnp

        from aa_rmvsnet_tpu.core.pfm import read_pfm
        from aa_rmvsnet_tpu.models.convert import load_torch_checkpoint
        from aa_rmvsnet_tpu.pipeline.infer import InferConfig, run_inference

        ckpt = "/root/reference/checkpoints/model_dtu_v2.ckpt"
        if not os.path.exists(ckpt):
            pytest.skip("shipped checkpoint absent")
        make_plane_scene(tmp_path, H=64, W=96, num_views=3, focal=600.0)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        ds = EvalDataset(str(tmp_path), str(listfile), nviews=3, ndepths=32,
                         max_h=64, max_w=96)
        params = load_torch_checkpoint(ckpt)
        outs = {}
        for tag, kwargs in (
            ("base", dict()),
            ("levers", dict(table_dtype=jnp.int8, residual_dtype="dual",
                            gather_pack=2, table_taps=6)),
        ):
            out_root = str(tmp_path / f"out_{tag}")
            run_inference(params, ds, InferConfig(
                out_root=out_root, depth_block=4,
                feature_dtype=jnp.float32, num_workers=0, **kwargs,
            ), progress=False)
            outs[tag] = read_pfm(
                os.path.join(out_root, "scan1/depth_est_0/00000000.pfm"))[0]
        bin_w = float(ds[0]["depth_values"][1] - ds[0]["depth_values"][0])
        within = np.abs(outs["levers"] - outs["base"]) <= bin_w + 1e-6
        assert within.mean() >= 0.90, within.mean()

    def test_degrade_chain_keeps_same_window_plain_packed(self):
        """A sample whose SUPER-pack gate fails but whose plain-packed
        span still fits the 6x6 window must resolve to (True, 1, 6) — not
        fall through to 4x4 or the exact per-depth path (ADVICE r4)."""
        import jax.numpy as jnp

        from aa_rmvsnet_tpu.models.network import pick_packed_rows
        from aa_rmvsnet_tpu.pipeline.infer import (
            InferConfig, resolve_packed_mode,
        )

        H, W, D, block, pack = 64, 96, 16, 4, 2
        K = np.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]],
                     np.float32)
        depths = np.linspace(425.0, 935.0, D).astype(np.float32)
        proj = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
        for v in range(3):
            proj[v, 0, 3] = v * 4.0
            proj[v, :3, :4] = K @ proj[v, :3, :4]
        # Widen baselines until the K=8 super span is in (2, 4] px but the
        # plain K=4 span still fits the 6x6 window.
        for mult in (2.0, 3.0, 4.0, 6.0, 8.0, 12.0, 16.0, 24.0):
            p_try = proj.copy()
            p_try[1:, :3, 3] *= mult
            if (not pick_packed_rows(p_try, depths, H, W, block * pack,
                                     taps=6)
                    and pick_packed_rows(p_try, depths, H, W, block,
                                         taps=6)
                    and not pick_packed_rows(p_try, depths, H, W, block,
                                             taps=4)):
                proj = p_try
                break
        else:
            pytest.fail("could not construct the intermediate-span scene")
        sample = {
            "imgs": np.zeros((3, H, W, 3), np.float32),
            "proj_matrices": proj,
            "depth_values": depths,
        }
        cfg = InferConfig(out_root="/tmp/unused", depth_block=block,
                          feature_dtype=jnp.float32, gather_pack=pack,
                          table_taps=6)
        assert resolve_packed_mode(sample, cfg) == (True, 1, 6)

    def test_gather_pack_degrades_on_indivisible_depth_count(self, tmp_path):
        """gather_pack whose super block does not divide D must degrade to
        plain packed instead of crashing the sweep (D=12 with block 4,
        pack 2 -> 12 % 8 != 0)."""
        import jax
        import jax.numpy as jnp

        from aa_rmvsnet_tpu.core.pfm import read_pfm
        from aa_rmvsnet_tpu.models import init_params
        from aa_rmvsnet_tpu.pipeline.infer import InferConfig, run_inference

        make_plane_scene(tmp_path, H=32, W=32, num_views=3, focal=200.0)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        ds = EvalDataset(str(tmp_path), str(listfile), nviews=3, ndepths=12,
                         max_h=32, max_w=32)
        params = init_params(jax.random.PRNGKey(0), 32, 32)
        out_root = str(tmp_path / "out_indiv")
        stats = run_inference(params, ds, InferConfig(
            out_root=out_root, depth_block=4, feature_dtype=jnp.float32,
            num_workers=0, gather_pack=2, table_taps=6,
        ), progress=False)
        assert stats["count"] == len(ds)
        arr = read_pfm(
            os.path.join(out_root, "scan1/depth_est_0/00000000.pfm"))[0]
        assert np.isfinite(arr).all()


class TestInferenceTiming:
    def test_timing_path_forces_host_fetch(self):
        """The axon tunnel's block_until_ready returns without waiting
        (CLAUDE.md), so run_inference's per-batch timing MUST force a
        device-to-host fetch inside the timed region — the timed section
        must contain the np.asarray pull and no block_until_ready."""
        import inspect

        from aa_rmvsnet_tpu.pipeline import infer

        src = inspect.getsource(infer.run_inference)
        assert "jax.block_until_ready(" not in src  # comments may mention it
        timed = src.split("t0 = time.perf_counter()")[1].split(
            "dt = time.perf_counter() - t0"
        )[0]
        assert "np.asarray" in timed  # the fetch is inside the timed region


class TestInferenceFanout:
    def test_fanout_matches_serial(self, tmp_path):
        """Multi-device eval fleet: batches of same-shape samples sharded
        over the mesh's data axis write the same PFMs as the serial loop
        (incl. a ragged tail padded by repetition)."""
        from aa_rmvsnet_tpu.parallel.mesh import make_mesh

        scene, gt, K, Es = make_plane_scene(tmp_path, H=32, W=40, num_views=3,
                                            focal=200.0)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=8,
                         max_h=32, max_w=40)
        params = init_params(jax.random.PRNGKey(0), 32, 40)

        out_serial = os.path.join(tmp_path, "serial")
        run_inference(params, ds,
                      InferConfig(out_root=out_serial, depth_block=4,
                                  feature_dtype=np.float32, num_workers=2),
                      progress=False)

        # 3 samples -> one full batch + ragged tail, on 2 of the 8 devices
        mesh = make_mesh(data=2, devices=jax.devices()[:2])
        out_fan = os.path.join(tmp_path, "fanout")
        stats = run_inference(
            params, ds,
            InferConfig(out_root=out_fan, depth_block=4,
                        feature_dtype=np.float32, num_workers=2, mesh=mesh),
            progress=False)
        assert stats["count"] == 3

        for v in range(3):
            a, _ = read_pfm(os.path.join(out_serial, f"scan1/depth_est_0/{v:08d}.pfm"))
            b, _ = read_pfm(os.path.join(out_fan, f"scan1/depth_est_0/{v:08d}.pfm"))
            np.testing.assert_allclose(b, a, atol=1e-5)
            ca, _ = read_pfm(os.path.join(out_serial, f"scan1/confidence_0/{v:08d}.pfm"))
            cb, _ = read_pfm(os.path.join(out_fan, f"scan1/confidence_0/{v:08d}.pfm"))
            np.testing.assert_allclose(cb, ca, atol=1e-5)


class TestInferenceSpatialSharding:
    def test_spatial_halo_matches_serial(self, tmp_path):
        """(data=1, spatial=2): one map's rows span two devices (GSPMD halo
        exchange); PFMs must match the single-device loop — the tiled
        high-res inference path (BASELINE north-star)."""
        from aa_rmvsnet_tpu.parallel.mesh import make_mesh

        scene, gt, K, Es = make_plane_scene(tmp_path, H=32, W=40, num_views=3,
                                            focal=200.0)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=8,
                         max_h=32, max_w=40)
        params = init_params(jax.random.PRNGKey(0), 32, 40)

        out_serial = os.path.join(tmp_path, "serial")
        run_inference(params, ds,
                      InferConfig(out_root=out_serial, depth_block=4,
                                  feature_dtype=np.float32, num_workers=2),
                      progress=False)

        mesh = make_mesh(data=1, spatial=2, devices=jax.devices()[:2])
        out_sp = os.path.join(tmp_path, "spatial")
        stats = run_inference(
            params, ds,
            InferConfig(out_root=out_sp, depth_block=4,
                        feature_dtype=np.float32, num_workers=2, mesh=mesh),
            progress=False)
        assert stats["count"] == 3

        for v in range(3):
            a, _ = read_pfm(os.path.join(out_serial, f"scan1/depth_est_0/{v:08d}.pfm"))
            b, _ = read_pfm(os.path.join(out_sp, f"scan1/depth_est_0/{v:08d}.pfm"))
            np.testing.assert_allclose(b, a, atol=1e-4)
            ca, _ = read_pfm(os.path.join(out_serial, f"scan1/confidence_0/{v:08d}.pfm"))
            cb, _ = read_pfm(os.path.join(out_sp, f"scan1/confidence_0/{v:08d}.pfm"))
            np.testing.assert_allclose(cb, ca, atol=1e-4)


class TestInferenceDepthPipeline:
    def test_depth_pipeline_matches_serial(self, tmp_path):
        """Mesh with a depth axis: maps stream through the pipeline
        (parallel/depth_pipeline.py) and the PFMs match the serial loop
        bit-for-bit on the depth map."""
        from aa_rmvsnet_tpu.parallel.mesh import make_mesh

        scene, gt, K, Es = make_plane_scene(tmp_path, H=32, W=40, num_views=3,
                                            focal=200.0)
        ds = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=8,
                         max_h=32, max_w=40)
        params = init_params(jax.random.PRNGKey(0), 32, 40)

        out_serial = os.path.join(tmp_path, "serial")
        run_inference(params, ds,
                      InferConfig(out_root=out_serial, depth_block=4,
                                  feature_dtype=np.float32, num_workers=2),
                      progress=False)

        mesh = make_mesh(data=1, depth=2, devices=jax.devices()[:2])
        out_pipe = os.path.join(tmp_path, "pipelined")
        stats = run_inference(
            params, ds,
            InferConfig(out_root=out_pipe, depth_block=4,
                        feature_dtype=np.float32, num_workers=2, mesh=mesh,
                        pipeline_maps=2),  # 3 samples -> one full + ragged
            progress=False)
        assert stats["count"] == 3

        for v in range(3):
            a, _ = read_pfm(os.path.join(out_serial, f"scan1/depth_est_0/{v:08d}.pfm"))
            b, _ = read_pfm(os.path.join(out_pipe, f"scan1/depth_est_0/{v:08d}.pfm"))
            np.testing.assert_array_equal(b, a)
            ca, _ = read_pfm(os.path.join(out_serial, f"scan1/confidence_0/{v:08d}.pfm"))
            cb, _ = read_pfm(os.path.join(out_pipe, f"scan1/confidence_0/{v:08d}.pfm"))
            np.testing.assert_allclose(cb, ca, atol=1e-5)

    def test_depth_pipeline_rejects_evidential_and_mixed_axes(self, tmp_path):
        from aa_rmvsnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=2, depth=2, devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="depth axis exclusively"):
            run_inference(None, [], InferConfig(out_root=str(tmp_path),
                                                mesh=mesh))
    def test_native_matches_numpy_path(self, tmp_path):
        from aa_rmvsnet_tpu.pipeline.native import available, fuse_pair_native

        if not available():
            pytest.skip("no C++ toolchain for the native fusion core")

        _, gt, K, Es = make_plane_scene(tmp_path, H=48, W=64, num_views=2)
        rng = np.random.RandomState(0)
        ref_depth = (gt + rng.randn(*gt.shape).astype(np.float32) * 0.5)
        src_depth = (gt + rng.randn(*gt.shape).astype(np.float32) * 0.5)
        cfg = FuseConfig()

        masks, reproj = graduated_consistency(
            ref_depth, K.astype(np.float64), Es[0].astype(np.float64),
            src_depth, K.astype(np.float64), Es[1].astype(np.float64), cfg,
        )
        level_np = np.stack([m.astype(np.int32) for m in masks])
        loose_np = masks[-1].astype(np.int32)

        level_c = np.zeros_like(level_np)
        loose_c = np.zeros_like(loose_np)
        reproj_c = np.zeros_like(reproj)
        fuse_pair_native(ref_depth, K, Es[0], src_depth, K, Es[1],
                         level_c, loose_c, reproj_c)

        # mask agreement (tiny bilinear rounding differences allowed at
        # threshold boundaries)
        agree = (level_c == level_np).mean()
        assert agree > 0.999, agree
        both = (loose_c > 0) & (loose_np > 0)
        np.testing.assert_allclose(reproj_c[both], reproj[both], rtol=1e-4)

    def test_fuse_scan_native_matches_python(self, tmp_path):
        from aa_rmvsnet_tpu.pipeline import native as native_mod
        from aa_rmvsnet_tpu.core.ply import read_ply

        if not native_mod.available():
            pytest.skip("no C++ toolchain")
        scene, gt, K, Es = make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        out_dir = os.path.join(tmp_path, "out", "scan1")
        for v in range(4):
            write_prediction(out_dir, v, gt, np.full_like(gt, 0.9))
        n_native = fuse_scan(scene, out_dir, os.path.join(tmp_path, "a.ply"),
                             FuseConfig(num_workers=2, use_native=True))
        n_python = fuse_scan(scene, out_dir, os.path.join(tmp_path, "b.ply"),
                             FuseConfig(num_workers=2, use_native=False))
        assert abs(n_native - n_python) <= 0.01 * max(n_native, n_python)
        xa, _ = read_ply(os.path.join(tmp_path, "a.ply"))
        np.testing.assert_allclose(np.median(xa[:, 2]), 500.0, atol=1.0)
