"""Data-layer parity: our loaders vs the reference dataset classes, run on
the same synthetic scene trees."""

import os
import sys

import numpy as np
import pytest

from aa_rmvsnet_tpu.data import EvalDataset, DTUTrainDataset

from conftest import reference_available
from scenefix import make_plane_scene


pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree absent"
)


class TestEvalDatasetParity:
    def test_matches_reference_eval_loader(self, tmp_path):
        """Same scene -> same images / projections / hypotheses as the
        reference data_eval_transform loader."""
        from oracle import import_reference_module

        make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        ref_ds_mod = import_reference_module("datasets.data_eval_transform")
        ref = ref_ds_mod.MVSDataset(
            str(tmp_path) + "/", str(listfile), "test", 3, 16, 1.0, False,
            adaptive_scaling=True, max_h=64, max_w=80, sample_scale=1,
            base_image_size=8,
        )

        ours = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=16,
                           interval_scale=1.0, max_h=64, max_w=80)

        r = ref[0]
        o = ours[0]
        # reference imgs: (V, 3, H, W); ours: (V, H, W, 3)
        ref_imgs = np.asarray(r["imgs"]).transpose(0, 2, 3, 1)
        # PIL (reference) and cv2 (ours) JPEG decoders may differ by ±1 LSB;
        # after per-image standardization that is ~1e-2 in normalized units.
        assert ref_imgs.shape == o["imgs"].shape
        np.testing.assert_allclose(o["imgs"], ref_imgs, atol=0.05)
        np.testing.assert_allclose(
            o["proj_matrices"], np.asarray(r["proj_matrices"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            o["depth_values"], np.asarray(r["depth_values"]), rtol=1e-6
        )
        assert o["filename"] == r["filename"]

    def test_matches_reference_inverse_depth(self, tmp_path):
        from oracle import import_reference_module

        make_plane_scene(tmp_path, H=64, W=80, num_views=4)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        ref_ds_mod = import_reference_module("datasets.data_eval_transform")
        ref = ref_ds_mod.MVSDataset(
            str(tmp_path) + "/", str(listfile), "test", 3, 16, 1.0, True,
            adaptive_scaling=True, max_h=64, max_w=80, sample_scale=1,
            base_image_size=8,
        )
        ours = EvalDataset(str(tmp_path), ["scan1"], nviews=3, ndepths=16,
                           interval_scale=1.0, inverse_depth=True,
                           max_h=64, max_w=80)
        np.testing.assert_allclose(
            ours[0]["depth_values"], np.asarray(ref[0]["depth_values"]), rtol=1e-6
        )

    def test_matches_reference_padding_loader(self, tmp_path):
        """Padded-TnT variant: +8 rows, cy+4, bounded inverse depth,
        both-ends view selection."""
        from oracle import import_reference_module

        make_plane_scene(tmp_path, H=64, W=80, num_views=6, with_depth_end=True)
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")
        ref_mod = import_reference_module("datasets.data_eval_transform_padding")
        ref = ref_mod.MVSDataset(
            str(tmp_path) + "/", str(listfile), "test", 5, 16, 1.0, True,
            adaptive_scaling=True, max_h=72, max_w=80, sample_scale=1,
            base_image_size=8,
        )
        ours = EvalDataset(str(tmp_path), ["scan1"], nviews=5, ndepths=16,
                           interval_scale=1.0, max_h=72, max_w=80,
                           pad_vertical=True)
        r, o = ref[0], ours[0]
        ref_imgs = np.asarray(r["imgs"]).transpose(0, 2, 3, 1)
        assert o["imgs"].shape == ref_imgs.shape  # (5, 72, 80, 3)
        np.testing.assert_allclose(o["imgs"], ref_imgs, atol=0.05)
        np.testing.assert_allclose(
            o["proj_matrices"], np.asarray(r["proj_matrices"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            o["depth_values"], np.asarray(r["depth_values"]), rtol=1e-6
        )


class TestDTUTrainParity:
    def test_matches_reference_train_loader(self, tmp_path):
        from oracle import import_reference_module
        from test_pipeline import TestDTUTrainDataset as Maker

        listfile = Maker()._make_dtu(str(tmp_path), H=64, W=80)
        ref_mod = import_reference_module("datasets.dtu_yao")
        ref = ref_mod.MVSDataset(
            str(tmp_path), listfile, "train", 3, ndepths=8,
            interval_scale=1.06, image_scale=0.25, both=True,
        )
        ours = DTUTrainDataset(str(tmp_path), listfile, nviews=3, ndepths=8,
                               interval_scale=1.06, image_scale=0.25)
        assert len(ref) == len(ours)

        for idx in (0, 1, 7):
            r, o = ref[idx], ours[idx]
            ref_imgs = np.asarray(r["imgs"]).transpose(0, 2, 3, 1)
            # PIL resize (reference read_img) vs cv2 INTER_LINEAR differ in
            # antialias behavior; compare geometry-critical fields tightly
            # and images loosely.
            assert ref_imgs.shape == o["imgs"].shape
            np.testing.assert_allclose(
                o["proj_matrices"], np.asarray(r["proj_matrices"]), rtol=1e-5
            )
            np.testing.assert_allclose(
                o["depth_values"], np.asarray(r["depth_values"]), rtol=1e-6
            )
            np.testing.assert_array_equal(o["mask"], np.asarray(r["mask"]))
            np.testing.assert_allclose(o["depth"], np.asarray(r["depth"]), atol=1e-6)
            assert float(o["depth_interval"]) == pytest.approx(
                float(r["depth_interval"]), rel=1e-6
            )
