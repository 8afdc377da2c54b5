"""Tests for the CPU-pure core layer (PFM, cameras, samplers, transforms, PLY)."""

import os

import numpy as np
import pytest

from aa_rmvsnet_tpu.core import (
    read_pfm,
    save_pfm,
    write_ply,
    read_cam_file,
    read_pair_file,
    projection_matrix,
    scale_intrinsics,
    crop_intrinsics,
    linear_depth_train,
    linear_depth_eval,
    inverse_depth_open,
    inverse_depth_bounded,
    standardize_image,
    center_crop_to_multiple,
    pad_rows,
)
from aa_rmvsnet_tpu.core.ply import read_ply
from aa_rmvsnet_tpu.core.samplers import maybe_flip

from conftest import reference_available, REFERENCE_ROOT


class TestPFM:
    def test_roundtrip_gray(self, tmp_path):
        img = np.random.RandomState(0).rand(37, 53).astype(np.float32)
        path = tmp_path / "x.pfm"
        save_pfm(path, img)
        out, scale = read_pfm(path)
        np.testing.assert_array_equal(out, img)
        assert scale == 1.0

    def test_roundtrip_color(self, tmp_path):
        img = np.random.RandomState(1).rand(16, 9, 3).astype(np.float32)
        path = tmp_path / "c.pfm"
        save_pfm(path, img)
        out, _ = read_pfm(path)
        np.testing.assert_array_equal(out, img)

    def test_rejects_non_float32(self, tmp_path):
        with pytest.raises(ValueError):
            save_pfm(tmp_path / "bad.pfm", np.zeros((4, 4), dtype=np.float64))

    @pytest.mark.skipif(not reference_available(), reason="reference tree absent")
    def test_matches_reference_codec(self, tmp_path):
        from oracle import import_reference_module

        ref_io = import_reference_module("datasets.data_io")
        img = np.random.RandomState(2).rand(24, 31).astype(np.float32)
        ours = tmp_path / "ours.pfm"
        theirs = tmp_path / "theirs.pfm"
        save_pfm(ours, img)
        ref_io.save_pfm(str(theirs), img)
        assert ours.read_bytes() == theirs.read_bytes()
        np.testing.assert_array_equal(read_pfm(theirs)[0], ref_io.read_pfm(str(ours))[0])


class TestCameras:
    def _write_cam(self, path, dmin=425.0, dint=2.5, extra=""):
        E = np.arange(16, dtype=np.float32).reshape(4, 4) / 7.0
        E[3] = [0, 0, 0, 1]
        K = np.array([[1446.16, 0, 800.0], [0, 1446.16, 600.0], [0, 0, 1]], np.float32)
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
        lines += ["", f"{dmin} {dint}{extra}"]
        path.write_text("\n".join(lines) + "\n")
        return K, E

    def test_parse(self, tmp_path):
        p = tmp_path / "00000000_cam.txt"
        K, E = self._write_cam(p)
        cam = read_cam_file(p, interval_scale=2.0)
        np.testing.assert_allclose(cam.intrinsics, K, rtol=1e-5)
        np.testing.assert_allclose(cam.extrinsics, E, rtol=1e-5)
        assert cam.depth_min == 425.0
        assert cam.depth_interval == pytest.approx(5.0)
        assert cam.depth_end is None

    def test_parse_with_depth_end(self, tmp_path):
        p = tmp_path / "cam.txt"
        self._write_cam(p, extra=" 512 935.0")
        cam = read_cam_file(p)
        assert cam.depth_num == 512
        assert cam.depth_end == 935.0

    def test_intrinsics_scale_and_cy_offset(self, tmp_path):
        p = tmp_path / "cam.txt"
        K, _ = self._write_cam(p)
        cam = read_cam_file(p, intrinsics_scale=4.0, cy_offset=4.0)
        np.testing.assert_allclose(cam.intrinsics[:2, :2], K[:2, :2] * 4, rtol=1e-5)
        assert cam.intrinsics[1, 2] == pytest.approx(K[1, 2] * 4 + 4)

    def test_projection_matrix(self, tmp_path):
        p = tmp_path / "cam.txt"
        K, E = self._write_cam(p)
        proj = projection_matrix(K, E)
        np.testing.assert_allclose(proj[:3], K @ E[:3], rtol=1e-5)
        np.testing.assert_array_equal(proj[3], [0, 0, 0, 1])

    def test_scale_crop_intrinsics(self):
        K = np.array([[100.0, 0, 50], [0, 80, 40], [0, 0, 1]], np.float32)
        Ks = scale_intrinsics(K, 0.5)
        assert Ks[0, 0] == 50 and Ks[1, 2] == 20
        Kc = crop_intrinsics(K, start_w=8, start_h=4)
        assert Kc[0, 2] == 42 and Kc[1, 2] == 36

    def test_pair_file(self, tmp_path):
        p = tmp_path / "pair.txt"
        p.write_text("2\n0\n3 10 2.0 1 1.5 22 0.5\n5\n1 0 9.9\n")
        pairs = read_pair_file(p)
        assert pairs == [(0, [10, 1, 22]), (5, [0])]

    @pytest.mark.skipif(not reference_available(), reason="reference tree absent")
    def test_reference_pair_lists_parse(self):
        lists = os.path.join(REFERENCE_ROOT, "lists/dtu/train.txt")
        scans = [s.strip() for s in open(lists)]
        assert len(scans) == 79 or len(scans) == 78  # reference train split


class TestSamplers:
    def test_linear_train(self):
        d = linear_depth_train(425.0, 2.5, 192)
        assert d.shape == (192,) and d.dtype == np.float32
        assert d[0] == 425.0
        assert d[-1] == pytest.approx(425.0 + 2.5 * 191)

    def test_linear_eval(self):
        d = linear_depth_eval(425.0, 2.5, 256)
        assert d.shape == (256,)
        np.testing.assert_allclose(d, 425.0 + 2.5 * np.arange(256), rtol=1e-6)

    def test_inverse_open(self):
        d = inverse_depth_open(425.0, 128)
        assert d[0] == pytest.approx(425.0)
        assert np.all(np.diff(d) > 0)  # increasing toward infinity
        ref = 1.0 / np.linspace(1.0 / 425.0, 0.0, 128, endpoint=False)
        np.testing.assert_allclose(d, ref.astype(np.float32), rtol=1e-6)

    def test_inverse_bounded(self):
        d = inverse_depth_bounded(2.0, 10.0, 64)
        ref = 1.0 / np.linspace(0.5, 0.1, 64, endpoint=False)
        np.testing.assert_allclose(d, ref.astype(np.float32), rtol=1e-6)

    def test_flip(self):
        d = linear_depth_eval(1.0, 1.0, 8)
        np.testing.assert_array_equal(maybe_flip(d, True), d[::-1])
        np.testing.assert_array_equal(maybe_flip(d, False), d)


class TestTransforms:
    def test_standardize(self):
        img = np.random.RandomState(0).rand(32, 48, 3).astype(np.float32) * 255
        out = standardize_image(img)
        np.testing.assert_allclose(out.mean(axis=(0, 1)), 0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=(0, 1)), 1, atol=1e-3)

    def test_center_crop_to_multiple(self):
        img = np.zeros((601, 799, 3), np.float32)
        out, sh, sw = center_crop_to_multiple(img, max_h=600, max_w=800, base=8)
        # 601 > 600 caps to 600; 799 < 800 rounds down to the aligned 792.
        assert out.shape == (600, 792, 3)
        assert sh == 1 and sw == 4
        img2 = np.zeros((300, 300, 3), np.float32)
        out2, _, _ = center_crop_to_multiple(img2, max_h=600, max_w=800, base=8)
        assert out2.shape[0] % 8 == 0 and out2.shape[1] % 8 == 0

    def test_pad_rows(self):
        img = np.ones((10, 5, 3), np.float32)
        out = pad_rows(img)
        assert out.shape == (18, 5, 3)
        assert out[:4].sum() == 0 and out[-4:].sum() == 0
        np.testing.assert_array_equal(out[4:-4], img)


class TestPly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(3)
        xyz = rng.randn(100, 3).astype(np.float32)
        rgb = rng.randint(0, 256, (100, 3)).astype(np.uint8)
        path = tmp_path / "cloud.ply"
        write_ply(path, xyz, rgb)
        x2, c2 = read_ply(path)
        np.testing.assert_array_equal(x2, xyz)
        np.testing.assert_array_equal(c2, rgb)


class TestPF:
    def test_read_pf(self, tmp_path):
        import numpy as np
        from aa_rmvsnet_tpu.core.pfm import read_pf

        data = np.arange(12, dtype="<f4").reshape(3, 4)
        path = tmp_path / "img.PF"
        with open(path, "wb") as f:
            f.write(b"Typ=Pic98::TPlane<float>\nLines=3\nColumns=4\n")
            f.write(data.tobytes())
        out = read_pf(path)
        np.testing.assert_array_equal(out, data)

    def test_read_pf_rejects_other(self, tmp_path):
        from aa_rmvsnet_tpu.core.pfm import read_pf

        path = tmp_path / "x.PF"
        path.write_bytes(b"NotAPF")
        assert read_pf(path) is None
