"""Tests for the uncertainty analytics and training logger."""

import os

import numpy as np

from aa_rmvsnet_tpu.utils.analysis import (
    uncertainty_roc,
    uncertainty_precision_recall,
    calibration_curve,
    sparsification_curve,
    precision_recall_vs_threshold,
    error_uncertainty_density,
    regression_fit,
    plot_density,
    summarize,
    plot_report,
)
from aa_rmvsnet_tpu.utils.logging import TrainLogger


def _well_calibrated(seed=0, n=64):
    """Uncertainty proportional to |error| -> near-perfect detector."""
    rng = np.random.RandomState(seed)
    error = rng.randn(n, n).astype(np.float32) * 10
    uncertainty = np.abs(error) + rng.rand(n, n) * 0.1
    mask = np.ones((n, n), np.float32)
    return error, uncertainty, mask


class TestAnalytics:
    def test_roc_perfect_detector(self):
        e, u, m = _well_calibrated()
        out = uncertainty_roc(e, u, m, error_threshold=10.0)
        assert out["auc"] > 0.99

    def test_roc_random_detector(self):
        e, _, m = _well_calibrated()
        rng = np.random.RandomState(1)
        out = uncertainty_roc(e, rng.rand(*e.shape), m, error_threshold=10.0)
        assert 0.4 < out["auc"] < 0.6

    def test_precision_recall(self):
        e, u, m = _well_calibrated()
        out = uncertainty_precision_recall(e, u, m, error_threshold=10.0)
        assert out["average_precision"] > 0.95

    def test_calibration_monotone_for_good_uncertainty(self):
        e, u, m = _well_calibrated()
        cal = calibration_curve(e, u, m, num_bins=8)
        diffs = np.diff(cal["bin_abs_error"])
        assert (diffs > 0).mean() > 0.8
        assert sum(cal["counts"]) == e.size

    def test_sparsification_good_vs_bad(self):
        e, u, m = _well_calibrated()
        good = sparsification_curve(e, u, m)
        rng = np.random.RandomState(2)
        bad = sparsification_curve(e, rng.rand(*e.shape), m)
        assert good["ause"] < bad["ause"]
        assert good["ause"] < 0.05

    def test_threshold_sweep(self):
        e, u, m = _well_calibrated()
        out = precision_recall_vs_threshold(e, u, m, error_threshold=10.0)
        assert len(out["precision"]) > 10
        # keeping only the most certain pixels should give high precision
        assert out["precision"][0] > 0.95

    def test_density_and_regression(self, tmp_path):
        """uncertainty = |error| -> regression slope ~1, r ~1; density mass
        concentrates on the diagonal (reference statistics.py:395-635,
        914-1053 analogs)."""
        e, u, m = _well_calibrated()
        fit = regression_fit(e, u, m)
        assert 0.9 < fit["linear"]["slope"] < 1.1, fit
        assert fit["linear"]["r"] > 0.99
        assert "loglog" in fit and fit["loglog"]["r"] > 0.9

        dens = error_uncertainty_density(e, u, m, bins=20)
        h = dens["hist"]
        assert h.sum() > 0.98 * (e.size)  # clip quantile drops <2%
        # diagonal dominance: on-diagonal band carries most of the mass
        band = sum(h[i, max(0, i - 1):i + 2].sum() for i in range(20))
        assert band > 0.8 * h.sum()

        out = os.path.join(tmp_path, "density.png")
        plot_density(out, e, u, m)
        assert os.path.getsize(out) > 0

    def test_regression_uninformative_uncertainty(self):
        rng = np.random.RandomState(3)
        e = rng.randn(64, 64).astype(np.float32) * 10
        u = rng.rand(64, 64).astype(np.float32)  # random -> no correlation
        fit = regression_fit(e, u, np.ones_like(u))
        assert abs(fit["linear"]["r"]) < 0.1

    def test_summarize(self):
        e, u, m = _well_calibrated()
        s = summarize(e, u, m)
        assert s["valid_pixels"] == e.size
        assert s["spearman_err_unc"] > 0.95
        assert s["rmse"] >= s["mae"]

    def test_masked_pixels_excluded(self):
        e, u, m = _well_calibrated()
        m2 = m.copy()
        m2[: e.shape[0] // 2] = 0
        s = summarize(e, u, m2)
        assert s["valid_pixels"] == e.size // 2

    def test_plot_report(self, tmp_path):
        e, u, m = _well_calibrated(n=32)
        gt = np.full((32, 32), 500.0, np.float32)
        path = tmp_path / "report.png"
        plot_report(path, np.zeros((32, 32, 3)), gt + e, gt, m, u, u * 0.1)
        assert path.exists() and path.stat().st_size > 0

    def test_plot_means_comparison(self, tmp_path):
        from aa_rmvsnet_tpu.utils.analysis import plot_means_comparison

        path = tmp_path / "means.png"
        plot_means_comparison(
            path,
            {"scan1": {"aleatoric": 1.0, "epistemic": 0.5},
             "scan2": {"aleatoric": 2.0, "epistemic": 0.2}},
        )
        assert path.exists() and path.stat().st_size > 0


class TestTrainLogger:
    def test_scalars_images_dump(self, tmp_path):
        logger = TrainLogger(str(tmp_path / "tb"))
        logger.scalars("train", {"loss": 1.5, "mae": 3.0}, step=1)
        logger.images("train", {"depth": np.random.rand(16, 16)}, step=1)
        path = logger.dump("train", {"depth": np.random.rand(4, 4)}, step=1)
        logger.flush()
        assert os.path.exists(path)
        loaded = np.load(path)
        assert loaded["depth"].shape == (4, 4)
        # tensorboard event file written
        assert any(f.startswith("events") for f in os.listdir(tmp_path / "tb"))
