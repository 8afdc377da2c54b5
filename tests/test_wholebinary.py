"""Whole-binary oracle parity: the reference's ACTUAL executables
(eval.py, fusion.py — run verbatim via tests/reference_shim.py) vs this
framework's CLI on the same synthetic photoconsistent scene.

Unlike the per-stage parity tests this exercises the full on-disk
pipelines end to end: dataset -> forward -> PFM writers on both sides
(reference eval.py:56-171), then consistency filtering + fusion -> PLY
(reference fusion.py:135-273).  Inputs match (same scene tree, same
combined checkpoint: shipped 187k core weights + one fixed random-init
evidential head); outputs are diffed file-for-file.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT
from scenefix import make_plane_scene

CKPT = os.path.join(REFERENCE_ROOT, "checkpoints/model_dtu_v2.ckpt")
SHIM = os.path.join(os.path.dirname(__file__), "reference_shim.py")

pytestmark = pytest.mark.slow

# Scene geometry: H,W multiples of 16 (the evidential hourglass needs
# H/4, W/4 divisible by 4 — the reference crashes identically otherwise);
# D=32 exactly so the reference's trilinear D->32 resample is the identity
# (our head fixes D!=32 resampling per the quirk ledger, so parity is only
# defined at D=32).  Plane at 500 = bin 15 of arange(425, 425+32*5).
# focal=2000 so a 1-bin depth error = 0.08 px/view of warp misalignment —
# enough signal for the trained network to localize the plane to ~1 bin
# (the ConvLSTM regularizer biases ~1 bin low on smooth synthetic texture;
# the reference binary does the same, so parity is unaffected).
H, W, D, NVIEWS = 32, 64, 32, 3
DMIN, DINT, PLANE = 425.0, 5.0, 500.0
FOCAL = 2000.0


def _run_shim(mode: str, argv: list[str], cwd: str):
    proc = subprocess.run(
        [sys.executable, SHIM, mode, *argv],
        cwd=cwd, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"reference {mode}.py failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    # The reference swallows per-sample exceptions (eval.py:170 bare
    # except, quirk ledger) — surface them so a silent failure can't
    # produce a vacuous diff.
    assert "PROBLEM!!!" not in proc.stdout, proc.stdout[-3000:]
    return proc


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Build the scene + combined ckpt, run both eval binaries once."""
    if not os.path.exists(CKPT):
        pytest.skip("shipped checkpoint absent")
    import torch

    from oracle import import_reference_module, patch_cuda_to_cpu

    root = str(tmp_path_factory.mktemp("wholebinary"))
    make_plane_scene(root, H=H, W=W, num_views=NVIEWS, focal=FOCAL,
                     plane_depth=PLANE, dmin=DMIN, dint=DINT)
    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")

    # Combined checkpoint: shipped core weights + a fixed random-init
    # evidential head (the shipped ckpts carry no evidential.* keys,
    # SURVEY §0.1, so eval.py's strict load needs the union).
    drmvsnet = import_reference_module("models.drmvsnet")
    torch.manual_seed(0)
    with patch_cuda_to_cpu():
        model = drmvsnet.EMVSNet(max_h=H, max_w=W, disparity_level=D,
                                 return_depth=True)
    core = torch.load(CKPT, map_location="cpu", weights_only=True)["model"]
    missing, unexpected = model.load_state_dict(core, strict=False)
    assert not unexpected and all(k.startswith("evidential.") for k in missing)
    ckpt_dir = os.path.join(root, "combined")
    os.makedirs(ckpt_dir)
    combined = os.path.join(ckpt_dir, "model_combined.ckpt")
    torch.save({"model": model.state_dict(), "epoch": 0}, combined)

    # --- reference eval.py (verbatim, CPU/torch-1.1-patched via shim) ---
    ref_out = os.path.join(root, "ref_out")
    _run_shim("eval", [
        "--dataset", "data_eval_transform",
        "--testpath", root, "--testlist", listfile,
        "--loadckpt", combined, "--outdir", ref_out,
        "--max_h", str(H), "--max_w", str(W), "--numdepth", str(D),
        "--interval_scale", "1.0", "--view_num", str(NVIEWS),
    ], cwd=root)
    # eval.py nests outputs under <outdir>/<dir>_<file>/
    ref_scan = os.path.join(ref_out, "combined_model_combined.ckpt", "scan1")
    assert os.path.isdir(ref_scan), os.listdir(ref_out)

    from aa_rmvsnet_tpu.cli import main

    # --- our CLI, evidential depth source (= the reference quirk) ---
    our_out = os.path.join(root, "our_out")
    common = [
        "--testpath", root, "--testlist", listfile,
        "--preset", "dtu_eval_smoke", "--loadckpt", combined,
        "--numdepth", str(D), "--interval_scale", "1.0",
        "--max_h", str(H), "--max_w", str(W), "--view_num", str(NVIEWS),
        "--fp32", "--depth_block", "8",
    ]
    main(["eval", *common, "--outdir", our_out,
          "--evidential_ckpt", combined])

    # --- our CLI, WTA depth (the path behind the published numbers) ---
    wta_out = os.path.join(root, "wta_out")
    main(["eval", *common, "--outdir", wta_out])

    return dict(root=root, listfile=listfile, ref_scan=ref_scan,
                our_scan=os.path.join(our_out, "scan1"),
                wta_scan=os.path.join(wta_out, "scan1"))


class TestEvalBinaryParity:
    @pytest.mark.parametrize("sub,rtol,atol", [
        # depth_est = evidential gamma, O(500); head outputs agree to the
        # evidential-parity budget (tests/test_evidential.py: 2e-3)
        ("depth_est_0", 0.0, 1.5),
        ("confidence_0", 0.0, 1e-3),
        ("epistemic_0", 2e-3, 1e-3),
        ("aleatoric_0", 2e-3, 5e-2),
    ])
    def test_pfm_dirs_match(self, pipeline, sub, rtol, atol):
        from aa_rmvsnet_tpu.core.pfm import read_pfm

        ref_files = sorted(glob.glob(os.path.join(pipeline["ref_scan"], sub, "*.pfm")))
        assert len(ref_files) == NVIEWS, (sub, ref_files)
        for rf in ref_files:
            ours = os.path.join(pipeline["our_scan"], sub, os.path.basename(rf))
            assert os.path.exists(ours), ours
            a = read_pfm(rf)[0]
            b = read_pfm(ours)[0]
            assert a.shape == b.shape, (a.shape, b.shape)
            np.testing.assert_allclose(b, a, rtol=rtol, atol=atol,
                                       err_msg=f"{sub}/{os.path.basename(rf)}")

    def test_wta_depth_hits_gt_plane(self, pipeline):
        """Quality sanity on the WTA path: confident pixels localize the
        plane to ~1 depth bin (the regularizer biases one bin low on
        synthetic smooth texture — so the bound is bins, not exactness)."""
        from aa_rmvsnet_tpu.core.pfm import read_pfm

        depth = read_pfm(os.path.join(pipeline["wta_scan"], "depth_est_0/00000000.pfm"))[0]
        conf = read_pfm(os.path.join(pipeline["wta_scan"], "confidence_0/00000000.pfm"))[0]
        good = conf > 0.35
        assert good.mean() > 0.5
        assert abs(np.median(depth[good]) - PLANE) <= DINT + 1e-3
        frac = (np.abs(depth[good] - PLANE) <= 2 * DINT + 1e-3).mean()
        assert frac > 0.95, frac


class TestFusionBinaryParity:
    @pytest.fixture(scope="class")
    def fused(self, pipeline):
        """Feed IDENTICAL depth maps (our WTA eval outputs) to the
        reference's fusion.py and to `cli fuse`; diff the point clouds.
        Using the same inputs isolates fusion parity from the eval quirk
        (reference eval saves evidential gamma as depth_est)."""
        from aa_rmvsnet_tpu.cli import main

        root = pipeline["root"]
        ref_dir = os.path.join(root, "fuse_ref")
        our_dir = os.path.join(root, "fuse_our")
        for d in (ref_dir, our_dir):
            shutil.copytree(pipeline["wta_scan"], os.path.join(d, "scan1"))

        _run_shim("fusion", [
            "--testpath", root, "--testlist", pipeline["listfile"],
            "--outdir", ref_dir, "--test_dataset", "dtu",
        ], cwd=root)
        main(["fuse", "--testpath", root, "--testlist", pipeline["listfile"],
              "--outdir", our_dir, "--test_dataset", "dtu",
              "--num_workers", "2"])

        from aa_rmvsnet_tpu.core.ply import read_ply

        ref_ply = os.path.join(ref_dir, "mvsnet_001_l3.ply")
        our_ply = os.path.join(our_dir, "mvsnet_001_l3.ply")
        assert os.path.exists(ref_ply) and os.path.exists(our_ply)
        return read_ply(ref_ply)[0], read_ply(our_ply)[0]

    def test_point_clouds_agree(self, fused):
        from aa_rmvsnet_tpu.utils.quality import accuracy_completeness

        ref_xyz, our_xyz = fused
        assert len(ref_xyz) > 200, len(ref_xyz)  # non-vacuous
        # Mask boundaries may round differently (native-core equivalence
        # budget: <0.1% mask disagreement) — counts near-equal, geometry
        # chamfer-tight.
        assert abs(len(ref_xyz) - len(our_xyz)) <= 0.01 * len(ref_xyz) + 5
        m = accuracy_completeness(our_xyz, ref_xyz, max_dist=DINT)
        assert m["accuracy_mean"] < 0.05, m
        assert m["completeness_mean"] < 0.05, m

    def test_fused_cloud_matches_synthetic_gt(self, fused):
        """The quality harness against analytic GT: every fused point must
        lie on the Z=500 plane (cam0 = world frame), within the WTA bin."""
        from aa_rmvsnet_tpu.utils.quality import accuracy_completeness

        _, our_xyz = fused
        # Analytic GT cloud: back-project every pixel at depth 500.
        f, cx, cy = FOCAL, W / 2.0, H / 2.0
        xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        gt = np.stack([(xs - cx) * PLANE / f, (ys - cy) * PLANE / f,
                       np.full_like(xs, PLANE)], -1).reshape(-1, 3)
        m = accuracy_completeness(our_xyz, gt.astype(np.float32),
                                  max_dist=10 * DINT)
        # accuracy: fused depths sit within ~2 bins of the plane;
        # completeness is looser — border/inconsistent pixels are masked.
        assert m["accuracy_mean"] < 2.5 * DINT, m
        assert m["completeness_mean"] < 4 * DINT, m
