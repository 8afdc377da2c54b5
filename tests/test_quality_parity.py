"""Closed quality loop vs the reference binaries on synthetic GT geometry
(VERDICT r2 item 4): run eval + fusion end-to-end, measure point-cloud
accuracy/completeness against the ANALYTIC ground-truth cloud, and assert
our numbers are within 1% of the reference pipeline's on the same scene.

The parity bar is built with the reference's real fusion.py (run verbatim
via tests/reference_shim.py) on the SAME depth maps our eval produced:
the reference's own eval binary saves the evidential gamma as depth_est
(quirk ledger, reference eval.py:165) which, with no shipped head weights,
does not represent its published WTA+fusion path — feeding both fusions
identical WTA maps isolates exactly the "does our pipeline lose geometry
quality anywhere" question with the reference binary in the loop.
"""

from __future__ import annotations

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

H, W, D, NVIEWS = 32, 64, 32, 3
DMIN, DINT, PLANE = 425.0, 5.0, 500.0
FOCAL = 2000.0


def _gt_cloud():
    """Analytic GT: back-project every ref pixel at the plane depth
    (cam0 = world frame)."""
    f, cx, cy = FOCAL, W / 2.0, H / 2.0
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    gt = np.stack(
        [(xs - cx) * PLANE / f, (ys - cy) * PLANE / f,
         np.full_like(xs, PLANE)], -1
    ).reshape(-1, 3)
    return gt.astype(np.float32)


@pytest.fixture(scope="module")
def clouds(tmp_path_factory):
    if not os.path.exists(CKPT):
        pytest.skip("shipped checkpoint absent")
    from aa_rmvsnet_tpu.cli import main
    from aa_rmvsnet_tpu.core.ply import read_ply

    root = str(tmp_path_factory.mktemp("quality_parity"))
    make_plane_scene(root, H=H, W=W, num_views=NVIEWS, focal=FOCAL,
                     plane_depth=PLANE, dmin=DMIN, dint=DINT)
    listfile = os.path.join(root, "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")

    # Our eval (WTA depth — the reference's published-numbers path).
    our_out = os.path.join(root, "our_out")
    main([
        "eval", "--testpath", root, "--testlist", listfile,
        "--preset", "dtu_eval_smoke", "--loadckpt", CKPT,
        "--numdepth", str(D), "--interval_scale", "1.0",
        "--max_h", str(H), "--max_w", str(W), "--view_num", str(NVIEWS),
        "--fp32", "--depth_block", "8", "--outdir", our_out,
    ])

    # Same maps into BOTH fusion binaries.
    ref_dir = os.path.join(root, "fuse_ref")
    our_dir = os.path.join(root, "fuse_our")
    for d in (ref_dir, our_dir):
        shutil.copytree(os.path.join(our_out, "scan1"),
                        os.path.join(d, "scan1"))

    proc = subprocess.run(
        [sys.executable, SHIM, "fusion",
         "--testpath", root, "--testlist", listfile,
         "--outdir", ref_dir, "--test_dataset", "dtu"],
        cwd=root, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    main(["fuse", "--testpath", root, "--testlist", listfile,
          "--outdir", our_dir, "--test_dataset", "dtu", "--num_workers", "2"])

    ref_xyz = read_ply(os.path.join(ref_dir, "mvsnet_001_l3.ply"))[0]
    our_xyz = read_ply(os.path.join(our_dir, "mvsnet_001_l3.ply"))[0]
    return ref_xyz, our_xyz


class TestQualityParity:
    def test_acc_comp_within_1pct_of_reference(self, clouds):
        """DTU-style acc/comp vs analytic GT: ours may not be more than 1%
        worse than the reference pipeline's on the same scene (BASELINE
        north-star: <=1% acc/comp regression)."""
        from aa_rmvsnet_tpu.utils.quality import accuracy_completeness

        ref_xyz, our_xyz = clouds
        assert len(ref_xyz) > 200 and len(our_xyz) > 200
        gt = _gt_cloud()
        ref_m = accuracy_completeness(ref_xyz, gt, max_dist=10 * DINT)
        our_m = accuracy_completeness(our_xyz, gt, max_dist=10 * DINT)

        for key in ("accuracy_mean", "completeness_mean"):
            # "within 1%": our error may exceed the reference's by at most
            # 1% (plus an epsilon for bilinear mask-boundary rounding).
            assert our_m[key] <= ref_m[key] * 1.01 + 1e-3, (key, our_m, ref_m)
        # Sanity: both pipelines actually localize the plane (the bar is
        # non-vacuous) — errors well under one depth bin on average.
        assert ref_m["accuracy_mean"] < 2.5 * DINT, ref_m
        assert our_m["accuracy_mean"] < 2.5 * DINT, our_m
