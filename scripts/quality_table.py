"""Produce the indicative quality table: our full pipeline vs the
reference binaries on the exact-GT synthetic scene family
(tests/test_quality_parity.py) — DTU-protocol accuracy/completeness per
scene plus final-mask agreement.  CPU-only; writes markdown to stdout.

This is the same loop the quality-parity tests gate on; the script exists
so the numbers are visible as an artifact, not only as a pass/fail bit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile

import numpy as np


def main():
    import test_quality_parity as qp
    from aa_rmvsnet_tpu.utils.quality import accuracy_completeness

    print("| scene | acc(ours) | acc(ref) | comp(ours) | comp(ref) | "
          "mask disagreement |")
    print("|---|---|---|---|---|---|")
    for name in sorted(qp.SCENES):
        spec = qp.SCENES[name]
        root = tempfile.mkdtemp(prefix=f"qt_{name}_")
        ref_xyz, our_xyz, masks, gt = qp._run_family_scene(root, spec)
        ref_m = accuracy_completeness(ref_xyz, gt, max_dist=10 * qp.DINT)
        our_m = accuracy_completeness(our_xyz, gt, max_dist=10 * qp.DINT)
        dis = float(np.mean([
            np.mean(r != o) for r, o in masks.values()
        ]))
        print(f"| {name} | {our_m['accuracy_mean']:.2f} | "
              f"{ref_m['accuracy_mean']:.2f} | "
              f"{our_m['completeness_mean']:.2f} | "
              f"{ref_m['completeness_mean']:.2f} | {dis * 100:.2f}% |")


if __name__ == "__main__":
    main()
