"""Benchmark harness contracts: one parseable JSON line per script.

Runs the scaling bench on the virtual CPU mesh (plumbing validation — the
efficiency value there reflects shared host cores, not ICI, and is NOT
asserted; the record's structure and platform field are).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_scaling_bench_json_contract():
    env = dict(os.environ)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        BENCH_FORCE_CPU="1",
        BENCH_SIZE="32x40",
        BENCH_DEPTH="4",
        BENCH_VIEWS="2",
        BENCH_ITERS="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/bench_scaling.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["platform"] == "cpu"
    assert rec["n_devices"] == 8
    assert rec["t_1dev_s"] > 0 and rec["t_ndev_s"] > 0
    assert rec["value"] == pytest.approx(rec["t_1dev_s"] / rec["t_ndev_s"], rel=1e-3)
    assert rec["mesh"] == {"data": 8, "spatial": 1}


@pytest.mark.slow
def test_bench_json_contract():
    """bench.py must print one JSON line with the headline metric plus the
    roofline accounting the driver records (gather-row + byte/FLOP)."""
    env = dict(os.environ)
    env.update(
        BENCH_FORCE_CPU="1",
        BENCH_SIZE="32x40",
        BENCH_DEPTH="8",
        BENCH_VIEWS="2",
        BENCH_BLOCK="4",
        BENCH_ITERS="1",
        BENCH_DTYPE="float32",
        BENCH_TABLE_DTYPE="none",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["value"] > 0
    rows = 1 * 8 * 32 * 40
    if rec["config"]["packed_rows"]:  # BENCH_PACKED=auto may enable packing
        rows //= rec["config"]["depth_block"] * rec["config"]["gather_pack"]
    assert rec["gather_mrows"] == pytest.approx(rows / 1e6, abs=1e-3)
    assert rec["gather_roofline_fraction"] > 0


def test_analytic_macs_derived_from_param_tree():
    """The analytic cost model derives per-module MAC/px from the actual
    kernel shapes (ADVICE r3: the former hardcoded constants silently
    drifted from the architecture — and indeed undercounted the U-Net by
    ~9%).  Pin the shipped-architecture values so a width change that
    alters them is a visible diff, and cross-check one module by hand."""
    import jax

    sys.path.insert(0, REPO)
    import bench
    from aa_rmvsnet_tpu.models.network import init_params

    params = init_params(jax.random.PRNGKey(0), 16, 16)
    macs = bench._macs_per_px(params)
    # Hand count for omega (all full-res): rw0 3x3x32x4 + rw1 two 1x1x4x4
    # + rw2 1x1x4x1 = 1152 + 32 + 4.
    assert macs["omega"] == pytest.approx(1188.0)
    # Shipped-architecture pins (see bench._AREA_FACTORS for the factors).
    assert macs["cost_regularization"] == pytest.approx(52632.0)
    assert macs["feature"] == pytest.approx(31750.0)


@pytest.mark.slow
def test_bench_supervisor_survives_worker_crash():
    """The supervisor must emit a valid JSON line (rc 0) even when the
    worker dies before printing anything — the round-2 driver failure mode
    (BENCH_r02.json: rc=1, parsed=null)."""
    env = dict(os.environ)
    env.update(
        BENCH_FORCE_CPU="1",
        BENCH_SIZE="32x40",
        BENCH_DEPTH="8",
        BENCH_VIEWS="2",
        # Invalid size for the network (not divisible by 4) would not crash
        # early enough; instead poison the worker via an unparseable size.
        BENCH_BLOCK="notanint",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert "note" in rec  # fallback record is labeled, not silently fabricated
