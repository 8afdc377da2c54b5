"""Train the evidential head to USEFULNESS on synthetic scenes (VERDICT r2
item 8): after a short NIG training run on mixed textured/textureless
scenes, the head's uncertainty must actually rank depth error on a
held-out scene — ROC-AUC > 0.7 and AUSE well below a random ranking —
and the analyze CLI must produce an analysis/report.json from the real
trained head's outputs.

Setup: the shipped 187k core (frozen) produces probability volumes for
plane scenes where a horizontal band is textureless — matching there is
ambiguous, so the WTA/softmax depth is wrong inside the band and accurate
outside it.  The head (reference evidential/models.py:330-460; trained by
reference train.py:234-247 via loss_der) sees only the volume, so learning
"diffuse volume -> high uncertainty" is exactly its job.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from aa_rmvsnet_tpu.data import EvalDataset
from aa_rmvsnet_tpu.models.convert import load_torch_checkpoint
from aa_rmvsnet_tpu.models.evidential import (
    EvidentialHead,
    init_evidential,
    loss_emvsnet,
    uncertainty_decompositions,
)
from aa_rmvsnet_tpu.models.network import SweepConfig, forward, probability_volume
from aa_rmvsnet_tpu.utils.analysis import sparsification_curve, uncertainty_roc

from scenefix import make_plane_scene

CKPT = "/root/reference/checkpoints/model_dtu_v2.ckpt"

pytestmark = pytest.mark.slow

H, W, D, NVIEWS = 32, 32, 16, 3
DMIN, DINT, PLANE = 425.0, 5.5, 500.0  # plane ~bin 13.6 of 16


def _volume(params, root, scan, band):
    make_plane_scene(root, scan=scan, H=H, W=W, num_views=NVIEWS,
                     focal=2000.0, plane_depth=PLANE, dmin=DMIN, dint=DINT,
                     seed=hash(scan) % 10_000, textureless_rows=band)
    ds = EvalDataset(root, [scan], nviews=NVIEWS, ndepths=D, max_h=H, max_w=W)
    s = ds[0]
    out = jax.jit(
        lambda p, i, pr, d: forward(p, i, pr, d, SweepConfig(depth_block=8))
    )(params, jnp.asarray(s["imgs"][None]), jnp.asarray(s["proj_matrices"][None]),
      jnp.asarray(s["depth_values"][None]))
    prob = probability_volume(out["cost_volume"])
    return (np.asarray(prob), np.asarray(s["depth_values"][None]),
            np.asarray(s["imgs"][0]))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    if not os.path.exists(CKPT):
        pytest.skip("shipped checkpoint absent")
    root = str(tmp_path_factory.mktemp("ev_train"))
    params = load_torch_checkpoint(CKPT)

    bands = [(0.25, 0.5), (0.5, 0.75), (0.0, 0.25)]
    train_data = [
        _volume(params, root, f"train{i}", band) for i, band in enumerate(bands)
    ]
    probs = jnp.asarray(np.concatenate([p for p, _, _ in train_data]))
    dvals = jnp.asarray(np.concatenate([d for _, d, _ in train_data]))
    gt = jnp.full((len(bands), H, W), PLANE, jnp.float32)
    mask = jnp.ones((len(bands), H, W), jnp.float32)

    head = EvidentialHead(maxdisp=D)
    variables = init_evidential(jax.random.PRNGKey(0), H, W, maxdisp=D)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    def loss_fn(p, stats):
        ev, mut = head.apply(
            {"params": p, "batch_stats": stats}, probs, dvals,
            train=True, mutable=["batch_stats"],
        )
        loss = loss_emvsnet(ev["gamma"], ev["nu"], ev["alpha"], ev["beta"],
                            gt, mask, 0.1)
        return loss, mut["batch_stats"]

    @jax.jit
    def step(p, stats, opt_state):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, stats)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), stats, opt_state, loss

    p, stats = variables["params"], variables.get("batch_stats", {})
    losses = []
    for _ in range(40):
        p, stats, opt_state, loss = step(p, stats, opt_state)
        losses.append(float(loss))

    # Held-out scene: unseen texture seed AND band position.
    h_prob, h_dvals, h_img = _volume(params, root, "heldout", (0.35, 0.65))
    ev = head.apply(
        {"params": p, "batch_stats": stats}, jnp.asarray(h_prob),
        jnp.asarray(h_dvals), train=False,
    )
    return dict(
        root=root, losses=losses,
        gamma=np.asarray(ev["gamma"][0]),
        nu=np.asarray(ev["nu"][0]), alpha=np.asarray(ev["alpha"][0]),
        beta=np.asarray(ev["beta"][0]), img=h_img,
    )


class TestEvidentialTraining:
    def test_loss_decreases(self, trained):
        losses = trained["losses"]
        assert losses[-1] < losses[0], (losses[0], losses[-1])

    def test_uncertainty_ranks_error_on_heldout(self, trained):
        """The trained head's uncertainty must separate the (ambiguous,
        wrong) textureless band from the well-matched textured pixels."""
        error = np.abs(trained["gamma"] - PLANE)
        decomp = uncertainty_decompositions(
            trained["nu"][None], trained["alpha"][None], trained["beta"][None]
        )
        mask = np.ones_like(error)

        # Threshold at the error median: after only 40 head steps gamma
        # still carries a uniform regression bias, so a fixed mm threshold
        # can be single-class; the median split always measures whether
        # uncertainty RANKS error, which is the claim under test.
        thresh = float(np.median(error))
        aucs = {}
        for key in ("aleatoric_1", "epistemic_1"):
            unc = np.asarray(decomp[key][0])
            roc = uncertainty_roc(error, unc, mask, error_threshold=thresh)
            aucs[key] = roc["auc"]
        assert max(aucs.values()) > 0.7, aucs

        best = max(aucs, key=aucs.get)
        unc = np.asarray(decomp[best][0])
        spars = sparsification_curve(error, unc, mask)
        rng = np.random.RandomState(0)
        rand = sparsification_curve(
            error, rng.permutation(unc.ravel()).reshape(unc.shape), mask
        )
        # "well below random": at most half the random ranking's AUSE.
        assert spars["ause"] < 0.5 * rand["ause"], (spars["ause"], rand["ause"])

    def test_analyze_report_from_trained_head(self, trained):
        """analysis/report.json generated from the REAL trained head's
        held-out outputs (not a random-init head)."""
        from aa_rmvsnet_tpu.cli import main
        from aa_rmvsnet_tpu.utils.logging import TrainLogger

        logdir = os.path.join(trained["root"], "logs_trained_head")
        logger = TrainLogger(logdir)
        decomp = uncertainty_decompositions(
            trained["nu"][None], trained["alpha"][None], trained["beta"][None]
        )
        err = np.abs(trained["gamma"] - PLANE)
        # Same per-sample (H, W) layout the train CLI dumps (cli.py:433-437).
        logger.dump("fulltest", {
            "depth_est": trained["gamma"],
            "depth_gt": np.full((H, W), PLANE, np.float32),
            "mask": np.ones((H, W), np.float32),
            "error_map": err,
            "alea_1": np.asarray(decomp["aleatoric_1"][0]),
            "epis_1": np.asarray(decomp["epistemic_1"][0]),
            "alea_2": np.asarray(decomp["aleatoric_2"][0]),
            "epis_2": np.asarray(decomp["epistemic_2"][0]),
            "ref_img": trained["img"],  # (H, W, 3) like cli.py:436
        }, step=40)
        logger.close()

        main(["analyze", "--logdir", logdir, "--mode", "fulltest"])
        with open(os.path.join(logdir, "analysis", "report.json")) as f:
            report = json.load(f)
        entry = next(iter(report.values()))
        assert "uncertainty" in entry and "ause" in entry
