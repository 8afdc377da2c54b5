"""Train and persist the evidential-head artifact (VERDICT r4 item 5).

The fork's full eval flow expects a trained evidential checkpoint
(reference scripts/eval_tnt.sh:8 points at an UNSHIPPED
``checkpoints/evidential_3ep/model_000002.ckpt`` — SURVEY §0.1), so the
repo ships its own: this script trains the head (frozen 187k core from
the shipped reference checkpoint producing the probability volumes) on a
synthetic scene family whose textureless bands make matching ambiguous in
known places, gates the result on held-out uncertainty quality (ROC-AUC +
AUSE, the tests/test_evidential_training.py criteria), and writes an
orbax checkpoint loadable by ``cli eval --evidential_ckpt``.

Usage:
    python scripts/train_evidential_head.py [--out checkpoints/evidential_head]
        [--steps 300]

CPU-only, a few minutes.  The committed artifact under
``checkpoints/evidential_head`` was produced by exactly this script;
``summary.json`` beside it records the loss curve tail and held-out gates.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax

CKPT = "/root/reference/checkpoints/model_dtu_v2.ckpt"
H, W, D, NVIEWS = 32, 32, 32, 3
DMIN, DINT, PLANE = 425.0, 2.75, 470.0  # plane ~bin 16.4 of 32


def _volume(params, root, scan, band, seed):
    from scenefix import make_plane_scene
    from aa_rmvsnet_tpu.data import EvalDataset
    from aa_rmvsnet_tpu.models.network import (
        SweepConfig, forward, probability_volume,
    )

    make_plane_scene(root, scan=scan, H=H, W=W, num_views=NVIEWS,
                     focal=2000.0, plane_depth=PLANE, dmin=DMIN, dint=DINT,
                     seed=seed, textureless_rows=band)
    ds = EvalDataset(root, [scan], nviews=NVIEWS, ndepths=D, max_h=H, max_w=W)
    s = ds[0]
    out = jax.jit(
        lambda p, i, pr, d: forward(p, i, pr, d, SweepConfig(depth_block=8))
    )(params, jnp.asarray(s["imgs"][None]),
      jnp.asarray(s["proj_matrices"][None]),
      jnp.asarray(s["depth_values"][None]))
    prob = probability_volume(out["cost_volume"])
    return np.asarray(prob), np.asarray(s["depth_values"][None])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_ROOT, "checkpoints",
                                                  "evidential_head"))
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--tpu", action="store_true",
                    help="train on the attached TPU instead of forcing CPU "
                         "(the 3D-conv head is ~10x faster there; results "
                         "are fetched to host before the orbax save)")
    args = ap.parse_args()

    from aa_rmvsnet_tpu.models.convert import load_torch_checkpoint
    from aa_rmvsnet_tpu.models.evidential import (
        EvidentialHead, init_evidential, loss_emvsnet,
        uncertainty_decompositions,
    )
    from aa_rmvsnet_tpu.utils.analysis import (
        sparsification_curve, uncertainty_roc,
    )

    params = load_torch_checkpoint(CKPT)
    root = tempfile.mkdtemp(prefix="ev_head_train_")

    bands = [(0.25, 0.5), (0.5, 0.75), (0.0, 0.25), (0.6, 0.9)]
    data = [_volume(params, root, f"train{i}", band, seed=100 + i)
            for i, band in enumerate(bands)]
    probs = jnp.asarray(np.concatenate([p for p, _ in data]))
    dvals = jnp.asarray(np.concatenate([d for _, d in data]))
    gt = jnp.full((len(bands), H, W), PLANE, jnp.float32)
    mask = jnp.ones((len(bands), H, W), jnp.float32)
    print(f"training volumes: {probs.shape}", flush=True)

    head = EvidentialHead(maxdisp=D)
    variables = init_evidential(jax.random.PRNGKey(0), H, W, maxdisp=D)
    schedule = optax.cosine_decay_schedule(1e-3, args.steps, alpha=2e-3)
    tx = optax.adam(schedule)
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
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, stats)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), stats, opt_state, loss

    p, stats = variables["params"], variables.get("batch_stats", {})
    losses = []
    for i in range(args.steps):
        p, stats, opt_state, loss = step(p, stats, opt_state)
        losses.append(float(loss))
        if i % 20 == 0:
            print(f"step {i}: loss {losses[-1]:.4f}", flush=True)

    # Held-out gate: unseen texture seed and band position.
    h_prob, h_dvals = _volume(params, root, "heldout", (0.35, 0.65), seed=999)
    ev = head.apply({"params": p, "batch_stats": stats}, jnp.asarray(h_prob),
                    jnp.asarray(h_dvals), train=False)
    error = np.abs(np.asarray(ev["gamma"][0]) - PLANE)
    decomp = uncertainty_decompositions(
        np.asarray(ev["nu"]), np.asarray(ev["alpha"]), np.asarray(ev["beta"])
    )
    m = np.ones_like(error)
    thresh = float(np.median(error))
    aucs = {
        k: uncertainty_roc(error, np.asarray(decomp[k][0]), m,
                           error_threshold=thresh)["auc"]
        for k in ("aleatoric_1", "epistemic_1")
    }
    best = max(aucs, key=aucs.get)
    unc = np.asarray(decomp[best][0])
    spars = sparsification_curve(error, unc, m)
    rng = np.random.RandomState(0)
    rand = sparsification_curve(
        error, rng.permutation(unc.ravel()).reshape(unc.shape), m)
    summary = {
        "steps": args.steps, "loss_first": losses[0], "loss_last": losses[-1],
        "heldout_auc": aucs, "ause": spars["ause"],
        "ause_random": rand["ause"], "maxdisp": D,
        "scene": f"{H}x{W} D{D} V{NVIEWS} textureless-band family",
    }
    print(json.dumps(summary))
    ok = max(aucs.values()) > 0.7 and spars["ause"] < 0.5 * rand["ause"]
    if not ok:
        print("GATE FAILED — artifact not written", file=sys.stderr)
        raise SystemExit(1)

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.out)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": jax.device_get(p),
                     "batch_stats": jax.device_get(stats)}, force=True)
    ckptr.wait_until_finished()  # async save: commit before exit
    with open(out + "_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"artifact written: {out}")


if __name__ == "__main__":
    main()
