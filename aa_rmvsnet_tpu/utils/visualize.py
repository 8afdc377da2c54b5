"""Colormapped PNG previews of depth / uncertainty maps
(reference: datasets/data_io.py:77-128 renders jet-colormapped previews)."""

from __future__ import annotations

import numpy as np


def save_depth_png(path, array: np.ndarray, mode: str = "depth") -> None:
    """Write a jet-colormapped preview.  ``mode='depth'`` inverts values
    (near = warm); ``mode='relative'`` min-max normalizes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(array, dtype=np.float32)
    valid = np.isfinite(arr)
    vmin = float(arr[valid].min()) if valid.any() else 0.0
    vmax = float(arr[valid].max()) if valid.any() else 1.0
    if mode == "depth":
        arr = np.where(valid, (vmax - arr) + vmin, 0.0)
    else:
        arr = np.where(valid, (arr - vmin) / max(vmax - vmin, 1e-12), 0.0)

    plt.imsave(path, arr, cmap="jet")


# ---------------------------------------------------------------------------
# Model-graph visualization (TPU-native analog of the reference's dev
# visualizers, reference evidential/visu.py:1-63 and
# evidential/dataset_comparison.py:1-91 — torchviz autograd graphs of toy
# stand-in models).  Here the REAL modules are rendered: a flax tabulate
# parameter/shape summary plus a graphviz DOT of the parameter-tree module
# hierarchy, no external graphviz binding required.
# ---------------------------------------------------------------------------


def model_summary(maxdisp: int = 32) -> str:
    """``nn.tabulate`` summaries of the core network and evidential head."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ..models.network import AARMVSNetCore
    from ..models.regularizer import init_states
    from ..models.evidential import EvidentialHead

    core = AARMVSNetCore()
    imgs = jnp.zeros((1, 32, 32, 3))
    states = init_states(1, 32, 32)
    core_tab = nn.tabulate(core, jax.random.PRNGKey(0),
                           console_kwargs={"width": 120})(imgs, states)

    head = EvidentialHead(maxdisp=maxdisp)
    prob = jnp.zeros((1, maxdisp, 32, 32))
    dvals = jnp.linspace(400.0, 600.0, maxdisp)[None]
    head_tab = nn.tabulate(head, jax.random.PRNGKey(0),
                           console_kwargs={"width": 120})(prob, dvals)
    return core_tab + "\n\n" + head_tab


def model_graph_dot(params) -> str:
    """Graphviz DOT of the module hierarchy with per-module parameter
    counts, derived from the parameter pytree (works for any checkpoint —
    shipped torch conversions included)."""
    counts: dict[str, int] = {}
    edges: set[tuple[str, str]] = set()

    def visit(tree, path):
        if hasattr(tree, "items"):
            for key, sub in tree.items():
                child = f"{path}/{key}" if path else str(key)
                if path:
                    edges.add((path, child))
                visit(sub, child)
        else:
            n = int(np.prod(np.asarray(tree).shape))
            p = path
            while True:
                counts[p] = counts.get(p, 0) + n
                if "/" not in p:
                    break
                p = p.rsplit("/", 1)[0]

    visit(params, "")
    lines = ["digraph model {", "  rankdir=LR;", "  node [shape=box];"]
    for node, n in sorted(counts.items()):
        label = node.rsplit("/", 1)[-1]
        lines.append(f'  "{node}" [label="{label}\\n{n:,} params"];')
    for a, b in sorted(edges):
        lines.append(f'  "{a}" -> "{b}";')
    lines.append("}")
    return "\n".join(lines)
