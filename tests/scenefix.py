"""Synthetic scene fixtures: MVSNet-format scene directories with known
planar geometry, for dataset / inference / fusion tests."""

from __future__ import annotations

import os

import cv2
import numpy as np

from aa_rmvsnet_tpu.core.pfm import save_pfm


def write_cam(path, K, E, dmin, dint, dnum=None, dend=None):
    lines = ["extrinsic"]
    lines += [" ".join(f"{v:.8f}" for v in row) for row in E]
    lines += ["", "intrinsic"]
    lines += [" ".join(f"{v:.8f}" for v in row) for row in K]
    tail = f"{dmin} {dint}"
    if dnum is not None:
        tail += f" {dnum} {dend}"
    lines += ["", tail, ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def make_plane_scene(
    root,
    scan: str = "scan1",
    num_views: int = 4,
    H: int = 64,
    W: int = 80,
    plane_depth: float = 500.0,
    focal: float = 400.0,
    baseline: float = 2.0,
    dmin: float = 425.0,
    dint: float = 2.5,
    with_depth_end: bool = False,
    seed: int = 0,
    textureless_rows: tuple[float, float] | None = None,
):
    """Write an MVSNet-format scene observing a fronto-parallel textured
    plane at ``plane_depth``; cameras translate along x by ``baseline``.

    ``textureless_rows=(lo, hi)`` (fractions of H) paints that horizontal
    band a CONSTANT color: matching there is ambiguous, so depth estimates
    are unreliable — the scene then carries both well-constrained and
    uncertain pixels (for uncertainty-learning tests).

    Returns (scene_dir, gt_depth (H, W), K, extrinsics list).
    """
    rng = np.random.RandomState(seed)
    scene = os.path.join(root, scan)
    os.makedirs(os.path.join(scene, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene, "cams"), exist_ok=True)

    # Smooth random texture on the plane, sampled per view by plane-induced
    # pure-horizontal shift: x_src = x_ref - f * tx / Z.
    tex_w = W + 4 * num_views + 16
    texture = cv2.GaussianBlur(
        rng.rand(H, tex_w, 3).astype(np.float32) * 255, (0, 0), 2.0
    )
    if textureless_rows is not None:
        lo, hi = (int(round(f * H)) for f in textureless_rows)
        texture[lo:hi] = 127.0

    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]], np.float32)
    extrinsics = []
    for v in range(num_views):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = -v * baseline  # camera moves +x in world => world point at -x cam
        extrinsics.append(E)
        shift = focal * (v * baseline) / plane_depth
        xs = (np.arange(W, dtype=np.float32) + shift)[None, :].repeat(H, 0)
        ys = np.arange(H, dtype=np.float32)[:, None].repeat(W, 1)
        img = cv2.remap(texture, xs, ys, interpolation=cv2.INTER_LINEAR)
        cv2.imwrite(
            os.path.join(scene, f"images/{v:08d}.jpg"),
            cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 98],
        )
        write_cam(
            os.path.join(scene, f"cams/{v:08d}_cam.txt"),
            K, E, dmin, dint,
            dnum=192 if with_depth_end else None,
            dend=935.0 if with_depth_end else None,
        )

    with open(os.path.join(scene, "pair.txt"), "w") as f:
        f.write(f"{num_views}\n")
        for v in range(num_views):
            srcs = [s for s in range(num_views) if s != v]
            f.write(f"{v}\n")
            f.write(f"{len(srcs)} " + " ".join(f"{s} {10.0 - i}" for i, s in enumerate(srcs)) + "\n")

    gt_depth = np.full((H, W), plane_depth, np.float32)
    return scene, gt_depth, K, extrinsics


def write_prediction(out_dir, view: int, depth: np.ndarray, confidence: np.ndarray):
    os.makedirs(os.path.join(out_dir, "depth_est_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "confidence_0"), exist_ok=True)
    save_pfm(os.path.join(out_dir, f"depth_est_0/{view:08d}.pfm"), depth.astype(np.float32))
    save_pfm(os.path.join(out_dir, f"confidence_0/{view:08d}.pfm"), confidence.astype(np.float32))
