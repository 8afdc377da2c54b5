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


def look_at_extrinsics(positions, target, num_views=None):
    """World->cam extrinsics for cameras at ``positions`` all oriented at
    ``target`` — the DTU-style rotating rig (rotation-dominant
    homographies; reference models/module.py:16-32 exercises the full
    R_src.R_ref^-1 path).

    Camera convention matches the renderer: x right, y down, z forward
    (right-handed).  The rotation between two cameras equals the angle
    between their view directions — e.g. positions on an arc of radius r
    spanning +-theta around the target give +-theta relative rotations.
    """
    target = np.asarray(target, np.float64)
    Es = []
    for C in positions:
        C = np.asarray(C, np.float64)
        z = target - C
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)  # y-down convention
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R_cw = np.stack([x, y, z], axis=1)  # cam -> world (columns = axes)
        E = np.eye(4, dtype=np.float64)
        E[:3, :3] = R_cw.T
        E[:3, 3] = -R_cw.T @ C
        Es.append(E.astype(np.float32))
    return Es


def make_multiplane_scene(
    root,
    planes,
    scan: str = "scan1",
    num_views: int = 5,
    H: int = 64,
    W: int = 96,
    focal: float = 2000.0,
    baseline: float = 2.0,
    dmin: float = 425.0,
    dint: float = 5.0,
    with_depth_end: bool = False,
    dnum: int = 192,
    dend: float = 935.0,
    seed: int = 0,
    extrinsics=None,
    principal_offset=(0.0, 0.0),
):
    """Ray-cast renderer for a family of textured world-space planes — the
    hard-mode quality fixtures (occlusion, slant, high-frequency texture)
    that a fronto-parallel plane cannot probe.

    Each plane is a dict with:
      ``z0``: depth at world (X, Y) = (0, 0);
      ``gx``, ``gy``: depth gradients dZ/dX, dZ/dY (0 = fronto-parallel);
      ``extent``: ``(x0, x1, y0, y1)`` world-space rectangle the plane
        occupies (texture is mapped over it);
      ``sigma``: texture Gaussian-blur sigma in ref-view pixels (0 = raw
        high-frequency noise).

    Cameras: by default world frame = camera 0 and cameras translate along
    +x by ``baseline`` (same convention as :func:`make_plane_scene`); pass
    ``extrinsics`` (a list of world->cam 4x4s, e.g. from
    :func:`look_at_extrinsics`) for rotating / mixed-baseline rigs.
    ``principal_offset=(dx, dy)`` shifts the principal point off center
    (the non-centered crops real eval produces, preprocess.py:41-73).
    Per view, every pixel ray is intersected with every plane in closed
    form; the NEAREST valid hit wins — real occlusion, exact GT.

    Returns ``(scene_dir, gt_depths, K, extrinsics)`` where ``gt_depths``
    is a list of per-view (H, W) depth maps (0 where no plane is hit).
    """
    rng = np.random.RandomState(seed)
    scene = os.path.join(root, scan)
    os.makedirs(os.path.join(scene, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene, "cams"), exist_ok=True)

    cx = W / 2.0 + principal_offset[0]
    cy = H / 2.0 + principal_offset[1]
    f = focal
    xs = np.arange(W, dtype=np.float64)[None, :].repeat(H, 0)
    ys = np.arange(H, dtype=np.float64)[:, None].repeat(W, 1)
    # Pixel rays in camera coords (z = 1): one (H, W, 3) bundle.
    dir_cam = np.stack(
        [(xs - cx) / f, (ys - cy) / f, np.ones_like(xs)], axis=-1
    )

    # Per-plane textures, sized so one texel ~ half a ref-view pixel.
    textures = []
    for plane in planes:
        x0, x1, y0, y1 = plane["extent"]
        tw = max(32, int(round(2 * (x1 - x0) * f / plane["z0"])))
        th = max(32, int(round(2 * (y1 - y0) * f / plane["z0"])))
        tex = rng.rand(th, tw, 3).astype(np.float32) * 255
        sigma = plane.get("sigma", 2.0)
        if sigma > 0:
            # sigma is in ref-view pixels; texels are ~2x finer.
            tex = cv2.GaussianBlur(tex, (0, 0), 2.0 * sigma)
            lo, hi = tex.min(), tex.max()
            tex = (tex - lo) / max(hi - lo, 1e-6) * 255.0
        textures.append(tex)

    if extrinsics is None:
        extrinsics = []
        for v in range(num_views):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = -v * baseline  # world -> cam: X_cam = X_w - v*b
            extrinsics.append(E)
    else:
        extrinsics = [np.asarray(E, np.float32) for E in extrinsics]
        assert len(extrinsics) == num_views

    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    gt_depths = []
    for v, E in enumerate(extrinsics):
        E64 = E.astype(np.float64)
        R_cw = E64[:3, :3].T                      # cam -> world
        C = -R_cw @ E64[:3, 3]                    # camera center in world
        dir_w = dir_cam @ R_cw.T                  # (H, W, 3) world rays

        depth = np.full((H, W), np.inf)
        img = np.zeros((H, W, 3), np.float32)
        for plane, tex in zip(planes, textures):
            z0, gx, gy = plane["z0"], plane.get("gx", 0.0), plane.get("gy", 0.0)
            x0, x1, y0, y1 = plane["extent"]
            # Plane Z_w = z0 + gx*X_w + gy*Y_w  <=>  n . X_w = z0 with
            # n = (-gx, -gy, 1).  Ray X_w = C + t*dir_w; camera depth = t
            # (dir_cam has unit z).
            n = np.array([-gx, -gy, 1.0])
            with np.errstate(divide="ignore", invalid="ignore"):
                d = (z0 - n @ C) / (dir_w @ n)
            Xw = C[0] + d * dir_w[..., 0]
            Yw = C[1] + d * dir_w[..., 1]
            th, tw = tex.shape[:2]
            u = (Xw - x0) / (x1 - x0) * (tw - 1)
            w_ = (Yw - y0) / (y1 - y0) * (th - 1)
            color = cv2.remap(
                tex, u.astype(np.float32), w_.astype(np.float32),
                interpolation=cv2.INTER_LINEAR,
            )
            hit = (
                np.isfinite(d) & (d > 0)
                & (Xw >= x0) & (Xw <= x1) & (Yw >= y0) & (Yw <= y1)
                & (d < depth)
            )
            depth = np.where(hit, d, depth)
            img = np.where(hit[..., None], color, img)

        gt_depths.append(np.where(np.isfinite(depth), depth, 0.0).astype(np.float32))
        cv2.imwrite(
            os.path.join(scene, f"images/{v:08d}.jpg"),
            cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 98],
        )
        write_cam(
            os.path.join(scene, f"cams/{v:08d}_cam.txt"),
            K, E, dmin, dint,
            dnum=dnum if with_depth_end else None,
            dend=dend if with_depth_end else None,
        )

    with open(os.path.join(scene, "pair.txt"), "w") as f:
        f.write(f"{num_views}\n")
        for v in range(num_views):
            srcs = [s for s in range(num_views) if s != v]
            f.write(f"{v}\n")
            f.write(f"{len(srcs)} " + " ".join(
                f"{s} {10.0 - i}" for i, s in enumerate(srcs)) + "\n")

    return scene, gt_depths, K, extrinsics


def write_prediction(out_dir, view: int, depth: np.ndarray, confidence: np.ndarray):
    os.makedirs(os.path.join(out_dir, "depth_est_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "confidence_0"), exist_ok=True)
    save_pfm(os.path.join(out_dir, f"depth_est_0/{view:08d}.pfm"), depth.astype(np.float32))
    save_pfm(os.path.join(out_dir, f"confidence_0/{view:08d}.pfm"), confidence.astype(np.float32))
