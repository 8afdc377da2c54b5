"""Photometric + geometric consistency filtering and point-cloud fusion.

Consumes the inference driver's per-view depth/confidence PFMs plus the
scene's images/cameras and emits a fused PLY point cloud.  Numerics mirror
the reference fusion stage (reference: fusion.py:27-289), which moves DTU
accuracy/completeness by more than the 1% budget if altered (SURVEY §7.3):

- the reference image is resized/cropped to the *prediction's* geometry,
  inferred from the confidence-map/image size ratio, with intrinsics
  adjusted (fusion.py:157-175);
- photometric mask: ``confidence > threshold`` (0.35 DTU / 0.2 TnT);
- geometric check per source view: project ref pixels into the source with
  the estimated depth, resample the source depth (cv2.remap bilinear),
  project back, and require reprojection distance < i/4 px AND relative
  depth difference < i/1300 for the graduated levels i in [2, 10]
  (fusion.py:110-133);
- a pixel survives if >= i source views pass level i for any i (the
  reference's additional ``geo_sum >= n_views+1`` term is vacuously false
  and therefore omitted);
- fused depth = mean of the ref estimate and the consistent reprojections
  (zeroed where the loosest level fails, matching fusion.py:131, 221);
- masked pixels are back-projected to world space with the ref image color.

Fusion is embarrassingly parallel: over scans (distributed across hosts by
the CLI) and over ref views (thread pool here — cv2/numpy release the GIL).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import cv2
import numpy as np

from ..core.cameras import read_cam_file, read_pair_file
from ..core.pfm import read_pfm
from ..core.ply import write_ply


def _native_available() -> bool:
    try:
        from .native import available

        return available()
    except Exception:
        return False


@dataclass
class FuseConfig:
    photo_threshold: float = 0.35  # 0.35 DTU / 0.2 TnT (fusion.py:285-288)
    dist_base: float = 4.0  # level-i pixel threshold = i / dist_base
    rel_diff_base: float = 1300.0  # level-i relative depth threshold = i / base
    num_levels: int = 9  # graduated levels i in [2, 2+num_levels)
    num_workers: int = 8
    use_native: bool = True  # OpenMP fused core when built (pipeline/native.py)


def _pair_block(pairs, block: int, num_blocks: int):
    """CONTIGUOUS slice of the (ref, srcs) pair list for worker ``block`` of
    ``num_blocks``.  Contiguous (not strided) so concatenating the per-block
    PLYs in block order reproduces the single-host vertex order exactly
    (reference anchor: the per-ref-view loop at fusion.py:144 is the natural
    distribution unit for 300+-view TnT-advanced scans; SURVEY §7.1.6)."""
    if not 0 <= block < num_blocks:
        raise ValueError(f"view block {block} outside [0, {num_blocks})")
    n = len(pairs)
    return pairs[block * n // num_blocks : (block + 1) * n // num_blocks]


def merge_ply_blocks(block_paths, out_path: str) -> int:
    """Concatenate per-view-block PLYs (pose-consistent: every block's
    vertices are already in world space) into one cloud.  Returns the
    vertex count."""
    from ..core.ply import read_ply

    xyz, rgb = [], []
    for path in block_paths:
        x, c = read_ply(path)
        xyz.append(x)
        rgb.append(c)
    xyz = np.concatenate(xyz) if xyz else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(rgb) if rgb else np.zeros((0, 3), np.uint8)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_ply(out_path, xyz, rgb)
    return len(xyz)


def reproject_with_depth(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """Ref->src->ref round trip (reference fusion.py:71-108).

    Returns (depth_reprojected, x_reprojected, y_reprojected) as (H, W) maps.
    """
    h, w = depth_ref.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    x = x.reshape(-1).astype(np.float64)
    y = y.reshape(-1).astype(np.float64)

    # ref pixels -> ref camera space -> src camera space -> src pixels
    xyz_ref = np.linalg.inv(K_ref) @ (np.vstack([x, y, np.ones_like(x)]) * depth_ref.reshape(-1))
    xyz_src = (E_src @ np.linalg.inv(E_ref)) @ np.vstack([xyz_ref, np.ones_like(x)])
    k_xyz_src = K_src @ xyz_src[:3]
    with np.errstate(divide="ignore", invalid="ignore"):
        xy_src = k_xyz_src[:2] / k_xyz_src[2:3]

    # sample the src depth at those pixels (bilinear, like cv2.remap)
    x_src = xy_src[0].reshape(h, w).astype(np.float32)
    y_src = xy_src[1].reshape(h, w).astype(np.float32)
    sampled = cv2.remap(depth_src, x_src, y_src, interpolation=cv2.INTER_LINEAR)

    # src pixels + sampled depth -> src camera -> ref camera -> ref pixels
    xyz_src2 = np.linalg.inv(K_src) @ (np.vstack([xy_src, np.ones_like(x)]) * sampled.reshape(-1))
    xyz_reproj = (E_ref @ np.linalg.inv(E_src)) @ np.vstack([xyz_src2, np.ones_like(x)])
    depth_reproj = xyz_reproj[2].reshape(h, w).astype(np.float32)
    k_xyz_reproj = K_ref @ xyz_reproj[:3]
    with np.errstate(divide="ignore", invalid="ignore"):
        xy_reproj = k_xyz_reproj[:2] / k_xyz_reproj[2:3]
    x_reproj = xy_reproj[0].reshape(h, w).astype(np.float32)
    y_reproj = xy_reproj[1].reshape(h, w).astype(np.float32)
    return depth_reproj, x_reproj, y_reproj


def graduated_consistency(depth_ref, K_ref, E_ref, depth_src, K_src, E_src, config: FuseConfig):
    """Graduated masks + loosest-mask-zeroed reprojected depth
    (reference fusion.py:110-133)."""
    h, w = depth_ref.shape
    x_ref, y_ref = np.meshgrid(np.arange(w), np.arange(h))
    depth_reproj, x_reproj, y_reproj = reproject_with_depth(
        depth_ref, K_ref, E_ref, depth_src, K_src, E_src
    )
    dist = np.sqrt((x_reproj - x_ref) ** 2 + (y_reproj - y_ref) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel_diff = np.abs(depth_reproj - depth_ref) / depth_ref
        rel_diff = np.nan_to_num(rel_diff, nan=np.inf)

    levels = range(2, 2 + config.num_levels)
    masks = [
        (dist < i / config.dist_base) & (rel_diff < i / config.rel_diff_base) for i in levels
    ]
    depth_reproj = np.where(masks[-1], depth_reproj, 0.0)
    return masks, depth_reproj


def _align_image_to_prediction(img, conf_shape):
    """Resize + center-crop the full-res scene image to the prediction's
    geometry, returning the image and the (scale, crop index, axis flag)
    needed to adjust intrinsics (reference fusion.py:157-175)."""
    scale = conf_shape[0] / img.shape[0]
    index = int((int(img.shape[1] * scale) - conf_shape[1]) / 2)
    flag = 0
    if conf_shape[1] / img.shape[1] > scale:
        scale = conf_shape[1] / img.shape[1]
        index = int((int(img.shape[0] * scale) - conf_shape[0]) / 2)
        flag = 1
    resized = cv2.resize(img, (int(img.shape[1] * scale), int(img.shape[0] * scale)))
    if flag == 0:
        index_p = resized.shape[1] - conf_shape[1] - index
        out = resized[:, index : resized.shape[1] - index_p]
    else:
        index_p = resized.shape[0] - conf_shape[0] - index
        out = resized[index : resized.shape[0] - index_p, :]
    return out, scale, index, flag


def _load_camera(scan_folder, vid, scale, index, flag):
    cam = read_cam_file(os.path.join(scan_folder, f"cams/{vid:08d}_cam.txt"))
    K = cam.intrinsics.copy()
    K[:2, :] *= scale
    if flag == 0:
        K[0, 2] -= index
    else:
        K[1, 2] -= index
    return K, cam.extrinsics


def fuse_scan_padded(
    scan_folder: str,
    depth_folder: str,
    ply_path: str,
    config: FuseConfig | None = None,
    num_workers: int = 8,
    view_block: tuple[int, int] | None = None,
) -> int:
    """TnT padded-pipeline fusion variant (reference fusion_padding.py:29-266).

    Matched to the row-padding eval dataset: predictions are at half the
    original image resolution with 8 padded rows (so 4 rows at half-res);
    the variant crops 2 rows top/bottom of every prediction, halves the
    intrinsics, pyrDowns the reference image, uses photo threshold 0.3, and
    adds a fixed ``loose-mask sum >= 10`` term to the graduated OR.
    ``view_block=(block, num_blocks)`` fuses one contiguous ref-view block
    (see :func:`fuse_scan`).
    """
    if config is None:
        config = FuseConfig(photo_threshold=0.3, num_workers=num_workers)
    pairs = read_pair_file(os.path.join(scan_folder, "pair.txt"))
    if view_block is not None:
        pairs = _pair_block(pairs, *view_block)

    def load_depth(vid):
        path = os.path.join(depth_folder, f"depth_est_0/{vid:08d}.pfm")
        if not os.path.exists(path):
            return None
        return read_pfm(path)[0][2:-2, :]

    def load_camera(vid):
        cam = read_cam_file(os.path.join(scan_folder, f"cams/{vid:08d}_cam.txt"))
        K = cam.intrinsics.copy()
        K[:2, :] /= 2.0
        return K, cam.extrinsics

    def process_ref(ref_view, src_views):
        ref_depth = load_depth(ref_view)
        if ref_depth is None:
            return None
        confidence = read_pfm(
            os.path.join(depth_folder, f"confidence_0/{ref_view:08d}.pfm")
        )[0][2:-2, :]
        img = cv2.imread(os.path.join(scan_folder, f"images/{ref_view:08d}.jpg"))
        img = cv2.pyrDown(cv2.cvtColor(img, cv2.COLOR_BGR2RGB)).astype(np.float32) / 255.0
        img = img[: ref_depth.shape[0], : ref_depth.shape[1]]
        K_ref, E_ref = load_camera(ref_view)

        photo_mask = confidence > config.photo_threshold

        level_sums = None
        reproj_sum = np.zeros_like(ref_depth)
        loose_sum = np.zeros(ref_depth.shape, np.int32)
        for src_view in src_views:
            src_depth = load_depth(src_view)
            if src_depth is None:
                continue
            K_src, E_src = load_camera(src_view)
            masks, depth_reproj = graduated_consistency(
                ref_depth, K_ref, E_ref, src_depth, K_src, E_src, config
            )
            stacked = np.stack([m.astype(np.int32) for m in masks])
            level_sums = stacked if level_sums is None else level_sums + stacked
            loose_sum += masks[-1].astype(np.int32)
            reproj_sum += depth_reproj

        if level_sums is None:
            return None
        geo_mask = loose_sum >= 10  # fixed term (fusion_padding.py:208)
        for li, i in enumerate(range(2, 2 + config.num_levels)):
            geo_mask |= level_sums[li] >= i
        fused_depth = (reproj_sum + ref_depth) / (loose_sum + 1)

        final_mask = photo_mask & geo_mask
        h, w = fused_depth.shape
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        xs, ys, ds = x[final_mask], y[final_mask], fused_depth[final_mask]
        colors = img[final_mask]
        xyz_ref = np.linalg.inv(K_ref) @ (np.vstack([xs, ys, np.ones_like(xs)]) * ds)
        xyz_world = (np.linalg.inv(E_ref) @ np.vstack([xyz_ref, np.ones_like(xs)]))[:3]
        return xyz_world.T.astype(np.float32), (colors * 255).astype(np.uint8)

    results = []
    with ThreadPoolExecutor(max_workers=config.num_workers) as pool:
        futures = [pool.submit(process_ref, rv, sv) for rv, sv in pairs]
        results = [r for r in (f.result() for f in futures) if r is not None]

    if not results and view_block is None:
        raise RuntimeError(f"no fused points for {scan_folder} (missing depth maps?)")
    xyz = (np.concatenate([r[0] for r in results])
           if results else np.zeros((0, 3), np.float32))
    rgb = (np.concatenate([r[1] for r in results])
           if results else np.zeros((0, 3), np.uint8))
    os.makedirs(os.path.dirname(ply_path) or ".", exist_ok=True)
    write_ply(ply_path, xyz, rgb)
    return len(xyz)


def fuse_scan(
    scan_folder: str,
    depth_folder: str,
    ply_path: str,
    config: FuseConfig = FuseConfig(),
    save_masks: bool = False,
    view_block: tuple[int, int] | None = None,
    display: bool = False,
) -> int:
    """Filter + fuse one scan into a PLY file.  Returns the vertex count.

    ``scan_folder``: the scene dir (images/, cams/, pair.txt).
    ``depth_folder``: the inference output dir (depth_est_0/, confidence_0/).
    ``view_block``: optional ``(block, num_blocks)`` — process only that
    contiguous ref-view block (distributing ONE large scan across hosts);
    merge the per-block PLYs afterwards with :func:`merge_ply_blocks`.
    ``display``: interactively show ref image | photo | geo | final masks
    per ref view (reference fusion.py:238-244 ``--display``); forces a
    serial loop and requires a GUI — on headless hosts use
    ``save_masks`` (the PNG equivalent) instead.
    """
    pairs = read_pair_file(os.path.join(scan_folder, "pair.txt"))
    if view_block is not None:
        pairs = _pair_block(pairs, *view_block)

    def load_depth(vid):
        path = os.path.join(depth_folder, f"depth_est_0/{vid:08d}.pfm")
        return read_pfm(path)[0] if os.path.exists(path) else None

    def process_ref(ref_view, src_views):
        ref_depth = load_depth(ref_view)
        if ref_depth is None:
            return None
        confidence = read_pfm(
            os.path.join(depth_folder, f"confidence_0/{ref_view:08d}.pfm")
        )[0]
        img = cv2.imread(os.path.join(scan_folder, f"images/{ref_view:08d}.jpg"))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        img, scale, index, flag = _align_image_to_prediction(img, confidence.shape)
        K_ref, E_ref = _load_camera(scan_folder, ref_view, scale, index, flag)

        photo_mask = confidence > config.photo_threshold

        use_native = config.use_native and _native_available()
        level_sums = np.zeros((config.num_levels,) + ref_depth.shape, np.int32)
        reproj_sum = np.zeros_like(ref_depth)
        loose_sum = np.zeros(ref_depth.shape, np.int32)
        any_src = False
        for src_view in src_views:
            src_depth = load_depth(src_view)
            if src_depth is None:
                continue
            any_src = True
            K_src, E_src = _load_camera(scan_folder, src_view, scale, index, flag)
            if use_native:
                from .native import fuse_pair_native

                fuse_pair_native(
                    ref_depth, K_ref, E_ref, src_depth, K_src, E_src,
                    level_sums, loose_sum, reproj_sum,
                    config.dist_base, config.rel_diff_base,
                )
            else:
                masks, depth_reproj = graduated_consistency(
                    ref_depth, K_ref, E_ref, src_depth, K_src, E_src, config
                )
                level_sums += np.stack([m.astype(np.int32) for m in masks])
                loose_sum += masks[-1].astype(np.int32)
                reproj_sum += depth_reproj

        if not any_src:
            return None
        # A pixel passes if >= i views agree at graduated level i, any i.
        geo_mask = np.zeros(ref_depth.shape, bool)
        for li, i in enumerate(range(2, 2 + config.num_levels)):
            if i <= len(src_views) + 1:
                geo_mask |= level_sums[li] >= i
        fused_depth = (reproj_sum + ref_depth) / (loose_sum + 1)

        final_mask = photo_mask & geo_mask
        if display:
            panes = [np.ascontiguousarray((img[..., ::-1] * 255).astype(np.uint8))] + [
                cv2.cvtColor((m * np.uint8(255)).astype(np.uint8),
                             cv2.COLOR_GRAY2BGR)
                for m in (photo_mask, geo_mask, final_mask)
            ]
            try:
                cv2.imshow(f"ref {ref_view:08d}  img | photo | geo | final",
                           np.concatenate(panes, axis=1))
                cv2.waitKey(0)
                cv2.destroyAllWindows()
            except cv2.error as e:
                raise RuntimeError(
                    "--display needs a GUI-capable OpenCV/display; on a "
                    "headless host use save_masks (writes the same masks "
                    "as PNGs)"
                ) from e
        if save_masks:
            os.makedirs(os.path.join(depth_folder, "mask"), exist_ok=True)
            for tag, m in (("photo", photo_mask), ("geo", geo_mask), ("final", final_mask)):
                cv2.imwrite(
                    os.path.join(depth_folder, f"mask/{ref_view:08d}_{tag}.png"),
                    m.astype(np.uint8) * 255,
                )

        h, w = fused_depth.shape
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        xs, ys, ds = x[final_mask], y[final_mask], fused_depth[final_mask]
        colors = img[final_mask]
        xyz_ref = np.linalg.inv(K_ref) @ (np.vstack([xs, ys, np.ones_like(xs)]) * ds)
        xyz_world = (np.linalg.inv(E_ref) @ np.vstack([xyz_ref, np.ones_like(xs)]))[:3]
        return xyz_world.T.astype(np.float32), (colors * 255).astype(np.uint8)

    results = []
    if display:  # serial: cv2 windows must run on the main thread
        for rv, sv in pairs:
            r = process_ref(rv, sv)
            if r is not None:
                results.append(r)
    else:
        with ThreadPoolExecutor(max_workers=config.num_workers) as pool:
            futures = [pool.submit(process_ref, rv, sv) for rv, sv in pairs]
            for f in futures:
                r = f.result()
                if r is not None:
                    results.append(r)

    if not results and view_block is None:
        raise RuntimeError(f"no fused points for {scan_folder} (missing depth maps?)")
    # A single view block may legitimately fuse zero points; write an empty
    # block so the merge step sees every block.
    xyz = (np.concatenate([r[0] for r in results])
           if results else np.zeros((0, 3), np.float32))
    rgb = (np.concatenate([r[1] for r in results])
           if results else np.zeros((0, 3), np.uint8))
    os.makedirs(os.path.dirname(ply_path) or ".", exist_ok=True)
    write_ply(ply_path, xyz, rgb)
    return len(xyz)
