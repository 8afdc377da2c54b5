"""Plane-sweep homography: project reference pixels into a source view at a
fronto-parallel depth plane.

For reference pixel ``(x, y)`` at depth ``d``, with ``P = P_src @ P_ref^-1``
(``P_* = [[K E[:3,:4]], [0 0 0 1]]``), the source-view pixel is the
perspective division of ``R @ [x, y, 1]^T * d + t`` (reference math:
models/module.py:6-34).

TPU-first structure: the rotation term ``R @ [x, y, 1]`` does not depend on
depth, so it is computed once per (view, batch) by
:func:`homography_terms`; each depth hypothesis then costs one
multiply-add and a divide.  This is what lets the depth sweep run as a
``lax.scan`` over cheap per-depth coordinate generation instead of
re-deriving the full homography per step.

The z==0 guard adds 1e-4 to exactly-zero denominators, matching the
reference's behavior (module.py:29).
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import bilinear_sample


def homography_terms(
    src_proj: jnp.ndarray, ref_proj: jnp.ndarray, height: int, width: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute the depth-independent warp terms.

    Args:
      src_proj, ref_proj: ``(B, 4, 4)`` full projection matrices.
      height, width: reference feature-map size.

    Returns:
      ``rot_grid``: ``(B, 3, H*W)`` — ``R @ [x, y, 1]`` per reference pixel.
      ``trans``: ``(B, 3, 1)`` translation column.
    """
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]

    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(x)
    pix = jnp.stack([x.ravel(), y.ravel(), ones.ravel()])  # (3, H*W)
    rot_grid = rot @ pix  # (B, 3, H*W)
    return rot_grid, trans


def plane_sweep_xy(
    rot_grid: jnp.ndarray,
    trans: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Source-view pixel coordinates for a block of depths, as separate
    ``x`` / ``y`` arrays of shape ``(B, D, H*W)`` (lane-padding-friendly:
    no trailing size-2 axis).

    Args:
      rot_grid: ``(B, 3, H*W)`` from :func:`homography_terms`.
      trans: ``(B, 3, 1)``; depth_values: ``(B, D)``.
    """
    proj_xyz = rot_grid[:, None] * depth_values[:, :, None, None] + trans[:, None]
    z = proj_xyz[:, :, 2]
    z = jnp.where(z == 0.0, z + 1e-4, z)
    return proj_xyz[:, :, 0] / z, proj_xyz[:, :, 1] / z


def plane_sweep_coords(
    rot_grid: jnp.ndarray,
    trans: jnp.ndarray,
    depth_values: jnp.ndarray,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Source-view pixel coordinates for a block of depth hypotheses.

    Args:
      rot_grid: ``(B, 3, H*W)`` from :func:`homography_terms`.
      trans: ``(B, 3, 1)``.
      depth_values: ``(B, D)`` depth hypotheses (D may be 1 for one slice).

    Returns:
      ``(B, D, H, W, 2)`` pixel coordinates ``(x, y)`` in the source image.
    """
    B = rot_grid.shape[0]
    D = depth_values.shape[1]
    x, y = plane_sweep_xy(rot_grid, trans, depth_values)
    coords = jnp.stack([x, y], axis=-1)  # (B, D, H*W, 2)
    return coords.reshape(B, D, height, width, 2)


def max_depth_step_displacement(
    src_projs, ref_proj, depth_values, height: int, width: int
) -> float:
    """Host-side (numpy) upper bound on the per-depth-step warp displacement.

    The packed 4x4-row gather (``ops.patch_sample.patch_bilinear_sample_packed``)
    is exact only when each group of K consecutive depth hypotheses spans
    <= 2 px; the caller checks ``(K - 1) * max_depth_step_displacement(...)
    <= 2``.  Per pixel, the warp x(d) = (alpha*d + beta)/(gamma*d + eps) is
    a Moebius map of depth, so its per-step displacement is monotone in d
    wherever the denominator keeps its sign (all depths in front of the
    camera) — the max over the sweep is attained at an endpoint, and
    evaluating the first and last depth pairs over the full pixel grid
    bounds every step.

    The endpoint argument REQUIRES (a) the warp denominator z > 0 at every
    probed depth for every view — if any pixel projects behind a source
    camera (near-epipole pixels, forward-motion scenes) the Moebius pole
    lies inside the sweep and interior steps can exceed both endpoint
    probes — and (b) monotone depth spacing (linspace in d or in 1/d both
    qualify; the step sequence must be sorted).  When either precondition
    fails this returns ``inf`` so gates like ``pick_packed_rows``
    fail-closed to the exact per-depth path instead of silently dropping
    bilinear taps.

    Args:
      src_projs: ``(S, 4, 4)`` source projection matrices (numpy).
      ref_proj: ``(4, 4)``.
      depth_values: ``(D,)`` sweep depths in order.
      height, width: feature-map size.

    Returns:
      max over views/pixels/axes of ``|p(d_{i+1}) - p(d_i)|`` in pixels
      at the sweep's endpoint steps.
    """
    import numpy as np

    src_projs = np.asarray(src_projs, np.float64)
    ref_proj = np.asarray(ref_proj, np.float64)
    d = np.asarray(depth_values, np.float64)
    if d.size < 2:
        return 0.0
    steps = np.diff(d)
    if not (np.all(steps > 0) or np.all(steps < 0)):
        return float("inf")  # non-monotone sweep: endpoint bound invalid
    # Spacing must be monotone too (linspace in d: constant; linspace in
    # 1/d: monotone).  A non-monotone |step| sequence can hide its largest
    # step in the interior.  Tolerance is relative to the step magnitude:
    # float32 linspace steps jitter by ~2^-23 * range.
    mag = np.abs(steps)
    tol = 1e-3 * float(mag.max())
    if not (np.all(np.diff(mag) >= -tol) or np.all(np.diff(mag) <= tol)):
        return float("inf")
    probe = np.array([d[0], d[1], d[-2], d[-1]])

    y, x = np.mgrid[0:height, 0:width].astype(np.float64)
    pix = np.stack([x.ravel(), y.ravel(), np.ones(height * width)])  # (3, N)

    worst = 0.0
    for sp in src_projs:
        proj = sp @ np.linalg.inv(ref_proj)
        rot_grid = proj[:3, :3] @ pix  # (3, N)
        trans = proj[:3, 3:4]
        xyz = rot_grid[None] * probe[:, None, None] + trans[None]  # (4, 3, N)
        z = xyz[:, 2]
        if np.min(z) <= 0.0:
            # A probed point is on/behind a source camera: the Moebius pole
            # sits inside (or at the edge of) the sweep, the interior is
            # unbounded by the endpoints — report "unbounded".
            return float("inf")
        z = np.where(z == 0.0, z + 1e-4, z)
        px = xyz[:, 0] / z
        py = xyz[:, 1] / z
        for a, b in ((0, 1), (2, 3)):
            worst = max(
                worst,
                float(np.abs(px[b] - px[a]).max()),
                float(np.abs(py[b] - py[a]).max()),
            )
    return worst


def warp_src_feature(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """One-call warp of a source feature map over a block of depths.

    Args:
      src_feat: ``(B, H, W, C)``.
      src_proj, ref_proj: ``(B, 4, 4)``.
      depth_values: ``(B, D)``.

    Returns:
      ``(B, D, H, W, C)`` source features resampled into the reference
      frustum at each hypothesis depth.
    """
    B, H, W, C = src_feat.shape
    rot_grid, trans = homography_terms(src_proj, ref_proj, H, W)
    coords = plane_sweep_coords(rot_grid, trans, depth_values, H, W)
    # Fold the depth axis into sampling points: (B, D*H*W, 2).
    warped = bilinear_sample(src_feat, coords.reshape(B, -1, 2))
    return warped.reshape(B, depth_values.shape[1], H, W, C)
