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
