"""JAX ops: bilinear sampling, plane-sweep homography, cost-volume build,
deformable-conv sampling.  Pure-XLA reference implementations live here;
speed-of-light Pallas kernels live in :mod:`aa_rmvsnet_tpu.ops.pallas` and
are numerically validated against these.
"""

from .grid_sample import bilinear_sample, bilinear_sample_xy, bilinear_sample_normalized
from .homography import (
    homography_terms,
    max_depth_step_displacement,
    plane_sweep_coords,
    plane_sweep_xy,
    warp_src_feature,
)
from .patch_sample import (
    build_patch_table,
    build_patch_table4,
    build_patch_table4_quant,
    build_patch_table_packed,
    build_patch_table_packed_quant,
    build_patch_table_quant,
    patch_bilinear_sample,
    patch_bilinear_sample_packed,
)
from .cost_volume import reweighted_variance_slice
from .deform import deform_conv
from .resize import resize_bilinear_align_corners, resize_trilinear_align_corners
