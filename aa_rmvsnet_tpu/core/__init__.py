"""CPU-pure geometry and I/O foundations (no JAX dependency).

Codec + camera-algebra layer mirroring the reference data formats:
PFM depth maps, MVSNet ``*_cam.txt`` cameras, ``pair.txt`` view graphs,
depth-hypothesis samplers, image standardization/scale/crop/pad transforms,
and a binary PLY point-cloud writer.
"""

from .pfm import read_pfm, save_pfm
from .cameras import (
    CameraParams,
    read_cam_file,
    read_pair_file,
    projection_matrix,
    scale_intrinsics,
    crop_intrinsics,
)
from .samplers import (
    linear_depth_train,
    linear_depth_eval,
    inverse_depth_open,
    inverse_depth_bounded,
)
from .transforms import (
    standardize_image,
    scale_image,
    center_crop_to_multiple,
    pad_rows,
)
from .ply import write_ply, read_ply
