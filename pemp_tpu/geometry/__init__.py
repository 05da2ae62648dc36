from pemp_tpu.geometry.affine import (
    factor_affine,
    get_affine_transform,
    get_multi_scale_size,
    get_multi_scale_size_hourglass,
    get_scaling_type,
    get_transform,
    kpt_affine,
    reverse_affine_map,
    reverse_affine_map_points,
    three_point_affine,
)
from pemp_tpu.geometry.warp import invert_2x3, resize_bilinear, warp_affine

__all__ = [
    "factor_affine",
    "get_affine_transform",
    "get_multi_scale_size",
    "get_multi_scale_size_hourglass",
    "get_scaling_type",
    "get_transform",
    "kpt_affine",
    "reverse_affine_map",
    "reverse_affine_map_points",
    "three_point_affine",
    "invert_2x3",
    "resize_bilinear",
    "warp_affine",
]
