"""Compute ops: deformable-attention sampling (XLA oracle + Pallas kernels)."""

from .sampling import bilinear_sample_2d, trilinear_sample_3d  # noqa: F401
from .deform_attn import (  # noqa: F401
    ms_deform_attn_2d,
    ms_deform_attn_2d_onehot,
    voxel_deform_attn_3d,
    voxel_deform_attn_3d_onehot,
)
