"""flax.linen model modules for the TPU-native VER stack."""

from .config import VERConfig  # noqa: F401
from .detector import VoxelFormer  # noqa: F401
from .bev2d import BEV2DConfig, BEVFormer2D  # noqa: F401
from .vit import ViT, convert_hf_vit_params  # noqa: F401
