"""Model layer (reference L0 backbones + L3 EDRL modules), flax.linen."""

from edrl_tpu.models.swin2d import SwinTransformer2D
from edrl_tpu.models.vit3d import ViT3D
from edrl_tpu.models.eprl import EPRL
from edrl_tpu.models.poe import PoE
from edrl_tpu.models.dilr import DILR, AttentionModel
from edrl_tpu.models.medfusion import MedFusion

__all__ = [
    "SwinTransformer2D",
    "ViT3D",
    "EPRL",
    "PoE",
    "DILR",
    "AttentionModel",
    "MedFusion",
]
