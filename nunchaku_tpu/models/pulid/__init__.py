from .encoders import IDFormer, PerceiverAttention, PerceiverAttentionCA, load_pulid
from .eva_clip import EVAVisionTower, load_eva_vision
from .forward import pulid_forward

__all__ = [
    "IDFormer",
    "PerceiverAttention",
    "PerceiverAttentionCA",
    "EVAVisionTower",
    "load_eva_vision",
    "load_pulid",
    "pulid_forward",
]
