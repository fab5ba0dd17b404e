from .module import Module
from .packing import PACK_BLOCK, pack_int4, unpack_int4

__all__ = ["Module", "PACK_BLOCK", "pack_int4", "unpack_int4"]
