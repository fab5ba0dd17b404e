from .unet_sdxl import SDXLConfig, SDXLUNet2DConditionModel, load_sdxl_unet

__all__ = ["SDXLConfig", "SDXLUNet2DConditionModel", "load_sdxl_unet"]
