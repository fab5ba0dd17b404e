"""nunchaku_tpu: a TPU-native 4-bit (SVDQuant W4A4) diffusion inference engine.

From-scratch JAX/Pallas rebuild of the capabilities of nunchaku-tech/nunchaku
(see SURVEY.md). The hot path — group-quantized int4 GEMM fused with the
rank-32 low-rank SVD branch, on-the-fly activation quantization, GELU/requant
chaining, fused RMSNorm+RoPE and flash attention — runs as Pallas MXU kernels
on HBM-resident packed int4 weights; graphs, caching, LoRA and pipelines are
idiomatic JAX/XLA with pjit/shard_map tensor parallelism over ICI.

Public surface (reference parity: nunchaku/__init__.py:1-17):
  * FluxTransformer2DModel + load_flux_transformer (NunchakuFluxTransformer2dModel)
  * T5EncoderModel / load_t5_encoder (NunchakuT5EncoderModel)
  * AutoencoderKL / load_autoencoder
  * ZImageTransformer2DModel + load_zimage_transformer (NunchakuZImageTransformer2DModel)
  * SDXLUNet2DConditionModel + load_sdxl_unet (NunchakuSDXLUNet2DConditionModel)
  * SanaTransformer2DModel + load_sana_transformer (NunchakuSanaTransformer2DModel)
  * QwenImageTransformer2DModel + load_qwenimage_transformer + QwenImagePipeline
  * FluxPipeline, apply_cache_on_pipe (caching/diffusers_adapters)
  * update_lora_params, set_lora_strength, compose_lora
"""

__version__ = "0.1.0"

from .models.autoencoder import AutoencoderKL, load_autoencoder
from .models.linear import AWQW4A16Linear, SVDQW4A4Linear
from .models.text_encoders.clip import (
    CLIPTextModel,
    CLIPVisionModel,
    load_clip_text,
    load_clip_vision,
    preprocess_clip_image,
)
from .models.ip_adapter.flux import FluxIPAdapter, load_flux_ip_adapter
from .models.pulid import IDFormer, load_eva_vision, load_pulid, pulid_forward
from .models.safety_checker import SafetyChecker
from .models.dc_ae import DCAE, DCAEConfig, load_dc_ae
from .models.text_encoders.gemma2 import Gemma2Encoder, load_gemma2_encoder
from .pipeline.pipeline_flux_pulid import PuLIDFluxPipeline
from .models.text_encoders.t5 import T5EncoderModel, load_t5_encoder
from .models.transformers.loader import load_flux_transformer
from .models.unets.unet_sdxl import SDXLConfig, SDXLUNet2DConditionModel, load_sdxl_unet
from .models.transformers.loader_qwenimage import load_qwenimage_transformer
from .models.transformers.loader_sana import load_sana_transformer
from .models.transformers.loader_zimage import load_zimage_transformer
from .models.transformers.transformer_qwenimage import (
    QwenImageConfig,
    QwenImageTransformer2DModel,
)
from .models.transformers.transformer_sana import SanaConfig, SanaTransformer2DModel
from .pipeline.pipeline_qwenimage import QwenImagePipeline
from .pipeline.pipeline_sdxl import SDXLPipeline
from .pipeline.pipeline_zimage import ZImagePipeline
from .models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from .models.transformers.transformer_zimage import ZImageConfig, ZImageTransformer2DModel
from .pipeline.pipeline_flux import FluxPipeline, apply_cache_on_pipe
from .pipeline.pipeline_flux_pix2pix import FluxPix2pixTurboPipeline
from .lora.flux.apply import set_lora_strength, update_lora_params
from .lora.flux.convert import compose_lora
from .models.requantize import requantize_model, w4a8_cache_dequant

__all__ = [
    "AutoencoderKL",
    "AWQW4A16Linear",
    "CLIPTextModel",
    "FluxConfig",
    "FluxPipeline",
    "FluxPix2pixTurboPipeline",
    "FluxTransformer2DModel",
    "SVDQW4A4Linear",
    "T5EncoderModel",
    "apply_cache_on_pipe",
    "compose_lora",
    "load_autoencoder",
    "requantize_model",
    "w4a8_cache_dequant",
    "load_clip_text",
    "load_clip_vision",
    "preprocess_clip_image",
    "CLIPVisionModel",
    "FluxIPAdapter",
    "load_flux_ip_adapter",
    "IDFormer",
    "load_eva_vision",
    "load_pulid",
    "pulid_forward",
    "PuLIDFluxPipeline",
    "SafetyChecker",
    "DCAE",
    "DCAEConfig",
    "load_dc_ae",
    "Gemma2Encoder",
    "load_gemma2_encoder",
    "load_flux_transformer",
    "load_t5_encoder",
    "set_lora_strength",
    "update_lora_params",
    "ZImageConfig",
    "ZImageTransformer2DModel",
    "load_zimage_transformer",
    "SDXLConfig",
    "SDXLUNet2DConditionModel",
    "load_sdxl_unet",
    "SanaConfig",
    "SanaTransformer2DModel",
    "load_sana_transformer",
    "QwenImageConfig",
    "QwenImageTransformer2DModel",
    "QwenImagePipeline",
    "SDXLPipeline",
    "ZImagePipeline",
    "load_qwenimage_transformer",
]
