"""nunchaku_tpu: a TPU-native 4-bit (SVDQuant W4A4) diffusion inference engine.

From-scratch JAX/Pallas rebuild of the capabilities of nunchaku-tech/nunchaku
(see SURVEY.md). The hot path — group-quantized int4 GEMM fused with the
rank-32 low-rank SVD branch, on-the-fly activation quantization, GELU/requant
chaining, fused RMSNorm+RoPE and flash attention — runs as Pallas MXU kernels
on HBM-resident packed int4 weights; graphs, caching, LoRA and pipelines are
idiomatic JAX/XLA with pjit/shard_map tensor parallelism over ICI.
"""

__version__ = "0.1.0"
