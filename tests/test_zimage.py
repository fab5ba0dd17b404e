"""Z-Image (S3-DiT) integration tests: graph forward + synthesized v2
checkpoint load (reference transformer_zimage.py:27-232 contract)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.utils import nunchaku_format as NF
from nunchaku_tpu.utils.safetensors import save_safetensors
from nunchaku_tpu.models.transformers.transformer_zimage import (
    ZImageConfig,
    ZImageTransformer2DModel,
)

rng = np.random.default_rng(7)
DIM, HEADS, CAP, LAYERS, REF = 512, 4, 512, 2, 1
CFG = dict(
    dim=DIM, num_layers=LAYERS, num_refiner_layers=REF, num_attention_heads=HEADS,
    in_channels=16, patch_size=2, cap_feat_dim=CAP, axes_dims_rope=[32, 48, 48],
    ffn_inner=1024,
)


def _inputs(b=1, s_img=256, s_txt=64):
    ii = np.zeros((s_img, 3), np.int32)
    ii[:, 1] = np.arange(s_img) // 16
    ii[:, 2] = np.arange(s_img) % 16
    return (
        jax.random.normal(jax.random.PRNGKey(1), (b, s_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (b, s_txt, CAP), jnp.bfloat16),
        jnp.full((b,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((s_txt, 3), jnp.int32),
    )


@pytest.mark.parametrize("precision", ["int4", "int8"])
def test_zimage_forward(precision):
    cfg = ZImageConfig(**{**CFG, "axes_dims_rope": (32, 48, 48)}, precision=precision)
    model = ZImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    out = jax.jit(lambda m, *a: m(*a))(model, *_inputs())
    assert out.shape == (1, 256, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def _svdq_v2_tensors(prefix, in_f, out_f, seed, rank=8):
    r = np.random.default_rng(seed)
    import ml_dtypes

    vals = r.integers(-8, 8, (out_f, in_f)).astype(np.int8)
    ws = (r.random((in_f // 64, out_f)).astype(np.float32) * 0.01 + 0.001)
    return {
        f"{prefix}.qweight": NF.pack_weight_int4(vals),
        f"{prefix}.wscales": NF.pack_scale_ref(ws),
        f"{prefix}.smooth_factor": (r.random(in_f).astype(np.float32) + 0.5).astype(ml_dtypes.bfloat16),
        f"{prefix}.proj_down": (r.standard_normal((in_f, rank)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{prefix}.proj_up": (r.standard_normal((out_f, rank)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{prefix}.bias": (r.standard_normal(out_f) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _linear_tensors(prefix, in_f, out_f, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    return {
        f"{prefix}.weight": (r.standard_normal((out_f, in_f)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{prefix}.bias": (r.standard_normal(out_f) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _norm(prefix, d, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    return {f"{prefix}.weight": (r.random(d).astype(np.float32) + 0.5).astype(ml_dtypes.bfloat16)}


def _block_tensors(p, seed, modulated=True):
    t = {}
    t |= _svdq_v2_tensors(f"{p}.attention.to_qkv", DIM, 3 * DIM, seed)
    t |= _svdq_v2_tensors(f"{p}.attention.to_out.0", DIM, DIM, seed + 1)
    t |= _norm(f"{p}.attention.norm_q", DIM // HEADS, seed + 2)
    t |= _norm(f"{p}.attention.norm_k", DIM // HEADS, seed + 3)
    t |= _svdq_v2_tensors(f"{p}.feed_forward.net.0.proj", DIM, 2048, seed + 4)
    t |= _svdq_v2_tensors(f"{p}.feed_forward.net.2", 1024, DIM, seed + 5)
    for i, nm in enumerate(["attention_norm1", "attention_norm2", "ffn_norm1", "ffn_norm2"]):
        t |= _norm(f"{p}.{nm}", DIM, seed + 6 + i)
    if modulated:
        t |= _linear_tensors(f"{p}.adaLN_modulation.1", 1024, 4 * DIM, seed + 10)
    return t


def _build_ckpt(tmp_path):
    t = {}
    for i in range(LAYERS):
        t |= _block_tensors(f"layers.{i}", 100 + i * 20)
    for i in range(REF):
        t |= _block_tensors(f"noise_refiner.{i}", 300 + i * 20)
        t |= _block_tensors(f"context_refiner.{i}", 400 + i * 20, modulated=False)
    t |= _linear_tensors("x_embedder", 64, DIM, 1)
    t |= _linear_tensors("t_embedder.mlp.0", 256, 1024, 2)
    t |= _linear_tensors("t_embedder.mlp.2", 1024, 1024, 3)
    t |= _norm("cap_embedder.0", CAP, 4)
    t |= _linear_tensors("cap_embedder.1", CAP, DIM, 5)
    t |= _norm("norm_out", DIM, 6)
    t |= _linear_tensors("final_layer.linear", DIM, 64, 7)
    t |= _linear_tensors("final_layer.adaLN_modulation.1", 1024, DIM, 8)
    qcfg = {"weight": {"dtype": "int4", "group_size": 64}, "rank": 8}
    path = tmp_path / "zimage-tiny.safetensors"
    save_safetensors(path, t, {"config": json.dumps(CFG), "quantization_config": json.dumps(qcfg)})
    return path


@pytest.mark.parametrize("precision", [None, "int8", "w4a8"])
def test_zimage_load_and_run(tmp_path, precision):
    from nunchaku_tpu.models.transformers.loader_zimage import load_zimage_transformer

    path = _build_ckpt(tmp_path)
    model = load_zimage_transformer(path, precision=precision)
    assert model.cfg.dim == DIM and model.cfg.num_layers == LAYERS
    out = jax.jit(lambda m, *a: m(*a))(model, *_inputs())
    assert out.shape == (1, 256, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_zimage_loaded_linear_matches_oracle(tmp_path):
    """Decoded v2 qkv linear reproduces the bit-faithful quantized oracle
    (same pattern as tests/test_checkpoint.py's FLUX check)."""
    from nunchaku_tpu.models.transformers.loader_zimage import load_zimage_transformer
    from nunchaku_tpu.models.transformers.transformer_flux import slice_module
    from nunchaku_tpu.ops import reference as R

    path = _build_ckpt(tmp_path)
    model = load_zimage_transformer(path)
    blk = slice_module(model.layers, 0)
    lin = blk.attention.to_qkv

    # reconstruct logical tensors from the same draws as _svdq_v2_tensors(seed=100)
    r = np.random.default_rng(100)
    vals = r.integers(-8, 8, (3 * DIM, DIM)).astype(np.int8)
    ws = r.random((DIM // 64, 3 * DIM)).astype(np.float32) * 0.01 + 0.001
    smooth = r.random(DIM).astype(np.float32) + 0.5
    pd = (r.standard_normal((DIM, 8)) * 0.02).astype(np.float32)  # (K, R)
    pu = (r.standard_normal((3 * DIM, 8)) * 0.02).astype(np.float32)  # (O, R)
    bias = (r.standard_normal(3 * DIM) * 0.01).astype(np.float32)

    x = jax.random.normal(jax.random.PRNGKey(5), (8, DIM), jnp.bfloat16)
    out = lin(x[None])[0]

    bf = lambda a: jnp.asarray(a, jnp.bfloat16).astype(jnp.float32)
    qa, asc, la = R.quantize_act_fuse_lora(x, bf(smooth), jnp.asarray(pd, jnp.bfloat16))
    ref = R.w4a4_gemm(
        qa, asc.astype(jnp.bfloat16), jnp.asarray(vals.T), bf(ws),
        lora_act=la, proj_up=jnp.asarray(pu.T, jnp.bfloat16), bias=bf(bias),
        exact_int_dot=False,
    )
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / (
        float(jnp.max(jnp.abs(ref))) + 1e-9
    )
    assert err < 0.02, err


def test_zimage_pipeline_smoke():
    """TPU-native ZImagePipeline (Lumina2 conventions: t = 1 - sigma,
    negative-velocity euler update) denoises to finite latents."""
    from nunchaku_tpu.pipeline.pipeline_zimage import ZImagePipeline

    cfg = ZImageConfig(**{**CFG, "axes_dims_rope": (32, 48, 48)})
    model = ZImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    pipe = ZImagePipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(5), (1, 64, CAP), jnp.bfloat16)
    out = pipe(pe, height=128, width=128, num_inference_steps=2)
    assert out.latents.shape == (1, 64, 64)  # (128/8/2)^2 tokens, 16*p^2 ch
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())
    # CFG branch
    ne = jnp.zeros_like(pe)
    out2 = pipe(pe, negative_prompt_embeds=ne, guidance_scale=3.0,
                height=128, width=128, num_inference_steps=2)
    assert bool(jnp.isfinite(out2.latents.astype(jnp.float32)).all())


def test_zimage_fused_qkv_prep_equivalence():
    """Half-split perm + qkv_rope_producer must match the interleaved path
    (all three attention stacks permuted)."""
    cfg = ZImageConfig(**{**CFG, "axes_dims_rope": (32, 48, 48)}, precision="int8")
    base = ZImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    fused = ZImageTransformer2DModel.random_init(
        jax.random.PRNGKey(0), cfg
    ).enable_fused_qkv_prep()
    args = _inputs()
    f = jax.jit(lambda m, *a: m(*a))
    ref = np.asarray(f(base, *args), np.float32)
    out = np.asarray(f(fused, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 2e-2, err
