"""Odd-dimension models (SANA 2240, SDXL 640/960/1280, ...): every
quantized-linear buffer is zero-padded to kernel-legal dims (K->256
multiples, N->128) at build time and the activations/output are
padded/sliced at call time (models/linear.py, ops/quantize.py).

Round-5 regression: `random_init` skipped the padding `from_weights`
applies, so SANA/SDXL random-weight builds failed on-chip with
"pack axis size 2240 not a multiple of 256" (SMOKE_r05.json) — caught by
the smoke tier precisely because the CPU suite only used 256-multiple
dims. These tests pin the padding contract at odd dims on every
precision, including the Mosaic full-K GEMM tile fallback (no 512-
multiple divides K=2304) and the GLU-fused quantize path.

Reference counterpart: the CUDA engine asserts 128-alignment and the
models guarantee it by construction (gemm_w4a4.cuh shape asserts); on TPU
the odd-dim models are first-class, so padding lives in the layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunchaku_tpu.core.packing import unpack_int4
from nunchaku_tpu.models.linear import SVDQW4A4Linear


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


@pytest.mark.parametrize("precision", ["int4", "nvfp4", "int8", "w4a8", "nvfp4-a8"])
@pytest.mark.parametrize("dims", [(320, 384), (2240, 640)])
def test_random_init_odd_dims_forward(precision, dims):
    K, N = dims
    lin = SVDQW4A4Linear.random_init(jax.random.PRNGKey(0), K, N, precision=precision)
    assert lin.logical_in == K and lin.logical_out == N
    assert lin.in_features % 256 == 0 and lin.out_features % 128 == 0
    x = jax.random.normal(jax.random.PRNGKey(1), (7, K), jnp.bfloat16)
    out = lin(x)
    assert out.shape == (7, N)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_random_init_padded_rows_hold_zero_codes():
    # act_unsigned's GELU shift makes padded activation CODES nonzero, so
    # correctness relies on the padded weight rows being zero codes
    lin = SVDQW4A4Linear.random_init(
        jax.random.PRNGKey(0), 2240, 640, precision="int4", act_unsigned=True
    )
    codes = unpack_int4(lin.qweight, axis=0)
    assert codes.shape[0] == 2304
    assert bool((codes[2240:] == 0).all())
    assert bool((np.asarray(lin.proj_down)[2240:] == 0).all())
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (5, 2240), jnp.bfloat16))
    out = lin(x)
    assert out.shape == (5, 640)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_random_init_odd_dims_batched_3d():
    lin = SVDQW4A4Linear.random_init(jax.random.PRNGKey(0), 2240, 640, precision="w4a8")
    xb = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 2240), jnp.bfloat16)
    ob = lin(xb)
    assert ob.shape == (2, 9, 640)
    assert bool(jnp.isfinite(ob.astype(jnp.float32)).all())


def test_from_weights_odd_dims_matches_dense():
    W = jax.random.normal(jax.random.PRNGKey(3), (320, 2240), jnp.float32) * 0.02
    lin = SVDQW4A4Linear.from_weights(W.astype(jnp.bfloat16), precision="int4")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 320), jnp.bfloat16)
    y = lin(x)
    assert y.shape == (5, 2240)
    ref = x.astype(jnp.float32) @ W
    assert _rel(y, ref) < 0.25  # 4-bit groups + rank-32 on random W


def test_glumbconv_odd_dim_forward():
    from nunchaku_tpu.models.transformers.transformer_sana import SanaGLUMBConv

    dim = 320  # pads: GLU input 2*2.5*320 = 1600 -> point K 800 -> 1024
    glu = SanaGLUMBConv.random_init(jax.random.PRNGKey(0), dim, int(dim * 2.5), 16, "int4")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, dim), jnp.bfloat16)
    out = glu(x, (8, 8))
    assert out.shape == (1, 64, dim)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_sana_real_dim_model_shapes():
    # the on-chip smoke config (real 2240 dim), eval_shape only: catches
    # every static shape error without paying the CPU compile
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig,
        SanaTransformer2DModel,
    )

    cfg = SanaConfig(num_layers=2, precision="int4")
    model = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    out = jax.eval_shape(
        lambda m, *a: m(*a),
        model,
        jnp.zeros((1, 1024, cfg.in_channels), jnp.bfloat16),
        jnp.zeros((1, 128, cfg.caption_channels), jnp.bfloat16),
        jnp.full((1,), 0.5, jnp.float32),
    )
    assert out.shape == (1, 1024, cfg.in_channels)


def test_sdxl_real_dim_model_shapes():
    from nunchaku_tpu.models.unets.unet_sdxl import (
        SDXLConfig,
        SDXLUNet2DConditionModel,
    )

    cfg = SDXLConfig(precision="int4")
    model = SDXLUNet2DConditionModel.random_init(jax.random.PRNGKey(0), cfg)
    out = jax.eval_shape(
        lambda m, *a: m(*a),
        model,
        jnp.zeros((1, 4, 64, 64), jnp.bfloat16),
        jnp.full((1,), 500.0, jnp.float32),
        jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16),
        jnp.zeros((1, 1280), jnp.bfloat16),
        jnp.ones((1, 6), jnp.float32) * 512,
    )
    assert out.shape == (1, 4, 64, 64)
