"""Golden quality tests: LPIPS machinery + engine-vs-16-bit-twin bounds.

Mirrors the reference contract (tests/v1/flux/test_flux1_dev.py:20-135):
deterministic seeds, quantized-vs-16-bit generation, LPIPS < budget * 1.10.
The 16-bit reference here is the exact dequantized twin; real checkpoints
activate via NUNCHAKU_TPU_CKPT_ROOT (tests skip — not vanish — without it).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from golden_utils import (
    GOLDEN_PROMPTS,
    LPIPS_BUDGETS,
    hash_str_to_int,
    latents_to_images,
    require_checkpoints,
)
from nunchaku_tpu.metrics import compute_lpips
from nunchaku_tpu.models.bf16_ref import dequantized_twin
from nunchaku_tpu.models.linear import SVDQW4A4Linear
from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)
from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline

TINY = FluxConfig(
    num_layers=2, num_single_layers=2, num_attention_heads=2,
    joint_attention_dim=512, pooled_projection_dim=256,
)


def test_seed_hash_matches_reference_algorithm():
    # same algorithm as reference tests/utils.py:14-20 (31-polynomial mod 1e9+7)
    assert hash_str_to_int("abc") == ((ord("a") * 31 + ord("b")) * 31 + ord("c")) % (10**9 + 7)
    assert hash_str_to_int(GOLDEN_PROMPTS[0]) != hash_str_to_int(GOLDEN_PROMPTS[1])


@pytest.mark.parametrize("precision", ["int4", "int8", "w4a8"])
def test_twin_linear_bounds_engine_error(precision):
    """Engine output vs the dequantized twin differs only by activation
    quantization: relative error stays within the per-precision envelope."""
    lin = SVDQW4A4Linear.random_init(
        jax.random.PRNGKey(0), 512, 768, precision=precision
    )
    from nunchaku_tpu.models.bf16_ref import _twin_linear

    twin = _twin_linear(lin)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 512), jnp.bfloat16)
    y_eng = np.asarray(lin(x), np.float32)
    y_ref = np.asarray(twin(x), np.float32)
    err = np.linalg.norm(y_eng - y_ref) / np.linalg.norm(y_ref)
    # int4 act-quant noise ~ few %, int8 sub-%; random weights are worst-case
    assert err < (0.25 if precision == "int4" else 0.08), (precision, err)


def test_twin_linear_unsigned_shift_fold():
    """act_unsigned engine path == twin with the shift folded into bias."""
    lin = SVDQW4A4Linear.random_init(
        jax.random.PRNGKey(2), 512, 256, precision="int8", act_unsigned=True
    )
    from nunchaku_tpu.models.bf16_ref import _twin_linear

    twin = _twin_linear(lin)
    # gelu-like non-negative-ish input (what fc2 actually sees)
    x = jax.nn.gelu(jax.random.normal(jax.random.PRNGKey(3), (32, 512))).astype(jnp.bfloat16)
    y_eng = np.asarray(lin(x), np.float32)
    y_ref = np.asarray(twin(x), np.float32)
    err = np.linalg.norm(y_eng - y_ref) / np.linalg.norm(y_ref)
    assert err < 0.08, err


def _generate(pipe, prompt, steps=2, size=128):
    seed = hash_str_to_int(prompt) % (2**31)
    pe = jax.random.normal(
        jax.random.PRNGKey(seed), (1, 64, TINY.joint_attention_dim), jnp.bfloat16
    )
    pool = jax.random.normal(
        jax.random.PRNGKey(seed + 1), (1, TINY.pooled_projection_dim), jnp.bfloat16
    )
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=size, width=size, num_inference_steps=steps, seed=seed,
    )
    return np.asarray(out.latents, np.float32)


def test_golden_harness_end_to_end_smoke():
    """Full golden pipeline on a tiny random model: generate with the
    quantized engine and its 16-bit twin over the prompt set with hashed
    seeds, decode to images, compute LPIPS, assert a budget. This is the
    exact code path real checkpoints will take."""
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    twin = dequantized_twin(model)
    engine_pipe = FluxPipeline(model)
    ref_pipe = FluxPipeline(twin)

    gen, ref = [], []
    for prompt in GOLDEN_PROMPTS[:2]:
        gen.append(_generate(engine_pipe, prompt))
        ref.append(_generate(ref_pipe, prompt))
    gen_imgs = latents_to_images(np.concatenate(gen))
    ref_imgs = latents_to_images(np.concatenate(ref))

    score = compute_lpips(ref_imgs, gen_imgs)
    mismatch = compute_lpips(ref_imgs, gen_imgs[::-1])
    assert np.isfinite(score)
    # engine-vs-twin must be far closer than unrelated images (metric sanity)
    assert score < 0.5 * mismatch, (score, mismatch)
    # smoke budget (random-feature LPIPS, random weights): generous but real
    assert score < 0.2, score


def test_lpips_metric_properties():
    rng = np.random.default_rng(0)
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
    c = rng.random((2, 64, 64, 3)).astype(np.float32)
    d_same = compute_lpips(a, a)
    d_near = compute_lpips(a, b)
    d_far = compute_lpips(a, c)
    assert d_same < 1e-6
    assert d_same < d_near < d_far


@pytest.mark.parametrize("name,precision", [("flux.1-schnell", "int4"), ("flux.1-dev", "int4")])
def test_golden_real_checkpoint(name, precision):
    """Real-checkpoint golden test: activates when NUNCHAKU_TPU_CKPT_ROOT is
    mounted (expects <root>/<name>.safetensors + <root>/ref_images/<name>/).
    Thresholds: reference CI tables x 1.10 (BASELINE.md)."""
    require_checkpoints()
    import os

    from golden_utils import CKPT_ROOT
    from nunchaku_tpu.models.transformers.loader import load_flux_transformer

    path = os.path.join(CKPT_ROOT, f"{name}.safetensors")
    if not os.path.exists(path):
        pytest.skip(f"{path} not mounted")
    model = load_flux_transformer(path)
    pipe = FluxPipeline(model)
    budget = LPIPS_BUDGETS[(name, precision)]
    ref_dir = os.path.join(CKPT_ROOT, "ref_images", name)
    if not os.path.isdir(ref_dir):
        pytest.skip(f"{ref_dir} (16-bit reference images) not mounted")
    # generation at full size + LPIPS vs mounted reference images
    gen = [
        _generate(pipe, p, steps=4 if "schnell" in name else 20, size=1024)
        for p in GOLDEN_PROMPTS
    ]
    gen_imgs = latents_to_images(np.concatenate(gen))
    ref_imgs = np.stack(
        [np.load(os.path.join(ref_dir, f"{hash_str_to_int(p)}.npy")) for p in GOLDEN_PROMPTS]
    )
    score = compute_lpips(ref_imgs, gen_imgs)
    assert score < budget * 1.10, (score, budget)


@pytest.mark.parametrize("mode", ["int8", "w4a8"])
def test_requantization_weight_rounding_envelope(mode):
    """Model-level bound on the int8/w4a8 weight re-rounding the TPU serving
    modes add on top of the checkpoint's int4 (loader.py _decode_svdq:89-126,
    ops/gemm.py w4a8 in-kernel re-round). Comparing the *twins* of the int4
    model and its requantized conversion isolates the re-rounding — neither
    side has activation quantization — which is the error the reference's
    LPIPS spec (tests/v1/flux/test_flux1_dev.py:66-70) cannot see."""
    from nunchaku_tpu.core.packing import pack_int4, unpack_int4
    from nunchaku_tpu.models.requantize import requantize_model

    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    # random_init packs raw random bytes -> codes span [-8, 7]; real
    # deepcompressor checkpoints are symmetric [-7, 7] (ops/reference.py
    # quantize_weight). -8 codes at max-scale groups hit the w4a8 clip
    # (ops/gemm.py:204-209) and would overstate the re-rounding error ~4x.
    for _, m in model.modules():
        if isinstance(m, SVDQW4A4Linear) and m.precision == "int4":
            codes = jnp.clip(unpack_int4(m.qweight, axis=-2), -7, 7)
            m.qweight = pack_int4(codes.astype(jnp.int8), axis=-2)
    re_model = requantize_model(model, mode)
    twin4 = dequantized_twin(model)
    twin_re = dequantized_twin(re_model)

    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 64, TINY.joint_attention_dim), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(2), (1, TINY.pooled_projection_dim), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64), jnp.bfloat16)
    iids = jnp.zeros((64, 3), jnp.int32)
    tids = jnp.zeros((64, 3), jnp.int32)
    t = jnp.full((1,), 0.5, jnp.float32)

    f = jax.jit(lambda m: m(x, pe, pool, t, iids, tids, None))
    y4 = np.asarray(f(twin4), np.float32)
    yre = np.asarray(f(twin_re), np.float32)
    err = np.linalg.norm(yre - y4) / (np.linalg.norm(y4) + 1e-9)
    # per-channel int8 re-rounding of an int4-grouped weight adds sub-percent
    # relative error at model level (int4 codes span <=7 levels/group; the
    # int8 grid has >=127/7 ~ 18 levels per int4 step)
    assert np.isfinite(err) and err < 0.02, (mode, err)

    # engine-vs-int4-twin total error stays within the activation envelope
    # (requantized engine output tracks the int4 parity contract)
    g = jax.jit(lambda m: m(x, pe, pool, t, iids, tids, None))
    y_eng = np.asarray(g(re_model), np.float32)
    tot = np.linalg.norm(y_eng - y4) / (np.linalg.norm(y4) + 1e-9)
    assert np.isfinite(tot) and tot < 0.15, (mode, tot)


@pytest.mark.parametrize("family", ["qwenimage", "zimage", "sana"])
def test_twin_model_bounds_other_families(family):
    """The dequantized-twin quality bound extends beyond FLUX: each model
    family's int8 engine forward tracks its exact bf16 twin within the
    activation-quantization envelope (the golden contract's engine half —
    real-checkpoint LPIPS activates via NUNCHAKU_TPU_CKPT_ROOT)."""
    key = jax.random.PRNGKey(0)
    if family == "qwenimage":
        from nunchaku_tpu.models.transformers.transformer_qwenimage import (
            QwenImageConfig, QwenImageTransformer2DModel,
        )

        cfg = QwenImageConfig(num_layers=2, num_attention_heads=2,
                              joint_attention_dim=320, precision="int8")
        model = QwenImageTransformer2DModel.random_init(key, cfg)
        args = (
            jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64), jnp.bfloat16),
            jax.random.normal(jax.random.PRNGKey(2), (1, 16, 320), jnp.bfloat16),
            jnp.array([0.5], jnp.float32),
            jnp.zeros((64, 3), jnp.int32),
        )
    elif family == "zimage":
        from nunchaku_tpu.models.transformers.transformer_zimage import (
            ZImageConfig, ZImageTransformer2DModel,
        )

        cfg = ZImageConfig(
            dim=512, num_layers=2, num_refiner_layers=1,
            num_attention_heads=4, in_channels=16, patch_size=2,
            cap_feat_dim=512, axes_dims_rope=[32, 48, 48], ffn_inner=1024,
            precision="int8",
        )
        model = ZImageTransformer2DModel.random_init(key, cfg)
        ii = np.zeros((256, 3), np.int32)
        ii[:, 1] = np.arange(256) // 16
        ii[:, 2] = np.arange(256) % 16
        args = (
            jax.random.normal(jax.random.PRNGKey(1), (1, 256, 64), jnp.bfloat16),
            jax.random.normal(jax.random.PRNGKey(2), (1, 64, 512), jnp.bfloat16),
            jnp.full((1,), 0.5, jnp.float32),
            jnp.asarray(ii),
            jnp.zeros((64, 3), jnp.int32),
        )
    else:
        from nunchaku_tpu.models.transformers.transformer_sana import (
            SanaConfig, SanaTransformer2DModel,
        )

        cfg = SanaConfig(
            num_layers=2, num_attention_heads=4, attention_head_dim=32,
            num_cross_attention_heads=4, cross_attention_head_dim=32,
            caption_channels=320, in_channels=32, precision="int8",
        )
        model = SanaTransformer2DModel.random_init(key, cfg)
        args = (
            jax.random.normal(jax.random.PRNGKey(1), (1, 256, 32), jnp.bfloat16),
            jax.random.normal(jax.random.PRNGKey(2), (1, 48, 320), jnp.bfloat16),
            jnp.array([0.5], jnp.float32),
        )

    twin = dequantized_twin(model)
    f = jax.jit(lambda m, *a: m(*a))
    y_eng = np.asarray(f(model, *args), np.float32)
    y_ref = np.asarray(f(twin, *args), np.float32)
    err = np.linalg.norm(y_eng - y_ref) / (np.linalg.norm(y_ref) + 1e-9)
    assert np.isfinite(err) and err < 0.15, (family, err)
