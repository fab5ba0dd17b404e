"""Tiny-config FLUX transformer graph tests (CPU, interpret-mode kernels)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)

TINY = FluxConfig(
    num_layers=1,
    num_single_layers=2,
    num_attention_heads=2,
    joint_attention_dim=512,
    pooled_projection_dim=256,
)


@pytest.fixture(scope="module")
def model():
    return FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)


def _inputs(B=1, S_img=256, S_txt=128):
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16)
    txt = jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    g = jnp.array([3.5], jnp.float32)
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    return lat, txt, pooled, t, jnp.asarray(ii), jnp.zeros((S_txt, 3), jnp.int32), g


def test_forward_shape_finite(model):
    args = _inputs()
    out = jax.jit(lambda m, *a: m(*a))(model, *args)
    assert out.shape == (1, 256, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_nvfp4_a8_model_forward():
    """precision='nvfp4-a8' builds e2m1-coded w4a8 linears (group-16
    rescales) and the full graph runs the dequant+int8 route end to end."""
    from nunchaku_tpu.models.linear import SVDQW4A4Linear

    cfg = FluxConfig(
        num_layers=1, num_single_layers=2, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
        precision="nvfp4-a8",
    )
    m = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    seen = 0
    for _, mod in m.modules():
        for child in vars(mod).values():
            if isinstance(child, SVDQW4A4Linear) and child.precision == "w4a8":
                assert child.wcodes == "e2m1"
                k = child.qweight.shape[-2] * 2  # (.., K/2, N), maybe stacked
                assert child.rescales.shape[-2] == k // 16
                seen += 1
    assert seen > 0
    out = jax.jit(lambda mm, *a: mm(*a))(m, *_inputs())
    assert out.shape == (1, 256, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_w4a8_cache_dequant_dial_code_exact():
    """w4a8_cache_dequant (the HBM/speed dial): the cached int8 weight
    codes are byte-identical to what the per-step dequant pass emits, and
    the model output stays inside the Pallas/XLA route-drift envelope
    (1-2 bf16 ulp on standalone GEMM epilogues) at every dial setting."""
    from nunchaku_tpu.models.linear import SVDQW4A4Linear
    from nunchaku_tpu.models.requantize import w4a8_cache_dequant

    cfg = FluxConfig(
        num_layers=1, num_single_layers=2, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
        precision="w4a8",
    )
    m = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    args = _inputs()
    f = jax.jit(lambda mm, *a: mm(*a))
    ref = np.asarray(f(m, *args))

    def count(mm, prec):
        return sum(
            1 for _, mod in mm.modules()
            for c in vars(mod).values()
            if isinstance(c, SVDQW4A4Linear) and c.precision == prec
        )

    n_w4a8 = count(m, "w4a8")
    m0 = w4a8_cache_dequant(m, 0.0)
    assert count(m0, "w4a8") == n_w4a8  # budget 0: nothing converts
    # budget = exactly the largest stack's net growth: only it converts
    biggest = max(
        int(np.prod(c.qweight.shape)) * 2  # packed int4 -> int8 bytes
        for _, mod in m.modules() for c in vars(mod).values()
        if isinstance(c, SVDQW4A4Linear) and c.precision == "w4a8"
    )
    m_half = w4a8_cache_dequant(m, (biggest // 2 + 1) / 2**30)
    m_full = w4a8_cache_dequant(m, 1.0)
    assert count(m_full, "w4a8") == 0  # full budget: everything converts
    assert 0 < count(m_half, "w4a8") < n_w4a8  # partial: a mixed model

    # weight codes byte-identical to the per-step dequant's output
    from nunchaku_tpu.ops.gemm import dequant_w4a8_to_int8

    pairs = [
        (c4, c8)
        for (_, m4), (_, m8) in zip(m.modules(), m_full.modules())
        for c4, c8 in zip(vars(m4).values(), vars(m8).values())
        if isinstance(c4, SVDQW4A4Linear) and c4.precision == "w4a8"
    ]
    assert pairs
    for c4, c8 in pairs:
        # stacked conversions must not derive in_features from the layer
        # axis (forward_modulated's fused producer checks k==in_features)
        assert c8.in_features == c4.in_features, (c8.in_features, c4.in_features)
        assert c8.out_features == c4.out_features
    c4, c8 = pairs[0]
    qw = c4.qweight[0] if c4.qweight.ndim == 3 else c4.qweight
    rs = c4.rescales[0] if c4.rescales.ndim == 3 else c4.rescales
    np.testing.assert_array_equal(
        np.asarray(c8.qweight[0] if c8.qweight.ndim == 3 else c8.qweight),
        np.asarray(dequant_w4a8_to_int8(qw, rs)),
    )

    for mm in (m_half, m_full):
        out = np.asarray(f(mm, *args), np.float32)
        rel = np.linalg.norm(out - ref.astype(np.float32)) / (
            np.linalg.norm(ref.astype(np.float32)) + 1e-9)
        assert rel < 3e-3, rel


def test_deterministic(model):
    args = _inputs()
    f = jax.jit(lambda m, *a: m(*a))
    o1 = f(model, *args)
    o2 = f(model, *args)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_controlnet_residuals_change_output(model):
    args = _inputs()
    f = jax.jit(lambda m, *a, **kw: m(*a, **kw))
    base = f(model, *args)
    ctrl = jnp.ones((2, 1, 256, TINY.dim), jnp.bfloat16) * 0.1
    out = f(model, *args, controlnet_block_samples=ctrl)
    assert not np.allclose(np.asarray(base, np.float32), np.asarray(out, np.float32))


def test_state_dict_roundtrip(model):
    sd = model.state_dict()
    assert any("transformer_blocks" in k for k in sd)
    # perturb one stacked param and load back
    key = "transformer_blocks.attn.to_qkv.proj_up"
    assert key in sd, sorted(sd)[:10]
    model.load_state_dict({key: sd[key] * 0}, partial=True)
    assert float(jnp.abs(model.transformer_blocks.attn.to_qkv.proj_up).sum()) == 0.0
    model.load_state_dict(sd, partial=False)


def test_blocksparse_attention_impl(model):
    """set_attention_impl('blocksparse') runs and approximates dense at low
    sparsity (reference Attention::forward(qkv, pool_qkv, sparsityRatio))."""
    args = _inputs(S_img=256, S_txt=128)  # 3 kv blocks
    dense = model(*args)
    model.set_attention_impl("blocksparse", sparsity_ratio=0.3)
    try:
        sparse = model(*args)
    finally:
        model.set_attention_impl("flashattn2")
    assert sparse.shape == dense.shape
    assert bool(jnp.all(jnp.isfinite(sparse.astype(jnp.float32))))
    # 0.3 over 3 blocks keeps 2/3 of kv — outputs correlated with dense
    d, s = dense.astype(jnp.float32).ravel(), sparse.astype(jnp.float32).ravel()
    corr = jnp.corrcoef(jnp.stack([d, s]))[0, 1]
    assert corr > 0.7, float(corr)


class TestFusedQKVPrep:
    """enable_fused_qkv_prep: half-split weight permutation + the
    qkv_prepare Pallas prologue + direct-(B,S,HD) flash output must match
    the unfused interleaved-rope path."""

    @pytest.mark.parametrize("precision", ["int8", "int4"])
    @pytest.mark.parametrize("producer", [True, False])
    def test_model_equivalence(self, precision, producer):
        cfg = FluxConfig(
            num_layers=1, num_single_layers=2, num_attention_heads=2,
            joint_attention_dim=512, pooled_projection_dim=256,
            precision=precision,
        )
        base = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
        fused = FluxTransformer2DModel.random_init(
            jax.random.PRNGKey(0), cfg
        ).enable_fused_qkv_prep(producer=producer)
        args = _inputs()
        f = jax.jit(lambda m, *a: m(*a))
        ref = np.asarray(f(base, *args), np.float32)
        out = np.asarray(f(fused, *args), np.float32)
        err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        # int4 re-quantizes activations per-64-group downstream, which
        # amplifies bf16-rounding-level diffs across blocks; the attention
        # module itself matches at 2e-2 (test below)
        assert err < (8e-2 if precision == "int4" else 2e-2), err

    @pytest.mark.parametrize("precision", ["int8", "int4"])
    def test_attention_module_equivalence(self, precision):
        from nunchaku_tpu.models.attention import (
            FluxAttention, permute_qk_halfsplit,
        )
        from nunchaku_tpu.models.embeddings import rope_table
        from nunchaku_tpu.ops.attention import rope_table_halfsplit

        S_img, S_txt, D = 256, 128, 128
        attn = FluxAttention.random_init(
            jax.random.PRNGKey(0), 256, 2, D, joint=True, precision=precision
        )
        attn2 = FluxAttention.random_init(
            jax.random.PRNGKey(0), 256, 2, D, joint=True, precision=precision
        )
        permute_qk_halfsplit(attn2)
        assert attn2.prep_fused

        ids = np.zeros((S_txt + S_img, 3), np.int32)
        ids[S_txt:, 1] = np.arange(S_img) // 16
        ids[S_txt:, 2] = np.arange(S_img) % 16
        rot = rope_table(jnp.asarray(ids), (16, 56, 56))
        img = jax.random.normal(jax.random.PRNGKey(1), (1, S_img, 256), jnp.bfloat16)
        txt = jax.random.normal(jax.random.PRNGKey(2), (1, S_txt, 256), jnp.bfloat16)

        ref_i, ref_t = attn(img, txt, rot)
        out_i, out_t = attn2(img, txt, rope_table_halfsplit(rot))
        for r, o in ((ref_i, out_i), (ref_t, out_t)):
            r = np.asarray(r, np.float32)
            o = np.asarray(o, np.float32)
            err = np.linalg.norm(o - r) / np.linalg.norm(r)
            # verified stage-by-stage: the qkv GEMM is bit-identical after
            # unpermutation, q/k differ 0.3% (the unfused path has one extra
            # bf16 cast between rmsnorm and rope), flash out 0.5%; int4's
            # to_out per-group requantization amplifies that to ~3.5%
            assert err < (6e-2 if precision == "int4" else 2e-2), err


def test_dual_mods_reach_txt_projection_on_fused_path():
    """Regression: the fused attention path (prep_producer + mods) must
    apply mods[1] (txt AdaLN LN+modulate) before add_qkv_proj —
    _forward_fused used to project the RAW encoder_hidden, silently
    dropping the txt modulation. Random-init AdaLN mods are tiny and
    LN(N(0,1)) is near-identity, so model-level equivalence tolerances
    hid it; engineered large scale/shift make the drop an order-1 error."""
    from nunchaku_tpu.models.attention import (
        FluxAttention, permute_qk_halfsplit,
    )
    from nunchaku_tpu.models.embeddings import rope_table
    from nunchaku_tpu.models.normalization import layer_norm
    from nunchaku_tpu.ops.attention import rope_table_halfsplit

    dim, H, D = 256, 2, 128
    B, S_img, S_txt = 1, 128, 128
    attn = FluxAttention.random_init(
        jax.random.PRNGKey(1), dim, H, D, joint=True, rank=8, precision="int8"
    )
    r = np.random.default_rng(1)
    img = jnp.asarray(r.normal(size=(B, S_img, dim)), jnp.bfloat16)
    txt = jnp.asarray(r.normal(size=(B, S_txt, dim)), jnp.bfloat16)
    rot = rope_table(jnp.zeros((S_img + S_txt, 3), jnp.float32), (16, 56, 56))
    sc_i = jnp.asarray(r.normal(size=(B, dim)), jnp.bfloat16) * 0.1
    sh_i = jnp.asarray(r.normal(size=(B, dim)), jnp.bfloat16) * 0.1
    # large txt modulation: a dropped mods[1] is an O(1) output error
    sc_t = jnp.asarray(r.normal(size=(B, dim)), jnp.bfloat16) * 0.1 + 1.0
    sh_t = jnp.asarray(r.normal(size=(B, dim)), jnp.bfloat16) * 0.1 + 2.0

    def mod(x, sc, sh):
        return (
            layer_norm(x) * (1.0 + sc.astype(jnp.float32))[:, None]
            + sh.astype(jnp.float32)[:, None]
        ).astype(jnp.bfloat16)

    ref = attn(mod(img, sc_i, sh_i), mod(txt, sc_t, sh_t), rot)

    permute_qk_halfsplit(attn)
    attn.prep_producer = True
    out = attn(img, txt, rope_table_halfsplit(rot),
               mods=((sc_i, sh_i), (sc_t, sh_t)))
    for rf, o, name in ((ref[0], out[0], "img"), (ref[1], out[1], "txt")):
        rf = np.asarray(rf, np.float32)
        o = np.asarray(o, np.float32)
        err = np.abs(o - rf).max() / (np.abs(rf).max() + 1e-9)
        assert err < 5e-2, (name, err)


def test_lora_in_producer_matches_gemm_epilogue():
    """lora_in_producer: the qkv GEMM skips its low-rank epilogue and the
    rope producer adds each tile's (bm, R) @ (R, D) slice in-kernel — must
    match the GEMM-side lora add to quantization-noise level (the producer
    adds lora in f32 where the XLA fusion rounds the main term to bf16
    first)."""
    from nunchaku_tpu.models.attention import (
        FluxAttention, permute_qk_halfsplit,
    )
    from nunchaku_tpu.models.embeddings import rope_table
    from nunchaku_tpu.ops.attention import rope_table_halfsplit

    dim, H, D = 256, 2, 128
    B, S_img, S_txt = 1, 128, 128
    r = np.random.default_rng(2)
    attn = FluxAttention.random_init(
        jax.random.PRNGKey(1), dim, H, D, joint=True, rank=8, precision="int8"
    )
    permute_qk_halfsplit(attn)
    attn.prep_producer = True
    img = jnp.asarray(r.normal(size=(B, S_img, dim)), jnp.bfloat16)
    txt = jnp.asarray(r.normal(size=(B, S_txt, dim)), jnp.bfloat16)
    rot = rope_table_halfsplit(
        rope_table(jnp.zeros((S_img + S_txt, 3), jnp.float32), (16, 56, 56))
    )
    sc = jnp.asarray(r.normal(size=(B, dim)), jnp.bfloat16) * 0.2
    sh = jnp.asarray(r.normal(size=(B, dim)), jnp.bfloat16) * 0.2
    mods = ((sc, sh), (sh, sc))
    attn.lora_in_producer = False
    ref = attn(img, txt, rot, mods=mods)
    attn.lora_in_producer = True
    out = attn(img, txt, rot, mods=mods)
    for i, (a, b) in enumerate(zip(ref, out)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert err < 3e-2, (i, err)


@pytest.mark.parametrize("precision", ["int8", "w4a8"])
def test_res_epilogue_equivalence(precision):
    """RES_EPILOGUE (gated residual adds fused into the chain consumer's
    epilogue, incl. the single block's attn_out extra + lora operands)
    matches the unfused adds to the documented rounding level."""
    import nunchaku_tpu.models.transformers.transformer_flux as TF

    cfg = FluxConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
        precision=precision,
    )
    m = FluxTransformer2DModel.random_init(jax.random.PRNGKey(3), cfg)
    m.set_stream_dtype(jnp.bfloat16)
    args = _inputs()
    f = jax.jit(lambda mm, *a: mm(*a))
    try:
        TF.set_res_epilogue(False)
        ref = np.asarray(f(m, *args), np.float32)
        TF.set_res_epilogue(True)
        out = np.asarray(f(m, *args), np.float32)
    finally:
        TF.set_res_epilogue(True)
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    # only float-rounding order differs (the kernel mimics the unfused
    # path's bf16 materializations; the attn lora add keeps f32 a bit
    # longer) — quantization-noise level
    assert rel < 2e-2, rel


def test_bf16_stream_close_to_f32(model):
    """set_stream_dtype(bf16): halved stream traffic, bounded drift."""
    args = _inputs()
    f = jax.jit(lambda m, *a: m(*a))
    ref = np.asarray(f(model, *args), np.float32)
    m16 = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    m16.set_stream_dtype(jnp.bfloat16)
    out = np.asarray(f(m16, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    # tiny random-weight models amplify carry rounding; the reference's C++
    # engine carries bf16 streams as well (real-checkpoint quality is gated
    # by the LPIPS golden harness, tests/test_golden.py)
    assert err < 1e-1, err


def test_batched_adaln_mod_matches_per_layer():
    """normalization.batched_adaln_mod == looping the stacked int8 SVDQ
    modulation linear layer by layer (the hoisted-out-of-scan fast path)."""
    from nunchaku_tpu.models.normalization import batched_adaln_mod, can_batch_mod
    from nunchaku_tpu.models.transformers.transformer_flux import slice_module

    m = FluxTransformer2DModel.random_init(
        jax.random.PRNGKey(0),
        FluxConfig(num_layers=3, num_single_layers=2, num_attention_heads=2,
                   joint_attention_dim=512, pooled_projection_dim=256,
                   precision="int8"),
    )
    lin = m.transformer_blocks.norm1.linear
    assert can_batch_mod(lin)
    temb = jax.random.normal(jax.random.PRNGKey(1), (1, 256), jnp.bfloat16)
    batched = np.asarray(batched_adaln_mod(lin, temb), np.float32)
    x = jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)
    for i in range(3):
        ref = np.asarray(slice_module(lin, i)(x), np.float32)
        err = np.linalg.norm(batched[i] - ref) / (np.linalg.norm(ref) + 1e-9)
        assert err < 2e-2, (i, err)


def test_merged_dual_streams_matches_unmerged():
    """merge_dual_streams(): one joint GEMM per dual projection pair must
    match the separate txt/img GEMMs (same int8 codes and weights — only
    float-accumulation order and the lora block-diag differ)."""
    cfg = FluxConfig(
        num_layers=2, num_single_layers=1, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256, precision="int8",
    )
    base = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    merged = FluxTransformer2DModel.random_init(
        jax.random.PRNGKey(0), cfg
    ).merge_dual_streams()
    args = _inputs()
    f = jax.jit(lambda m, *a: m(*a))
    ref = np.asarray(f(base, *args), np.float32)
    out = np.asarray(f(merged, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 1e-2, err


@pytest.mark.parametrize("precision", ["int8", "w4a8"])
def test_fused_ln_quant_equivalence(precision):
    """FUSED_LN_QUANT (Pallas LN+modulate+quantize producers) matches the
    unfused XLA path to quantization-noise level on a bf16-stream model
    (the turbo config where the fusion activates). w4a8 engages the same
    producer on its XLA dequant+dot route."""
    import nunchaku_tpu.models.transformers.transformer_flux as TF

    cfg = FluxConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
        precision=precision,
    )
    m = FluxTransformer2DModel.random_init(jax.random.PRNGKey(7), cfg)
    m.set_stream_dtype(jnp.bfloat16)
    args = _inputs()
    try:
        TF.set_fused_ln_quant(False)
        ref = jax.jit(lambda mm, *a: mm(*a))(m, *args)
        TF.set_fused_ln_quant(True)
        out = jax.jit(lambda mm, *a: mm(*a))(m, *args)
    finally:
        TF.set_fused_ln_quant(True)
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    rel = np.abs(r - o).max() / (np.sqrt(np.mean(r**2)) + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("precision", ["int8", "w4a8"])
def test_batch2_matches_stacked_b1(precision):
    """B=2 rides the native (B,S,·) operand path (no flatten at the Pallas
    boundaries, tools/bench_batch.py) — outputs must equal the two B=1
    forwards stacked, in the turbo serving config (bf16 streams + fused
    qkv prologue + GELU_QUANT chain)."""
    cfg = FluxConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
        precision=precision,
    )
    m = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    m.set_stream_dtype(jnp.bfloat16)
    m.enable_fused_qkv_prep()

    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 64), jnp.bfloat16)
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 512), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 256), jnp.bfloat16)
    ii = np.zeros((256, 3), np.int32)
    ii[:, 1] = np.arange(256) // 16
    ii[:, 2] = np.arange(256) % 16
    ii = jnp.asarray(ii)
    ti = jnp.zeros((128, 3), jnp.int32)

    fwd = jax.jit(lambda mm, l, tx, p, t, g: mm(l, tx, p, t, ii, ti, g))
    t2 = jnp.array([0.5, 0.5], jnp.float32)
    g2 = jnp.array([3.5, 3.5], jnp.float32)
    out2 = fwd(m, lat, txt, pooled, t2, g2)
    rows = [
        fwd(m, lat[i : i + 1], txt[i : i + 1], pooled[i : i + 1],
            t2[i : i + 1], g2[i : i + 1])[0]
        for i in range(2)
    ]
    np.testing.assert_allclose(
        np.asarray(out2, np.float32),
        np.stack([np.asarray(r, np.float32) for r in rows]),
        atol=5e-2,
    )
