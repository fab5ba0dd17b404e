"""Tensor-parallel correctness: sharded forward == single-device forward."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)
from nunchaku_tpu.parallel.tp import parallelize


def test_tp_matches_single_device():
    cfg = FluxConfig(
        num_layers=1,
        num_single_layers=1,
        num_attention_heads=8,
        joint_attention_dim=512,
        pooled_projection_dim=256,
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)

    B, S_img, S_txt = 2, 256, 128
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
        jnp.full((B,), 3.5, jnp.float32),
    )

    ref = jax.jit(lambda m, *a: m(*a))(model, *args)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 4), ("dp", "tp"))
    sharded, forward = parallelize(model, mesh)
    out = forward(sharded, *args)

    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    # Tolerance note: any change in f32 summation order (row-parallel psum,
    # different batch tiling) perturbs pre-quantizer activations at ~1e-7,
    # and the 4-bit quantizer amplifies such flips. With *random* (non-
    # contractive) weights this compounds per block; the single-device model
    # itself shows ~2.6% batch-(in)variance on this config. We assert the
    # sharded run stays within that same noise envelope and is strongly
    # correlated; bit-level parity across resummations is impossible behind
    # quantizers (true for the CUDA reference too).
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert err < 0.06, err
    assert corr > 0.995, corr


def _tp_mode_check(precision, tol=0.06):
    cfg = FluxConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=8,
        joint_attention_dim=512, pooled_projection_dim=256,
        precision=precision,
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, S_img, S_txt = 1, 256, 128
    ii = np.zeros((S_img, 3), np.int32)
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
        jnp.full((B,), 3.5, jnp.float32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("dp", "tp"))
    sharded, forward = parallelize(model, mesh)
    out = forward(sharded, *args)
    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert err < tol, err


def test_tp_int8_mode():
    """TP sharding also works for the int8 turbo layouts (per-channel
    wscales (1, N) shard on N; per-token ascales replicate)."""
    _tp_mode_check("int8")


def test_tp_w4a8_mode():
    """w4a8: the (K/G, N) int4->int8 rescale table must follow the fused-QKV
    column permutation (ADVICE r1 #2 — previously unpermuted, corrupting
    every attention projection under tp>1). Tolerance has teeth: with the
    rescale permutation err~=0.0025 on this config; without it ~0.0075."""
    _tp_mode_check("w4a8", tol=0.005)


def test_qwenimage_tp_matches_single_device():
    """Qwen-Image TP: same Megatron pairing as FLUX (shared dual block)."""
    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )
    from nunchaku_tpu.parallel.tp import parallelize_qwenimage

    cfg = QwenImageConfig(
        num_layers=1, num_attention_heads=8, joint_attention_dim=512,
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)

    B, S_img, S_txt = 2, 256, 128
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, cfg.in_channels), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "tp"))
    model2 = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    sharded, fwd = parallelize_qwenimage(model2, mesh)
    out = fwd(sharded, *args)
    err = float(
        jnp.linalg.norm((out - ref).astype(jnp.float32))
        / jnp.linalg.norm(ref.astype(jnp.float32))
    )
    assert err < 2e-2, err


def test_tp_zimage_matches_single_device():
    """parallelize_zimage: S3-DiT Megatron pairing incl. the SwiGLU
    [value|gate] 2-section column permutation on w13.

    int8 mode gives the tight check (per-token quantize noise ~1%); the
    int4 group quantizer amplifies psum-resummation flips to ~6% on random
    non-contractive weights (same effect as the FLUX test note above), so
    correctness rides on int8 + the int4 correlation bound.
    """
    from nunchaku_tpu.models.transformers.transformer_zimage import (
        ZImageConfig,
        ZImageTransformer2DModel,
    )
    from nunchaku_tpu.parallel.tp import parallelize_zimage

    # int4 activation packing needs local K % 256 == 0: dim/tp = 256
    cfg = ZImageConfig(
        dim=1024, num_layers=2, num_refiner_layers=1, num_attention_heads=8,
        cap_feat_dim=512, ffn_inner=1024, precision="int8",
    )
    model = ZImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)

    B, S_img, S_txt = 2, 256, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    sharded, forward = parallelize_zimage(model, mesh)
    out = forward(sharded, *args)

    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert err < 0.03, err
    assert corr > 0.999, corr


def test_tp_sana_matches_single_device():
    """parallelize_sana: LiteLA head sharding, GLUMBConv [value|gate]
    permutation with lockstep depthwise-conv channel permutation, bf16
    kv_linear [k|v] halves. int8 mode for the tight bound (see the
    Z-Image test note)."""
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig,
        SanaTransformer2DModel,
    )
    from nunchaku_tpu.parallel.tp import parallelize_sana

    # dim = 32 heads * 32 = 1024; ff_hidden = 1024 (expand 1.0):
    # local K stays a multiple of the int4 pack block under tp=4
    cfg = SanaConfig(
        num_layers=2, num_attention_heads=32, num_cross_attention_heads=8,
        cross_attention_head_dim=128, caption_channels=512,
        expand_ratio=1.0, precision="int8",
    )
    model = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)

    B, S_img, S_txt = 2, 256, 64
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 32), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    sharded, forward = parallelize_sana(model, mesh)
    out = forward(sharded, *args)

    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert err < 0.03, err
    assert corr > 0.999, corr


def test_ring_attention_matches_dense():
    """Sequence-parallel ring attention over an 8-way mesh equals dense
    flash attention (exact partial-softmax combine via the fixed shift)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from nunchaku_tpu.ops.attention import flash_attention
    from nunchaku_tpu.parallel.sp import ring_attention

    shard_map = partial(jax.shard_map, check_vma=False)

    B, H, S, D = 1, 2, 1024, 128  # S/8 = 128-token shards
    rng_ = np.random.default_rng(3)
    q = jnp.asarray(rng_.standard_normal((B, H, S, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng_.standard_normal((B, H, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng_.standard_normal((B, H, S, D)) * 0.3, jnp.bfloat16)

    ref = np.asarray(
        flash_attention(q, k, v, fixed_softmax=True), np.float32
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    f = shard_map(
        partial(ring_attention, axis="sp", interpret=True),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )
    out = np.asarray(jax.jit(f)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=5e-3)

    # denominators are shard-size invariant: a 2-way ring agrees too
    mesh2 = Mesh(np.array(jax.devices()[:2]).reshape(2), ("sp",))
    f2 = shard_map(
        partial(ring_attention, axis="sp", interpret=True),
        mesh=mesh2,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )
    out2 = np.asarray(jax.jit(f2)(q, k, v), np.float32)
    np.testing.assert_allclose(out2, ref, atol=5e-3)


def test_sequence_parallel_flux_matches_single_device():
    """parallelize_sequence: full FLUX forward with the token sequence
    sharded 8 ways (weights replicated, ring attention) == single device."""
    from nunchaku_tpu.parallel.sp import parallelize_sequence

    # int8 for the tight bound: per-token quantization is shard-invariant,
    # so the only differences are flash tile boundaries at the shard size
    # (the int4 group quantizer amplifies those to ~3% on random weights —
    # same effect the TP tests document above)
    cfg = FluxConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256, precision="int8",
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)

    B, S_img, S_txt = 1, 512, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 32
    ii[:, 2] = np.arange(S_img) % 32
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
        jnp.full((B,), 3.5, jnp.float32),
    )
    ref = np.asarray(jax.jit(lambda m, *a: m(*a))(model, *args), np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    replicated, fwd = parallelize_sequence(model, mesh)
    out = np.asarray(fwd(replicated, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.01, err


def test_sequence_parallel_qwen_matches_single_device():
    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )
    from nunchaku_tpu.parallel.sp import parallelize_sequence_qwenimage

    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320,
        precision="int8",
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, S_img, S_txt = 1, 256, 32
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    # explicit txt_ids: Qwen's default index rope must follow GLOBAL token
    # positions, not the local shard's — the pipeline passes them sharded
    txt_ids = jnp.tile(jnp.arange(S_txt, dtype=jnp.int32)[:, None], (1, 3))
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 320), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        txt_ids,
    )
    ref = np.asarray(jax.jit(lambda m, *a: m(*a))(model, *args), np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    replicated, fwd = parallelize_sequence_qwenimage(model, mesh)
    out = np.asarray(fwd(replicated, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.01, err


def test_sequence_parallel_zimage_matches_single_device():
    from nunchaku_tpu.models.transformers.transformer_zimage import (
        ZImageConfig,
        ZImageTransformer2DModel,
    )
    from nunchaku_tpu.parallel.sp import parallelize_sequence_zimage

    cfg = ZImageConfig(
        dim=512, num_layers=2, num_refiner_layers=1, num_attention_heads=4,
        cap_feat_dim=512, ffn_inner=1024, precision="int8",
    )
    model = ZImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, S_img, S_txt = 1, 256, 32
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    ti = np.zeros((S_txt, 3), np.int32)
    ti[:, 0] = np.arange(S_txt)
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.asarray(ti),
    )
    ref = np.asarray(jax.jit(lambda m, *a: m(*a))(model, *args), np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    replicated, fwd = parallelize_sequence_zimage(model, mesh)
    out = np.asarray(fwd(replicated, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.01, err


def test_sp_x_tp_2d_mesh_matches_single_device():
    """Combined sequence x tensor parallelism (sp=2, tp=4 over 8 devices):
    the kv ring runs within each tp group on tp-local heads while weights
    shard Megatron-style — both communication patterns compose."""
    from nunchaku_tpu.parallel.sp import parallelize_2d

    cfg = FluxConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=8,
        joint_attention_dim=512, pooled_projection_dim=256, precision="int8",
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)

    B, S_img, S_txt = 1, 256, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
        jnp.full((B,), 3.5, jnp.float32),
    )
    ref = np.asarray(jax.jit(lambda m, *a: m(*a))(model, *args), np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("sp", "tp"))
    sharded, fwd = parallelize_2d(model, mesh)
    out = np.asarray(fwd(sharded, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert err < 0.02, err
    assert corr > 0.999, corr


def test_sequence_parallel_sana_matches_single_device():
    """SANA SP: lite_la kv-moment psum + GLUMBConv row-halo exchange +
    replicated cross-attention text — exact vs single device."""
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig,
        SanaTransformer2DModel,
    )
    from nunchaku_tpu.parallel.sp import parallelize_sequence_sana

    cfg = SanaConfig(
        num_layers=2, num_attention_heads=4, attention_head_dim=32,
        num_cross_attention_heads=4, cross_attention_head_dim=32,
        caption_channels=320, in_channels=32, precision="int8",
    )
    model = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, side, S_txt = 1, 16, 48  # 256 tokens -> 2 rows per device
    x = jax.random.normal(jax.random.PRNGKey(1), (B, side * side, 32), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    ref = np.asarray(jax.jit(lambda m, *a: m(*a))(model, x, cond, t), np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    replicated, fwd = parallelize_sequence_sana(model, mesh)
    out = np.asarray(fwd(replicated, x, cond, t), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.01, err
