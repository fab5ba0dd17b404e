"""Checkpoint format tests: layout codecs + loading a synthesized
nunchaku-format FLUX checkpoint end-to-end."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.utils import nunchaku_format as NF
from nunchaku_tpu.utils.safetensors import load_safetensors, save_safetensors

rng = np.random.default_rng(0)


class TestCodecs:
    def test_weight_int4(self):
        v = rng.integers(-8, 8, (256, 384)).astype(np.int8)
        assert np.array_equal(NF.unpack_weight_int4(NF.pack_weight_int4(v), 256, 384), v)

    def test_scale(self):
        s = rng.random((6, 256)).astype(np.float32)
        assert np.array_equal(NF.unpack_scale(NF.pack_scale_ref(s), 256), s)

    def test_micro_scale(self):
        s = rng.random((24, 256)).astype(np.float32)
        assert np.array_equal(NF.unpack_micro_scale(NF.pack_micro_scale_ref(s), 256), s)

    @pytest.mark.parametrize("down", [True, False])
    def test_lowrank(self, down):
        w = rng.random((32, 384) if down else (256, 32)).astype(np.float32)
        assert np.array_equal(
            NF.unpack_lowrank_weight(NF.pack_lowrank_weight_ref(w, down), down), w
        )

    def test_awq_gemv(self):
        v = rng.integers(0, 16, (128, 256)).astype(np.int8)
        assert np.array_equal(NF.unpack_awq_gemv(NF.pack_awq_gemv(v), 128, 256), v)

    def test_tinychat(self):
        v = rng.integers(0, 16, (128, 256)).astype(np.int8)
        assert np.array_equal(NF.unpack_tinychat_w4(NF.pack_tinychat_w4(v), 128, 256), v)


class TestSafetensors:
    def test_roundtrip(self, tmp_path):
        import ml_dtypes

        tensors = {
            "a": rng.random((4, 8)).astype(np.float32),
            "b": rng.integers(-100, 100, (3, 3)).astype(np.int8),
            "c": rng.random((2, 2)).astype(ml_dtypes.bfloat16),
        }
        p = tmp_path / "t.safetensors"
        save_safetensors(p, tensors, {"config": json.dumps({"x": 1})})
        out, meta = load_safetensors(p)
        assert json.loads(meta["config"]) == {"x": 1}
        for k in tensors:
            np.testing.assert_array_equal(np.asarray(out[k]), tensors[k])


# ---------------------------------------------------------------------------
# synthesized nunchaku-format FLUX checkpoint
# ---------------------------------------------------------------------------

DIM, HEADS, HEAD_DIM, RANK = 256, 2, 128, 32
TXT_DIM, POOL_DIM = 320, 128


def _svdq_tensors(key, k, n, seed):
    r = np.random.default_rng(seed)
    vals = r.integers(-8, 8, (n, k)).astype(np.int8)
    ws = (r.random((k // 64, n)).astype(np.float32) * 0.01 + 0.001)
    smooth = r.random(k).astype(np.float32) + 0.5
    ld = r.standard_normal((RANK, k)).astype(np.float32) * 0.02  # (R, K) torch layout
    lu = r.standard_normal((n, RANK)).astype(np.float32) * 0.02  # (N, R)
    bias = r.standard_normal(n).astype(np.float32) * 0.01
    import ml_dtypes

    bf = lambda a: a.astype(ml_dtypes.bfloat16)
    return {
        f"{key}.qweight": NF.pack_weight_int4(vals),
        f"{key}.wscales": bf(NF.pack_scale_ref(ws)),
        f"{key}.smooth": bf(smooth),
        f"{key}.smooth_orig": bf(smooth),
        f"{key}.lora_down": bf(NF.pack_lowrank_weight_ref(ld, down=True)),
        f"{key}.lora_up": bf(NF.pack_lowrank_weight_ref(lu, down=False)),
        f"{key}.bias": bf(bias),
    }


def _awq_tensors(key, k, n, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    codes = r.integers(0, 16, (n, k)).astype(np.int8)
    ws = r.random((k // 64, n)).astype(np.float32) * 0.01
    wz = r.standard_normal((k // 64, n)).astype(np.float32) * 0.01
    bias = r.standard_normal(n).astype(np.float32) * 0.01
    bf = lambda a: a.astype(ml_dtypes.bfloat16)
    return {
        f"{key}.qweight": NF.pack_awq_gemv(codes),
        f"{key}.wscales": bf(ws),
        f"{key}.wzeros": bf(wz),
        f"{key}.bias": bf(bias),
    }


def _linear_tensors(key, k, n, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    return {
        f"{key}.weight": (r.standard_normal((n, k)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{key}.bias": (r.standard_normal(n) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _build_checkpoint(tmp_path):
    import ml_dtypes

    t = {}
    for i in range(1):
        p = f"transformer_blocks.{i}"
        t |= _svdq_tensors(f"{p}.qkv_proj", DIM, 3 * DIM, 1)
        t |= _svdq_tensors(f"{p}.qkv_proj_context", DIM, 3 * DIM, 2)
        t |= _svdq_tensors(f"{p}.out_proj", DIM, DIM, 3)
        t |= _svdq_tensors(f"{p}.out_proj_context", DIM, DIM, 4)
        t |= _svdq_tensors(f"{p}.mlp_fc1", DIM, 4 * DIM, 5)
        t |= _svdq_tensors(f"{p}.mlp_fc2", 4 * DIM, DIM, 6)
        t |= _svdq_tensors(f"{p}.mlp_context_fc1", DIM, 4 * DIM, 7)
        t |= _svdq_tensors(f"{p}.mlp_context_fc2", 4 * DIM, DIM, 8)
        t |= _awq_tensors(f"{p}.norm1.linear", DIM, 6 * DIM, 9)
        t |= _awq_tensors(f"{p}.norm1_context.linear", DIM, 6 * DIM, 10)
        for nm, sd in [("norm_q", 11), ("norm_k", 12), ("norm_added_q", 13), ("norm_added_k", 14)]:
            r = np.random.default_rng(sd)
            t[f"{p}.{nm}.weight"] = (r.random(HEAD_DIM).astype(np.float32) + 0.5).astype(
                ml_dtypes.bfloat16
            )
    for i in range(1):
        p = f"single_transformer_blocks.{i}"
        t |= _svdq_tensors(f"{p}.qkv_proj", DIM, 3 * DIM, 21)
        t |= _svdq_tensors(f"{p}.mlp_fc1", DIM, 4 * DIM, 22)
        t |= _svdq_tensors(f"{p}.mlp_fc2", 4 * DIM, DIM, 23)
        t |= _svdq_tensors(f"{p}.out_proj", DIM, DIM, 24)
        t |= _awq_tensors(f"{p}.norm.linear", DIM, 3 * DIM, 25)
        for nm, sd in [("norm_q", 26), ("norm_k", 27)]:
            r = np.random.default_rng(sd)
            t[f"{p}.{nm}.weight"] = (r.random(HEAD_DIM).astype(np.float32) + 0.5).astype(
                ml_dtypes.bfloat16
            )
    t |= _linear_tensors("x_embedder", 64, DIM, 31)
    t |= _linear_tensors("context_embedder", TXT_DIM, DIM, 32)
    t |= _linear_tensors("time_text_embed.timestep_embedder.linear_1", 256, DIM, 33)
    t |= _linear_tensors("time_text_embed.timestep_embedder.linear_2", DIM, DIM, 34)
    t |= _linear_tensors("time_text_embed.text_embedder.linear_1", POOL_DIM, DIM, 35)
    t |= _linear_tensors("time_text_embed.text_embedder.linear_2", DIM, DIM, 36)
    t |= _linear_tensors("time_text_embed.guidance_embedder.linear_1", 256, DIM, 37)
    t |= _linear_tensors("time_text_embed.guidance_embedder.linear_2", DIM, DIM, 38)
    t |= _linear_tensors("norm_out.linear", DIM, 2 * DIM, 39)
    t |= _linear_tensors("proj_out", DIM, 64, 40)

    config = {
        "num_layers": 1,
        "num_single_layers": 1,
        "attention_head_dim": HEAD_DIM,
        "num_attention_heads": HEADS,
        "joint_attention_dim": TXT_DIM,
        "pooled_projection_dim": POOL_DIM,
        "in_channels": 64,
        "guidance_embeds": True,
        "axes_dims_rope": [16, 56, 56],
    }
    qcfg = {"weight": {"dtype": "int4", "group_size": 64}, "rank": RANK}
    path = tmp_path / "flux-tiny-int4.safetensors"
    save_safetensors(path, t, {"config": json.dumps(config), "quantization_config": json.dumps(qcfg)})
    return path


@pytest.mark.parametrize("precision", [None, "int8"])
def test_load_and_run(tmp_path, precision):
    from nunchaku_tpu.models.transformers.loader import load_flux_transformer

    path = _build_checkpoint(tmp_path)
    model = load_flux_transformer(path, precision=precision)
    assert model.cfg.num_layers == 1 and model.cfg.dim == DIM

    B, S_img, S_txt = 1, 256, 128
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, TXT_DIM), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (B, POOL_DIM), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
        jnp.array([3.5], jnp.float32),
    )
    assert out.shape == (B, S_img, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


@pytest.mark.parametrize("precision", [None, "int8", "w4a8"])
def test_act_unsigned_follows_checkpoint_precision(tmp_path, precision):
    """int4 checkpoints bake the +0.171875 GELU-shift compensation into the
    fc2 bias (reference gemm_w4a4_launch_impl.cuh:286 applies the shift
    unconditionally for int4), so fc2 must run unsigned-shifted in *every*
    runtime precision when the checkpoint was int4 (ADVICE r1 #1)."""
    from nunchaku_tpu.models.transformers.loader import load_flux_transformer
    from nunchaku_tpu.models.transformers.transformer_flux import slice_module

    path = _build_checkpoint(tmp_path)
    model = load_flux_transformer(path, precision=precision)
    dual = slice_module(model.transformer_blocks, 0)
    single = slice_module(model.single_transformer_blocks, 0)
    assert dual.ff.fc2.act_unsigned
    assert dual.ff_context.fc2.act_unsigned
    assert single.mlp_fc2.act_unsigned
    # ... and nowhere else: fc1 / attention projections stay signed
    assert not dual.ff.fc1.act_unsigned
    assert not dual.attn.to_qkv.act_unsigned


def test_loaded_linear_matches_oracle(tmp_path):
    """The decoded qkv linear reproduces the oracle dequant matmul."""
    from nunchaku_tpu.models.transformers.loader import load_flux_transformer
    from nunchaku_tpu.models.transformers.transformer_flux import slice_module
    from nunchaku_tpu.ops import reference as R

    path = _build_checkpoint(tmp_path)
    model = load_flux_transformer(path)
    blk = slice_module(model.transformer_blocks, 0)
    lin = blk.attn.to_qkv

    # reconstruct logical tensors from the same seed as _svdq_tensors(seed=1)
    r = np.random.default_rng(1)
    vals = r.integers(-8, 8, (3 * DIM, DIM)).astype(np.int8)
    ws = r.random((DIM // 64, 3 * DIM)).astype(np.float32) * 0.01 + 0.001
    smooth = r.random(DIM).astype(np.float32) + 0.5
    ld = r.standard_normal((RANK, DIM)).astype(np.float32) * 0.02
    lu = r.standard_normal((3 * DIM, RANK)).astype(np.float32) * 0.02
    bias = r.standard_normal(3 * DIM).astype(np.float32) * 0.01

    x = jax.random.normal(jax.random.PRNGKey(5), (8, DIM), jnp.bfloat16)
    out = lin(x[None])[0]

    bf = lambda a: jnp.asarray(a, jnp.bfloat16).astype(jnp.float32)
    qa, asc, la = R.quantize_act_fuse_lora(
        x, bf(smooth), jnp.asarray(ld.T, jnp.bfloat16)
    )
    ref = R.w4a4_gemm(
        qa, asc.astype(jnp.bfloat16), jnp.asarray(vals.T), bf(ws),
        lora_act=la, proj_up=jnp.asarray(lu.T, jnp.bfloat16), bias=bf(bias),
        exact_int_dot=False,  # match the kernel's bf16-dequant formulation
    )
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / (
        float(jnp.max(jnp.abs(ref))) + 1e-9
    )
    assert err < 3e-2, err
