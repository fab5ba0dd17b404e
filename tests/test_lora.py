"""LoRA subsystem tests: normalization, composition, runtime application."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.lora.flux.apply import set_lora_strength, update_lora_params
from nunchaku_tpu.lora.flux.convert import compose_lora, to_canonical
from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
    slice_module,
)

TINY = FluxConfig(
    num_layers=1, num_single_layers=1, num_attention_heads=2,
    joint_attention_dim=512, pooled_projection_dim=256,
)
DIM = TINY.dim
rng = np.random.default_rng(0)


def _diffusers_lora(r=4):
    sd = {}
    for leaf, k, n in [("attn.to_q", DIM, DIM), ("attn.to_k", DIM, DIM),
                       ("attn.to_v", DIM, DIM), ("ff.net.0.proj", DIM, 4 * DIM)]:
        sd[f"transformer.transformer_blocks.0.{leaf}.lora_A.weight"] = (
            rng.standard_normal((r, k)).astype(np.float32) * 0.02
        )
        sd[f"transformer.transformer_blocks.0.{leaf}.lora_B.weight"] = (
            rng.standard_normal((n, r)).astype(np.float32) * 0.02
        )
    return sd


class TestConvert:
    def test_qkv_fusion(self):
        out = to_canonical(_diffusers_lora(r=4))
        a, b = out["transformer_blocks.0.attn.to_qkv"]
        assert a.shape == (12, DIM) and b.shape == (3 * DIM, 12)
        # block structure: q rows only hit first rank block
        assert np.all(b[:DIM, 4:] == 0) and np.all(b[DIM:2 * DIM, :4] == 0)
        assert "transformer_blocks.0.ff.fc1" in out

    def test_qkv_subset(self):
        """A LoRA covering only q and v (legal in diffusers format) must
        produce a full-width B with k's rows zero (ADVICE r1 #5)."""
        r = 4
        sd = {}
        for leaf in ("attn.to_q", "attn.to_v"):
            sd[f"transformer.transformer_blocks.0.{leaf}.lora_A.weight"] = (
                rng.standard_normal((r, DIM)).astype(np.float32) * 0.02
            )
            sd[f"transformer.transformer_blocks.0.{leaf}.lora_B.weight"] = (
                rng.standard_normal((DIM, r)).astype(np.float32) * 0.02
            )
        out = to_canonical(sd)
        a, b = out["transformer_blocks.0.attn.to_qkv"]
        assert a.shape == (2 * r, DIM)
        assert b.shape == (3 * DIM, 2 * r)  # full fused width
        # k rows (middle third) untouched; q hits ranks 0:4, v ranks 4:8
        assert np.all(b[DIM : 2 * DIM] == 0)
        assert np.any(b[:DIM, :r] != 0) and np.all(b[:DIM, r:] == 0)
        assert np.any(b[2 * DIM :, r:] != 0) and np.all(b[2 * DIM :, :r] == 0)

    def test_kohya_names_and_alpha(self):
        r = 4
        sd = {
            "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight":
                rng.standard_normal((r, DIM)).astype(np.float32),
            "lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight":
                rng.standard_normal((3 * DIM, r)).astype(np.float32),
            "lora_unet_double_blocks_0_img_attn_qkv.alpha": np.float32(2.0),
        }
        out = to_canonical(sd)
        a, b = out["transformer_blocks.0.attn.to_qkv"]
        # alpha/rank = 0.5 folded into A
        ref = sd["lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight"] * 0.5
        np.testing.assert_allclose(a, ref)

    def test_compose(self):
        l1 = to_canonical(_diffusers_lora(4))
        l2 = to_canonical(_diffusers_lora(4))
        sd1 = _diffusers_lora(4)
        sd2 = _diffusers_lora(4)
        merged = compose_lora([(sd1, 1.0), (sd2, 0.5)])
        a, b = merged["transformer_blocks.0.attn.to_qkv"]
        assert a.shape[0] == 24 and b.shape[1] == 24


class TestApply:
    @pytest.fixture(scope="class")
    def model(self):
        return FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)

    def test_linear_delta(self, model):
        sd = _diffusers_lora(r=4)
        new = update_lora_params(model, sd)
        base_lin = slice_module(model.transformer_blocks, 0).attn.to_qkv
        lora_lin = slice_module(new.transformer_blocks, 0).attn.to_qkv
        assert lora_lin.proj_down.shape[1] == base_lin.proj_down.shape[1] + 16

        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, DIM), jnp.bfloat16)
        y0 = base_lin(x).astype(jnp.float32)
        y1 = lora_lin(x).astype(jnp.float32)
        canon = to_canonical(sd)["transformer_blocks.0.attn.to_qkv"]
        delta = (
            x[0].astype(jnp.float32)
            @ jnp.asarray(canon[0].T, jnp.bfloat16).astype(jnp.float32)
            @ jnp.asarray(canon[1].T, jnp.bfloat16).astype(jnp.float32)
        )
        err = float(jnp.max(jnp.abs(y1 - y0 - delta))) / (
            float(jnp.max(jnp.abs(y0))) + 1e-9
        )
        assert err < 2e-2, err

    def test_model_forward_changes_and_strength_zero_resets(self, model):
        sd = _diffusers_lora(r=4)
        new = update_lora_params(model, sd)
        zeroed = set_lora_strength(new, 0.0)

        args = (
            jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64), jnp.bfloat16),
            jax.random.normal(jax.random.PRNGKey(3), (1, 32, 512), jnp.bfloat16),
            jax.random.normal(jax.random.PRNGKey(4), (1, 256), jnp.bfloat16),
            jnp.array([0.5], jnp.float32),
            jnp.zeros((64, 3), jnp.int32),
            jnp.zeros((32, 3), jnp.int32),
            jnp.array([3.5], jnp.float32),
        )
        f = jax.jit(lambda m, *a: m(*a))
        y_base = np.asarray(f(model, *args), np.float32)
        y_lora = np.asarray(f(new, *args), np.float32)
        y_zero = np.asarray(f(zeroed, *args), np.float32)
        assert not np.allclose(y_base, y_lora, atol=1e-3)
        np.testing.assert_allclose(y_zero, y_base, atol=2e-2)

    def test_strength_is_absolute(self, model):
        """Repeated set_lora_strength calls must NOT compound (reference
        setLoraScale is absolute, csrc/flux.h:177-198): 0.5 then 1.0 ==
        1.0 once == the freshly-applied strength-1.0 model."""
        sd = _diffusers_lora(r=4)
        new = update_lora_params(model, sd)
        once = set_lora_strength(new, 1.0)
        twice = set_lora_strength(set_lora_strength(new, 0.5), 1.0)

        def leaves(m):
            return jax.tree_util.tree_leaves(m)

        for a, b in zip(leaves(once), leaves(twice)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and setting 1.0 on a strength-1.0 application is a no-op
        for a, b in zip(leaves(new), leaves(once)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_update_strength_matches_set(self, model):
        """update_lora_params(sd, strength=s) == update at 1.0 then
        set_lora_strength(s)."""
        sd = _diffusers_lora(r=4)
        direct = update_lora_params(model, sd, strength=0.7)
        via_set = set_lora_strength(update_lora_params(model, sd), 0.7)
        for a, b in zip(
            jax.tree_util.tree_leaves(direct), jax.tree_util.tree_leaves(via_set)
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=0, atol=1e-6,
            )
