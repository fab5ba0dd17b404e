"""Qwen-Image ControlNet: loader (synthesized diffusers checkpoint),
residual threading in the transformer scan, and pipeline wiring (CPU).

Mirrors the reference flow where diffusers' QwenImageControlNetModel (bf16)
runs next to the quantized transformer every step and its per-block samples
are added with the ceil-interval rule
(reference transformer_qwenimage.py:546-550,
tests/v1/qwenimage/test_qwenimage_controlnet.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.controlnet_qwenimage import (
    QwenImageControlNetModel,
    load_qwenimage_controlnet,
)
from nunchaku_tpu.models.transformers.transformer_qwenimage import (
    QwenImageConfig,
    QwenImageTransformer2DModel,
)
from nunchaku_tpu.utils.safetensors import save_safetensors

rng = np.random.default_rng(0)

DIM, HEAD_DIM, IN_CH, JOINT = 128, 64, 16, 96
ROPE = (8, 28, 28)


def _t(*shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def _linear(sd, prefix, out_f, in_f):
    sd[prefix + ".weight"] = _t(out_f, in_f)
    sd[prefix + ".bias"] = _t(out_f)


def _synth(n=2):
    sd = {}
    _linear(sd, "img_in", DIM, IN_CH)
    _linear(sd, "txt_in", DIM, JOINT)
    sd["txt_norm.weight"] = np.ones((JOINT,), np.float32)
    _linear(sd, "controlnet_x_embedder", DIM, IN_CH)
    _linear(sd, "time_text_embed.timestep_embedder.linear_1", DIM, 256)
    _linear(sd, "time_text_embed.timestep_embedder.linear_2", DIM, DIM)
    for i in range(n):
        p = f"transformer_blocks.{i}"
        _linear(sd, f"{p}.img_mod.1", 6 * DIM, DIM)
        _linear(sd, f"{p}.txt_mod.1", 6 * DIM, DIM)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            _linear(sd, f"{p}.attn.{nm}", DIM, DIM)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{nm}.weight"] = _t(HEAD_DIM)
        _linear(sd, f"{p}.attn.to_out.0", DIM, DIM)
        _linear(sd, f"{p}.attn.to_add_out", DIM, DIM)
        _linear(sd, f"{p}.img_mlp.net.0.proj", 4 * DIM, DIM)
        _linear(sd, f"{p}.img_mlp.net.2", DIM, 4 * DIM)
        _linear(sd, f"{p}.txt_mlp.net.0.proj", 4 * DIM, DIM)
        _linear(sd, f"{p}.txt_mlp.net.2", DIM, 4 * DIM)
        # zero-init output projections (trained in real artifacts; zero lets
        # the conditioning-path test assert exact zeros)
        sd[f"controlnet_blocks.{i}.weight"] = np.zeros((DIM, DIM), np.float32)
        sd[f"controlnet_blocks.{i}.bias"] = np.zeros((DIM,), np.float32)
    return sd


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("qcnet") / "controlnet.safetensors"
    save_safetensors(path, _synth())
    return str(path)


def test_load_structure_and_forward(ckpt):
    cnet = load_qwenimage_controlnet(ckpt, head_dim=HEAD_DIM, axes_dims_rope=ROPE)
    assert cnet.cfg.num_layers == 2
    assert cnet.txt_norm is not None
    # fused qkv = [q | k | v] concat of the transposed torch weights
    from nunchaku_tpu.utils.safetensors import SafeTensors

    sd = SafeTensors(ckpt)
    w = np.asarray(cnet.blocks.attn.to_qkv.weight[0], np.float32)
    ref = np.concatenate(
        [sd.tensor(f"transformer_blocks.0.attn.{nm}.weight").T
         for nm in ("to_q", "to_k", "to_v")], axis=1
    )
    np.testing.assert_allclose(w, ref.astype(np.float32), atol=1e-2)

    b, s_img, s_txt = 1, 64, 24
    lat = jnp.asarray(rng.normal(size=(b, s_img, IN_CH)), jnp.bfloat16)
    cond = jnp.asarray(rng.normal(size=(b, s_img, IN_CH)), jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(b, s_txt, JOINT)), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    img_ids = jnp.zeros((s_img, 3), jnp.int32)
    samples = jax.jit(lambda c, *a: c(*a))(cnet, lat, cond, txt, t, img_ids)
    assert samples.shape == (2, b, s_img, DIM)
    # zero-init controlnet projections -> exactly zero samples
    assert float(jnp.abs(samples.astype(jnp.float32)).max()) == 0.0


TINY = QwenImageConfig(
    num_layers=3, num_attention_heads=2, joint_attention_dim=320
)


def test_transformer_residual_threading():
    """Zero samples leave the output bit-identical; nonzero samples change
    it. 2 samples over 3 layers exercises the ceil-interval spread."""
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    B, S_img, S_txt = 1, 64, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16)
    txt = jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    ii = jnp.zeros((S_img, 3), jnp.int32)
    fwd = jax.jit(lambda m, *a, **k: m(*a, **k))

    base = fwd(model, x, txt, t, ii)
    zero = fwd(model, x, txt, t, ii,
               controlnet_block_samples=jnp.zeros((2, B, S_img, TINY.dim),
                                                  jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(base, np.float32),
                                  np.asarray(zero, np.float32))
    nz = fwd(model, x, txt, t, ii,
             controlnet_block_samples=0.1 * jax.random.normal(
                 jax.random.PRNGKey(3), (2, B, S_img, TINY.dim), jnp.bfloat16))
    assert float(np.abs(np.asarray(nz - base, np.float32)).max()) > 1e-3


class _FakeVae:
    """Stand-in VAE: deterministic stride-8 'encode', zero decode."""

    class encoder:  # non-None marker for the pipeline's capability check
        pass

    def encode(self, images):
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        x = images[:, ::8, ::8, :1].transpose(0, 3, 1, 2)  # (B, 1, h/8, w/8)
        return jnp.broadcast_to(x, (b, 16, h // 8, w // 8)).astype(jnp.bfloat16)

    def decode(self, z):
        b, _, h, w = z.shape
        return jnp.zeros((b, h * 8, w * 8, 3), jnp.float32)


def test_pipeline_controlnet_conditioning():
    from nunchaku_tpu.pipeline.pipeline_qwenimage import QwenImagePipeline

    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    cnet = QwenImageControlNetModel.random_init(
        jax.random.PRNGKey(1), TINY, num_layers=2
    )
    # un-zero the output projections so conditioning actually flows
    cnet.controlnet_blocks.weight = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), cnet.controlnet_blocks.weight.shape, jnp.bfloat16
    )
    pipe = QwenImagePipeline(model, vae=_FakeVae(), controlnet=cnet)
    pe = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 320), jnp.bfloat16)
    control = jnp.asarray(
        np.random.default_rng(4).random((1, 128, 128, 3)), jnp.float32
    )

    base = pipe(pe, height=128, width=128, num_inference_steps=2, seed=0)
    ctl = pipe(pe, height=128, width=128, num_inference_steps=2, seed=0,
               control_image=control, controlnet_conditioning_scale=1.0)
    assert ctl.latents.shape == base.latents.shape == (1, 64, 64)
    assert bool(jnp.isfinite(ctl.latents.astype(jnp.float32)).all())
    diff = float(jnp.abs((ctl.latents - base.latents).astype(jnp.float32)).max())
    assert diff > 1e-3, diff
    # scale=0 restores the unconditioned trajectory
    off = pipe(pe, height=128, width=128, num_inference_steps=2, seed=0,
               control_image=control, controlnet_conditioning_scale=0.0)
    d0 = float(jnp.abs((off.latents - base.latents).astype(jnp.float32)).max())
    assert d0 < 1e-5, d0

    with pytest.raises(ValueError):
        QwenImagePipeline(model, vae=_FakeVae())(
            pe, height=128, width=128, num_inference_steps=1,
            control_image=control,
        )
