"""Diffusers-format FLUX ControlNet loader (synthesized checkpoint, CPU).

Mirrors the reference flow where diffusers' FluxControlNetModel (bf16)
runs next to the quantized transformer (examples/flux.1-dev-controlnet-
union-pro.py): keys are the diffusers state-dict schema, torch (out, in)
weight layout.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.controlnet_flux import load_flux_controlnet
from nunchaku_tpu.utils.safetensors import save_safetensors

rng = np.random.default_rng(0)

DIM, HEAD_DIM, IN_CH, JOINT, POOLED = 128, 64, 16, 96, 32


def _t(*shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def _linear(sd, prefix, out_f, in_f):
    sd[prefix + ".weight"] = _t(out_f, in_f)
    sd[prefix + ".bias"] = _t(out_f)


def _synth(n_dual=2, n_single=2, union=True, guidance=True):
    sd = {}
    sd["x_embedder.weight"] = _t(DIM, IN_CH)
    sd["x_embedder.bias"] = _t(DIM)
    sd["controlnet_x_embedder.weight"] = _t(DIM, IN_CH)
    sd["controlnet_x_embedder.bias"] = _t(DIM)
    _linear(sd, "context_embedder", DIM, JOINT)
    _linear(sd, "time_text_embed.timestep_embedder.linear_1", DIM, 256)
    _linear(sd, "time_text_embed.timestep_embedder.linear_2", DIM, DIM)
    _linear(sd, "time_text_embed.text_embedder.linear_1", DIM, POOLED)
    _linear(sd, "time_text_embed.text_embedder.linear_2", DIM, DIM)
    if guidance:
        _linear(sd, "time_text_embed.guidance_embedder.linear_1", DIM, 256)
        _linear(sd, "time_text_embed.guidance_embedder.linear_2", DIM, DIM)
    for i in range(n_dual):
        p = f"transformer_blocks.{i}"
        _linear(sd, f"{p}.norm1.linear", 6 * DIM, DIM)
        _linear(sd, f"{p}.norm1_context.linear", 6 * DIM, DIM)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            _linear(sd, f"{p}.attn.{n}", DIM, DIM)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{n}.weight"] = _t(HEAD_DIM)
        _linear(sd, f"{p}.attn.to_out.0", DIM, DIM)
        _linear(sd, f"{p}.attn.to_add_out", DIM, DIM)
        _linear(sd, f"{p}.ff.net.0.proj", 4 * DIM, DIM)
        _linear(sd, f"{p}.ff.net.2", DIM, 4 * DIM)
        _linear(sd, f"{p}.ff_context.net.0.proj", 4 * DIM, DIM)
        _linear(sd, f"{p}.ff_context.net.2", DIM, 4 * DIM)
        # zero-init output projections (real checkpoints are trained, but
        # zero lets the conditioning-path test assert exact zeros)
        sd[f"controlnet_blocks.{i}.weight"] = np.zeros((DIM, DIM), np.float32)
        sd[f"controlnet_blocks.{i}.bias"] = np.zeros((DIM,), np.float32)
    for i in range(n_single):
        p = f"single_transformer_blocks.{i}"
        _linear(sd, f"{p}.norm.linear", 3 * DIM, DIM)
        for n in ("to_q", "to_k", "to_v"):
            _linear(sd, f"{p}.attn.{n}", DIM, DIM)
        sd[f"{p}.attn.norm_q.weight"] = _t(HEAD_DIM)
        sd[f"{p}.attn.norm_k.weight"] = _t(HEAD_DIM)
        _linear(sd, f"{p}.proj_mlp", 4 * DIM, DIM)
        _linear(sd, f"{p}.proj_out", DIM, 5 * DIM)
        sd[f"controlnet_single_blocks.{i}.weight"] = np.zeros((DIM, DIM), np.float32)
        sd[f"controlnet_single_blocks.{i}.bias"] = np.zeros((DIM,), np.float32)
    if union:
        sd["controlnet_mode_embedder.weight"] = _t(10, DIM)
    return sd


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("cnet") / "controlnet.safetensors"
    save_safetensors(path, _synth())
    return str(path)


def test_load_structure(ckpt):
    cnet = load_flux_controlnet(ckpt, head_dim=HEAD_DIM, axes_dims_rope=(8, 28, 28))
    assert cnet.cfg.num_layers == 2 and cnet.cfg.num_single_layers == 2
    assert cnet.cfg.guidance_embeds
    assert cnet.mode_embedder is not None
    # fused qkv = [q | k | v] concat of the transposed torch weights
    from nunchaku_tpu.utils.safetensors import SafeTensors

    sd = SafeTensors(ckpt)
    w = np.asarray(cnet.blocks.attn.to_qkv.weight[0], np.float32)
    ref = np.concatenate(
        [sd.tensor(f"transformer_blocks.0.attn.{n}.weight").T
         for n in ("to_q", "to_k", "to_v")], axis=1
    )
    np.testing.assert_allclose(w, ref.astype(np.float32), atol=1e-2)


def test_forward_union(ckpt):
    import jax

    cnet = load_flux_controlnet(ckpt, head_dim=HEAD_DIM, axes_dims_rope=(8, 28, 28))
    b, s_img, s_txt = 1, 64, 24
    lat = jnp.asarray(rng.normal(size=(b, s_img, IN_CH)), jnp.bfloat16)
    cond = jnp.asarray(rng.normal(size=(b, s_img, IN_CH)), jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(b, s_txt, JOINT)), jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(b, POOLED)), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    g = jnp.array([3.5], jnp.float32)
    img_ids = jnp.zeros((s_img, 3), jnp.int32)
    txt_ids = jnp.zeros((s_txt, 3), jnp.int32)
    mode = jnp.array([3], jnp.int32)

    samples, ssamples = jax.jit(
        lambda c, *a: c(*a, guidance=g, controlnet_mode=mode)
    )(cnet, lat, cond, txt, pooled, t, img_ids, txt_ids)
    assert samples.shape == (2, b, s_img, DIM)
    assert ssamples.shape == (2, b, s_img, DIM)
    assert bool(jnp.isfinite(samples.astype(jnp.float32)).all())
    # zero-init controlnet projections -> exactly zero samples
    assert float(jnp.abs(samples.astype(jnp.float32)).max()) == 0.0
    assert float(jnp.abs(ssamples.astype(jnp.float32)).max()) == 0.0


def test_forward_no_singles(tmp_path):
    import jax

    path = tmp_path / "c.safetensors"
    save_safetensors(path, _synth(n_single=0, union=False, guidance=False))
    cnet = load_flux_controlnet(str(path), head_dim=HEAD_DIM, axes_dims_rope=(8, 28, 28))
    assert cnet.single_blocks is None and cnet.mode_embedder is None
    b, s_img, s_txt = 1, 64, 24
    out = jax.jit(lambda c, *a: c(*a))(
        cnet,
        jnp.zeros((b, s_img, IN_CH), jnp.bfloat16),
        jnp.zeros((b, s_img, IN_CH), jnp.bfloat16),
        jnp.zeros((b, s_txt, JOINT), jnp.bfloat16),
        jnp.zeros((b, POOLED), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.zeros((s_img, 3), jnp.int32),
        jnp.zeros((s_txt, 3), jnp.int32),
    )
    # single return value (legacy contract) when no single blocks exist
    assert out.shape == (2, b, s_img, DIM)
