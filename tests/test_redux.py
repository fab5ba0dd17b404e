"""FLUX.1-Redux prior: SigLIP tower cross-checked vs transformers, embedder
vs a numpy oracle, and the prompt-embeds concat contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.redux import (
    FluxReduxPrior,
    ReduxImageEncoder,
    SiglipVisionModel,
    load_redux_embedder,
    load_siglip_vision,
    preprocess_siglip_image,
)


def test_redux_prior_random_forward():
    prior = FluxReduxPrior.random_init(
        jax.random.PRNGKey(0), image_size=28, patch=14, d=64, heads=2,
        layers=2, txt_in_features=96,
    )
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28), jnp.bfloat16)
    tokens = jax.jit(lambda m, x: m(x))(prior, px)
    assert tokens.shape == (2, 4, 96)  # 27x27-style grid is 2x2 here
    assert bool(jnp.isfinite(tokens.astype(jnp.float32)).all())

    text = jnp.zeros((1, 8, 96), jnp.bfloat16)
    pe = prior.prompt_embeds(px, text)
    assert pe.shape == (2, 12, 96)
    # image tokens appended AFTER the text tokens (diffusers contract)
    np.testing.assert_array_equal(
        np.asarray(pe[:, :8].astype(jnp.float32)), np.zeros((2, 8, 96), np.float32)
    )


def test_siglip_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel as HFSiglip

    cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    hf = HFSiglip(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mine = load_siglip_vision(sd, heads=4, layers=2, patch=14)

    px = np.random.default_rng(0).normal(size=(1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    out = np.asarray(
        mine(jnp.asarray(px, jnp.bfloat16)).astype(jnp.float32)
    )
    assert out.shape == ref.shape
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, err


def test_redux_embedder_matches_oracle():
    rng = np.random.default_rng(1)
    up_w = rng.normal(size=(18, 6)).astype(np.float32) * 0.1  # (out, in) torch
    up_b = rng.normal(size=(18,)).astype(np.float32) * 0.1
    dn_w = rng.normal(size=(6, 18)).astype(np.float32) * 0.1
    dn_b = rng.normal(size=(6,)).astype(np.float32) * 0.1
    enc = load_redux_embedder({
        "redux_up.weight": up_w, "redux_up.bias": up_b,
        "redux_down.weight": dn_w, "redux_down.bias": dn_b,
    })
    x = rng.normal(size=(1, 4, 6)).astype(np.float32)
    h = x @ up_w.T + up_b
    h = h / (1.0 + np.exp(-h)) * 1.0  # silu = x*sigmoid(x)
    want = h @ dn_w.T + dn_b
    got = np.asarray(enc(jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 0.05, err


def test_preprocess_siglip_image():
    img = np.zeros((100, 60, 3), np.uint8)
    img[:, :, 0] = 255
    out = preprocess_siglip_image(img, size=28)
    assert out.shape == (1, 3, 28, 28)
    arr = np.asarray(out.astype(jnp.float32))
    np.testing.assert_allclose(arr[0, 0], 1.0, atol=1e-2)  # (1-0.5)/0.5
    np.testing.assert_allclose(arr[0, 1], -1.0, atol=1e-2)
