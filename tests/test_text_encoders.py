"""Text encoder tests: cross-checked against huggingface transformers (torch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.text_encoders.clip import CLIPTextModel, load_clip_text
from nunchaku_tpu.models.text_encoders.t5 import T5EncoderModel, load_t5_encoder


def test_t5_random_forward():
    m = T5EncoderModel.random_init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (2, 16)))
    out = jax.jit(lambda m, i: m(i))(m, ids)
    assert out.shape == (2, 16, 512)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_clip_random_forward():
    m = CLIPTextModel.random_init(jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(3, 999, (2, 12))
    ids[0, 5] = 2  # eos
    ids[1, 9] = 2
    pooled, hidden = jax.jit(lambda m, i: m(i))(m, jnp.asarray(ids))
    assert pooled.shape == (2, 128) and hidden.shape == (2, 12, 128)
    assert bool(jnp.isfinite(pooled.astype(jnp.float32)).all())


def test_t5_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5EncoderModel as HFT5

    cfg = T5Config(
        vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, is_gated_act=True, dense_act_fn="gelu_new",
        feed_forward_proj="gated-gelu",
    )
    hf = HFT5(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mine = load_t5_encoder(
        sd, config=dict(d_model=64, num_heads=4, d_kv=16, num_layers=2)
    )
    ids = np.random.default_rng(0).integers(0, 512, (1, 10))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(mine(jnp.asarray(ids)), np.float32)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, err


def test_clip_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel as HFCLIP

    # real CLIP's eos (49407) is the largest vocab id and HF's pooler relies
    # on that (argmax of ids); mirror it with eos = vocab-1 here
    cfg = CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=32,
        eos_token_id=511, bos_token_id=1, hidden_act="quick_gelu",
    )
    hf = HFCLIP(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mine = load_clip_text(sd, heads=4, layers=2, eos_token_id=511)
    ids = np.random.default_rng(0).integers(3, 500, (1, 12))
    ids[0, 8] = 511
    with torch.no_grad():
        r = hf(torch.from_numpy(ids))
        ref_pool = r.pooler_output.numpy()
        ref_h = r.last_hidden_state.numpy()
    pooled, hidden = mine(jnp.asarray(ids))
    err_h = np.abs(np.asarray(hidden, np.float32) - ref_h).max() / (np.abs(ref_h).max() + 1e-9)
    err_p = np.abs(np.asarray(pooled, np.float32) - ref_pool).max() / (np.abs(ref_pool).max() + 1e-9)
    assert err_h < 0.03, err_h
    assert err_p < 0.03, err_p


def test_clip_vision_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from nunchaku_tpu.models.text_encoders.clip import load_clip_vision

    cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8, projection_dim=48,
    )
    hf = CLIPVisionModelWithProjection(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mine = load_clip_vision(sd, heads=4, layers=2, patch=8)
    px = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).image_embeds.numpy()
    out, _, _ = mine(jnp.asarray(px, jnp.bfloat16))
    out = np.asarray(out, np.float32)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, err


def test_clip_image_preprocess():
    from nunchaku_tpu.models.text_encoders.clip import preprocess_clip_image

    img = np.random.default_rng(1).integers(0, 255, (300, 400, 3), dtype=np.uint8)
    out = preprocess_clip_image(img, size=224)
    assert out.shape == (1, 3, 224, 224)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_gemma2_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2Model

    from nunchaku_tpu.models.text_encoders.gemma2 import load_gemma2_encoder

    cfg = Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        sliding_window=4096, max_position_embeddings=128,
    )
    hf = Gemma2Model(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mine = load_gemma2_encoder(
        sd,
        config=dict(num_layers=2, heads=4, kv_heads=2, head_dim=16,
                    query_pre_attn_scalar=16.0),
    )
    ids = np.random.default_rng(0).integers(1, 256, (2, 12))
    am = np.ones((2, 12), np.int64)
    am[1, 9:] = 0
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(am)).last_hidden_state.numpy()
    out = np.asarray(
        mine(jnp.asarray(ids), jnp.asarray(am)), np.float32
    )
    # compare only non-pad positions
    err = np.abs(out[am.astype(bool)] - ref[am.astype(bool)]).max() / (
        np.abs(ref).max() + 1e-9
    )
    assert err < 0.04, err
