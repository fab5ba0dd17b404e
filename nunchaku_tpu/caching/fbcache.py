"""First-block cache (FB cache) and double FB cache, TPU-native.

Strategy (reference nunchaku/caching/fbcache.py:20-29 + caching/utils.py:
345-516): run only the first transformer block each step; if its residual
is close (mean relative L1 < threshold) to the previous step's, reuse the
cached residual of all remaining blocks instead of computing them. Double
FB cache applies the same test again at the first *single* block with its
own threshold.

The reference breaks the torch graph at the decision point
(caching/utils.py:462 torch._dynamo.graph_break); here the whole step stays
one jitted function — the decision is a ``lax.cond`` and the cache is an
explicit carry pytree threaded through the denoise loop (pure, donatable,
works under scan/vmap).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FBCacheState(NamedTuple):
    prev_first_residual: jnp.ndarray  # (B, S_img, D) f32
    cached_dual_residual_img: jnp.ndarray  # (B, S_img, D) f32
    cached_dual_residual_txt: jnp.ndarray  # (B, S_txt, D) f32
    prev_single_residual: jnp.ndarray  # (B, S, D) f32
    cached_single_residual: jnp.ndarray  # (B, S, D) f32
    valid: jnp.ndarray  # () bool
    hits: jnp.ndarray  # () int32 — diagnostics


def init_fb_state(batch, s_img, s_txt, dim) -> FBCacheState:
    # bf16 states: residuals feed a mean-relative-L1 metric and a residual
    # add — bf16 is ample, and f32 states OOM a 16 GB chip at 1024px.
    # Each field gets its own buffer (states are donated by the pipeline
    # step; aliased buffers cannot be donated twice).
    def z(shape):
        return jnp.zeros(shape, jnp.bfloat16)

    return FBCacheState(
        z((batch, s_img, dim)),
        z((batch, s_img, dim)),
        z((batch, s_txt, dim)),
        z((batch, s_img + s_txt, dim)),
        z((batch, s_img + s_txt, dim)),
        jnp.zeros((), jnp.bool_),
        jnp.zeros((), jnp.int32),
    )


def _similar(a, b, threshold):
    """mean|a-b| / mean|b| < threshold (caching/utils.py check_and_apply_cache)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    diff = jnp.mean(jnp.abs(af - bf)) / (jnp.mean(jnp.abs(bf)) + 1e-8)
    return diff < threshold


def make_hit_schedule(num_steps: int, hit_ratio: float):
    """Forced-decision schedule: () int32 per step — 1 = replay the cache,
    0 = recompute. ``round(hit_ratio * num_steps)`` hits spread evenly over
    steps 1..N-1 (step 0 must miss: the cache is empty).

    Benchmarking aid: the hit/miss *rate* of a threshold cache depends on
    the checkpoint (real FLUX at threshold 0.12 gives the reference's ~2x
    at 50 steps, docs/source/usage/cache.rst:24), which random sandbox
    weights cannot reproduce (they measure 49/50 — degenerate). A forced
    schedule runs the exact hit/miss compute of a real cached generation at
    a *stated* hit count, so the measured latency is auditable. Every hit
    costs the same (replay of block-0 + cached residuals), so only the
    count matters, not the placement."""
    import numpy as np

    h = int(round(hit_ratio * num_steps))
    h = max(0, min(h, num_steps - 1))
    sched = np.zeros((num_steps,), np.int32)
    if h:
        idx = np.round(np.linspace(1, num_steps - 1, h)).astype(np.int64)
        # dedupe while keeping the count exact
        seen, fixed = set(), []
        for i in idx:
            while i in seen or i < 1:
                i += 1
            seen.add(i)
            fixed.append(i)
        sched[np.asarray(fixed, np.int64)] = 1
    return sched


def _apply_force(natural, force):
    """force: () int32 — <0 keeps the threshold decision, 0/1 overrides."""
    if force is None:
        return natural
    return jnp.where(force < 0, natural, force > 0)


def fb_cached_forward(
    model,
    state: FBCacheState,
    hidden_states,
    encoder_hidden_states,
    pooled_projections,
    timestep,
    img_ids,
    txt_ids,
    guidance=None,
    *,
    residual_diff_threshold: float = 0.12,
    single_residual_diff_threshold: float | None = None,
    controlnet_block_samples=None,
    controlnet_single_block_samples=None,
    force=None,  # () int32: <0 threshold decision, 0 force miss, 1 force hit
    ip_kv=None,  # (k_ip, v_ip) stacked (L, B, S_ip, inner) IP-Adapter xs
    ip_scale: float = 1.0,
):
    """One cached transformer step. Returns (velocity, new_state).

    ``single_residual_diff_threshold`` enables double FB cache; None keeps
    the single-level scheme (singles are cached together with the duals).

    ControlNet residuals thread through every computed branch (the reference
    supports cache x controlnet, tests/flux/test_flux_txt2img_cache_controlnet
    .py); on a hit the cached residual already contains the conditioning from
    the step it was computed at, matching the reference's replay semantics.
    ``ip_kv`` composes IP-Adapter the same way: the reference's
    IPA_TransformerBlocks *extends* the cached blocks
    (nunchaku/models/ip_adapter/utils.py:25-491), so every computed dual
    block gets its per-layer image cross-attention and hits replay residuals
    that already carry the conditioning.
    """
    cb, csb = controlnet_block_samples, controlnet_single_block_samples
    img0, txt0, temb, rot = model.embed(
        hidden_states, encoder_hidden_states, pooled_projections,
        timestep, img_ids, txt_ids, guidance,
    )
    s_txt = txt0.shape[1]

    # always run dual block 0 (with its controlnet/IPA conditioning, if any)
    img1, txt1 = model.run_dual(
        img0, txt0, temb, rot, start=0, stop=1, controlnet_block_samples=cb,
        ip_kv=ip_kv, ip_scale=ip_scale,
    )
    first_res = (img1 - img0).astype(jnp.bfloat16)
    hit = jnp.logical_and(
        state.valid,
        _apply_force(
            _similar(first_res, state.prev_first_residual, residual_diff_threshold),
            force,
        ),
    )

    if single_residual_diff_threshold is None:
        # single-level: one decision covers dual blocks 1.. and all singles
        def on_hit(st):
            img_f = img1 + st.cached_dual_residual_img
            txt_f = txt1 + st.cached_dual_residual_txt
            x1 = jnp.concatenate([txt_f, img_f], axis=1)
            x_f = x1 + st.cached_single_residual
            return (x_f, st.prev_single_residual, st.cached_single_residual,
                    st.cached_dual_residual_img, st.cached_dual_residual_txt)

        def on_miss(st):
            # Recompute block 0 from the UNSLICED stacked weights: scanning
            # blocks[1:] would make XLA materialize a ~5.9 GiB copy of the
            # sliced weight stack as an HLO temp inside this cond branch
            # (slices of scan xs are copied, not aliased). One redundant
            # dual block (~2% of a miss step) buys back that entire buffer.
            img_f, txt_f = model.run_dual(
                img0, txt0, temb, rot, start=0, controlnet_block_samples=cb,
                ip_kv=ip_kv, ip_scale=ip_scale,
            )
            x1 = jnp.concatenate([txt_f, img_f], axis=1)
            x_f = model.run_singles(
                x1, temb, rot, s_txt, controlnet_single_block_samples=csb
            )
            return (x_f, st.prev_single_residual, (x_f - x1).astype(jnp.bfloat16),
                    (img_f - img1).astype(jnp.bfloat16),
                    (txt_f - txt1).astype(jnp.bfloat16))

        x_f, prev_sres, cached_sres, dual_res_img, dual_res_txt = jax.lax.cond(
            hit, on_hit, on_miss, state
        )
    else:
        # double FB: dual-level decision, then an independent single-level
        # decision at the first single block (its cache is relative to the
        # post-single-block-0 stream)
        def d_hit(st):
            return (img1 + st.cached_dual_residual_img,
                    txt1 + st.cached_dual_residual_txt,
                    st.cached_dual_residual_img, st.cached_dual_residual_txt)

        def d_miss(st):
            # start=0: recompute block 0 instead of slicing the weight stack
            # (see the single-level on_miss comment — slice = 5.9 GiB temp)
            img_f, txt_f = model.run_dual(
                img0, txt0, temb, rot, start=0, controlnet_block_samples=cb,
                ip_kv=ip_kv, ip_scale=ip_scale,
            )
            return (img_f, txt_f, (img_f - img1).astype(jnp.bfloat16),
                    (txt_f - txt1).astype(jnp.bfloat16))

        img_f, txt_f, dual_res_img, dual_res_txt = jax.lax.cond(
            hit, d_hit, d_miss, state
        )
        x1 = jnp.concatenate([txt_f, img_f], axis=1)
        x2 = model.run_singles(
            x1, temb, rot, s_txt, start=0, stop=1,
            controlnet_single_block_samples=csb,
        )
        sres = (x2 - x1).astype(jnp.bfloat16)
        shit = jnp.logical_and(
            state.valid,
            _apply_force(
                _similar(sres, state.prev_single_residual,
                         single_residual_diff_threshold),
                force,
            ),
        )

        def s_hit(st):
            return x2 + st.cached_single_residual, st.cached_single_residual

        def s_miss(st):
            # start=0 from x1: recompute single block 0 (== x2) rather than
            # scan a [1:38] weight-stack slice (~2.2 GiB HLO-temp copy)
            x_f = model.run_singles(
                x1, temb, rot, s_txt, start=0,
                controlnet_single_block_samples=csb,
            )
            return x_f, (x_f - x2).astype(jnp.bfloat16)

        x_f, cached_sres = jax.lax.cond(shit, s_hit, s_miss, state)
        # store-on-miss (reference fbcache.py:467-469 set_buffer only in the
        # miss branch): hits keep comparing against the last MISS's residual,
        # so sub-threshold drift accumulates and eventually forces a recompute
        # instead of allowing unbounded hit streaks
        prev_sres = jnp.where(shit, state.prev_single_residual, sres)

    out = model.head(x_f[:, s_txt:], temb)
    new_state = FBCacheState(
        prev_first_residual=jnp.where(
            hit, state.prev_first_residual, first_res
        ),
        cached_dual_residual_img=dual_res_img,
        cached_dual_residual_txt=dual_res_txt,
        prev_single_residual=prev_sres,
        cached_single_residual=cached_sres,
        valid=jnp.ones((), jnp.bool_),
        hits=state.hits + hit.astype(jnp.int32),
    )
    return out, new_state


# ---------------------------------------------------------------------------
# Qwen-Image first-N-blocks cache (reference runs cache-dit DBCache over
# QwenImage, examples/v1/qwen-image-cache-dit.py with Fn_compute_blocks=8 /
# Bn=0: blocks 0..7 are the decision indicator, the remaining blocks'
# residual is replayed; fn_blocks=1 gives the more aggressive FLUX-style
# first-block variant the reference uses in flux.1-dev-cache-dit.py)
# ---------------------------------------------------------------------------


class QwenFBCacheState(NamedTuple):
    prev_first_residual: jnp.ndarray  # (B, S_img, D) bf16
    cached_rest_residual: jnp.ndarray  # (B, S_img, D) bf16
    valid: jnp.ndarray  # () bool
    hits: jnp.ndarray  # () int32


def init_qwen_fb_state(batch, s_img, dim) -> QwenFBCacheState:
    return QwenFBCacheState(
        jnp.zeros((batch, s_img, dim), jnp.bfloat16),
        jnp.zeros((batch, s_img, dim), jnp.bfloat16),
        jnp.zeros((), jnp.bool_),
        jnp.zeros((), jnp.int32),
    )


def qwenimage_fb_cached_forward(
    model,
    state: QwenFBCacheState,
    hidden_states,
    encoder_hidden_states,
    timestep,
    img_ids,
    txt_ids=None,
    *,
    residual_diff_threshold: float = 0.12,
    fn_blocks: int = 8,
    controlnet_block_samples=None,
    encoder_hidden_states_mask=None,
    force=None,  # () int32: <0 threshold decision, 0 force miss, 1 force hit
):
    """One cached Qwen-Image transformer step. Returns (velocity, new_state).

    Qwen's 60 joint blocks have no single-stream tail, so one decision covers
    blocks fn..L-1; the img-stream residual is both the similarity metric and
    the replayed quantity (cache-dit DBCache compares/replays hidden_states
    the same way). ``fn_blocks`` is Fn_compute_blocks: the reference's Qwen
    example sets Fn=8 (examples/v1/qwen-image-cache-dit.py:25) — the default
    here — while its FLUX example uses the more aggressive Fn=1
    (flux.1-dev-cache-dit.py:23). The txt stream is only an intermediate —
    ``head`` reads img alone — so hits never need it.
    """
    fn = max(1, min(int(fn_blocks), model.cfg.num_layers - 1))
    img0, txt0, temb, rot = model.embed(
        hidden_states, encoder_hidden_states, timestep, img_ids, txt_ids
    )
    kv_mask = model.kv_mask_for(img0, encoder_hidden_states_mask)
    img1, txt1 = model.run_blocks(
        img0, txt0, temb, rot, start=0, stop=fn,
        controlnet_block_samples=controlnet_block_samples, kv_mask=kv_mask,
    )
    first_res = (img1 - img0).astype(jnp.bfloat16)
    hit = jnp.logical_and(
        state.valid,
        _apply_force(
            _similar(first_res, state.prev_first_residual, residual_diff_threshold),
            force,
        ),
    )

    def on_hit(st):
        img_f = img1 + st.cached_rest_residual.astype(img1.dtype)
        return img_f, st.cached_rest_residual

    def on_miss(st):
        # start=0: recompute blocks 0..fn-1 from the unsliced stacked
        # weights — scanning blocks[fn:] materializes a full HLO-temp copy
        # of the sliced weight stack inside this cond branch (see
        # fb_cached_forward)
        img_f, _ = model.run_blocks(
            img0, txt0, temb, rot, start=0,
            controlnet_block_samples=controlnet_block_samples, kv_mask=kv_mask,
        )
        return img_f, (img_f - img1).astype(jnp.bfloat16)

    img_f, cached_rest = jax.lax.cond(hit, on_hit, on_miss, state)
    out = model.head(img_f, temb)
    new_state = QwenFBCacheState(
        # store-on-miss (reference fbcache.py:467-469): hits keep comparing
        # against the last miss's residual so drift forces a recompute
        prev_first_residual=jnp.where(hit, state.prev_first_residual, first_res),
        cached_rest_residual=cached_rest,
        valid=jnp.ones((), jnp.bool_),
        hits=state.hits + hit.astype(jnp.int32),
    )
    return out, new_state


# ---------------------------------------------------------------------------
# SANA first-block cache (reference SanaCachedTransformerBlocks,
# caching/utils.py:33-213)
# ---------------------------------------------------------------------------


class SanaFBCacheState(NamedTuple):
    prev_first_residual: jnp.ndarray  # (B, S_img, D)
    cached_rest_residual: jnp.ndarray  # (B, S_img, D)
    valid: jnp.ndarray  # () bool
    hits: jnp.ndarray  # () int32


def init_sana_fb_state(batch, s_img, dim) -> SanaFBCacheState:
    return SanaFBCacheState(
        jnp.zeros((batch, s_img, dim), jnp.bfloat16),
        jnp.zeros((batch, s_img, dim), jnp.bfloat16),
        jnp.zeros((), jnp.bool_),
        jnp.zeros((), jnp.int32),
    )


def sana_fb_cached_forward(
    model,
    state: SanaFBCacheState,
    hidden_states,
    encoder_hidden_states,
    timestep,
    cond_mask=None,
    pag: bool = False,
    *,
    residual_diff_threshold: float = 0.12,
):
    """SANA step with first-block caching: run block 0; when its residual is
    close to the previous step's, replay the cached remaining-blocks
    residual instead of running blocks 1..L-1."""
    x0, cond, temb, temb6, side = model.embed(
        hidden_states, encoder_hidden_states, timestep
    )
    x1 = model.run_blocks(x0, cond, temb6, side, cond_mask, pag, start=0, stop=1)
    first_residual = (x1 - x0).astype(jnp.bfloat16)
    hit = jnp.logical_and(
        state.valid,
        _similar(first_residual, state.prev_first_residual, residual_diff_threshold),
    )

    def on_hit(st):
        x = x1 + st.cached_rest_residual.astype(jnp.float32)
        # store-on-miss (reference fbcache.py:467-469): keep comparing
        # against the last miss's residual so drift can't hit forever
        return x, SanaFBCacheState(
            st.prev_first_residual, st.cached_rest_residual,
            jnp.ones((), jnp.bool_), st.hits + 1,
        )

    def on_miss(st):
        # start=0 from x0: recompute block 0 instead of slicing the stacked
        # weights (slices of scan xs become full HLO-temp copies on TPU)
        x = model.run_blocks(x0, cond, temb6, side, cond_mask, pag, start=0)
        rest = (x - x1).astype(jnp.bfloat16)
        return x, SanaFBCacheState(
            first_residual, rest, jnp.ones((), jnp.bool_), st.hits,
        )

    x, new_state = jax.lax.cond(hit, on_hit, on_miss, state)
    return model.head(x, temb), new_state
