"""TeaCache: timestep-embedding-aware step caching.

Reference: nunchaku/caching/teacache.py:68-420 — the caching decision uses
the relative L1 distance of the *modulated* first-block input (AdaLN output),
rescaled by a model-specific polynomial, accumulated across steps; when the
accumulation stays under the threshold the entire transformer is skipped and
the previous residual is replayed. First and last steps always compute.

Implemented as a pure step function with an explicit state carry (the
reference mutates counters on the module and swaps ``forward``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

COEFFICIENTS = {
    # polynomial rescale, highest power first (reference teacache.py:62-65)
    "flux": (4.98651651e02, -2.83781631e02, 5.58554382e01, -3.82021401e00, 2.64230861e-01),
    "flux-kontext": (-1.04655119e03, 3.12563399e02, -1.69500694e01, 4.10995971e-01, 3.74537863e-02),
}


class TeaCacheState(NamedTuple):
    prev_modulated: jnp.ndarray  # (B, S_img, D)
    prev_residual: jnp.ndarray  # (B, S_img, D) — blocks' image-stream residual
    accumulated: jnp.ndarray  # () f32
    step: jnp.ndarray  # () int32
    hits: jnp.ndarray  # () int32


def init_teacache_state(batch, s_img, dim) -> TeaCacheState:
    return TeaCacheState(
        jnp.zeros((batch, s_img, dim), jnp.bfloat16),
        jnp.zeros((batch, s_img, dim), jnp.bfloat16),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )


def _poly(coeffs, x):
    acc = jnp.zeros_like(x)
    for c in coeffs:
        acc = acc * x + c
    return acc


def teacache_forward(
    model,
    state: TeaCacheState,
    hidden_states,
    encoder_hidden_states,
    pooled_projections,
    timestep,
    img_ids,
    txt_ids,
    guidance=None,
    *,
    num_steps: int,
    rel_l1_thresh: float = 0.6,
    model_name: str = "flux",
    controlnet_block_samples=None,
    controlnet_single_block_samples=None,
):
    """One TeaCache step. Returns (velocity, new_state)."""
    img0, txt0, temb, rot = model.embed(
        hidden_states, encoder_hidden_states, pooled_projections,
        timestep, img_ids, txt_ids, guidance,
    )
    s_txt = txt0.shape[1]

    blk0 = jax.tree.map(lambda a: a[0], model.transformer_blocks)
    modulated, *_ = blk0.norm1(img0, temb)
    modulated = modulated.astype(jnp.bfloat16)

    rel = jnp.mean(jnp.abs((modulated - state.prev_modulated).astype(jnp.float32))) / (
        jnp.mean(jnp.abs(state.prev_modulated.astype(jnp.float32))) + 1e-8
    )
    acc = state.accumulated + jnp.abs(_poly(COEFFICIENTS[model_name], rel))
    boundary = jnp.logical_or(state.step == 0, state.step == num_steps - 1)
    should_calc = jnp.logical_or(boundary, acc >= rel_l1_thresh)
    acc = jnp.where(boundary | should_calc, 0.0, acc)

    def compute(_):
        img, txt = model.run_dual(
            img0, txt0, temb, rot,
            controlnet_block_samples=controlnet_block_samples,
        )
        x = jnp.concatenate([txt, img], axis=1)
        img_f = model.run_singles(
            x, temb, rot, s_txt,
            controlnet_single_block_samples=controlnet_single_block_samples,
        )[:, s_txt:]
        return (img_f - img0).astype(jnp.bfloat16)  # blocks' image-stream residual

    def replay(_):
        return state.prev_residual

    # the cache stores the blocks' residual on the image stream; the output
    # head always runs with the *current* temb (reference teacache.py:236
    # `hidden_states += self.previous_residual` before norm_out)
    resid = jax.lax.cond(should_calc, compute, replay, None)
    out = model.head(img0 + resid, temb)

    new_state = TeaCacheState(
        prev_modulated=modulated,
        prev_residual=resid,
        accumulated=acc,
        step=(state.step + 1) % num_steps,
        hits=state.hits + (1 - should_calc.astype(jnp.int32)),
    )
    return out, new_state
