"""PuLID-conditioned FLUX forward.

Rebuild of the reference's residual-callback cadence
(src/FluxModel.cpp:1301,1335 + transformer_flux.py:287-302): after every
dual block with layer % 2 == 0 and every single block with local % 4 == 0,
the image stream gains ``id_weight * pulid_ca[idx](id_embeddings, img)``
with idx incrementing per injection (20 modules total for 19+38 blocks).

Instead of a host callback breaking the graph per layer, the dual/single
scans are split into segments at the injection boundaries — each segment is
still a lax.scan over stacked blocks, and the whole thing stays one jitted
program.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dual_segments(n_layers: int, interval: int):
    """[(start, stop)] segments ending right after each injection layer.

    Injections fire after layers 0, interval, 2*interval, ... — segment
    boundaries at stop = layer + 1.
    """
    segs = []
    start = 0
    for layer in range(n_layers):
        if layer % interval == 0:
            segs.append((start, layer + 1, True))
            start = layer + 1
    if start < n_layers:
        segs.append((start, n_layers, False))
    return segs


def pulid_forward(
    model,
    pulid_ca: list,
    id_embeddings: jnp.ndarray,  # (B, 32, 2048)
    id_weight: float,
    hidden_states: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    pooled_projections: jnp.ndarray,
    timestep: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt_ids: jnp.ndarray,
    guidance: jnp.ndarray | None = None,
    controlnet_block_samples=None,
    controlnet_single_block_samples=None,
    *,
    double_interval: int = 2,
    single_interval: int = 4,
) -> jnp.ndarray:
    cfg = model.cfg
    n_dual = -(-cfg.num_layers // double_interval)
    n_single = -(-cfg.num_single_layers // single_interval)
    if len(pulid_ca) < n_dual + n_single:
        raise ValueError(
            f"need {n_dual + n_single} pulid_ca modules, got {len(pulid_ca)}"
        )

    img, txt, temb, rot = model.embed(
        hidden_states, encoder_hidden_states, pooled_projections,
        timestep, img_ids, txt_ids, guidance,
    )

    ca_idx = 0
    for start, stop, inject in _dual_segments(cfg.num_layers, double_interval):
        img, txt = model.run_dual(
            img, txt, temb, rot, start=start, stop=stop,
            controlnet_block_samples=controlnet_block_samples,
        )
        if inject:
            ip = pulid_ca[ca_idx](id_embeddings, img.astype(jnp.bfloat16))
            img = img + id_weight * ip.astype(jnp.float32)
            ca_idx += 1

    s_txt = txt.shape[1]
    x = jnp.concatenate([txt, img], axis=1)
    for start, stop, inject in _dual_segments(cfg.num_single_layers, single_interval):
        x = model.run_singles(
            x, temb, rot, s_txt, start=start, stop=stop,
            controlnet_single_block_samples=controlnet_single_block_samples,
        )
        if inject:
            im = x[:, s_txt:]
            ip = pulid_ca[ca_idx](id_embeddings, im.astype(jnp.bfloat16))
            x = x.at[:, s_txt:].add(id_weight * ip.astype(jnp.float32))
            ca_idx += 1

    return model.head(x[:, s_txt:], temb)
