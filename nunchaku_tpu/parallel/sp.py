"""Sequence (context) parallelism: exact ring attention over the device
mesh.

The reference is strictly single-GPU (SURVEY §2.3); its high-resolution
answer is block-sparse attention. On TPU the sequence axis can additionally
be sharded across chips: every non-attention op in the DiT block is
per-token (LN, AdaLN modulation, GEMMs, residuals), so only attention needs
communication — k/v shards rotate around the ICI ring via ``ppermute``
while every chip attends its local queries against each passing shard.

The fixed-shift softmax (ops/attention.py FIXED_SHIFT) makes the combine
EXACT with no running-max bookkeeping: partial outputs over disjoint kv
shards satisfy

    o = sum_i (o_i * l_i) / sum_i l_i,     l_i = sum_k exp2(s_k - SHIFT)

because every shard's probabilities share the same global shift. This is
the TPU-native replacement for ring-attention's online-max rescaling.

Use inside ``shard_map`` with the joint sequence sharded over ``axis``:

    mesh = jax.make_mesh((n,), ("sp",))
    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp"),
        mesh=mesh,
        in_specs=P(None, None, "sp", None), out_specs=P(None, None, "sp", None),
    )(q, k, v)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention


def ring_attention(
    q: jnp.ndarray,  # (B, H, S_local, D) — this chip's query shard
    k: jnp.ndarray,  # (B, H, S_local, D) — this chip's kv shard
    v: jnp.ndarray,
    axis: str,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Exact distributed attention; S is sharded over mesh axis ``axis``.

    Each of the ``n`` ring steps runs the local flash kernel with
    ``return_denom=True`` and rotates k/v to the next neighbor — XLA's
    latency-hiding scheduler overlaps the ``ppermute`` ICI transfer with
    the current step's compute. Communication volume per chip:
    2 * (n-1)/n of one kv shard pair — the same bytes a single all-gather
    would move, but peak memory stays at one extra shard instead of the
    full sequence.
    """
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    acc = jnp.zeros(q.shape, jnp.float32)
    den = jnp.zeros(q.shape[:-1], jnp.float32)
    k_cur, v_cur = k, v
    for step in range(n):
        o_i, l_i = flash_attention(
            q, k_cur, v_cur, scale=scale, fixed_softmax=True,
            return_denom=True, interpret=interpret,
        )
        acc = acc + o_i.astype(jnp.float32) * l_i[..., None]
        den = den + l_i
        if step + 1 < n:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
    return (acc / den[..., None]).astype(q.dtype)


def _set_sp_axis(model, axis: str) -> None:
    from ..models.attention import FluxAttention
    from ..models.transformers.transformer_zimage import ZImageAttention

    for _, mod in model.modules():
        for child in vars(mod).values():
            if isinstance(child, (FluxAttention, ZImageAttention)):
                child.sp_axis = axis
    if isinstance(model, type(model)) and hasattr(model, "refresh_pytree"):
        model.refresh_pytree()


def parallelize_sequence(model, mesh):
    """Sequence-parallel FLUX forward over mesh axis ``'sp'``.

    Complementary to tensor parallelism (parallel/tp.py): weights are
    REPLICATED and the (txt + img) token sequence is sharded, so activation
    memory and attention FLOPs split n ways — the multi-chip answer to
    2048px+ sequences (16K+ tokens), where activations and O(S^2) attention
    dominate, not weights. Every per-token op runs locally; only attention
    communicates (ring_attention's kv ppermute ring).

    Returns ``(replicated_model, forward)``; forward takes the
    FluxTransformer2DModel argument list. Requires S_img and S_txt
    divisible by the axis size (pipeline shapes are: 4096/512 at 1024px).
    """
    from functools import partial

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    _set_sp_axis(model, "sp")
    specs = jax.tree.map(lambda _: P(), model)
    replicated = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P(None, "sp", None),  # hidden_states (S_img sharded)
        P(None, "sp", None),  # encoder_hidden_states (S_txt sharded)
        P(None, None),  # pooled_projections
        P(None),  # timestep
        P("sp", None),  # img_ids
        P("sp", None),  # txt_ids
        P(None),  # guidance
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P(None, "sp", None),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    def forward(m, *args):
        return m(*args)

    return replicated, forward


def parallelize_sequence_qwenimage(model, mesh):
    """Sequence-parallel Qwen-Image forward (same ring-attention design as
    :func:`parallelize_sequence`; only the argument list differs). The 20B
    Qwen at high resolution is activation-bound — sharding the token axis
    splits both activation memory and the O(S^2) attention.

    Pass EXPLICIT ``txt_ids`` (global token-index rope, (S_txt, 3)): the
    transformer's in-model default would number each local shard from 0."""
    from functools import partial

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    _set_sp_axis(model, "sp")
    specs = jax.tree.map(lambda _: P(), model)
    replicated = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P(None, "sp", None),  # hidden_states
        P(None, "sp", None),  # encoder_hidden_states
        P(None),  # timestep
        P("sp", None),  # img_ids
        P("sp", None),  # txt_ids
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P(None, "sp", None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return replicated, forward


def parallelize_sequence_zimage(model, mesh):
    """Sequence-parallel Z-Image forward (S3-DiT: noise/context refiners +
    joint stack — each stage's token axis shards consistently, ring
    attention per stage)."""
    from functools import partial

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    _set_sp_axis(model, "sp")
    specs = jax.tree.map(lambda _: P(), model)
    replicated = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P(None, "sp", None),  # hidden_states
        P(None, "sp", None),  # encoder_hidden_states
        P(None),  # timestep
        P("sp", None),  # img_ids
        P("sp", None),  # txt_ids
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P(None, "sp", None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return replicated, forward


def parallelize_2d(model, mesh):
    """Combined sequence x tensor parallelism for FLUX over mesh axes
    ('sp', 'tp'): weights shard Megatron-style over 'tp' (parallel/tp.py
    pairing — column-parallel QKV/fc1, row-parallel out/fc2 with in-module
    psums), the token sequence shards over 'sp', and attention runs the kv
    ppermute ring within each tp group on tp-local heads. The two schemes
    are orthogonal: tp splits the weight/channel axis, sp the token axis —
    an (sp=2, tp=4) v5e-8 slice gets 8-way compute with 1/4 weight HBM per
    chip and 1/2 activation memory."""
    from functools import partial

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from .tp import (
        _reorder_qkv_columns,
        _scale_row_parallel_bias,
        _set_tp_axis,
        flux_param_specs,
    )

    tp = mesh.shape["tp"]
    _set_tp_axis(model, "tp")
    if tp > 1:
        _reorder_qkv_columns(model, tp)
        _scale_row_parallel_bias(model, tp)
    _set_sp_axis(model, "sp")
    specs = flux_param_specs(model)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P(None, "sp", None),  # hidden_states
        P(None, "sp", None),  # encoder_hidden_states
        P(None, None),  # pooled_projections
        P(None),  # timestep
        P("sp", None),  # img_ids
        P("sp", None),  # txt_ids
        P(None),  # guidance
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P(None, "sp", None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return sharded, forward


def parallelize_sequence_sana(model, mesh):
    """Sequence-parallel SANA forward. Linear attention needs only a psum
    of its (d x d) kv moment (lite_la sp_axis); cross-attention keeps the
    short text replicated (no communication); the GLUMBConv 3x3 depthwise
    conv exchanges one pixel-row halo with each grid neighbor via ppermute.
    The image token grid shards along rows: H must divide the axis size."""
    from functools import partial

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from ..models.transformers.transformer_sana import (
        SanaGLUMBConv,
        SanaLinearAttention,
    )

    n = mesh.shape["sp"]
    for _, mod in model.modules():
        for child in vars(mod).values():
            if isinstance(child, (SanaLinearAttention, SanaGLUMBConv)):
                child.sp_axis = "sp"
    model._sp_n = n  # embed() reconstructs the global grid from local S

    specs = jax.tree.map(lambda _: P(), model)
    replicated = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P(None, "sp", None),  # hidden_states (pixel rows sharded)
        P(None, None, None),  # encoder_hidden_states (short text, replicated)
        P(None),  # timestep
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P(None, "sp", None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return replicated, forward
