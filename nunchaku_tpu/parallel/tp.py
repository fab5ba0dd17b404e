"""Tensor parallelism for the quantized transformer over a TPU mesh.

This is new design, not a port: the reference is strictly single-GPU
(SURVEY.md §2.3). Megatron-style TP over the ICI mesh axis ``tp``:

  * fused QKV / fc1 are column-parallel (output channels = heads sharded),
  * to_out / to_add_out / fc2 / single-block proj-out are row-parallel
    (input channels sharded) with one ``psum`` per pairing — the psums live
    inside the modules (models/attention.py, transformer_flux.py) and fire
    only when ``tp_axis`` is set,
  * the rank-r SVD branch shards with its GEMM (proj_down row-sharded on
    row-parallel layers; partial ``lora_act @ proj_up`` folds into the same
    psum),
  * AdaLN modulation (tiny, per-image) and norms are replicated,
  * the batch axis shards over ``dp``.

Activations inside blocks are replicated over ``tp``; collectives ride ICI.
Implemented with ``shard_map`` so the Pallas kernels see local shards.
"""

from __future__ import annotations

import re
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.module import Module

# name-pattern -> (partition dim for column-parallel, for row-parallel)
# Column-parallel layers shard dim that holds output channels; row-parallel
# shard input channels. Layout reminders: qweight (K/2, N), wscales (K/G, N),
# smooth (K,), proj_down (K, R), proj_up (R, N), bias (N,).
_COL_PARALLEL = (
    r"\.attn\.to_qkv\.",
    r"\.attn\.add_qkv_proj\.",
    r"\.ff(_context)?\.fc1\.",
    r"\.mlp_fc1\.",
    # Z-Image (S3-DiT) naming
    r"\.attention\.to_qkv\.",
    r"\.feed_forward\.w13\.",
    # SANA naming (LiteLA + cross attention + GLUMBConv)
    r"\.attn\.qkv_proj\.",
    r"\.attn\.pag_to_v\.",
    r"\.cross_attn\.q_linear\.",
    r"\.cross_attn\.kv_linear\.",
    r"\.ff\.inverted\.",
)
_ROW_PARALLEL = (
    r"\.attn\.to_out\.",
    r"\.attn\.to_add_out\.",
    r"\.ff(_context)?\.fc2\.",
    r"\.mlp_fc2\.",
    r"\.attn_out\.",
    # Z-Image (S3-DiT) naming
    r"\.attention\.to_out\.",
    r"\.feed_forward\.w2\.",
    # SANA naming
    r"\.attn\.out_proj\.",
    r"\.cross_attn\.out_proj\.",
    r"\.ff\.point\.",
)


def _param_spec(name: str, shape: tuple, stacked: bool) -> P:
    """PartitionSpec for one parameter by naming convention + shape.

    int8-turbo layers store per-channel wscales (1, N): that first dim can
    never shard; correctness-wise per-channel scales replicate under row
    parallelism (they scale output channels, applied per-device before the
    psum) and shard N under column parallelism.
    """
    pad = (None,) if stacked else ()
    local = shape[1:] if stacked else shape
    ndim = len(shape)

    def spec(*dims):
        return P(*pad, *dims)

    def repl():
        return spec(*([None] * (ndim - len(pad))))

    leaf = name.rsplit(".", 1)[-1]
    if leaf in ("depth_w", "depth_b"):
        # SANA depthwise conv rides the column-sharded GLUMB channels
        return spec("tp", *([None] * (ndim - len(pad) - 1)))
    if any(re.search(p, "." + name) for p in _COL_PARALLEL):
        if leaf == "wscales" and local[0] == 1:
            return spec(None, "tp")  # int8/w4a8 per-channel scales
        if leaf in ("qweight", "wscales", "proj_up", "rescales", "weight"):
            return spec(None, "tp")
        if leaf == "bias":
            return spec("tp")
        if leaf in ("smooth", "proj_down"):
            return repl()
    if any(re.search(p, "." + name) for p in _ROW_PARALLEL):
        if leaf == "wscales" and local[0] == 1:
            return repl()  # int8/w4a8 per-channel scales
        if leaf in ("qweight", "wscales", "proj_down", "rescales"):
            return spec("tp", None)
        if leaf == "weight":
            return spec("tp", None)
        if leaf == "smooth":
            return spec("tp")
        # bias, proj_up replicated (bias pre-divided by tp)
        return repl()
    return repl()


_STACKED_PREFIXES = (
    "transformer_blocks.",         # FLUX dual
    "single_transformer_blocks.",  # FLUX single
    "blocks.",                     # Qwen-Image MMDiT (same dual block)
    "layers.",                     # Z-Image main stack
    "noise_refiner.",              # Z-Image image refiner
    "context_refiner.",            # Z-Image caption refiner
)


def flux_param_specs(model) -> Module:
    """Tree of PartitionSpecs matching the model pytree."""
    flat = {name: arr for name, arr in model.named_parameters()}

    def build(name, arr):
        stacked = name.startswith(_STACKED_PREFIXES)
        return _param_spec(name, tuple(arr.shape), stacked)

    specs = {n: build(n, a) for n, a in flat.items()}
    # rebuild as a pytree with same structure
    leaves, treedef = jax.tree.flatten(model)
    names = [n for n, _ in model.named_parameters()]
    assert len(leaves) == len(names)
    return jax.tree.unflatten(treedef, [specs[n] for n in names])


def _set_tp_axis(model, axis: str) -> None:
    for _, mod in model.modules():
        if "tp_axis" in getattr(mod, "__dict__", {}):
            mod.tp_axis = axis


def _section_perm(n: int, sections: int, tp_size: int):
    import numpy as np

    inner = n // sections
    loc = inner // tp_size
    return np.concatenate(
        [
            np.concatenate(
                [
                    np.arange(d * loc, (d + 1) * loc) + s * inner
                    for s in range(sections)
                ]
            )
            for d in range(tp_size)
        ]
    )


def _reorder_sectioned_columns(lin, sections: int, tp_size: int) -> None:
    """Permute a section-fused projection's output columns from
    [s0 | s1 | ...] to per-shard section groups: shard d must hold its
    local slice of EVERY section (qkv_norm_rope splits the local output in
    thirds; the GLU quantize splits it in halves). Handles quantized
    (qweight) and plain (weight) linears."""
    if not hasattr(lin, "qweight"):
        perm = jnp.asarray(_section_perm(lin.weight.shape[-1], sections, tp_size))
        lin.weight = jnp.take(lin.weight, perm, axis=-1)
        if lin.bias is not None:
            lin.bias = jnp.take(lin.bias, perm, axis=-1)
        return

    n = lin.qweight.shape[-1]
    perm = _section_perm(n, sections, tp_size)
    take = lambda a, axis: jnp.take(a, jnp.asarray(perm), axis=axis)
    lin.qweight = take(lin.qweight, -1)
    lin.wscales = take(lin.wscales, -1)
    lin.proj_up = take(lin.proj_up, -1)
    if lin.bias is not None:
        lin.bias = take(lin.bias, -1)
    # w4a8 mode: the (K/G, N) int4->int8 rescale table indexes the
    # same output channels as qweight — permute it too.
    if getattr(lin, "rescales", None) is not None:
        lin.rescales = take(lin.rescales, -1)


def _reorder_qkv_columns(model, tp_size: int) -> None:
    """Column permutations for every section-fused projection: [q|k|v]
    triples on attention QKV (FLUX/Z-Image/SANA LiteLA), [value|gate]
    halves on SwiGLU w13 / SANA kv_linear / GLUMB inverted (whose
    depthwise conv channels are permuted in lockstep)."""
    for _, mod in model.modules():
        for attr in ("to_qkv", "add_qkv_proj", "qkv_proj"):
            lin = getattr(mod, attr, None)
            if lin is not None and hasattr(lin, "qweight"):
                _reorder_sectioned_columns(lin, 3, tp_size)
        w13 = getattr(mod, "w13", None)
        if w13 is not None and hasattr(w13, "qweight"):
            _reorder_sectioned_columns(w13, 2, tp_size)
        kv = getattr(mod, "kv_linear", None)
        if kv is not None:
            _reorder_sectioned_columns(kv, 2, tp_size)
        inv = getattr(mod, "inverted", None)
        if inv is not None and hasattr(inv, "qweight"):
            _reorder_sectioned_columns(inv, 2, tp_size)
            perm = jnp.asarray(
                _section_perm(mod.depth_w.shape[-4], 2, tp_size)
            )
            mod.depth_w = jnp.take(mod.depth_w, perm, axis=-4)
            mod.depth_b = jnp.take(mod.depth_b, perm, axis=-1)


def _scale_row_parallel_bias(model, tp_size: int) -> None:
    """Row-parallel biases are added on every device before the psum."""

    def fix(name, arr):
        leaf = name.rsplit(".", 1)[-1]
        if leaf == "bias" and any(re.search(p, "." + name) for p in _ROW_PARALLEL):
            return arr / tp_size
        return arr

    model.update_leaves(fix)


def parallelize(model, mesh: Mesh):
    """Shard a FluxTransformer2DModel over ``mesh`` (axes 'dp', 'tp').

    Returns (sharded_model, forward_fn). ``forward_fn(model, *args)`` is the
    jitted SPMD forward; batch shards over dp, heads/channels over tp.
    """
    tp = mesh.shape["tp"]
    _set_tp_axis(model, "tp")
    if tp > 1:
        _reorder_qkv_columns(model, tp)
        _scale_row_parallel_bias(model, tp)
    specs = flux_param_specs(model)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P("dp", None, None),  # hidden_states
        P("dp", None, None),  # encoder_hidden_states
        P("dp", None),  # pooled_projections
        P("dp"),  # timestep
        P(None, None),  # img_ids
        P(None, None),  # txt_ids
        P("dp"),  # guidance
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P("dp", None, None),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    def forward(m, *args):
        return m(*args)

    return sharded, forward


def parallelize_qwenimage(model, mesh: Mesh):
    """Shard a QwenImageTransformer2DModel over ``mesh`` (axes 'dp', 'tp').

    Qwen's 60 blocks ARE FluxTransformerBlock (transformer_qwenimage.py),
    so the Megatron column/row pairing, qkv column permutation, and
    param-spec rules apply unchanged — only the forward signature differs
    (hidden, encoder_hidden, timestep, img_ids, txt_ids)."""
    tp = mesh.shape["tp"]
    _set_tp_axis(model, "tp")
    if tp > 1:
        _reorder_qkv_columns(model, tp)
        _scale_row_parallel_bias(model, tp)
    specs = flux_param_specs(model)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P("dp", None, None),  # hidden_states
        P("dp", None, None),  # encoder_hidden_states
        P("dp"),  # timestep
        P(None, None),  # img_ids
        P(None, None),  # txt_ids
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P("dp", None, None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return sharded, forward


def parallelize_zimage(model, mesh: Mesh):
    """Shard a ZImageTransformer2DModel over ``mesh`` (axes 'dp', 'tp').

    S3-DiT blocks pair Megatron-style: to_qkv/w13 column-parallel (w13's
    [value|gate] halves get the 2-section shard permutation so the local
    GLU split stays correct), to_out/w2 row-parallel with in-module psums
    (transformer_zimage.py ZImageAttention/ZImageFeedForward tp_axis).
    Refiner stacks shard the same way; adaLN modulation and the sandwich
    RMSNorms replicate."""
    tp = mesh.shape["tp"]
    _set_tp_axis(model, "tp")
    if tp > 1:
        _reorder_qkv_columns(model, tp)
        _scale_row_parallel_bias(model, tp)
    specs = flux_param_specs(model)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P("dp", None, None),  # hidden_states (pre-patchified tokens)
        P("dp", None, None),  # encoder_hidden_states (cap feats)
        P("dp"),  # timestep
        P(None, None),  # img_ids
        P(None, None),  # txt_ids
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P("dp", None, None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return sharded, forward


def parallelize_sana(model, mesh: Mesh):
    """Shard a SanaTransformer2DModel over ``mesh`` (axes 'dp', 'tp').

    LiteLA's 32-dim heads column-shard on qkv_proj ([q|k|v] 3-section
    permutation); the GLUMBConv inverted projection's [value|gate] halves
    get the 2-section permutation with the depthwise-conv channels permuted
    and sharded in lockstep; out_proj / point run row-parallel with
    in-module psums. The bf16 cross-attention kv_linear column-shards its
    [k|v] halves."""
    tp = mesh.shape["tp"]
    _set_tp_axis(model, "tp")
    if tp > 1:
        _reorder_qkv_columns(model, tp)
        _scale_row_parallel_bias(model, tp)
    specs = flux_param_specs(model)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), model, specs
    )

    data_specs = (
        P("dp", None, None),  # hidden_states (patch-1 latent tokens)
        P("dp", None, None),  # encoder_hidden_states
        P("dp"),  # timestep
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,) + data_specs,
        out_specs=P("dp", None, None),
        check_vma=False,
    )
    def forward(m, *args):
        return m(*args)

    return sharded, forward
