"""Runtime LoRA application onto the quantized FLUX model.

Counterpart of the reference's ``update_lora_params`` /
``set_lora_strength`` (nunchaku/models/transformers/transformer_flux.py:
783-855) and ``convert_to_nunchaku_flux_lowrank_dict``
(lora/flux/nunchaku_converter.py:165-877): the LoRA branch concatenates
onto the rank-32 SVD branch of each quantized linear — proj_down gains
columns, proj_up gains rows — so the fused GEMM kernel picks it up with no
extra launches. Strength rescales only the appended columns (the base SVD
ranks are skipped, csrc/flux.h:177-198 setLoraScale skip-32).

Functional: returns a new model pytree; the base model is untouched, so
"reset lora" is just keeping the original (tests/flux/test_lora_reset.py
behavior for free).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...models.transformers.transformer_flux import slice_module, stack_modules
from .convert import to_canonical

RANK_PAD = 16  # pad appended ranks (reference packs lora scales per 16 ranks)


def _pad_rank(a: np.ndarray, axis: int) -> np.ndarray:
    r = a.shape[axis]
    pad = (-r) % RANK_PAD
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return np.pad(a, widths)


def _extend_svdq(lin, a: np.ndarray, b_mat: np.ndarray, strength: float):
    """Concat LoRA (A (r, K), B (N, r)) onto the SVD branch of a linear.

    The *unit-strength* appended proj_up rows are kept in ``lora_up_unit``
    so ``set_lora_strength`` can later SET the appended region to
    ``unit * strength`` — absolute semantics matching the reference's
    ``setLoraScale`` (csrc/flux.h:177-198), where repeated calls do not
    compound."""
    a = _pad_rank(a, 0)
    b_mat = _pad_rank(b_mat, 1)
    unit = jnp.asarray(b_mat.T, lin.proj_up.dtype)  # (r_pad, N)
    pd = jnp.concatenate(
        [lin.proj_down, jnp.asarray(a.T, lin.proj_down.dtype)], axis=1
    )
    pu = jnp.concatenate([lin.proj_up, unit * strength], axis=0)
    new = jax.tree_util.tree_map(lambda x: x, lin)  # shallow copy via pytree
    new.proj_down = pd
    new.proj_up = pu
    new.rank = pd.shape[1]
    prev_unit = getattr(lin, "lora_up_unit", None)
    if prev_unit is not None:
        # stacking a second LoRA: the base rank stays where the FIRST
        # append started; unit rows accumulate
        new.lora_up_unit = jnp.concatenate([prev_unit, unit], axis=0)
    else:
        new.lora_base_rank = lin.proj_up.shape[0]
        new.lora_up_unit = unit
    new.register_dynamic("lora_up_unit")
    return new


def _extend_awq(lin, a: np.ndarray, b_mat: np.ndarray, strength: float):
    """AdaLN modulation linears get an explicit low-rank side branch
    (reference GEMV_AWQ lora_down/lora_up, src/Linear.cpp:25-57)."""
    new = jax.tree_util.tree_map(lambda x: x, lin)
    unit = jnp.asarray(b_mat.T, jnp.bfloat16)  # (r, N)
    new.lora_down = jnp.asarray(a.T, jnp.bfloat16)  # (K, r)
    new.lora_up = unit * strength
    new.lora_up_unit = unit
    new.refresh_pytree()  # None fields became arrays
    return new


def update_lora_params(model, lora_state_dict: dict, strength: float = 1.0):
    """Return a new FluxTransformer2DModel with the LoRA folded in.

    Accepts a raw LoRA state dict (any supported flavor) or an
    already-canonical ``{path: (A, B)}`` dict from ``compose_lora``.
    """
    is_canonical = lora_state_dict and all(
        isinstance(v, tuple) and len(v) == 2 for v in lora_state_dict.values()
    )
    # convert at unit strength; strength is applied to the appended proj_up
    # rows only, so set_lora_strength can later retarget it absolutely
    lora = lora_state_dict if is_canonical else to_canonical(lora_state_dict, 1.0)

    # split by stack
    def apply_stack(stacked, stack_name, n_layers, leaf_applier):
        per_layer = [slice_module(stacked, i) for i in range(n_layers)]
        changed = False
        for path, (a, b_mat) in lora.items():
            if not path.startswith(stack_name + "."):
                continue
            _, idx, *leaf = path.split(".")
            leaf = ".".join(leaf)
            if leaf_applier(per_layer[int(idx)], leaf, a, b_mat):
                changed = True
        if not changed:
            return stacked
        # uniform rank/structure required for restacking: pad every layer
        max_rank: dict[str, int] = {}
        awq_rank: dict[str, int] = {}
        svdq_lora: dict[str, int] = {}  # module name -> base rank of the append
        for blk in per_layer:
            for name, mod in blk.modules():
                if hasattr(mod, "proj_down"):
                    max_rank[name] = max(max_rank.get(name, 0), mod.proj_down.shape[1])
                    if getattr(mod, "lora_up_unit", None) is not None:
                        svdq_lora[name] = mod.lora_base_rank
                if hasattr(mod, "wzeros"):
                    r = 0 if mod.lora_down is None else mod.lora_down.shape[1]
                    awq_rank[name] = max(awq_rank.get(name, 0), r)
        for blk in per_layer:
            for name, mod in blk.modules():
                if hasattr(mod, "proj_down"):
                    r = mod.proj_down.shape[1]
                    target = max_rank[name]
                    if r < target:
                        mod.proj_down = jnp.pad(mod.proj_down, ((0, 0), (0, target - r)))
                        mod.proj_up = jnp.pad(mod.proj_up, ((0, target - r), (0, 0)))
                    if name in svdq_lora:
                        # every layer must carry an identically-shaped
                        # lora_up_unit leaf for restacking
                        base = svdq_lora[name]
                        unit = getattr(mod, "lora_up_unit", None)
                        n_app = target - base
                        if unit is None:
                            mod.lora_up_unit = jnp.zeros(
                                (n_app, mod.proj_up.shape[-1]), mod.proj_up.dtype
                            )
                            mod.lora_base_rank = base
                        elif unit.shape[0] < n_app:
                            mod.lora_up_unit = jnp.pad(
                                unit, ((0, n_app - unit.shape[0]), (0, 0))
                            )
                        mod.register_dynamic("lora_up_unit")
                if hasattr(mod, "wzeros") and awq_rank.get(name, 0) > 0:
                    target = awq_rank[name]
                    k_dim, n_dim = mod.in_features, mod.out_features
                    if mod.lora_down is None:
                        mod.lora_down = jnp.zeros((k_dim, target), jnp.bfloat16)
                        mod.lora_up = jnp.zeros((target, n_dim), jnp.bfloat16)
                        mod.lora_up_unit = jnp.zeros((target, n_dim), jnp.bfloat16)
                    elif mod.lora_down.shape[1] < target:
                        pad = target - mod.lora_down.shape[1]
                        mod.lora_down = jnp.pad(mod.lora_down, ((0, 0), (0, pad)))
                        mod.lora_up = jnp.pad(mod.lora_up, ((0, pad), (0, 0)))
                        mod.lora_up_unit = jnp.pad(
                            mod.lora_up_unit, ((0, pad), (0, 0))
                        )
                    mod.refresh_pytree()
        return stack_modules(per_layer)

    def dual_leaf(blk, leaf, a, b_mat):
        return _apply_leaf(blk, leaf, a, b_mat)

    def single_leaf(blk, leaf, a, b_mat):
        if leaf == "proj_out":
            # split the fused single-block output LoRA: K = dim | 4*dim
            dim = blk.attn_out.in_features
            _apply_leaf(blk, "attn_out", a[:, :dim], b_mat)
            _apply_leaf(blk, "mlp_fc2", a[:, dim:], b_mat)
            return True
        if leaf == "qkv_mlp_fused":
            # bfl linear1 = [qkv | mlp_fc1] on the output side
            n_qkv = blk.attn.to_qkv.out_features
            _apply_leaf(blk, "attn.to_qkv", a, b_mat[:n_qkv])
            _apply_leaf(blk, "mlp_fc1", a, b_mat[n_qkv:])
            return True
        return _apply_leaf(blk, leaf, a, b_mat)

    def _apply_leaf(blk, leaf, a, b_mat):
        obj = blk
        parts = leaf.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p, None)
            if obj is None:
                return False
        name = parts[-1]
        lin = getattr(obj, name, None)
        if lin is None:
            return False
        if hasattr(lin, "proj_down"):
            setattr(obj, name, _extend_svdq(lin, a, b_mat, strength))
            return True
        if hasattr(lin, "wzeros"):
            setattr(obj, name, _extend_awq(lin, a, b_mat, strength))
            return True
        if hasattr(lin, "weight"):  # plain linear: fold directly (strength
            # baked in — set_lora_strength cannot retarget folded weights)
            w = lin.weight.astype(jnp.float32) + strength * jnp.asarray((b_mat @ a).T)
            lin.weight = w.astype(lin.weight.dtype)
            return True
        return False

    new = jax.tree_util.tree_map(lambda x: x, model)
    new.transformer_blocks = apply_stack(
        model.transformer_blocks, "transformer_blocks", model.cfg.num_layers, dual_leaf
    )
    new.single_transformer_blocks = apply_stack(
        model.single_transformer_blocks,
        "single_transformer_blocks",
        model.cfg.num_single_layers,
        single_leaf,
    )
    return new


def set_lora_strength(model, strength: float):
    """SET the LoRA scale to an absolute value (skip the base SVD ranks).

    Matches the reference's ``setLoraScale`` (csrc/flux.h:177-198 /
    transformer_flux.py:834-855): repeated calls do NOT compound —
    ``set_lora_strength(m, 0.5)`` then ``(_, 1.0)`` equals setting 1.0 once.
    Implemented by re-materializing the appended proj_up rows from the
    stored unit-strength copy (``lora_up_unit``, kept by
    ``update_lora_params``)."""
    new = jax.tree_util.tree_map(lambda x: x, model)

    def scale_stack(stacked):
        for name, m in stacked.modules():
            unit = getattr(m, "lora_up_unit", None)
            if unit is None:
                continue
            if hasattr(m, "proj_up"):  # SVDQ linear: appended SVD-branch rows
                base = m.lora_base_rank
                m.proj_up = m.proj_up.at[..., base:, :].set(
                    (unit * strength).astype(m.proj_up.dtype)
                )
            elif getattr(m, "lora_up", None) is not None:  # AWQ side branch
                m.lora_up = (unit * strength).astype(m.lora_up.dtype)
        return stacked

    new.transformer_blocks = scale_stack(
        jax.tree_util.tree_map(lambda x: x, model.transformer_blocks)
    )
    new.single_transformer_blocks = scale_stack(
        jax.tree_util.tree_map(lambda x: x, model.single_transformer_blocks)
    )
    return new
