"""A minimal pytree-native module system.

Plays the role of the reference's C++ ``Module`` registry (src/Module.h:7-212:
named parameter/children registration, recursive ``loadParams`` with partial
updates for LoRA reload) — but JAX-idiomatic: every ``Module`` **is** a pytree,
so whole models pass directly through ``jax.jit`` / ``jax.device_put`` /
sharding APIs, with parameters as leaves and configuration as static aux data.

Rules:
  * attributes holding ``jax.Array`` / ``numpy.ndarray`` / ``Module`` /
    lists or tuples or dicts of those are *dynamic* (pytree children);
  * everything else (ints, strings, floats, bools, None, tuples of those)
    is *static* and must be hashable — it becomes part of the treedef and
    therefore of the jit cache key.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import jax
import numpy as np


def _is_dynamic(v: Any) -> bool:
    if isinstance(v, (jax.Array, np.ndarray, Module)):
        return True
    if isinstance(v, (list, tuple)) and len(v) > 0:
        return any(_is_dynamic(x) for x in v)
    if isinstance(v, dict) and len(v) > 0:
        return any(_is_dynamic(x) for x in v.values())
    return False


class Module:
    """Base class. Subclasses are automatically registered as pytrees."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls, cls._tree_flatten_with_keys, cls._tree_unflatten
        )

    # -- pytree protocol ----------------------------------------------------
    def _tree_flatten_with_keys(self):
        # Which attributes are pytree children is decided by value on first
        # flatten and then *pinned* (``_dyn_keys``): trees produced by
        # jax.tree.map with non-array leaves (PartitionSpecs, shapes, ...)
        # must keep the identical structure or mapping over (model, specs)
        # pairs breaks.
        pinned = self.__dict__.get("_dyn_keys")
        dyn_keys, dyn_vals, static = [], [], []
        for k in sorted(self.__dict__):
            if k == "_dyn_keys":
                continue
            v = self.__dict__[k]
            if (k in pinned) if pinned is not None else _is_dynamic(v):
                dyn_keys.append(k)
                dyn_vals.append((jax.tree_util.GetAttrKey(k), v))
            else:
                static.append((k, v))
        return dyn_vals, (tuple(dyn_keys), tuple(static))

    @classmethod
    def _tree_unflatten(cls, aux, children):
        dyn_keys, static = aux
        obj = object.__new__(cls)
        for k, v in zip(dyn_keys, children):
            object.__setattr__(obj, k, v)
        for k, v in static:
            object.__setattr__(obj, k, v)
        object.__setattr__(obj, "_dyn_keys", frozenset(dyn_keys))
        return obj

    def register_dynamic(self, *names: str) -> None:
        """Add attribute names to the pinned dynamic-children set.

        Modules produced by jax.tree.map (e.g. stack_modules) pin their
        pytree children (``_dyn_keys``); attributes added afterwards would
        otherwise flatten as static aux — arrays would bake into the jit
        treedef instead of riding the scan/jit as leaves."""
        pinned = self.__dict__.get("_dyn_keys")
        if pinned is not None:
            object.__setattr__(self, "_dyn_keys", frozenset(pinned) | set(names))

    # -- parameter registry --------------------------------------------------
    def named_parameters(self, prefix: str = "") -> Iterator[tuple[str, jax.Array]]:
        """Yield ``(dotted_name, array)`` pairs, depth-first."""
        for k in sorted(self.__dict__):
            v = self.__dict__[k]
            name = f"{prefix}{k}"
            yield from _walk(name, v)

    def state_dict(self) -> dict[str, jax.Array]:
        return dict(self.named_parameters())

    def load_state_dict(self, state: dict[str, Any], partial: bool = False) -> None:
        """Assign arrays by dotted name (in place, eager).

        With ``partial=True`` missing keys are skipped (LoRA reload pattern,
        reference: csrc/module.h:39-50 ``loadDict(sd, partial)``).
        """
        own = {name: None for name, _ in self.named_parameters()}
        unknown = [k for k in state if k not in own]
        if unknown:
            raise KeyError(f"unknown parameters: {unknown[:8]}{'...' if len(unknown) > 8 else ''}")
        if not partial:
            missing = [k for k in own if k not in state]
            if missing:
                raise KeyError(f"missing parameters: {missing[:8]}{'...' if len(missing) > 8 else ''}")
        for name, value in state.items():
            _assign(self, name.split("."), value)

    def modules(self, prefix: str = "") -> Iterator[tuple[str, "Module"]]:
        """Yield ``(dotted_name, module)`` for self and all descendants."""
        yield prefix.rstrip("."), self
        for k in sorted(self.__dict__):
            v = self.__dict__[k]
            yield from _walk_modules(f"{prefix}{k}", v)

    def refresh_pytree(self) -> None:
        """Drop the pinned dynamic-key set so the next flatten re-decides.

        Call after an attribute changes 'kind' (e.g. a None field gets an
        array assigned) — otherwise the pinned keys would put the new array
        into static aux data.
        """
        self.__dict__.pop("_dyn_keys", None)

    def update_leaves(self, fn: Callable[[str, jax.Array], jax.Array]) -> None:
        """Apply ``fn(name, leaf) -> leaf`` to every parameter, in place."""
        for name, arr in list(self.named_parameters()):
            _assign(self, name.split("."), fn(name, arr))


def _walk(name: str, v: Any) -> Iterator[tuple[str, jax.Array]]:
    if isinstance(v, (jax.Array, np.ndarray)):
        yield name, v
    elif isinstance(v, Module):
        yield from v.named_parameters(prefix=name + ".")
    elif isinstance(v, (list, tuple)):
        for i, x in enumerate(v):
            yield from _walk(f"{name}.{i}", x)
    elif isinstance(v, dict):
        for k in sorted(v):  # match pytree dict flatten order
            yield from _walk(f"{name}.{k}", v[k])


def _walk_modules(name: str, v: Any) -> Iterator[tuple[str, Module]]:
    if isinstance(v, Module):
        yield from v.modules(prefix=name + ".")
    elif isinstance(v, (list, tuple)):
        for i, x in enumerate(v):
            yield from _walk_modules(f"{name}.{i}", x)
    elif isinstance(v, dict):
        for k, x in v.items():
            yield from _walk_modules(f"{name}.{k}", x)


def _assign(obj: Any, path: list[str], value: Any) -> None:
    head, rest = path[0], path[1:]
    if isinstance(obj, (list,)):
        idx = int(head)
        if rest:
            _assign(obj[idx], rest, value)
        else:
            obj[idx] = value
        return
    if isinstance(obj, dict):
        if rest:
            _assign(obj[head], rest, value)
        else:
            obj[head] = value
        return
    if isinstance(obj, tuple):
        raise TypeError("cannot assign into tuple-valued module field")
    if rest:
        _assign(getattr(obj, head), rest, value)
    else:
        setattr(obj, head, value)
