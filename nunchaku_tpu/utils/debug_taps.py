"""Named intermediate-tensor capture (layerwise debugging).

Counterpart of the reference's debug-tap system (src/Module.h:187-199
startDebug/getDebugResults + debug(name, tensor) call sites): capture named
intermediates from inside jitted graphs for layerwise diffing against a
reference implementation — the first tool to reach for when a real
checkpoint produces a bad image.

Usage::

    with capture_taps() as taps:
        out = jax.jit(model)(x, ...)   # or an un-jitted call
    taps["dual.attn_img"]  # list of per-layer arrays (scan order)

``tap(name, x)`` is an identity everywhere; when capture is active it
attaches a ``jax.debug.callback`` that copies the value to host. Whether
capture is active is decided at TRACE time, so enabling it around an
already-compiled function triggers a retrace — expected for a debug mode
(the reference equally rebuilds with debug buffers).

Inside ``lax.scan`` the callback fires once per iteration, so a tapped
stacked-block value shows up as one list entry per layer, in order.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax

_CAPTURE: dict | None = None


def tap(name: str, x):
    """Identity; records ``x`` under ``name`` when capture is active."""
    if _CAPTURE is None:
        return x

    def _store(v, name=name):
        if _CAPTURE is not None:
            _CAPTURE.setdefault(name, []).append(np.asarray(v))

    jax.debug.callback(_store, x)
    return x


def taps_active() -> bool:
    return _CAPTURE is not None


@contextlib.contextmanager
def capture_taps():
    """Enable capture; yields the dict that fills with {name: [arrays]}."""
    global _CAPTURE
    prev = _CAPTURE
    _CAPTURE = {}
    try:
        yield _CAPTURE
    finally:
        _CAPTURE = prev


def summarize(taps: dict) -> dict:
    """{name: [(shape, mean, std, amax)]} quick-look statistics."""
    out = {}
    for name, vals in taps.items():
        out[name] = [
            (tuple(v.shape), float(v.astype(np.float32).mean()),
             float(v.astype(np.float32).std()),
             float(np.abs(v.astype(np.float32)).max()))
            for v in vals
        ]
    return out
