"""Warn-once logging for silent performance-fallback sites.

Several hot paths have guards that quietly drop to a slower-but-correct
route (e.g. the fused qkv/rope Pallas producer needs head_dim % 128 == 0 on
Mosaic; a non-FLUX head size otherwise loses ~28 ms/step invisibly). Each
such site calls :func:`warn_once` so the first trace of a demoted
configuration logs exactly one ``logging.WARNING`` per process — visible in
server logs, silent afterwards. Guards run at trace time, so the warning
fires when the program is built, not per step.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("nunchaku_tpu")

_seen: set[str] = set()


def warn_once(key: str, message: str) -> None:
    """Log ``message`` at WARNING level once per process for ``key``."""
    if key in _seen:
        return
    _seen.add(key)
    logger.warning(message)


def reset_warnings() -> None:
    """Forget fired warnings (test helper)."""
    _seen.clear()
