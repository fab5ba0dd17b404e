"""Minimal, dependency-free safetensors reader/writer (numpy + mmap).

Counterpart of the reference's C++ mmap loader (src/Serialization.cpp:117-252:
header parse/validate + zero-copy mapping; NUNCHAKU_LOAD_METHOD fallbacks are
CUDA-pinning tricks that have no TPU analogue — np.memmap covers the
zero-copy read path here). Also understands the metadata convention used by
nunchaku checkpoints: ``__metadata__`` string keys ``config`` and
``quantization_config`` (nunchaku/models/transformers/utils.py:32-60).
"""

from __future__ import annotations

import json
import mmap
import os
import struct

import numpy as np
import ml_dtypes

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "BOOL": np.bool_,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


class SafeTensors:
    """Lazy zero-copy view over a .safetensors file."""

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        with open(self.path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        self.metadata: dict[str, str] = header.pop("__metadata__", {}) or {}
        self._entries = header
        self._data_offset = 8 + hlen
        self._mm = np.memmap(self.path, mode="r", dtype=np.uint8)

    def keys(self):
        return self._entries.keys()

    def __contains__(self, name):
        return name in self._entries

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy numpy view of one tensor."""
        e = self._entries[name]
        dt = np.dtype(_DTYPES[e["dtype"]])
        start, end = e["data_offsets"]
        buf = self._mm[self._data_offset + start : self._data_offset + end]
        return buf.view(dt).reshape(e["shape"])

    def items(self):
        for k in self._entries:
            yield k, self.tensor(k)


def load_safetensors(path) -> tuple[dict[str, np.ndarray], dict[str, str]]:
    st = SafeTensors(path)
    return dict(st.items()), st.metadata


def save_safetensors(path, tensors: dict[str, np.ndarray], metadata: dict[str, str] | None = None):
    """Write a .safetensors file (little-endian, C-contiguous)."""
    entries = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        dt = _DTYPE_NAMES[np.dtype(arr.dtype)]
        nb = arr.nbytes
        entries[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nb],
        }
        blobs.append(arr)
        offset += nb
    header: dict = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    header.update(entries)
    hjson = json.dumps(header).encode()
    pad = (-len(hjson)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for arr in blobs:
            f.write(arr.tobytes())
