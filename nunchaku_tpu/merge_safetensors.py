"""Merge legacy two-file nunchaku checkpoints into one file.

Counterpart of nunchaku/merge_safetensors.py:36 (CLI merging
``unquantized_layers.safetensors`` + ``transformer_blocks.safetensors``
plus the json configs into the single-file format with metadata).

Usage:
    python -m nunchaku_tpu.merge_safetensors -i <repo_dir> -o merged.safetensors
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from .utils.safetensors import load_safetensors, save_safetensors


def merge(input_dir: Path, output: Path) -> None:
    unq, _ = load_safetensors(input_dir / "unquantized_layers.safetensors")
    q, _ = load_safetensors(input_dir / "transformer_blocks.safetensors")
    tensors = {**unq, **q}
    metadata = {}
    cfg = input_dir / "config.json"
    if cfg.exists():
        metadata["config"] = cfg.read_text()
    comfy = input_dir / "comfy_config.json"
    if comfy.exists():
        metadata["comfy_config"] = comfy.read_text()
    qcfg = input_dir / "quantization_config.json"
    if qcfg.exists():
        metadata["quantization_config"] = qcfg.read_text()
    else:
        metadata.setdefault(
            "quantization_config",
            json.dumps({"weight": {"dtype": "int4", "group_size": 64}}),
        )
    save_safetensors(output, tensors, metadata)
    print(f"merged {len(tensors)} tensors -> {output}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input-path", type=Path, required=True)
    ap.add_argument("-o", "--output-path", type=Path, required=True)
    args = ap.parse_args()
    merge(args.input_path, args.output_path)


if __name__ == "__main__":
    main()
