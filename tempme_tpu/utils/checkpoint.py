"""Checkpointing: flax msgpack param blobs + JSON meta sidecars.

Replaces the reference's whole-module torch pickles
(learn_base.py:271-278, loaded with weights_only=False at
temp_exp_main.py:702). We store (params pytree, meta dict) so checkpoints are
framework-stable and shardable; Orbax-based sharded checkpointing for the
distributed path lives in parallel/checkpoint.py.
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Optional, Tuple

from flax import serialization


def save_params(path: str, params, meta: Optional[dict] = None) -> None:
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=1)


def load_params(path: str, template) -> Any:
    """Restore params into the structure of ``template`` (e.g. model.init output)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_meta(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)


def load_checkpoint(path: str, template) -> Tuple[Any, dict]:
    return load_params(path, template), load_meta(path)
