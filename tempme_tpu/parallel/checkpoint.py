"""Sharded checkpointing on a device mesh (Orbax).

No reference counterpart (the reference pickles whole modules on one GPU,
learn_base.py:271-278); this is the distributed half of the framework's
checkpoint story (SURVEY.md §5.4): save a sharded train-state pytree from an
SPMD run and restore it onto a (possibly different) mesh with the target
shardings, so multi-chip training can stop and resume without gathering
everything to one host.

The single-process msgpack path for driver checkpoints lives in
``utils/checkpoint.py``; this module is for mesh-placed state.
"""
from __future__ import annotations

import os.path as osp
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_sharded(ckpt_dir: str, state: Any, step: int) -> str:
    """Save a (possibly sharded) pytree under ``ckpt_dir/step_{step}``.

    Works for replicated and mesh-sharded arrays alike: Orbax records each
    leaf's global shape + sharding and writes per-shard data.
    """
    path = osp.abspath(osp.join(ckpt_dir, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    return path


def restore_sharded(ckpt_dir: str, step: int, template: Any,
                    mesh=None, sharding_fn=None) -> Any:
    """Restore ``step``'s pytree.

    ``template`` provides structure/shape/dtype. If ``mesh`` and
    ``sharding_fn(path, leaf) -> NamedSharding`` are given, leaves are
    restored directly into those shardings (resharding on the fly if the
    saved layout differs); otherwise they restore with the template's own
    shardings.
    """
    path = osp.abspath(osp.join(ckpt_dir, f"step_{step}"))

    def abstract(path_keys, x):
        sharding = None
        if sharding_fn is not None:
            sharding = sharding_fn(path_keys, x)
        elif hasattr(x, "sharding"):
            sharding = x.sharding
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    target = jax.tree_util.tree_map_with_path(abstract, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def latest_step(ckpt_dir: str) -> int | None:
    """Highest saved step in ``ckpt_dir`` (None if empty/missing)."""
    import os
    if not osp.isdir(ckpt_dir):
        return None
    steps = [int(d[len("step_"):]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and d[len("step_"):].isdigit()]
    return max(steps) if steps else None
