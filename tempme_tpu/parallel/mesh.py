"""Device mesh + sharding rules for SPMD execution.

This layer has no counterpart in the reference (single hard-coded GPU,
learn_base.py:155-172); it is the framework's distribution story per
SURVEY.md §2.10:

* ``dp``  — data parallel: event batches sharded across chips; gradient psum
            rides ICI (inserted by XLA from the sharded jit).
* ``sp``  — "sequence" parallel analog: the neighbor/walk support axis
            ([B, n], [B, n²], [B, W]) is sharded so per-chip HBM holds only a
            slice of the support pyramid; also used to row-shard the TGN
            memory table (the edge-partition analog — cross-shard message
            routing becomes an XLA all-to-all).
* ``tp``  — tensor parallel: feature tables and Dense kernels sharded on the
            feature axis. Feature dims here are small (32-172), so tp defaults
            to 1 and exists as a first-class option.

``pp`` (pipeline) and ``ep`` (expert) axes are intentionally absent: the
models are 2-3 layers deep with no MoE — there is nothing to pipeline or route
(documented unsupported, SURVEY.md §2.10).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "sp", "tp")


def make_mesh(dp: int = 0, sp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """Build a ('dp','sp','tp') mesh. dp=0 means "all remaining devices"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp == 0:
        assert n % (sp * tp) == 0, (n, sp, tp)
        dp = n // (sp * tp)
    assert dp * sp * tp == n, f"mesh {dp}x{sp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, AXES)


def factorize(n: int) -> Tuple[int, int, int]:
    """Default (dp, sp, tp) factorization for n devices: favor dp, give sp a
    factor of 2 when available, tp last."""
    if n == 1:
        return 1, 1, 1
    sp = 2 if n % 2 == 0 else 1
    rem = n // sp
    tp = 2 if rem % 2 == 0 and rem > 2 else 1
    dp = rem // tp
    return dp, sp, tp


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def support_sharding(mesh: Mesh) -> NamedSharding:
    """[B, n_support] arrays: batch over dp, support axis over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def feature_sharding(mesh: Mesh) -> NamedSharding:
    """[N, D] feature tables: feature axis over tp."""
    return NamedSharding(mesh, P(None, "tp"))


def memory_sharding(mesh: Mesh) -> NamedSharding:
    """TGN memory rows sharded over sp (edge-partition analog)."""
    return NamedSharding(mesh, P("sp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh):
    """Shard Dense kernels on their output axis over tp where divisible;
    replicate everything else."""
    tp = mesh.shape["tp"]

    def place(path, x):
        if (tp > 1 and hasattr(x, "ndim") and x.ndim == 2
                and x.shape[-1] % tp == 0 and x.shape[-1] >= 2 * tp):
            return jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, params)
