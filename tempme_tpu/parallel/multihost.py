"""Multi-host SPMD: process initialization + edge-partitioned input pipeline.

No reference counterpart (single hard-coded GPU, learn_base.py:155-172;
no torch.distributed/NCCL anywhere — SURVEY.md §5.8): this layer is what makes
the framework run one program over N hosts x M chips.

Design (TPU-native, scaling-book recipe):

* ``initialize()`` wraps ``jax.distributed.initialize`` — after it, every
  process sees the global device set and jit-compiled programs run SPMD with
  XLA inserting ICI/DCN collectives from the shardings.
* The event stream is **edge-partitioned by batch position**: every process
  computes the identical global shuffle (same seed), and feeds only its
  contiguous slice of each global batch (``local_slice``); the global
  [B]-shaped batch arrays are assembled with
  ``jax.make_array_from_process_local_data`` — no host ever materializes
  another host's events.
* TGN memory stays a *global* [N, D] array sharded over the mesh
  (``mesh.memory_sharding``); cross-host message routing is the all-to-all
  XLA inserts for the scatter in ``TGN._store_messages`` — semantics are the
  sequential last-message-wins reduction, tested in test_parallel.py
  (single-process mesh) and test_multihost.py (2 processes).
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..data.events import EventStream
from ..train import loops


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """``jax.distributed.initialize`` with env-var fallbacks.

    On TPU pods the arguments are auto-detected; on CPU/GPU clusters pass
    them (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID). Must be called before any jax device access.
    """
    kw = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (coordinator_address or
                                     os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(num_processes if num_processes is not None
                                  else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(process_id if process_id is not None
                               else os.environ["JAX_PROCESS_ID"])
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)


def local_slice(batch_size: int, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> slice:
    """This process's contiguous slice of every global [B] batch."""
    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    assert batch_size % pc == 0, (batch_size, pc)
    per = batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def iter_global_batches(events: EventStream, batch_size: int, mesh,
                        shuffle: bool, seed: int, drop_remainder: bool = True,
                        ) -> Iterator[loops.Batch]:
    """Edge-partitioned multi-host batch stream.

    Every process runs this with identical arguments; each yields *global*
    jax.Arrays of shape [B] whose addressable shards hold only this process's
    slice. Single-process: equivalent to ``loops.iter_batches`` with
    device-sharded output.

    With ``drop_remainder=False`` the final chunk is padded with index 0 and
    ``mask=False``; the TGN train/eval steps remap masked rows to the padding
    node and scrub memory row 0 (``loops.mask_batch_nodes`` /
    ``scrub_padding_row``), so padded batches cannot store duplicate real
    messages (ADVICE r2).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp"))
    n = len(events)
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    sl = local_slice(batch_size)

    def globalize(x):
        return jax.make_array_from_process_local_data(sharding, x[sl])

    stop = (n - batch_size + 1) if drop_remainder else n
    for s in range(0, stop, batch_size):
        chunk = idx[s:s + batch_size]
        if len(chunk) < batch_size:
            if drop_remainder:
                return
            pad = np.zeros(batch_size - len(chunk), np.int64)
            mask = np.r_[np.ones(len(chunk), bool),
                         np.zeros(batch_size - len(chunk), bool)]
            chunk = np.r_[chunk, pad]
        else:
            mask = np.ones(batch_size, bool)
        yield loops.Batch(
            src=globalize(events.src[chunk]),
            dst=globalize(events.dst[chunk]),
            ts=globalize(events.ts[chunk]),
            eidx=globalize(events.e_idx[chunk]),
            mask=globalize(mask),
        )


def host_local_to_global(mesh, spec, x: np.ndarray):
    """Assemble a global array from identical-per-process host data (e.g.
    feature tables): every process contributes its addressable shards."""
    from jax.sharding import NamedSharding
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        x, mesh, spec)


def sync_global_devices(tag: str) -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
