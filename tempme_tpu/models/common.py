"""Shared model-facing containers and the framework's base-model contract.

The reference's duck-typed API (SURVEY.md §2.2: ``grab_subgraph``,
``contrast``, ``get_node_emb``, ``set_neighbor_sampler``, frozen feature
embeddings with padding idx 0) becomes:

* ``Features`` — frozen node/edge feature tables passed explicitly through
  apply (device-resident, shardable; row 0 is the zero padding row),
* models are pure flax modules taking (features, batch arrays, Subgraph)s,
* sampling lives in ``ops.sampler`` and composes with the model inside one
  jitted train step (no host round-trips, unlike the reference's per-batch
  ``torch.from_numpy(...).to(device)`` pattern, TGAT/TGAT.py:646-650).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Features(NamedTuple):
    node: jnp.ndarray   # [N, Dn] float32, row 0 = padding zeros
    edge: jnp.ndarray   # [E, De] float32, row 0 = padding zeros


def gather_node(feats: Features, idx: jnp.ndarray) -> jnp.ndarray:
    return feats.node[idx]


def gather_edge(feats: Features, idx: jnp.ndarray) -> jnp.ndarray:
    return feats.edge[idx]
