"""Segment reductions used by the explainer.

Replaces the reference's torch_scatter dependency (models/explainer.py:7,389,443)
with shapes that avoid materializing the dense [B, num_edges] table: the
walk→edge scatter-max is fused with the gather back onto the subgraph's edge
ids, so the working set is [B, n_support, n_walk_slots] instead of [B, E].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def walk_to_edge_max_jnp(walk_edge_ids: jnp.ndarray, walk_imp: jnp.ndarray,
                         target_edge_ids: jnp.ndarray) -> jnp.ndarray:
    """For each target edge id, the max importance over walk slots carrying it.

    walk_edge_ids: [B, S] int32 (S = n_walks * 3 event slots)
    walk_imp:      [B, S] float32
    target_edge_ids: [B, T] int32
    returns:       [B, T] float32 (0 where no walk slot matches — the same
                   fill value torch_scatter's reduce="max" leaves for untouched
                   ids, models/explainer.py:389)
    """
    eq = target_edge_ids[:, :, None] == walk_edge_ids[:, None, :]   # [B,T,S]
    scores = jnp.where(eq, walk_imp[:, None, :], 0.0)
    return jnp.max(scores, axis=-1)


def walk_to_edge_max(walk_edge_ids: jnp.ndarray, walk_imp: jnp.ndarray,
                     target_edge_ids: jnp.ndarray) -> jnp.ndarray:
    """Dispatching form: fused Pallas kernel on TPU, jnp elsewhere."""
    from .pallas import kernels as pk
    if pk.enabled():
        return pk.walk_to_edge_max(walk_edge_ids, walk_imp, target_edge_ids)
    return walk_to_edge_max_jnp(walk_edge_ids, walk_imp, target_edge_ids)


def class_mean(prob: jnp.ndarray, cat: jnp.ndarray, num_classes: int = 12
               ) -> jnp.ndarray:
    """Per-class mean of walk probabilities (scatter-mean,
    models/explainer.py:443): prob [B, W], cat [B, W] -> [B, num_classes],
    0 for empty classes."""
    oh = jax.nn.one_hot(cat, num_classes, dtype=prob.dtype)      # [B, W, C]
    s = jnp.einsum("bw,bwc->bc", prob, oh)
    cnt = oh.sum(axis=1)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)


def edge_cooccurrence_counts(walk_edge_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-walk edge co-occurrence count features
    (processed/data_preprocess.py:327-343 ``new_edge_info``):

    out[b, m, c, c2] = #{walks m' : edge[b, m', c2] == edge[b, m, c]}

    walk_edge_ids: [B, W, 3] -> [B, W, 3, 3] float32. Padding id 0 is counted
    like any other id, matching the reference.
    """
    e = walk_edge_ids
    eq = e[:, :, :, None, None] == e[:, None, None, :, :]   # [B, W, 3, W, 3]
    return eq.sum(axis=3).astype(jnp.float32)               # [B, W, 3, 3]
