"""Jitted train/eval step factories for the base TGNN models.

One jit region per step covering negative sampling + k-hop subgraph sampling +
forward + backward + optimizer — the whole per-batch pipeline that the
reference runs as Python loops with host<->device ping-pong
(learn_base.py:207-253). This is where the TPU build's throughput comes from.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.graph import TemporalGraph
from ..models.common import Features
from ..ops import sampler as S


class Batch(NamedTuple):
    src: jnp.ndarray     # [B] int32
    dst: jnp.ndarray     # [B] int32
    ts: jnp.ndarray      # [B] float32
    eidx: jnp.ndarray    # [B] int32
    mask: jnp.ndarray    # [B] bool (False = padding row in final partial batch)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    key: jnp.ndarray


def bce_with_logits(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def masked_bce_with_logits(logits, labels, mask):
    """BCE averaged over valid rows only (padded final batches)."""
    per = optax.sigmoid_binary_cross_entropy(logits.squeeze(-1), labels)
    m = mask.astype(per.dtype)
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


def mask_batch_nodes(batch: "Batch") -> "Batch":
    """Remap padded rows to the reserved padding ids (node 0 / edge 0) so a
    stateful consumer (TGN memory) routes their stores to row 0, which
    ``scrub_padding_row`` then clears. Without this, a drop_remainder=False
    final batch would scatter duplicate real messages into memory
    (ADVICE r2: iter_global_batches pads with index 0 = the first real
    event)."""
    m = batch.mask
    z = jnp.zeros((), batch.src.dtype)
    return Batch(src=jnp.where(m, batch.src, z),
                 dst=jnp.where(m, batch.dst, z),
                 ts=jnp.where(m, batch.ts, jnp.zeros((), batch.ts.dtype)),
                 eidx=jnp.where(m, batch.eidx, z),
                 mask=m)


def scrub_padding_row(mem):
    """Clear TGN memory row 0 (the padding node). Padding stores are routed
    there by ``mask_batch_nodes``; the row must stay identically zero so
    padded support positions keep zero keys/values."""
    return mem._replace(
        memory=mem.memory.at[0].set(0.0),
        last_update=mem.last_update.at[0].set(0.0),
        msg_buf=mem.msg_buf.at[0].set(0.0),
        msg_ts=mem.msg_ts.at[0].set(0.0),
        msg_valid=mem.msg_valid.at[0].set(False))


def sample_support(g: TemporalGraph, key, batch: Batch, dst_table: jnp.ndarray,
                   k: int, n: int, use_eidx: bool = True):
    """Negatives + 3x k-hop subgraphs, all on device.

    ``use_eidx=False`` (all base-model training/eval paths) cuts history at
    the batch timestamp, matching the reference's ``grab_subgraph`` which
    passes ``e_idx_l=None`` for all three models (learn_base.py:224-226,
    TGN/tgn.py:283-284, GraphM/graphmixer.py:232-234).  ``use_eidx=True``
    cuts hop-0 at the batch event's own edge (e-path), matching the offline
    preprocessing / explainer walk paths which do pass ``e_idx``
    (processed/data_preprocess.py:112-117).
    """
    kn, k1, k2, k3 = jax.random.split(key, 4)
    neg_idx = jax.random.randint(kn, batch.src.shape, 0, dst_table.shape[0])
    bgd = dst_table[neg_idx]
    eidx = batch.eidx if use_eidx else None
    sub_src = S.find_k_hop(g, k1, batch.src, batch.ts, k, n, eids=eidx)
    sub_tgt = S.find_k_hop(g, k2, batch.dst, batch.ts, k, n, eids=eidx)
    sub_bgd = S.find_k_hop(g, k3, bgd, batch.ts, k, n, eids=None)
    return bgd, sub_src, sub_tgt, sub_bgd


def make_base_train_step(model, g_train: TemporalGraph, feats: Features,
                         dst_table: jnp.ndarray, k: int, n: int,
                         optimizer: optax.GradientTransformation,
                         use_eidx: bool = False):
    """Returns jitted ``step(state, batch) -> (state, aux)`` for stateless
    models (TGAT / GraphMixer)."""

    @jax.jit
    def step(state: TrainState, batch: Batch):
        key, k_samp, k_drop = jax.random.split(state.key, 3)
        bgd, s_src, s_tgt, s_bgd = sample_support(
            g_train, k_samp, batch, dst_table, k, n, use_eidx)

        def loss_fn(params):
            pos, neg = model.apply(
                params, feats, batch.src, batch.dst, bgd, batch.ts,
                s_src, s_tgt, s_bgd, deterministic=False,
                rngs={"dropout": k_drop})
            loss = (bce_with_logits(pos, jnp.ones_like(pos))
                    + bce_with_logits(neg, jnp.zeros_like(neg)))
            return loss, (pos, neg)

        (loss, (pos, neg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, key), {
            "loss": loss, "pos": pos.squeeze(-1), "neg": neg.squeeze(-1)}

    return step


def make_base_eval_step(model, g_full: TemporalGraph, feats: Features,
                        dst_table: jnp.ndarray, k: int, n: int,
                        use_eidx: bool = False):
    @jax.jit
    def step(params, key, batch: Batch):
        bgd, s_src, s_tgt, s_bgd = sample_support(
            g_full, key, batch, dst_table, k, n, use_eidx)
        pos, neg = model.apply(params, feats, batch.src, batch.dst, bgd,
                               batch.ts, s_src, s_tgt, s_bgd,
                               deterministic=True)
        return pos.squeeze(-1), neg.squeeze(-1)

    return step


def stack_batches(events, batch_size: int, shuffle: bool, seed: int):
    """All full batches of an epoch as one [K, B] Batch (device-resident),
    for scan-based epoch execution."""
    import numpy as np
    n = len(events)
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    k = n // batch_size
    idx = idx[:k * batch_size].reshape(k, batch_size)
    return Batch(
        src=jnp.asarray(events.src[idx]),
        dst=jnp.asarray(events.dst[idx]),
        ts=jnp.asarray(events.ts[idx]),
        eidx=jnp.asarray(events.e_idx[idx]),
        mask=jnp.ones((k, batch_size), bool),
    )


def make_base_train_epoch(step_fn):
    """Wrap a per-batch train step into a jitted lax.scan over stacked batches:
    one dispatch per epoch chunk instead of one per batch (kills host/dispatch
    latency, which dominates at these model sizes)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state, batches: Batch):
        def body(state, batch):
            state, aux = step_fn(state, batch)
            return state, aux
        return jax.lax.scan(body, state, batches)

    return epoch


def make_tgn_train_epoch(step_fn):
    # When the step exposes its graph/feature tables (make_tgn_train_step),
    # thread them as runtime arguments of the epoch program too — otherwise
    # the scan body re-embeds them as serialized-program constants, which is
    # exactly what the unbound step form exists to avoid (large graphs).
    inner = getattr(step_fn, "with_tables", None)
    if inner is not None:
        tables = step_fn.tables

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def epoch_t(g, feats, state, mem, batches: Batch):
            def body(carry, batch):
                state, mem = carry
                state, mem, aux = inner(g, feats, state, mem, batch)
                return (state, mem), aux
            (state, mem), auxs = jax.lax.scan(body, (state, mem), batches)
            return state, mem, auxs

        def epoch(state, mem, batches):
            return epoch_t(*tables, state, mem, batches)

        return epoch

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(state, mem, batches: Batch):
        def body(carry, batch):
            state, mem = carry
            state, mem, aux = step_fn(state, mem, batch)
            return (state, mem), aux
        (state, mem), auxs = jax.lax.scan(body, (state, mem), batches)
        return state, mem, auxs
    return epoch


def iter_batches(events, batch_size: int, shuffle: bool, seed: int,
                 drop_remainder: bool):
    """Fixed-shape batches (padded final batch carries a validity mask)."""
    import numpy as np
    n = len(events)
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for s in range(0, n, batch_size):
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
        yield Batch(
            src=jnp.asarray(events.src[chunk]),
            dst=jnp.asarray(events.dst[chunk]),
            ts=jnp.asarray(events.ts[chunk]),
            eidx=jnp.asarray(events.e_idx[chunk]),
            mask=jnp.asarray(mask),
        )
