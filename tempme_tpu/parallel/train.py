"""Sharded train-step factory: the full TGN training step (negative sampling +
k-hop sampling + memory advance + attention pyramid + fwd/bwd + Adam) compiled
once over a ('dp','sp','tp') mesh.

The program is written globally; sharding annotations make XLA insert the
collectives (gradient psum over dp; all-to-all / all-gather for the row-sharded
memory table and tp-sharded feature tables). No NCCL-style hand-written
communication, per the TPU-native design (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.graph import TemporalGraph
from ..models.common import Features
from ..models.tgn import TGN, TGNMemoryState
from ..train import loops
from . import mesh as M


def constrain_support(sub, mesh):
    """Anchor the support axes: batch over dp, neighbor axis over sp."""
    spec = NamedSharding(mesh, P("dp", "sp"))

    def c(x):
        return jax.lax.with_sharding_constraint(x, spec)

    return type(sub)(tuple(c(x) for x in sub.nodes),
                     tuple(c(x) for x in sub.eids),
                     tuple(c(x) for x in sub.ts))


def make_sharded_tgn_train_step(model: TGN, g: TemporalGraph,
                                feats: Features, dst_table, n: int,
                                optimizer, mesh):
    """Returns (step, place) where ``place(params, opt_state, mem, batch)``
    device_puts state with the mesh's shardings and ``step`` is the sharded
    jitted train step."""
    repl = M.replicated(mesh)
    bsh = M.batch_sharding(mesh)
    msh = M.memory_sharding(mesh)

    def place(params, opt_state, mem, key):
        params = M.shard_params_tp(params, mesh)
        opt_state = jax.device_put(opt_state, repl)
        mem = TGNMemoryState(
            memory=jax.device_put(mem.memory, msh),
            last_update=jax.device_put(mem.last_update, repl),
            msg_buf=jax.device_put(mem.msg_buf, msh),
            msg_ts=jax.device_put(mem.msg_ts, repl),
            msg_valid=jax.device_put(mem.msg_valid, repl),
        )
        key = jax.device_put(key, repl)
        return params, opt_state, mem, key

    def place_batch(batch: loops.Batch) -> loops.Batch:
        return loops.Batch(*(jax.device_put(x, bsh) for x in batch))

    @jax.jit
    def step(params, opt_state, mem, key, batch: loops.Batch):
        new_key, k_samp, k_drop = jax.random.split(key, 3)
        bgd, s_src, s_tgt, s_bgd = loops.sample_support(
            g, k_samp, batch, dst_table, model.n_layers, n)
        s_src = constrain_support(s_src, mesh)
        s_tgt = constrain_support(s_tgt, mesh)
        s_bgd = constrain_support(s_bgd, mesh)

        def loss_fn(ps):
            (pos, neg), new_mem = model.apply(
                ps, feats, mem, batch.src, batch.dst, bgd, batch.ts,
                batch.eidx, s_src, s_tgt, s_bgd, deterministic=False,
                rngs={"dropout": k_drop}, method=TGN.contrast)
            loss = (loops.bce_with_logits(pos, jnp.ones_like(pos))
                    + loops.bce_with_logits(neg, jnp.zeros_like(neg)))
            return loss, new_mem

        (loss, new_mem), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, new_mem, new_key, loss

    return step, place, place_batch
