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
        # padded rows (drop_remainder=False multihost batches) route to the
        # padding node and are excluded from the loss (ADVICE r2)
        batch = loops.mask_batch_nodes(batch)
        # use_eidx=False: the TGN base path cuts history at the batch
        # timestamp (TGN/tgn.py:283-284 passes e_idx_l=None), matching
        # learn_tgn.make_tgn_train_step — with the default e-path cut the
        # sharded step would sample different supports than the sequential
        # step and store different raw messages (round-2 msg_buf divergence).
        bgd, s_src, s_tgt, s_bgd = loops.sample_support(
            g, k_samp, batch, dst_table, model.n_layers, n, use_eidx=False)
        s_src = constrain_support(s_src, mesh)
        s_tgt = constrain_support(s_tgt, mesh)
        s_bgd = constrain_support(s_bgd, mesh)

        def loss_fn(ps):
            (pos, neg), new_mem = model.apply(
                ps, feats, mem, batch.src, batch.dst, bgd, batch.ts,
                batch.eidx, s_src, s_tgt, s_bgd, deterministic=False,
                rngs={"dropout": k_drop}, method=TGN.contrast)
            loss = (loops.masked_bce_with_logits(
                        pos, jnp.ones(pos.shape[0]), batch.mask)
                    + loops.masked_bce_with_logits(
                        neg, jnp.zeros(neg.shape[0]), batch.mask))
            return loss, new_mem

        (loss, new_mem), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        new_mem = loops.scrub_padding_row(new_mem)
        return params2, opt_state2, new_mem, new_key, loss

    return step, place, place_batch


def constrain_walks(walks, mesh):
    """Anchor walk arrays [B, W, ...]: batch over dp, walk axis over sp
    (the sequence-parallel analog of SURVEY.md §5.7: 90 walks/side)."""
    def c(x):
        spec = P("dp", "sp", *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return type(walks)(*(c(x) for x in walks))


def make_sharded_explainer_train_step(explainer, contrast, g: TemporalGraph,
                                      feats: Features, dst_table,
                                      n_degree: int, null_dist, optimizer,
                                      mesh, beta: float = 0.5,
                                      prior_p: float = 0.3):
    """The TempME explainer train step (the flagship pipeline: triple
    walk sampling + frozen base contrast + scatter-max + Beta rsample +
    re-contrast + KL), compiled over the ('dp','sp','tp') mesh.

    ``contrast`` is a frozen-base contrast fn from
    ``train.temp_exp_main.make_base_contrast``; ``explainer`` is a TempME
    (tgn/graphmixer) OR TempMETGAT instance whose params the step optimizes
    (dispatch on the class — their importance-forward signatures differ,
    models/explainer.py:174 vs :513). Batch rides dp; walk (W=90) and support
    (n, n²) axes ride sp; explainer params are small and stay replicated
    (tp shards the feature tables only).

    Returns (step, place, place_batch).
    """
    from ..explain.tempme import kl_sparsity_loss
    from ..explain.tempme_tgat import TempMETGAT
    from ..train.temp_exp_main import sample_explainer_inputs

    cls = type(explainer)
    is_tgat = isinstance(explainer, TempMETGAT)
    repl = M.replicated(mesh)
    bsh = M.batch_sharding(mesh)

    def place(exp_params, opt_state, key):
        return (jax.device_put(exp_params, repl),
                jax.device_put(opt_state, repl),
                jax.device_put(key, repl))

    def place_batch(batch: loops.Batch) -> loops.Batch:
        return loops.Batch(*(jax.device_put(x, bsh) for x in batch))

    def apply_imps(ep, walks, batch, bgd, drop_key):
        sides = [(walks[0], batch.src, batch.dst),
                 (walks[1], batch.dst, batch.src),
                 (walks[2], bgd, batch.src)]
        out = []
        for i, (w, a, b) in enumerate(sides):
            rngs = {"dropout": jax.random.fold_in(drop_key, i)}
            if is_tgat:
                out.append(explainer.apply(ep, feats, w, a, batch.ts, b,
                                           deterministic=False, rngs=rngs))
            else:
                out.append(explainer.apply(ep, feats, w, batch.ts,
                                           deterministic=False, rngs=rngs))
        return out

    @jax.jit
    def step(exp_params, opt_state, key, batch: loops.Batch):
        k_samp, k_drop, k_beta, k_next = jax.random.split(key, 4)
        bgd, subs, walks = sample_explainer_inputs(g, k_samp, batch,
                                                   dst_table, n_degree)
        subs = tuple(constrain_support(s, mesh) for s in subs)
        walks = tuple(constrain_walks(w, mesh) for w in walks)
        pos_ori, neg_ori = contrast(batch.src, batch.dst, bgd, batch.ts,
                                    batch.eidx, *subs, None)
        y_ori = (jnp.concatenate([pos_ori, neg_ori]) > 0.0).astype(jnp.float32)

        def loss_fn(ep):
            imps = apply_imps(ep, walks, batch, bgd, k_drop)
            explanation = explainer.apply(
                ep, feats, subs[0], imps[0], walks[0], subs[1], imps[1],
                walks[1], subs[2], imps[2], walks[2], training=True,
                deterministic=False,
                rngs={"sample": k_beta,
                      "dropout": jax.random.fold_in(k_drop, 7)},
                method=cls.retrieve_explanation)
            pos, neg = contrast(batch.src, batch.dst, bgd, batch.ts,
                                batch.eidx, *subs, explanation)
            pred = jnp.concatenate([pos, neg])
            pred_loss = optax.sigmoid_binary_cross_entropy(pred, y_ori).mean()
            kl = sum(kl_sparsity_loss(imps[i], walks[i].cat, null_dist,
                                      target=prior_p) for i in range(3))
            return pred_loss + beta * kl

        loss, grads = jax.value_and_grad(loss_fn)(exp_params)
        updates, opt_state2 = optimizer.update(grads, opt_state, exp_params)
        exp_params2 = optax.apply_updates(exp_params, updates)
        return exp_params2, opt_state2, k_next, loss

    return step, place, place_batch


def make_sharded_enhance_train_step(base, predictor, g: TemporalGraph,
                                    feats: Features, dst_table,
                                    n_degree: int, node_degree, optimizer,
                                    mesh):
    """The enhance stage (reference enhance_main.py:276-366) over the mesh:
    joint {base, predictor} optimization, fresh walk sampling, base
    ``get_node_emb`` + motif-level ``enhance_predict_agg`` -> BCE on true
    labels. TGN memory rides the row-sharded memory table (msh); batch rides
    dp; walk/support axes ride sp.

    ``base`` is a train.base_loader.LoadedBase (tgn or graphmixer).
    Returns (step, place, place_batch)."""
    from ..explain.tempme import TempME
    from ..train.temp_exp_main import sample_explainer_inputs

    is_tgn = base.base_type == "tgn"
    repl = M.replicated(mesh)
    bsh = M.batch_sharding(mesh)
    msh = M.memory_sharding(mesh)

    def place(all_params, opt_state, mem, key):
        all_params = {"base": M.shard_params_tp(all_params["base"], mesh),
                      "predictor": jax.device_put(all_params["predictor"],
                                                  repl)}
        opt_state = jax.device_put(opt_state, repl)
        if mem is not None:
            mem = mem._replace(
                memory=jax.device_put(mem.memory, msh),
                last_update=jax.device_put(mem.last_update, repl),
                msg_buf=jax.device_put(mem.msg_buf, msh),
                msg_ts=jax.device_put(mem.msg_ts, repl),
                msg_valid=jax.device_put(mem.msg_valid, repl))
        return all_params, opt_state, mem, jax.device_put(key, repl)

    def place_batch(batch: loops.Batch) -> loops.Batch:
        return loops.Batch(*(jax.device_put(x, bsh) for x in batch))

    @jax.jit
    def step(params, opt_state, mem, key, batch: loops.Batch):
        k_samp, k_drop1, k_drop2, k_next = jax.random.split(key, 4)
        bgd, subs, walks = sample_explainer_inputs(g, k_samp, batch,
                                                   dst_table, n_degree)
        subs = tuple(constrain_support(s, mesh) for s in subs)
        walks = tuple(constrain_walks(w, mesh) for w in walks)

        def loss_fn(ps):
            if is_tgn:
                (s, t, b), new_mem = base.model.apply(
                    ps["base"], feats, mem, batch.src, batch.dst, bgd,
                    batch.ts, batch.eidx, *subs, update_memory=True,
                    deterministic=False, rngs={"dropout": k_drop1},
                    method=type(base.model).get_node_emb)
            else:
                s, t, b = base.model.apply(
                    ps["base"], feats, batch.src, batch.dst, bgd, batch.ts,
                    *subs, deterministic=False, rngs={"dropout": k_drop1},
                    method=type(base.model).get_node_emb)
                new_mem = mem
            pos, neg = predictor.apply(
                ps["predictor"], feats, batch.ts, walks[0], walks[1],
                walks[2], s, t, b, node_degree=node_degree,
                deterministic=False, rngs={"dropout": k_drop2},
                method=TempME.enhance_predict_agg)
            loss = (optax.sigmoid_binary_cross_entropy(
                        pos, jnp.ones_like(pos)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        neg, jnp.zeros_like(neg)).mean())
            return loss, new_mem

        (loss, new_mem), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        if is_tgn:
            new_mem = loops.scrub_padding_row(new_mem)
        return params2, opt_state2, new_mem, k_next, loss

    return step, place, place_batch
