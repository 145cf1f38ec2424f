"""Bisect the 3-layer TGAT bs=32 TPU device fault to a stage/op."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

stage = sys.argv[1]
bs = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from tempme_tpu.data.events import load_dataset
from tempme_tpu.data.graph import build_temporal_graph
from tempme_tpu.models.common import Features
from tempme_tpu.models.tgat import TGAT
from tempme_tpu.ops import sampler as S

ds = load_dataset("uslegis_sampled", "/root/reference/processed")
g = build_temporal_graph(ds.train, num_nodes=ds.full.num_nodes,
                         num_edges=ds.full.num_edges)
feats = Features(node=jnp.asarray(ds.node_feat),
                 edge=jnp.asarray(ds.edge_feat))
key = jax.random.PRNGKey(0)
src = jnp.asarray(ds.train.src[:bs])
dst = jnp.asarray(ds.train.dst[:bs])
ts = jnp.asarray(ds.train.ts[:bs])
n = 30

print(f"stage={stage} bs={bs} backend={jax.default_backend()}", flush=True)
t0 = time.time()

if stage == "sample":
    f = jax.jit(lambda k: [S.find_k_hop(g, jax.random.fold_in(k, i), x, ts,
                                        3, n)
                           for i, x in enumerate((src, dst, dst))])
    subs = jax.block_until_ready(f(key))
    print("sample ok", time.time() - t0, flush=True)
    sys.exit(0)

subs = jax.jit(lambda k: [S.find_k_hop(g, jax.random.fold_in(k, i), x, ts,
                                       3, n)
                          for i, x in enumerate((src, dst, dst))])(key)
jax.block_until_ready(subs)
print("sampled", time.time() - t0, flush=True)

remat = "noremat" not in stage
model = TGAT(node_dim=feats.node.shape[1], edge_dim=feats.edge.shape[1],
             num_layers=3, n_head=2, dropout=0.1, remat=remat)
params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts, *subs,
                    deterministic=True)
print("init ok", time.time() - t0, flush=True)

if stage.startswith("fwd"):
    f = jax.jit(lambda p: model.apply(p, feats, src, dst, dst, ts, *subs,
                                      deterministic=True))
    out = jax.block_until_ready(f(params))
    print("fwd ok", float(out[0].mean()), time.time() - t0, flush=True)
elif stage.startswith("bwd"):
    def loss(p, k):
        pos, neg = model.apply(p, feats, src, dst, dst, ts, *subs,
                               deterministic=False, rngs={"dropout": k})
        return -(jax.nn.log_sigmoid(pos).mean()
                 + jax.nn.log_sigmoid(-neg).mean())
    f = jax.jit(jax.grad(loss))
    gr = jax.block_until_ready(f(params, key))
    print("bwd ok", time.time() - t0, flush=True)
elif stage.startswith("bwddet"):
    def loss(p):
        pos, neg = model.apply(p, feats, src, dst, dst, ts, *subs,
                               deterministic=True)
        return -(jax.nn.log_sigmoid(pos).mean()
                 + jax.nn.log_sigmoid(-neg).mean())
    f = jax.jit(jax.grad(loss))
    gr = jax.block_until_ready(f(params))
    print("bwddet ok", time.time() - t0, flush=True)

if stage == "step" or stage == "scan":
    import optax
    from tempme_tpu.train import loops
    from tempme_tpu.data.events import RandEdgeSampler
    sampler = RandEdgeSampler([ds.train.src], [ds.train.dst])
    optimizer = optax.adam(1e-4)
    state = loops.TrainState(params, optimizer.init(params), key)
    train_step = loops.make_base_train_step(
        model, g, feats, jnp.asarray(sampler.dst_list), 3, n, optimizer)
    if stage == "step":
        b0 = next(loops.iter_batches(ds.train, bs, True, 0, True))
        for i in range(5):
            state, aux = train_step(state, b0)
            jax.block_until_ready(aux["loss"])
            print(f"step {i} ok loss={float(aux['loss']):.4f}",
                  time.time() - t0, flush=True)
    else:
        epoch_fn = loops.make_base_train_epoch(train_step)
        batches = loops.stack_batches(ds.train, bs, shuffle=True, seed=0)
        print("scan over", batches.src.shape[0], "batches", flush=True)
        state, auxs = epoch_fn(state, batches)
        jax.block_until_ready(auxs["loss"])
        print("scan ok", time.time() - t0, flush=True)
