"""Benchmark: TGN end-to-end training throughput (events/s) on one chip.

Measures the full per-batch pipeline — negative sampling, 3x 2-hop temporal
neighbor sampling, TGN memory advance, attention pyramid, fwd/bwd, Adam — as
one jitted step on the real dataset, the same work the reference does in
Python loops at ~52-70 events/s on full Enron (README.md:124-127, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

REFERENCE_EVENTS_PER_S = 60.0     # midpoint of the reference's 52-70 edges/s


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tempme_tpu.data.events import load_dataset, RandEdgeSampler
    from tempme_tpu.data.graph import build_temporal_graph
    from tempme_tpu.models.common import Features
    from tempme_tpu.models.tgn import TGN, init_memory_state
    from tempme_tpu.train import loops
    from tempme_tpu.train.learn_tgn import make_tgn_train_step

    data_dir = "/root/reference/processed"
    ds = load_dataset("uslegis_sampled", data_dir)
    g = build_temporal_graph(ds.train, ds.full.num_nodes, ds.full.num_edges)
    feats = Features(node=jnp.asarray(ds.node_feat),
                     edge=jnp.asarray(ds.edge_feat))
    bs, n_degree = 256, 30
    model = TGN(node_dim=ds.node_feat.shape[1], edge_dim=ds.edge_feat.shape[1],
                num_nodes=ds.full.num_nodes, n_layers=2, n_head=2, dropout=0.1)
    mem = init_memory_state(ds.full.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    sampler = RandEdgeSampler([ds.train.src], [ds.train.dst])
    dst_table = jnp.asarray(sampler.dst_list)

    key = jax.random.PRNGKey(0)
    batches = list(loops.iter_batches(ds.train, bs, shuffle=True, seed=0,
                                      drop_remainder=True))
    from tempme_tpu.train.loops import sample_support
    b0 = batches[0]
    _, s0, s1, s2 = sample_support(g, key, b0, dst_table, 2, n_degree)
    params = model.init({"params": key, "dropout": key}, feats, mem, b0.src,
                        b0.dst, b0.dst, b0.ts, b0.eidx, s0, s1, s2,
                        deterministic=True)
    optimizer = optax.adam(1e-3)
    state = loops.TrainState(params, optimizer.init(params), key)
    step = make_tgn_train_step(model, g, feats, dst_table, n_degree, optimizer)
    epoch_fn = loops.make_tgn_train_epoch(step)

    stacked = loops.stack_batches(ds.train, bs, shuffle=True, seed=0)
    # warmup (compile)
    state, mem, auxs = epoch_fn(state, mem, stacked)
    jax.block_until_ready(auxs["loss"])

    n_epochs = 5
    t0 = time.time()
    for e in range(n_epochs):
        state, mem, auxs = epoch_fn(state, mem, stacked)
    jax.block_until_ready(auxs["loss"])
    dt = time.time() - t0
    n_steps = stacked.src.shape[0] * n_epochs
    events_per_s = n_steps * bs / dt

    print(json.dumps({
        "metric": "tgn_train_events_per_s",
        "value": round(float(events_per_s), 1),
        "unit": "events/s",
        "vs_baseline": round(float(events_per_s) / REFERENCE_EVENTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
