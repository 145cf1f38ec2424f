"""Per-step cost breakdown of the flagship TGN train step on the live chip.

VERDICT r2 missing#2 / weak#3: the 121 ms/step (2115 ev/s at bs=256) headline
was never decomposed. This tool jits each stage of the step separately and
times it in isolation, then captures an optional ``jax.profiler`` trace of the
full step:

  * sample   — negative sampling + 3x 2-hop temporal neighbor sampling
               (ops/sampler.py: bisect + uniform pick + CSR gathers)
  * fwd      — TGN memory advance + attention pyramid + affinity (no grad)
  * fwdbwd   — value_and_grad of the same
  * full     — the production fused step (sampling + fwd/bwd + Adam)

Isolated stage times do not sum exactly to the fused step (XLA fuses across
stage boundaries), but they bound where the time goes.

Usage:  python -m tempme_tpu.tools.profile_step [--trace DIR] [--bs 256]
Writes one JSON line; PERF.md summarizes the findings.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, warmup=2, iters=20):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="uslegis_sampled")
    ap.add_argument("--data_dir", default="/root/reference/processed")
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--n_degree", type=int, default=30)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of the full step")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..data.events import load_dataset, RandEdgeSampler
    from ..data.graph import build_temporal_graph
    from ..models.common import Features
    from ..models.tgn import TGN, init_memory_state
    from ..train import loops
    from ..train.learn_tgn import make_tgn_train_step

    ds = load_dataset(args.data, args.data_dir)
    g = build_temporal_graph(ds.train, ds.full.num_nodes, ds.full.num_edges)
    feats = Features(node=jnp.asarray(ds.node_feat),
                     edge=jnp.asarray(ds.edge_feat))
    bs, n = args.bs, args.n_degree
    model = TGN(node_dim=ds.node_feat.shape[1], edge_dim=ds.edge_feat.shape[1],
                num_nodes=ds.full.num_nodes, n_layers=2, n_head=2, dropout=0.1)
    mem = init_memory_state(ds.full.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    sampler = RandEdgeSampler([ds.train.src], [ds.train.dst])
    dst_table = jnp.asarray(sampler.dst_list)
    key = jax.random.PRNGKey(0)
    batch = next(loops.iter_batches(ds.train, bs, shuffle=True, seed=0,
                                    drop_remainder=True))
    _, s0, s1, s2 = loops.sample_support(g, key, batch, dst_table, 2, n,
                                         use_eidx=False)
    params = model.init({"params": key, "dropout": key}, feats, mem,
                        batch.src, batch.dst, batch.dst, batch.ts, batch.eidx,
                        s0, s1, s2, deterministic=True)
    optimizer = optax.adam(1e-3)
    state = loops.TrainState(params, optimizer.init(params), key)

    # --- stage: sampling only -------------------------------------------
    @jax.jit
    def stage_sample(key, batch):
        return loops.sample_support(g, key, batch, dst_table, 2, n,
                                    use_eidx=False)

    # --- stage: forward only (fixed supports) ---------------------------
    subs = stage_sample(key, batch)
    bgd, ss0, ss1, ss2 = subs

    @jax.jit
    def stage_fwd(params, mem, batch):
        (pos, neg), new_mem = model.apply(
            params, feats, mem, batch.src, batch.dst, bgd, batch.ts,
            batch.eidx, ss0, ss1, ss2, deterministic=True,
            method=TGN.contrast)
        return pos.sum() + neg.sum(), new_mem

    # --- stage: fwd+bwd (fixed supports) --------------------------------
    @jax.jit
    def stage_fwdbwd(params, mem, batch):
        def loss_fn(p):
            (pos, neg), new_mem = model.apply(
                p, feats, mem, batch.src, batch.dst, bgd, batch.ts,
                batch.eidx, ss0, ss1, ss2, deterministic=True,
                method=TGN.contrast)
            return (loops.bce_with_logits(pos, jnp.ones_like(pos))
                    + loops.bce_with_logits(neg, jnp.zeros_like(neg))), new_mem
        (loss, new_mem), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(params)
        # consume EVERY grad leaf so XLA cannot dead-code the backward
        gsum = sum(jnp.sum(jnp.square(g))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    # --- stage: embeddings only (no memory writeback) -------------------
    @jax.jit
    def stage_embed(params, mem, batch):
        (s, t, b2), _ = model.apply(
            params, feats, mem, batch.src, batch.dst, bgd, batch.ts,
            batch.eidx, ss0, ss1, ss2, update_memory=False,
            deterministic=True, method=TGN.get_node_emb)
        return s.sum() + t.sum() + b2.sum()

    # --- stage: memory advance + store only ------------------------------
    @jax.jit
    def stage_memory(params, mem, batch):
        _, new_mem = model.apply(
            params, feats, mem, batch.src, batch.dst, bgd, batch.ts,
            batch.eidx, ss0, ss1, ss2, update_memory=True,
            deterministic=True, method=TGN.get_node_emb)
        return new_mem.msg_buf.sum()

    # --- stage: dropout-on fwd (the production fused-dropout path) -------
    @jax.jit
    def stage_fwd_drop(params, mem, batch, key):
        (pos, neg), _ = model.apply(
            params, feats, mem, batch.src, batch.dst, bgd, batch.ts,
            batch.eidx, ss0, ss1, ss2, deterministic=False,
            rngs={"dropout": key}, method=TGN.contrast)
        return pos.sum() + neg.sum()

    # --- full fused production step -------------------------------------
    full_step = make_tgn_train_step(model, g, feats, dst_table, n, optimizer)

    times = {
        "sample_ms": _timeit(lambda: stage_sample(key, batch)) * 1e3,
        "fwd_ms": _timeit(lambda: stage_fwd(params, mem, batch)) * 1e3,
        "fwd_drop_ms": _timeit(
            lambda: stage_fwd_drop(params, mem, batch, key)) * 1e3,
        "embed_ms": _timeit(lambda: stage_embed(params, mem, batch)) * 1e3,
        "memory_ms": _timeit(lambda: stage_memory(params, mem, batch)) * 1e3,
        "fwdbwd_ms": _timeit(lambda: stage_fwdbwd(params, mem, batch)) * 1e3,
        "full_ms": _timeit(lambda: full_step(state, mem, batch)) * 1e3,
    }
    times["events_per_s_full"] = bs / (times["full_ms"] / 1e3)

    # finer sampler split: bisect+uniform vs the hop-1 wide gather
    @jax.jit
    def stage_hop0(key, batch):
        from ..ops import sampler as S
        return S.sample_neighbors(g, key, batch.src, batch.ts, n)

    hop0 = stage_hop0(key, batch)

    @jax.jit
    def stage_hop1(key):
        from ..ops import sampler as S
        nn, ne, nt = hop0
        return S.sample_neighbors(g, key, nn.reshape(-1), nt.reshape(-1), n,
                                  eids=ne.reshape(-1))
    times["sample_hop0_ms"] = _timeit(lambda: stage_hop0(key, batch)) * 1e3
    times["sample_hop1_ms"] = _timeit(lambda: stage_hop1(key)) * 1e3

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = full_step(state, mem, batch)
            jax.block_until_ready(out)
        times["trace_dir"] = args.trace

    times = {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in times.items()}
    times.update(bs=bs, n_degree=n,
                 backend=jax.devices()[0].platform)
    print(json.dumps(times))
    return times


if __name__ == "__main__":
    main()
