"""Base TGNN training driver (reference learn_base.py).

Usage:
    python -m tempme_tpu.train.learn_base --data uslegis_sampled \
        --base_type tgat --n_epoch 5 --bs 256

Trains future-link prediction with BCE on contrastive (pos, neg) logits,
evaluates AP/AUC/ACC on the test split with the full-graph sampler each epoch,
keeps the best checkpoint, early-stops after 5 flat rounds.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import DEGREE_DICT
from ..data.events import load_dataset, RandEdgeSampler
from ..data.graph import build_temporal_graph
from ..models.common import Features
from ..utils import metrics as M
from ..utils.checkpoint import save_params
from ..utils.logging import MetricsLogger
from . import loops


def write_results(results_dir: str, name: str, payload: dict) -> str:
    import json
    os.makedirs(results_dir, exist_ok=True)
    out = osp.join(results_dir, name + ".json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"results -> {out}")
    return out


def eval_checkpoint(args):
    """Evaluate a saved base checkpoint on the test split (AP/AUC/ACC with the
    full-graph sampler — the reference protocol, learn_base.py:43-73)."""
    from .base_loader import load_base
    ds = load_dataset(args.data, args.data_dir)
    g_full = build_temporal_graph(ds.full, ds.full.num_nodes,
                                  ds.full.num_edges)
    feats = Features(node=jnp.asarray(ds.node_feat),
                     edge=jnp.asarray(ds.edge_feat))
    base = load_base(osp.join(args.out_dir,
                              f"{args.base_type}_{args.data}.msgpack"), feats)
    n = int(base.meta["n_degree"])
    test_sampler = RandEdgeSampler([ds.train.src, ds.val.src, ds.test.src],
                                   [ds.train.dst, ds.val.dst, ds.test.dst])
    dst = jnp.asarray(test_sampler.dst_list)
    if base.base_type == "tgn":
        from .learn_tgn import evaluate_tgn, make_tgn_eval_step
        eval_step = make_tgn_eval_step(base.model, g_full, feats, dst, n)
        test = evaluate_tgn(eval_step, base.params, base.memory, ds.test,
                            args.bs)
    else:
        k = int(base.meta["n_layer"]) if base.base_type == "tgat" else 2
        eval_step = loops.make_base_eval_step(base.model, g_full, feats, dst,
                                              k, n)
        test = evaluate(eval_step, base.params, ds.test, args.bs)
    print(f"[eval {args.base_type}/{args.data}] ap={test['ap']:.4f} "
          f"auc={test['auc']:.4f} acc={test['acc']:.4f}")
    write_results(args.results_dir, f"base_{args.base_type}_{args.data}",
                  dict(base_type=args.base_type, data=args.data, **test))
    return test


def build_model(mc, node_dim: int, edge_dim: int):
    """Base model from a ModelConfig (the single config source, SURVEY §5.6)."""
    if mc.base_type == "tgat":
        from ..models.tgat import TGAT
        # 'pos' ranks per-parent n-wide groups, so n_degree suffices
        pos_len = max(64, mc.n_degree)
        return TGAT(node_dim=node_dim, edge_dim=edge_dim,
                    num_layers=mc.n_layers, n_head=mc.n_heads,
                    dropout=mc.dropout, agg_method=mc.agg_method,
                    attn_mode=mc.attn_mode, use_time=mc.use_time,
                    pos_seq_len=pos_len,
                    # 3-layer support (30+900+27000 events/side) only fits
                    # one chip's HBM with per-level rematerialization
                    remat=mc.n_layers >= 3), mc.n_layers
    if mc.base_type == "graphmixer":
        from ..models.graphmixer import GraphMixer
        return GraphMixer(node_dim=node_dim, edge_dim=edge_dim,
                          num_tokens=mc.n_degree, num_layers=mc.n_layers,
                          dropout=mc.dropout), 2
    raise ValueError(
        f"unknown base_type {mc.base_type} (tgn uses learn_tgn path)")


def evaluate(eval_step, params, events, batch_size, seed=0):
    scores, labels, masks = [], [], []
    key = jax.random.PRNGKey(seed)
    for batch in loops.iter_batches(events, batch_size, shuffle=False, seed=0,
                                    drop_remainder=False):
        key, sub = jax.random.split(key)
        pos, neg = eval_step(params, sub, batch)
        pos = jax.nn.sigmoid(pos)
        neg = jax.nn.sigmoid(neg)
        scores.append(np.r_[np.asarray(pos), np.asarray(neg)])
        labels.append(np.r_[np.ones(len(pos)), np.zeros(len(neg))])
        m = np.asarray(batch.mask)
        masks.append(np.r_[m, m])
    s, l, m = np.concatenate(scores), np.concatenate(labels), np.concatenate(masks)
    return dict(ap=M.average_precision_score(l, s, m),
                auc=M.roc_auc_score(l, s, m),
                acc=M.accuracy_score(l, s, mask=m))


def main(argv=None):
    from ..config import (add_common_args, add_model_args, config_from_args,
                          resolve_bs)
    p = argparse.ArgumentParser("tempme_tpu base-model training")
    add_common_args(p, bs=256, n_epoch=20, lr=1e-3)
    add_model_args(p)
    p.add_argument("--out_dir", type=str, default="params/tgnn")
    p.add_argument("--eval_only", action="store_true",
                   help="evaluate the saved checkpoint on the test split")
    p.add_argument("--resume", action="store_true",
                   help="continue from the .train_state checkpoint if present "
                        "(params + optimizer + RNG + early-stop state)")
    args = p.parse_args(argv)
    resolve_bs(args, deep_tgat_bs=32)
    cfg = config_from_args(args)
    args.n_degree = cfg.model.n_degree    # downstream paths (tgn/eval) share it
    if args.eval_only:
        return eval_checkpoint(args)
    if args.base_type == "tgn":
        from .learn_tgn import main as tgn_main
        return tgn_main(args, cfg)

    ds = load_dataset(args.data, args.data_dir)
    g_train = build_temporal_graph(ds.train, ds.full.num_nodes, ds.full.num_edges)
    g_full = build_temporal_graph(ds.full, ds.full.num_nodes, ds.full.num_edges)
    feats = Features(node=jnp.asarray(ds.node_feat), edge=jnp.asarray(ds.edge_feat))

    model, k = build_model(cfg.model, ds.node_feat.shape[1],
                           ds.edge_feat.shape[1])
    train_sampler = RandEdgeSampler([ds.train.src], [ds.train.dst])
    test_sampler = RandEdgeSampler([ds.train.src, ds.val.src, ds.test.src],
                                   [ds.train.dst, ds.val.dst, ds.test.dst])

    # init — TGAT params are support-width independent (all kernels sized by
    # feature dims), so init on a width-2 support: the real 3-layer pyramid
    # (widths 30/900/27000) costs minutes of device compile PER PROCESS
    # START, which multiplies under the stall-watchdog restarts.
    # GraphMixer's token-mix Dense IS sized by n_degree -> real width there.
    key = jax.random.PRNGKey(args.seed)
    init_batch = next(loops.iter_batches(ds.train, args.bs, True, 0, True))
    n_init = 2 if args.base_type == "tgat" else args.n_degree
    _, s0, s1, s2 = loops.sample_support(
        g_train, key, init_batch, jnp.asarray(train_sampler.dst_list),
        k, n_init)
    params = model.init({"params": key, "dropout": key}, feats,
                        init_batch.src, init_batch.dst, init_batch.dst,
                        init_batch.ts, s0, s1, s2, deterministic=True)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model={args.base_type} data={args.data} params={n_params:,} "
          f"n_degree={args.n_degree} layers={k}")

    optimizer = optax.adam(args.lr)
    state = loops.TrainState(params, optimizer.init(params), key)
    train_step = loops.make_base_train_step(
        model, g_train, feats, jnp.asarray(train_sampler.dst_list),
        k, args.n_degree, optimizer)
    eval_step = loops.make_base_eval_step(
        model, g_full, feats, jnp.asarray(test_sampler.dst_list),
        k, args.n_degree)

    stopper = M.EarlyStopMonitor(max_round=args.patience)
    best = None
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_path = osp.join(args.out_dir, f"{args.base_type}_{args.data}.msgpack")
    # full-train-state checkpoint for stop/resume (params + optimizer state +
    # RNG + stopper; the reference has no resume story, SURVEY.md §5.4)
    train_ckpt = ckpt_path + ".train_state"
    start_epoch, start_step = 0, 0
    if args.resume and osp.exists(train_ckpt):
        from ..utils.checkpoint import load_checkpoint
        blob, tmeta = load_checkpoint(train_ckpt,
                                      {"params": state.params,
                                       "opt_state": state.opt_state,
                                       "key": state.key})
        state = loops.TrainState(blob["params"], blob["opt_state"],
                                 blob["key"])
        best = tmeta["best"]
        stopper.load_state_dict(tmeta["stopper"])
        # meta "step" >= 0 marks a mid-epoch checkpoint (--ckpt_every_steps):
        # re-enter that epoch and skip the completed steps (the batch order
        # is deterministic in seed+epoch)
        if tmeta.get("step", -1) >= 0:
            start_epoch, start_step = tmeta["epoch"], tmeta["step"]
            print(f"resumed from {train_ckpt} at epoch {start_epoch} "
                  f"step {start_step}")
        else:
            start_epoch = tmeta["epoch"] + 1
            print(f"resumed from {train_ckpt} at epoch {start_epoch}")
    logger = MetricsLogger(
        args.log_dir,
        run_name=time.strftime(f"{args.base_type}_{args.data}_%Y%m%d_%H%M%S"))
    # The scanned epoch (one dispatch per epoch) is the default. The 3-layer
    # rematted TGAT step runs fine stepwise but hits a TPU runtime device
    # fault when the SAME step is wrapped in the epoch lax.scan (bisected in
    # r4: sample/fwd/bwd/5x full step all ok at bs=32, scan faults —
    # PERF.md "3-layer TGAT"). Per-batch stepping costs only dispatch
    # latency (~ms against a ~750 ms step), so deep TGAT steps per batch.
    use_scan = not (args.base_type == "tgat" and k >= 3) \
        and not args.ckpt_every_steps and not start_step
    epoch_fn = loops.make_base_train_epoch(train_step) if use_scan else None
    from ..utils import debug
    if debug.enabled():
        debug.install()
    for epoch in range(start_epoch, args.n_epoch):
        t0 = time.time()
        batches = loops.stack_batches(ds.train, args.bs, shuffle=True,
                                      seed=args.seed + epoch)
        prev_state = state
        if use_scan:
            state, auxs = epoch_fn(state, batches)
        else:
            aux_list = []
            first = start_step if epoch == start_epoch else 0
            if first:
                print(f"  (mid-epoch resume: skipping {first} completed "
                      f"steps; epoch metrics cover the remainder)")
            for i in range(first, batches.src.shape[0]):
                b_i = loops.Batch(*(x[i] for x in batches))
                state, aux = train_step(state, b_i)
                aux_list.append(aux)
                if args.ckpt_every_steps and \
                        (i + 1) % args.ckpt_every_steps == 0 and \
                        i + 1 < batches.src.shape[0]:
                    jax.block_until_ready(aux["loss"])
                    save_params(train_ckpt, {"params": state.params,
                                             "opt_state": state.opt_state,
                                             "key": state.key},
                                meta=dict(epoch=epoch, step=i + 1, best=best,
                                          stopper=stopper.state_dict()))
            auxs = jax.tree.map(lambda *xs: jnp.stack(xs), *aux_list)
        jax.block_until_ready(auxs["loss"])
        if debug.enabled():
            if use_scan:
                debug.assert_donated(prev_state, where="base epoch scan")
            debug.check_finite(state.params, "params after epoch")
        dt = time.time() - t0
        losses = np.asarray(auxs["loss"])
        # after a mid-epoch resume only the remaining steps ran this process
        n_batches = losses.shape[0]
        n_events = n_batches * args.bs
        pos = 1 / (1 + np.exp(-np.asarray(auxs["pos"])))   # [K, B]
        neg = 1 / (1 + np.exp(-np.asarray(auxs["neg"])))
        aps, aucs = [], []
        for i in range(n_batches):
            s = np.r_[pos[i], neg[i]]
            l = np.r_[np.ones(args.bs), np.zeros(args.bs)]
            aps.append(M.average_precision_score(l, s))
            aucs.append(M.roc_auc_score(l, s))
        # model selection + early stopping on VAL; test is reported only
        # (the reference selects on test, temp_exp_main.py:534-541 /
        # learn_base.py:271-278 — a methodological bug we do not copy,
        # VERDICT r3 weak#6)
        val = evaluate(eval_step, state.params, ds.val, args.bs)
        test = evaluate(eval_step, state.params, ds.test, args.bs)
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"train_ap={np.mean(aps):.4f} val_ap={val['ap']:.4f} "
              f"test_ap={test['ap']:.4f} test_auc={test['auc']:.4f} "
              f"({n_events / dt:,.0f} events/s)")
        logger.add_scalars("Train", {"loss": float(np.mean(losses)),
                                     "ap": float(np.mean(aps)),
                                     "auc": float(np.mean(aucs)),
                                     "events_per_s": n_events / dt}, epoch)
        logger.add_scalars("Val", val, epoch)
        logger.add_scalars("Test", test, epoch)
        logger.flush()
        if best is None or val["ap"] > best.get("val_ap", float("-inf")):
            best = dict(test, val_ap=val["ap"])
            meta = dict(base_type=args.base_type, data=args.data,
                        n_degree=args.n_degree, n_layer=k,
                        n_head=args.n_head, drop_out=args.drop_out,
                        node_dim=ds.node_feat.shape[1],
                        edge_dim=ds.edge_feat.shape[1])
            if args.base_type == "tgat":
                meta.update(agg_method=cfg.model.agg_method,
                            attn_mode=cfg.model.attn_mode,
                            use_time=cfg.model.use_time,
                            pos_seq_len=max(64, cfg.model.n_degree))
            save_params(ckpt_path, state.params, meta=meta)
            print(f"  saved best checkpoint -> {ckpt_path} "
                  f"(val_ap={best['val_ap']:.4f} test_ap={best['ap']:.4f})")
        stop = stopper.early_stop_check(val["ap"])
        save_params(train_ckpt, {"params": state.params,
                                 "opt_state": state.opt_state,
                                 "key": state.key},
                    meta=dict(epoch=epoch, best=best,
                              stopper=stopper.state_dict()))
        if stop:
            print(f"early stop at epoch {epoch}")
            break
    logger.close()
    if best is not None:
        write_results(args.results_dir, f"base_{args.base_type}_{args.data}",
                      dict(base_type=args.base_type, data=args.data, **best))
    return 0.0 if best is None else best["ap"]


if __name__ == "__main__":
    main()
