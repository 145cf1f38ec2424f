"""TGN training driver: like learn_base but threads TGNMemoryState through
every step, with backup/restore around eval (reference learn_base.py:239-240,
259-266)."""
from __future__ import annotations

import os
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.events import load_dataset, RandEdgeSampler, compute_time_statistics
from ..data.graph import build_temporal_graph
from ..models.common import Features
from ..models.tgn import TGN, init_memory_state
from ..utils import metrics as M
from ..utils.checkpoint import save_params
from . import loops


def make_tgn_train_step(model, g_train, feats, dst_table, n, optimizer):
    """The jitted step takes the graph as a RUNTIME argument (bound below),
    not a closure constant: closed-over CSR tables are baked into the
    serialized program as constants, which caps graph size at whatever the
    compile transport accepts (reddit-scale CSR ~20 MB blew the limit) and
    bloats every recompile. Feature tables ride along for the same reason
    (reddit-scale edge features are ~460 MB). `step.with_tables` /
    `step.tables` expose the unbound form so epoch scans can thread the
    same runtime arguments."""
    @jax.jit
    def _step(g_train, feats, state: loops.TrainState, mem,
              batch: loops.Batch):
        key, k_samp, k_drop = jax.random.split(state.key, 3)
        # padded rows (drop_remainder=False) route to the padding node so
        # they cannot store real messages; row 0 is scrubbed below
        batch = loops.mask_batch_nodes(batch)
        # e-path off: TGN.grab_subgraph hard-codes e_idx_l=None
        # (TGN/tgn.py:283-284), same as the TGAT/GraphMixer base paths
        bgd, s_src, s_tgt, s_bgd = loops.sample_support(
            g_train, k_samp, batch, dst_table, model.n_layers, n,
            use_eidx=False)

        def loss_fn(params):
            (pos, neg), new_mem = model.apply(
                params, feats, mem, batch.src, batch.dst, bgd, batch.ts,
                batch.eidx, s_src, s_tgt, s_bgd, deterministic=False,
                rngs={"dropout": k_drop}, method=TGN.contrast)
            loss = (loops.masked_bce_with_logits(
                        pos, jnp.ones(pos.shape[0]), batch.mask)
                    + loops.masked_bce_with_logits(
                        neg, jnp.zeros(neg.shape[0]), batch.mask))
            return loss, (pos, neg, new_mem)

        (loss, (pos, neg, new_mem)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_mem = loops.scrub_padding_row(new_mem)
        # detach_memory (learn_base.py:239-240) is implicit: new_mem leaves the
        # jit region as values.
        return (loops.TrainState(params, opt_state, key), new_mem,
                {"loss": loss, "pos": pos.squeeze(-1), "neg": neg.squeeze(-1)})

    def step(state, mem, batch):
        return _step(g_train, feats, state, mem, batch)

    step.with_tables = _step
    step.tables = (g_train, feats)
    return step


def make_tgn_eval_step(model, g_full, feats, dst_table, n):
    @jax.jit
    def step(params, mem, key, batch: loops.Batch):
        batch = loops.mask_batch_nodes(batch)
        bgd, s_src, s_tgt, s_bgd = loops.sample_support(
            g_full, key, batch, dst_table, model.n_layers, n, use_eidx=False)
        (pos, neg), new_mem = model.apply(
            params, feats, mem, batch.src, batch.dst, bgd, batch.ts,
            batch.eidx, s_src, s_tgt, s_bgd, deterministic=True,
            method=TGN.contrast)
        new_mem = loops.scrub_padding_row(new_mem)
        return pos.squeeze(-1), neg.squeeze(-1), new_mem

    return step


def evaluate_tgn(eval_step, params, mem, events, batch_size, seed=0,
                 return_memory=False):
    """Evaluates on a split, mutating a local copy of the memory (caller
    keeps its own backup — reference learn_base.py:259-266).
    ``return_memory=True`` also returns the post-eval memory so a subsequent
    split (val -> test) can continue in time order."""
    scores, labels, masks = [], [], []
    key = jax.random.PRNGKey(seed)
    for batch in loops.iter_batches(events, batch_size, shuffle=False, seed=0,
                                    drop_remainder=False):
        key, sub = jax.random.split(key)
        pos, neg, mem = eval_step(params, mem, sub, batch)
        scores.append(np.r_[jax.nn.sigmoid(np.asarray(pos)),
                            jax.nn.sigmoid(np.asarray(neg))])
        labels.append(np.r_[np.ones(len(pos)), np.zeros(len(neg))])
        m = np.asarray(batch.mask)
        masks.append(np.r_[m, m])
    s, l, m = (np.concatenate(scores), np.concatenate(labels),
               np.concatenate(masks))
    out = dict(ap=M.average_precision_score(l, s, m),
               auc=M.roc_auc_score(l, s, m),
               acc=M.accuracy_score(l, s, mask=m))
    return (out, mem) if return_memory else out


def main(args, cfg=None):
    if cfg is None:
        from ..config import config_from_args
        cfg = config_from_args(args)
    mc = cfg.model
    ds = load_dataset(cfg.data.name, args.data_dir)
    g_train = build_temporal_graph(ds.train, ds.full.num_nodes, ds.full.num_edges)
    g_full = build_temporal_graph(ds.full, ds.full.num_nodes, ds.full.num_edges)
    feats = Features(node=jnp.asarray(ds.node_feat), edge=jnp.asarray(ds.edge_feat))

    mean_shift, std_shift = (0.0, 0.0), (1.0, 1.0)
    if mc.embedding_module == "time":
        mean_shift, std_shift = compute_time_statistics(ds.train)
    model = TGN(node_dim=ds.node_feat.shape[1], edge_dim=ds.edge_feat.shape[1],
                num_nodes=ds.full.num_nodes, n_layers=2, n_head=mc.n_heads,
                dropout=mc.dropout,
                memory_updater=mc.memory_updater,
                aggregator=mc.aggregator,
                message_function=mc.message_function,
                embedding_type=mc.embedding_module,
                mean_time_shift=mean_shift, std_time_shift=std_shift)
    mem = init_memory_state(ds.full.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    train_sampler = RandEdgeSampler([ds.train.src], [ds.train.dst])
    test_sampler = RandEdgeSampler([ds.train.src, ds.val.src, ds.test.src],
                                   [ds.train.dst, ds.val.dst, ds.test.dst])

    key = jax.random.PRNGKey(args.seed)
    init_batch = next(loops.iter_batches(ds.train, args.bs, True, 0, True))
    _, s0, s1, s2 = loops.sample_support(
        g_train, key, init_batch, jnp.asarray(train_sampler.dst_list),
        2, args.n_degree)
    params = model.init({"params": key, "dropout": key}, feats, mem,
                        init_batch.src, init_batch.dst, init_batch.dst,
                        init_batch.ts, init_batch.eidx, s0, s1, s2,
                        deterministic=True)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model=tgn data={args.data} params={n_params:,} "
          f"n_degree={args.n_degree}")

    optimizer = optax.adam(args.lr)
    state = loops.TrainState(params, optimizer.init(params), key)
    train_step = make_tgn_train_step(model, g_train, feats,
                                     jnp.asarray(train_sampler.dst_list),
                                     args.n_degree, optimizer)
    eval_step = make_tgn_eval_step(model, g_full, feats,
                                   jnp.asarray(test_sampler.dst_list),
                                   args.n_degree)

    stopper = M.EarlyStopMonitor(max_round=args.patience)
    best = None
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_path = osp.join(args.out_dir, f"tgn_{args.data}.msgpack")
    # stop/resume train-state checkpoint (params + optimizer + RNG + memory +
    # stopper — the TGN memory is part of the sequential training state)
    train_ckpt = ckpt_path + ".train_state"
    start_epoch, start_step = 0, 0
    if getattr(args, "resume", False) and osp.exists(train_ckpt):
        from ..utils.checkpoint import load_checkpoint
        blob, tmeta = load_checkpoint(train_ckpt,
                                      {"params": state.params,
                                       "opt_state": state.opt_state,
                                       "key": state.key, "memory": mem})
        state = loops.TrainState(blob["params"], blob["opt_state"],
                                 blob["key"])
        mem = blob["memory"]
        best = tmeta["best"]
        stopper.load_state_dict(tmeta["stopper"])
        if tmeta.get("step", -1) >= 0:   # mid-epoch (--ckpt_every_steps)
            start_epoch, start_step = tmeta["epoch"], tmeta["step"]
            print(f"resumed from {train_ckpt} at epoch {start_epoch} "
                  f"step {start_step}")
        else:
            start_epoch = tmeta["epoch"] + 1
            print(f"resumed from {train_ckpt} at epoch {start_epoch}")
    from ..utils.logging import MetricsLogger
    logger = MetricsLogger(
        args.log_dir,
        run_name=time.strftime(f"tgn_{args.data}_%Y%m%d_%H%M%S"))
    use_scan = not args.ckpt_every_steps and not start_step
    epoch_fn = loops.make_tgn_train_epoch(train_step) if use_scan else None
    from ..utils import debug
    if debug.enabled():
        debug.install()
    for epoch in range(start_epoch, args.n_epoch):
        t0 = time.time()
        batches = loops.stack_batches(ds.train, args.bs, shuffle=True,
                                      seed=args.seed + epoch)
        prev_state, prev_mem = state, mem
        if use_scan:
            state, mem, auxs = epoch_fn(state, mem, batches)
        else:
            aux_list = []
            first = start_step if epoch == start_epoch else 0
            if first:
                print(f"  (mid-epoch resume: skipping {first} completed "
                      f"steps; epoch metrics cover the remainder)")
            for i in range(first, batches.src.shape[0]):
                b_i = loops.Batch(*(x[i] for x in batches))
                state, mem, aux = train_step(state, mem, b_i)
                aux_list.append(aux)
                if args.ckpt_every_steps and \
                        (i + 1) % args.ckpt_every_steps == 0 and \
                        i + 1 < batches.src.shape[0]:
                    jax.block_until_ready(aux["loss"])
                    save_params(train_ckpt,
                                {"params": state.params,
                                 "opt_state": state.opt_state,
                                 "key": state.key, "memory": mem},
                                meta=dict(epoch=epoch, step=i + 1, best=best,
                                          stopper=stopper.state_dict()))
            auxs = jax.tree.map(lambda *xs: jnp.stack(xs), *aux_list)
        jax.block_until_ready(auxs["loss"])
        if debug.enabled():
            if use_scan:
                debug.assert_donated(prev_state, prev_mem,
                                     where="tgn epoch scan")
            debug.check_finite(state.params, "params after epoch")
            debug.check_finite(mem.memory, "tgn memory after epoch")
        dt = time.time() - t0
        losses = np.asarray(auxs["loss"])
        # after a mid-epoch resume only the remaining steps ran this process
        k = losses.shape[0]
        n_events = k * args.bs
        pos = 1 / (1 + np.exp(-np.asarray(auxs["pos"])))
        neg = 1 / (1 + np.exp(-np.asarray(auxs["neg"])))
        aps = []
        for i in range(k):
            s = np.r_[pos[i], neg[i]]
            l = np.r_[np.ones(args.bs), np.zeros(args.bs)]
            aps.append(M.average_precision_score(l, s))
        mem_backup = mem                       # backup_memory
        # selection/early-stop on VAL (test reported only — the reference's
        # test-selection bug is not copied, VERDICT r3 weak#6). The memory
        # advances train -> val -> test in time order, then restores.
        val, mem_val = evaluate_tgn(eval_step, state.params, mem, ds.val,
                                    args.bs, return_memory=True)
        test = evaluate_tgn(eval_step, state.params, mem_val, ds.test,
                            args.bs)
        mem = mem_backup                       # restore_memory
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"train_ap={np.mean(aps):.4f} val_ap={val['ap']:.4f} "
              f"test_ap={test['ap']:.4f} test_auc={test['auc']:.4f} "
              f"({n_events / dt:,.0f} events/s)")
        logger.add_scalars("Train", {"loss": float(np.mean(losses)),
                                     "ap": float(np.mean(aps)),
                                     "events_per_s": n_events / dt}, epoch)
        logger.add_scalars("Val", val, epoch)
        logger.add_scalars("Test", test, epoch)
        logger.flush()
        if best is None or val["ap"] > best.get("val_ap", float("-inf")):
            best = dict(test, val_ap=val["ap"])
            # checkpoint carries the train-side memory state (the reference's
            # pickled module embeds its Memory parameter the same way,
            # learn_base.py:276)
            save_params(ckpt_path, {"params": state.params,
                                    "memory": mem_backup},
                        meta=dict(base_type="tgn", data=args.data,
                                  n_degree=args.n_degree, n_layer=2,
                                  n_head=args.n_head, drop_out=args.drop_out,
                                  node_dim=ds.node_feat.shape[1],
                                  edge_dim=ds.edge_feat.shape[1],
                                  num_nodes=ds.full.num_nodes,
                                  memory_updater=model.memory_updater,
                                  aggregator=model.aggregator,
                                  message_function=model.message_function,
                                  embedding_module=model.embedding_type,
                                  mean_time_shift=list(mean_shift),
                                  std_time_shift=list(std_shift)))
            print(f"  saved best checkpoint -> {ckpt_path} "
                  f"(ap={best['ap']:.4f})")
        stop = stopper.early_stop_check(val["ap"])
        save_params(train_ckpt, {"params": state.params,
                                 "opt_state": state.opt_state,
                                 "key": state.key, "memory": mem},
                    meta=dict(epoch=epoch, best=best,
                              stopper=stopper.state_dict()))
        if stop:
            print(f"early stop at epoch {epoch}")
            break
    logger.close()
    if best is not None:
        from .learn_base import write_results
        write_results(args.results_dir, f"base_tgn_{args.data}",
                      dict(base_type="tgn", data=args.data, **best))
    return 0.0 if best is None else best["ap"]
