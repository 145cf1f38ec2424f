"""Compiled-op census from a jax.profiler trace (VERDICT r4 weak#2).

Aggregates the xprof ``hlo_stats`` table (per-HLO-op self time on the device)
into an op-category census, so PERF.md's residual-overhead claims are backed
by committed numbers instead of assertions.

Usage:
    # parse an existing trace
    python -m tempme_tpu.tools.op_census --trace logs/profile_r3/*.xplane.pb
    # capture the Enron-shape TGN train step on the live backend, then parse
    python -m tempme_tpu.tools.op_census --capture enron --steps 20
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp


def parse_trace(xplane_paths, top_ops=15):
    """Aggregate hlo_stats by op category. Returns (categories, top_rows)."""
    from xprof.convert import raw_to_tool_data as r
    data, _ = r.xspace_to_tool_data(list(xplane_paths), "hlo_stats", {})
    table = json.loads(data if isinstance(data, str)
                       else data.decode("utf-8", "ignore"))
    cols = [c["id"] for c in table["cols"]]
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_occ = cols.index("occurrences")
    i_self = cols.index("total_self_time")

    cats = {}
    rows = []
    for row in table["rows"]:
        c = [cell["v"] for cell in row["c"]]
        cat = c[i_cat] or "(none)"
        occ = float(c[i_occ] or 0)
        self_us = float(c[i_self] or 0)
        agg = cats.setdefault(cat, {"occurrences": 0, "self_time_us": 0.0})
        agg["occurrences"] += int(occ)
        agg["self_time_us"] += self_us
        rows.append({"op": c[i_name], "category": cat,
                     "occurrences": int(occ), "self_time_us": self_us})
    rows.sort(key=lambda x: -x["self_time_us"])
    total = sum(a["self_time_us"] for a in cats.values()) or 1.0
    for a in cats.values():
        a["self_time_us"] = round(a["self_time_us"], 1)
        a["pct"] = round(100.0 * a["self_time_us"] / total, 2)
    return cats, rows[:top_ops]


def capture_enron_step(steps=20, out_dir="logs/op_census"):
    """Trace the Enron-shape TGN train step (bench.py's headline measurement)
    on the live backend and return the xplane path(s)."""
    import sys
    sys.path.insert(0, os.getcwd())
    import bench
    import jax
    from tempme_tpu.train import loops
    from tempme_tpu.train.learn_tgn import make_tgn_train_step

    ds, g, feats = bench._enron_shape_setup()
    import jax.numpy as jnp
    import optax
    import numpy as np
    from tempme_tpu.models.tgn import TGN, init_memory_state
    from tempme_tpu.data.events import RandEdgeSampler

    bs, n_degree = int(os.environ.get("TEMPME_BENCH_ENRON_BS", "256")), 30
    model = TGN(node_dim=ds.node_feat.shape[1],
                edge_dim=ds.edge_feat.shape[1],
                num_nodes=ds.full.num_nodes, n_layers=2, n_head=2,
                dropout=0.1)
    mem = init_memory_state(ds.full.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    sampler = RandEdgeSampler([ds.train.src], [ds.train.dst])
    dst_table = jnp.asarray(sampler.dst_list)
    key = jax.random.PRNGKey(0)
    batches = list(loops.iter_batches(ds.train, bs, shuffle=True, seed=0,
                                      drop_remainder=True))[:steps + 3]
    b0 = batches[0]
    _, s0, s1, s2 = loops.sample_support(g, key, b0, dst_table, 2, n_degree)
    params = model.init({"params": key, "dropout": key}, feats, mem, b0.src,
                        b0.dst, b0.dst, b0.ts, b0.eidx, s0, s1, s2,
                        deterministic=True)
    optimizer = __import__("optax").adam(1e-3)
    state = loops.TrainState(params, optimizer.init(params), key)
    step = make_tgn_train_step(model, g, feats, dst_table, n_degree,
                               optimizer)
    # warm/compile outside the trace
    for b in batches[:3]:
        state, mem, aux = step(state, mem, b)
    jax.block_until_ready(aux["loss"])
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        for b in batches[3:3 + steps]:
            state, mem, aux = step(state, mem, b)
        jax.block_until_ready(aux["loss"])
    paths = sorted(glob.glob(osp.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True), key=osp.getmtime)
    assert paths, f"no xplane trace written under {out_dir}"
    return [paths[-1]], steps, bs


def main(argv=None):
    p = argparse.ArgumentParser("tempme_tpu compiled-op census")
    p.add_argument("--trace", nargs="*", default=None,
                   help="existing .xplane.pb path(s) to parse")
    p.add_argument("--capture", choices=["enron"], default=None,
                   help="capture a fresh trace of the named workload first")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="results/op_census.json")
    p.add_argument("--top_ops", type=int, default=15)
    args = p.parse_args(argv)

    meta = {}
    if args.capture:
        paths, steps, bs = capture_enron_step(args.steps)
        meta = {"workload": "enron_shape_tgn_train", "steps": steps,
                "bs": bs}
    elif args.trace:
        paths = args.trace
        meta = {"workload": "existing_trace", "paths": paths}
    else:
        p.error("need --trace or --capture")

    cats, top = parse_trace(paths, args.top_ops)
    order = sorted(cats.items(), key=lambda kv: -kv[1]["self_time_us"])
    print(f"{'category':<28}{'self us':>12}{'%':>8}{'#ops':>8}")
    for cat, a in order:
        print(f"{cat:<28}{a['self_time_us']:>12,.0f}{a['pct']:>8.2f}"
              f"{a['occurrences']:>8}")
    print("\ntop ops by self time:")
    for row in top:
        print(f"  {row['self_time_us']:>10,.0f} us  {row['category']:<20}"
              f"{row['op'][:70]}")
    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"meta": meta, "categories": dict(order), "top_ops": top},
                  f, indent=1)
    print(f"\ncensus -> {args.out}")


if __name__ == "__main__":
    main()
