"""Offline preprocessing CLI (reference processed/data_preprocess.py +
preprocess_for_explainer.py — which configured the run by regex-rewriting
source; here it's just flags).

Usage:
    python -m tempme_tpu.train.preprocess --data uslegis_sampled \
        --out_dir cache/
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import time

from ..config import DEGREE_DICT
from ..data.cache import build_walk_cache, save_cache
from ..data.events import load_dataset, RandEdgeSampler
from ..data.graph import build_temporal_graph


def main(argv=None):
    p = argparse.ArgumentParser("tempme_tpu offline walk/subgraph cache")
    p.add_argument("-d", "--data", type=str, default="uslegis_sampled")
    p.add_argument("--data_dir", type=str,
                   default=os.environ.get("TEMPME_DATA_DIR",
                                          "/root/reference/processed"))
    p.add_argument("--out_dir", type=str, default="cache")
    p.add_argument("--modes", type=str, default="train,test")
    p.add_argument("--n_degree", type=int, default=0)
    p.add_argument("--n_walk_cont", type=int, default=3)
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    n_degree = args.n_degree or DEGREE_DICT.get(args.data, 20)

    ds = load_dataset(args.data, args.data_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    for mode in args.modes.split(","):
        t0 = time.time()
        if mode == "train":
            g = build_temporal_graph(ds.train, ds.full.num_nodes,
                                     ds.full.num_edges)
            events = ds.train
            neg = RandEdgeSampler([ds.train.src], [ds.train.dst],
                                  seed=args.seed)
        else:
            g = build_temporal_graph(ds.full, ds.full.num_nodes,
                                     ds.full.num_edges)
            events = ds.test
            neg = RandEdgeSampler(
                [ds.train.src, ds.val.src, ds.test.src],
                [ds.train.dst, ds.val.dst, ds.test.dst], seed=args.seed)
        cache = build_walk_cache(g, events, neg, n_degree,
                                 n_walk_cont=args.n_walk_cont,
                                 batch_size=args.bs, seed=args.seed)
        out = osp.join(args.out_dir, f"{args.data}_{mode}.npz")
        save_cache(out, cache)
        n = len(events)
        dt = time.time() - t0
        print(f"{mode}: {n} events -> {out} in {dt:.1f}s "
              f"({n / dt:,.0f} events/s; reference: '5-10 minutes', "
              f"preprocess_for_explainer.py:59)")


if __name__ == "__main__":
    main()
