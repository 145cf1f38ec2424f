"""Null-model motif prior: the 12-class motif distribution of a shuffled graph.

Reference: utils/null_model.py — reload the dataset with permuted (src, dst),
sample 50 batches x 10 test events of motif walks (N1 = n_degree, N2 = 1) on
the shuffled full graph, and normalize class counts.

Deviation (documented): the reference builds the null distribution in one class
order (utils/null_model.py:90) but scatters empirical means in another
(processed/data_preprocess.py:171 via cat_feat) — the two orders disagree, so
its KL pairs mismatched classes. We use the canonical ``CAT_ORDER`` for both.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..data.events import EventStream, shuffled_events, split_events
from ..data.graph import build_temporal_graph
from ..ops import sampler as S


def estimate_null_distribution(events: EventStream,
                               n_degree: int,
                               node_feat: np.ndarray,
                               edge_feat: np.ndarray,
                               num_batches: int = 50,
                               batch_size: int = 10,
                               seed: int = 0) -> np.ndarray:
    """Returns the [12] motif-class probability vector in CAT_ORDER."""
    shuf = shuffled_events(events, seed=seed)
    splits = split_events(shuf, node_feat, edge_feat)
    g = build_temporal_graph(shuf, events.num_nodes, events.num_edges)
    test = splits.test

    counts = np.zeros(12, np.int64)
    total = 0
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def one_batch(key, src, dst, bgd, ts, eidx):
        k = jax.random.split(key, 6)
        out = []
        for i, (anchor, e) in enumerate([(src, eidx), (dst, eidx), (bgd, None)]):
            sub = S.find_k_hop(g, k[2 * i], anchor, ts, 2, n_degree, eids=e)
            walks = S.find_k_walks(g, k[2 * i + 1], anchor, sub, n_degree, 1)
            out.append(walks.cat)
        return jnp.concatenate(out, axis=0)

    rng = np.random.RandomState(seed)
    dst_pool = np.unique(np.concatenate([test.src, test.dst, splits.train.dst]))
    n = len(test)
    for b in range(num_batches):
        s = b * batch_size
        if s + batch_size > n:
            break
        key, sub = jax.random.split(key)
        src = jnp.asarray(test.src[s:s + batch_size])
        dst = jnp.asarray(test.dst[s:s + batch_size])
        bgd = jnp.asarray(dst_pool[rng.randint(0, len(dst_pool), batch_size)])
        ts = jnp.asarray(test.ts[s:s + batch_size])
        eidx = jnp.asarray(test.e_idx[s:s + batch_size])
        cats = np.asarray(one_batch(sub, src, dst, bgd, ts, eidx))
        counts += np.bincount(cats.ravel(), minlength=12)
        total += cats.size
    if total == 0:
        return np.full(12, 1.0 / 12, np.float32)
    return (counts / total).astype(np.float32)


def null_distribution_stability(events: EventStream, n_degree: int,
                                node_feat: np.ndarray, edge_feat: np.ndarray,
                                seeds=(0, 1, 2), num_batches: int = 50,
                                batch_size: int = 10):
    """Stability report for the estimator (VERDICT r2 weak#9: the reference's
    fixed 50x10-event sample consumes ~38% of a small test split with no
    variance check). Re-estimates under ``seeds`` (different shuffles AND
    different sampled events) and returns per-class mean/std plus the max
    pairwise total-variation distance — the number that bounds how much the
    KL prior the explainer trains against can move between estimator runs."""
    dists = np.stack([
        estimate_null_distribution(events, n_degree, node_feat, edge_feat,
                                   num_batches=num_batches,
                                   batch_size=batch_size, seed=sd)
        for sd in seeds])
    tv = 0.0
    for i in range(len(dists)):
        for j in range(i + 1, len(dists)):
            tv = max(tv, 0.5 * float(np.abs(dists[i] - dists[j]).sum()))
    return dict(mean=dists.mean(axis=0), std=dists.std(axis=0),
                max_tv_distance=tv, dists=dists)


def get_null_distribution(data_name: str, events: EventStream, n_degree: int,
                          node_feat: np.ndarray, edge_feat: np.ndarray,
                          cache_dir: str = "params", seed: int = 0
                          ) -> np.ndarray:
    """Cached entry point (reference utils/null_model.py:124): the null prior
    is a dataset-level constant, so estimate once and reuse across drivers."""
    import os
    import os.path as osp
    path = osp.join(cache_dir, f"null_{data_name}_n{n_degree}_s{seed}.npy")
    if osp.exists(path):
        return np.load(path).astype(np.float32)
    dist = estimate_null_distribution(events, n_degree, node_feat, edge_feat,
                                      seed=seed)
    os.makedirs(cache_dir, exist_ok=True)
    np.save(path, dist)
    return dist
