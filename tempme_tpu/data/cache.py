"""Offline walk/subgraph cache (reference processed/data_preprocess.py).

The reference spends "5-10 minutes" per dataset in per-event Python loops
(batch size 1!, data_preprocess.py:106) writing HDF5; here the same artifacts
are produced by batched on-device sampling and stored as one compressed .npz
per split:

  subgraph_{src,tgt,bgd}_{0,1}   [N, w]         nodes/eids/ts packed per hop
  walks_{src,tgt,bgd}            [N, W, 14]     6 nodes, 3 eids, 3 ts, cat,
                                                marginal (the _cat.h5 layout,
                                                batch_loader.py:120-201)
  edge_{src,tgt,bgd}             [N, W, 3, 3]   co-occurrence counts
                                                ({data}_{mode}_edge.npy)
  dst_fake                       [N]

The online sampler makes this cache optional (SURVEY.md §7.1.2) — it exists
for parity, reproducibility pinning, and host-side inspection.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sampler as S
from ..ops.segment import edge_cooccurrence_counts
from .events import EventStream, RandEdgeSampler
from .graph import TemporalGraph


def build_walk_cache(g: TemporalGraph, events: EventStream,
                     neg_sampler: RandEdgeSampler, n_degree: int,
                     n_walk_cont: int = 3, batch_size: int = 128,
                     seed: int = 0, with_marginal: bool = True) -> dict:
    """Sample supports + walks for every event of a split (batched, on device)."""
    n = len(events)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def one(key, src, dst, bgd, ts, eidx):
        ks = jax.random.split(key, 6)
        out = {}
        for name, anchor, e in (("src", src, eidx), ("tgt", dst, eidx),
                                ("bgd", bgd, None)):
            i = {"src": 0, "tgt": 1, "bgd": 2}[name]
            sub = S.find_k_hop(g, ks[2 * i], anchor, ts, 2, n_degree, eids=e)
            walks = S.find_k_walks(g, ks[2 * i + 1], anchor, sub, n_degree,
                                   n_walk_cont)
            out[f"subgraph_{name}_0"] = jnp.concatenate(
                [sub.nodes[0].astype(jnp.float32),
                 sub.eids[0].astype(jnp.float32), sub.ts[0]], axis=1)
            out[f"subgraph_{name}_1"] = jnp.concatenate(
                [sub.nodes[1].astype(jnp.float32),
                 sub.eids[1].astype(jnp.float32), sub.ts[1]], axis=1)
            out[f"walks_{name}_nodes"] = walks.nodes
            out[f"walks_{name}_eids"] = walks.eids
            out[f"walks_{name}_ts"] = walks.ts
            out[f"walks_{name}_cat"] = walks.cat
            out[f"edge_{name}"] = edge_cooccurrence_counts(walks.eids)
        return out

    chunks = []
    rng = np.random.RandomState(seed)
    for s0 in range(0, n, batch_size):
        e0 = min(n, s0 + batch_size)
        pad = batch_size - (e0 - s0)
        sl = slice(s0, e0)
        src = np.r_[events.src[sl], np.zeros(pad, np.int32)]
        dst = np.r_[events.dst[sl], np.zeros(pad, np.int32)]
        ts = np.r_[events.ts[sl], np.zeros(pad, np.float32)]
        eidx = np.r_[events.e_idx[sl], np.zeros(pad, np.int32)]
        _, fake = neg_sampler.sample(batch_size)
        key, sub = jax.random.split(key)
        out = one(sub, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(fake),
                  jnp.asarray(ts), jnp.asarray(eidx))
        out = {k: np.asarray(v)[:e0 - s0] for k, v in out.items()}
        out["dst_fake"] = np.asarray(fake)[:e0 - s0]
        chunks.append(out)

    cache = {k: np.concatenate([c[k] for c in chunks], axis=0)
             for k in chunks[0]}

    if with_marginal:
        # empirical class distribution over the whole split
        # (data_preprocess.py:180-193)
        cats = np.concatenate([cache[f"walks_{s}_cat"].ravel()
                               for s in ("src", "tgt", "bgd")])
        dist = np.bincount(cats, minlength=12) / max(len(cats), 1)
        cache["class_distribution"] = dist.astype(np.float32)
        for s in ("src", "tgt", "bgd"):
            cache[f"walks_{s}_marginal"] = dist[
                cache[f"walks_{s}_cat"]].astype(np.float32)
    return cache


def pack_walks_14(cache: dict, side: str) -> np.ndarray:
    """The reference's 14-wide walk rows (batch_loader.py:176-201)."""
    return np.concatenate([
        cache[f"walks_{side}_nodes"].astype(np.float32),
        cache[f"walks_{side}_eids"].astype(np.float32),
        cache[f"walks_{side}_ts"].astype(np.float32),
        cache[f"walks_{side}_cat"][..., None].astype(np.float32),
        cache[f"walks_{side}_marginal"][..., None],
    ], axis=-1)


def cache_to_inputs(cache: dict, idx: np.ndarray, n_degree: int):
    """Slice a cached split by batch indices into the online sampler's output
    types: ``(bgd, (sub_src, sub_tgt, sub_bgd), (w_src, w_tgt, w_bgd))`` —
    the ``get_item`` / ``get_item_edge`` equivalents
    (utils/batch_loader.py:204-242), feeding the same train/eval steps that
    consume online samples.
    """
    from ..explain.tempme import WalkInputs

    def sub(side):
        nodes, eids, ts = [], [], []
        for h in (0, 1):
            w = n_degree ** (h + 1)
            arr = cache[f"subgraph_{side}_{h}"][idx]
            nodes.append(jnp.asarray(arr[:, :w], jnp.int32))
            eids.append(jnp.asarray(arr[:, w:2 * w], jnp.int32))
            ts.append(jnp.asarray(arr[:, 2 * w:], jnp.float32))
        return S.Subgraph(tuple(nodes), tuple(eids), tuple(ts))

    def wlk(side):
        return WalkInputs(
            nodes=jnp.asarray(cache[f"walks_{side}_nodes"][idx], jnp.int32),
            eids=jnp.asarray(cache[f"walks_{side}_eids"][idx], jnp.int32),
            ts=jnp.asarray(cache[f"walks_{side}_ts"][idx], jnp.float32),
            cat=jnp.asarray(cache[f"walks_{side}_cat"][idx], jnp.int32),
            edge_count=jnp.asarray(cache[f"edge_{side}"][idx], jnp.float32))

    bgd = jnp.asarray(cache["dst_fake"][idx], jnp.int32)
    return (bgd, (sub("src"), sub("tgt"), sub("bgd")),
            (wlk("src"), wlk("tgt"), wlk("bgd")))


def save_cache(path: str, cache: dict) -> None:
    np.savez_compressed(path, **cache)


def load_cache(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
