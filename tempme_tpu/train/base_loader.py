"""Rebuild a trained base model (module + params [+ TGN memory]) from a
checkpoint written by learn_base / learn_tgn.

Replaces the reference's ``torch.load(weights_only=False)`` whole-module
pickles (temp_exp_main.py:700-704) with meta-driven reconstruction.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.common import Features
from ..utils.checkpoint import load_meta, load_params


class LoadedBase(NamedTuple):
    base_type: str
    model: object
    params: dict
    memory: Optional[object]      # TGNMemoryState for tgn, else None
    meta: dict


def load_base(ckpt_path: str, feats: Features) -> LoadedBase:
    meta = load_meta(ckpt_path)
    base_type = meta["base_type"]
    node_dim, edge_dim = meta["node_dim"], meta["edge_dim"]
    key = jax.random.PRNGKey(0)

    if base_type == "tgat":
        from ..models.tgat import TGAT
        model = TGAT(node_dim=node_dim, edge_dim=edge_dim,
                     num_layers=meta["n_layer"], n_head=meta["n_head"],
                     dropout=meta["drop_out"],
                     agg_method=meta.get("agg_method", "attn"),
                     attn_mode=meta.get("attn_mode", "prod"),
                     use_time=meta.get("use_time", "time"),
                     pos_seq_len=meta.get("pos_seq_len", 1024),
                     remat=meta["n_layer"] >= 3)
        template = _init_stateless(model, feats, meta, key)
        params = load_params(ckpt_path, template)
        return LoadedBase(base_type, model, params, None, meta)

    if base_type == "graphmixer":
        from ..models.graphmixer import GraphMixer
        model = GraphMixer(node_dim=node_dim, edge_dim=edge_dim,
                           num_tokens=meta["n_degree"],
                           num_layers=meta["n_layer"],
                           dropout=meta["drop_out"])
        template = _init_stateless(model, feats, meta, key)
        params = load_params(ckpt_path, template)
        return LoadedBase(base_type, model, params, None, meta)

    if base_type == "tgn":
        from ..models.tgn import TGN, init_memory_state
        model = TGN(node_dim=node_dim, edge_dim=edge_dim,
                    num_nodes=meta["num_nodes"], n_layers=meta["n_layer"],
                    n_head=meta["n_head"], dropout=meta["drop_out"],
                    memory_updater=meta.get("memory_updater", "gru"),
                    aggregator=meta.get("aggregator", "last"),
                    message_function=meta.get("message_function", "mlp"),
                    embedding_type=meta.get("embedding_module",
                                            "graph_attention"),
                    mean_time_shift=tuple(meta.get("mean_time_shift",
                                                   (0.0, 0.0))),
                    std_time_shift=tuple(meta.get("std_time_shift",
                                                  (1.0, 1.0))))
        mem = init_memory_state(meta["num_nodes"], model.memory_dim,
                                model.raw_message_dim)
        params_t = _init_tgn(model, feats, mem, meta, key)
        blob = load_params(ckpt_path, {"params": params_t, "memory": mem})
        return LoadedBase(base_type, model, blob["params"], blob["memory"],
                          meta)

    raise ValueError(f"unknown base_type {base_type}")


def _dummy_subgraphs(meta, k, b=2, tiny=False):
    """``tiny=True`` inits on width-2 supports — TGAT params are
    support-width independent, and the real 3-layer pyramid (30/900/27000)
    costs minutes of init compile. GraphMixer's token-mix Dense is sized by
    n_degree, so it keeps the real width."""
    from ..ops.sampler import Subgraph
    n = 2 if tiny else meta["n_degree"]
    nodes, eids, ts = [], [], []
    width = n
    for _ in range(k):
        nodes.append(jnp.zeros((b, width), jnp.int32))
        eids.append(jnp.zeros((b, width), jnp.int32))
        ts.append(jnp.zeros((b, width), jnp.float32))
        width *= n
    return Subgraph(tuple(nodes), tuple(eids), tuple(ts))


def _init_stateless(model, feats, meta, key):
    b = 2
    is_tgat = meta["base_type"] == "tgat"
    k = meta["n_layer"] if is_tgat else 2
    sub = _dummy_subgraphs(meta, k, b, tiny=is_tgat)
    z = jnp.zeros((b,), jnp.int32)
    t = jnp.zeros((b,), jnp.float32)
    return model.init({"params": key}, feats, z, z, z, t, sub, sub, sub,
                      deterministic=True)


def _init_tgn(model, feats, mem, meta, key):
    b = 2
    sub = _dummy_subgraphs(meta, 2, b)
    z = jnp.zeros((b,), jnp.int32)
    t = jnp.zeros((b,), jnp.float32)
    return model.init({"params": key}, feats, mem, z, z, z, t, z,
                      sub, sub, sub, deterministic=True)
