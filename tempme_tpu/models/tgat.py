"""TGAT: temporal graph attention network (reference TGAT/TGAT.py:389-739).

Pyramid aggregation over a k-hop temporal support tree: hop widths
n, n², ..., n^k; at stack layer ℓ every remaining pyramid level i aggregates
its children (level i+1) through a shared 1×n temporal attention
(TGAT/TGAT.py:678-706). Fully batched, fixed shapes, one jit region.

Uses the split-projection attention (ops/attention.py): at stack layer 0 every
pyramid level holds *raw* node features, so the node table is projected once
and gathered post-projection; deeper layers project their computed embeddings
directly. The query's zero-edge slot (TGAT/TGAT.py:380) contributes nothing
through a bias-free projection and is skipped.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.aggregators import LSTMPool, MapAttnLayer, MeanPool
from ..ops.attention import SplitTemporalAttention
from ..ops.encodings import make_time_encoder
from ..ops.gather import gather_rows
from ..ops.layers import GatedMerge, ConcatMerge
from ..ops.sampler import Subgraph
from .common import Features


class TGATAttnLayer(nn.Module):
    """One AttnModel: attention over [node||edge||time] keys + 2-branch merge
    (TGAT/TGAT.py:317-386)."""
    feat_dim: int
    edge_dim: int
    time_dim: int
    n_head: int
    dropout: float
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        model_dim = self.feat_dim + self.edge_dim + self.time_dim
        # The reference requires model_dim % n_head == 0 (TGAT/TGAT.py:340),
        # which rejects e.g. uslegis (172+1+172=345). We round the per-head
        # dim up instead; the output projection maps h*d_k back to model_dim.
        d_k = -(-model_dim // self.n_head)
        self.attn = SplitTemporalAttention(
            n_head=self.n_head, d_model=model_dim, d_k=d_k,
            d_node=self.feat_dim, d_edge=self.edge_dim, d_time=self.time_dim,
            dropout=self.dropout, compute_dtype=self.compute_dtype)
        self.merger = GatedMerge(dim3=self.feat_dim, dim4=self.feat_dim)

    def project_node_table(self, table):
        return self.attn.project_node_table(table)

    def project_node(self, x):
        return self.attn.project_node(x)

    def project_edge_table(self, table):
        return self.attn.project_edge_table(table)

    def project_edge(self, x):
        return self.attn.project_edge(x)

    def __call__(self, src, src_t, k_nv, v_nv, k_ev, v_ev, ngh_t, mask,
                 explain_weight=None, deterministic=True):
        b, nq, _ = src.shape
        src_e = jnp.zeros((b, nq, self.edge_dim), src.dtype)
        residual = jnp.concatenate([src, src_e, src_t], axis=-1)
        out, attn = self.attn(src, src_t, residual, k_nv, v_nv, k_ev, v_ev,
                              ngh_t, mask=mask, explain_weight=explain_weight,
                              deterministic=deterministic)
        return self.merger(out, src), attn


class TGAT(nn.Module):
    """Variant flags mirror the reference factories:

    * ``agg_method``: "attn" | "lstm" | "mean" (``init_attn_model_list``,
      TGAT/TGAT.py:435-460);
    * ``attn_mode``: "prod" | "map" (AttnModel's score mode,
      TGAT/TGAT.py:99-106,140-218), only meaningful for agg_method="attn";
    * ``use_time``: "time" | "pos" | "empty" (``init_time_encoder``,
      TGAT/TGAT.py:435-445); "pos" ranks neighbors within each parent's
      n-wide group (original TGAT semantics), so ``pos_seq_len`` only needs
      to be >= n_degree.

    The default prod path runs the TPU-optimized split-projection attention;
    the variants share a raw-feature pyramid (``_node_embed_raw``) kept for
    parity/ablations.
    """
    node_dim: int
    edge_dim: int
    num_layers: int = 3
    n_head: int = 2
    dropout: float = 0.1
    agg_method: str = "attn"
    attn_mode: str = "prod"
    use_time: str = "time"
    pos_seq_len: int = 1024
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def time_dim(self) -> int:
        return self.node_dim

    def setup(self):
        self.time_encoder = make_time_encoder(
            self.use_time, self.time_dim, seq_len=self.pos_seq_len,
            trainable=True, name="time_encoder")
        if self.agg_method == "attn" and self.attn_mode == "prod":
            self.attn_layers = [
                TGATAttnLayer(feat_dim=self.node_dim, edge_dim=self.edge_dim,
                              time_dim=self.time_dim, n_head=self.n_head,
                              dropout=self.dropout,
                              compute_dtype=self.compute_dtype,
                              name=f"attn_{i}")
                for i in range(self.num_layers)]
        elif self.agg_method == "attn" and self.attn_mode == "map":
            self.attn_layers = [
                MapAttnLayer(feat_dim=self.node_dim, edge_dim=self.edge_dim,
                             time_dim=self.time_dim, n_head=self.n_head,
                             dropout=self.dropout, name=f"attn_{i}")
                for i in range(self.num_layers)]
        elif self.agg_method == "lstm":
            self.attn_layers = [
                LSTMPool(feat_dim=self.node_dim, edge_dim=self.edge_dim,
                         time_dim=self.time_dim, name=f"attn_{i}")
                for i in range(self.num_layers)]
        elif self.agg_method == "mean":
            self.attn_layers = [
                MeanPool(feat_dim=self.node_dim, edge_dim=self.edge_dim,
                         name=f"attn_{i}")
                for i in range(self.num_layers)]
        else:
            raise ValueError(
                f"invalid agg_method/attn_mode: {self.agg_method}/"
                f"{self.attn_mode}")
        self.affinity_score = ConcatMerge(hidden=self.node_dim, out=1)

    @property
    def _uses_split_attention(self) -> bool:
        return self.agg_method == "attn" and self.attn_mode == "prod"

    # -- feature assembly (TGAT/TGAT.py:643-676) ---------------------------
    def _time_features(self, cut_time, sub: Subgraph, n: int):
        b = cut_time.shape[0]
        feats = [self.time_encoder(jnp.zeros((b, 1), jnp.float32))]
        standard = cut_time[:, None]                       # parent timestamps
        for t_rec in sub.ts:
            delta = standard[:, :, None] - t_rec.reshape(b, -1, n)
            if self.use_time == "pos":
                # positional ranks are per-parent neighbor groups of width n
                # (original TGAT semantics; the fork's flattened call would
                # rank across parents AND index past seq_len=n_degree —
                # ADVICE r2 medium). Encode [b*n^h, n] rows, then flatten.
                enc = self.time_encoder(delta.reshape(-1, n))
                feats.append(enc.reshape(b, -1, enc.shape[-1]))
            else:
                feats.append(self.time_encoder(delta.reshape(b, -1)))
            standard = t_rec
        return feats

    def _node_embed_raw(self, feats: Features, src, cut_time, sub: Subgraph,
                        explain_weights=None, deterministic: bool = True
                        ) -> jnp.ndarray:
        """Pyramid aggregation through the variant aggregators (map attention,
        LSTM pool, mean pool), which consume raw per-level [node, edge, time]
        features rather than the split projections. Parity/ablation path —
        not the perf path."""
        n = sub.nodes[0].shape[1]
        node_levels = [src[:, None]] + list(sub.nodes)
        masks = [nodes == 0 for nodes in sub.nodes]
        tfeat = self._time_features(cut_time, sub, n)
        b = src.shape[0]

        l = self.num_layers
        hidden = [feats.node[lv] for lv in node_levels]   # raw features/level
        for layer in range(l):
            lay = self.attn_layers[layer]
            new_hidden = []
            for i in range(l - layer):
                q = hidden[i]                              # [B, n^i, Df]
                nq = q.shape[1]
                src_flat = q.reshape(b * nq, -1)
                src_t = tfeat[i].reshape(b * nq, 1, -1)
                seq = hidden[i + 1].reshape(b * nq, n, -1)
                seq_e = feats.edge[sub.eids[i]].reshape(b * nq, n, -1)
                seq_t = tfeat[i + 1].reshape(b * nq, n, -1)
                mask = masks[i].reshape(b * nq, n)
                ew = None
                if explain_weights is not None:
                    ew = explain_weights[i].reshape(b * nq, n)
                out, _ = lay(src_flat, src_t, seq, seq_t, seq_e, mask,
                             explain_weight=ew, deterministic=deterministic)
                new_hidden.append(out.reshape(b, nq, -1))
            hidden = new_hidden
        return hidden[0].squeeze(1)

    def node_embed(self, feats: Features, src, cut_time, sub: Subgraph,
                   explain_weights: Optional[List[jnp.ndarray]] = None,
                   deterministic: bool = True) -> jnp.ndarray:
        """forward_msg (TGAT/TGAT.py:607-619): [B] src -> [B, node_dim]."""
        if not self._uses_split_attention:
            return self._node_embed_raw(feats, src, cut_time, sub,
                                        explain_weights, deterministic)
        n = sub.nodes[0].shape[1]
        node_levels = [src[:, None]] + list(sub.nodes)
        masks = [nodes == 0 for nodes in sub.nodes]
        tfeat = self._time_features(cut_time, sub, n)

        l = self.num_layers
        hidden = None                       # None => levels hold raw features
        for layer in range(l):
            lay = self.attn_layers[layer]
            if hidden is None:
                k_tab, v_tab = lay.project_node_table(feats.node)
            new_hidden = []
            for i in range(l - layer):
                if hidden is None:
                    q_node = gather_rows(feats.node, node_levels[i])
                    # one-hot matmul gather (PERF.md: row gathers are
                    # DMA-descriptor-bound on TPU)
                    k_nv = gather_rows(k_tab, node_levels[i + 1])
                    v_nv = gather_rows(v_tab, node_levels[i + 1])
                else:
                    q_node = hidden[i]
                    k_nv, v_nv = lay.project_node(hidden[i + 1])
                # raw (narrow) edge rows + per-position projection
                k_ev, v_ev = lay.project_edge(
                    gather_rows(feats.edge, sub.eids[i]))
                ew = explain_weights[i] if explain_weights is not None else None
                out, _ = lay(q_node, tfeat[i], k_nv, v_nv, k_ev, v_ev,
                             tfeat[i + 1], masks[i], explain_weight=ew,
                             deterministic=deterministic)
                new_hidden.append(out)
            hidden = new_hidden
        return hidden[0].squeeze(1)

    def contrast(self, feats: Features, src, tgt, bgd, cut_time,
                 sub_src: Subgraph, sub_tgt: Subgraph, sub_bgd: Subgraph,
                 explain_weights=None, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pos/neg affinity logits [B, 1] (TGAT/TGAT.py:461-481).

        ``explain_weights``: the reference's per-layer pair-of-pairs
        [[imp_src, imp_tgt], [imp_src, imp_bgd]] (temp_exp_main.py:319,613);
        each imp is a list over hops of [B, n^(h+1)] weights.
        """
        if explain_weights is not None:
            (exp_src_p, exp_tgt), (exp_src_n, exp_bgd) = explain_weights
        else:
            exp_src_p = exp_tgt = exp_src_n = exp_bgd = None
        src_emb_p = self.node_embed(feats, src, cut_time, sub_src, exp_src_p,
                                    deterministic)
        tgt_emb = self.node_embed(feats, tgt, cut_time, sub_tgt, exp_tgt,
                                  deterministic)
        pos = self.affinity_score(src_emb_p, tgt_emb)
        src_emb_n = self.node_embed(feats, src, cut_time, sub_src, exp_src_n,
                                    deterministic)
        bgd_emb = self.node_embed(feats, bgd, cut_time, sub_bgd, exp_bgd,
                                  deterministic)
        neg = self.affinity_score(src_emb_n, bgd_emb)
        return pos, neg

    def get_node_emb(self, feats: Features, src, tgt, bgd, cut_time,
                     sub_src, sub_tgt, sub_bgd, deterministic: bool = True):
        """(src, tgt, bgd) embeddings (TGAT/TGAT.py:507-519)."""
        return (self.node_embed(feats, src, cut_time, sub_src, None, deterministic),
                self.node_embed(feats, tgt, cut_time, sub_tgt, None, deterministic),
                self.node_embed(feats, bgd, cut_time, sub_bgd, None, deterministic))

    def __call__(self, feats: Features, src, tgt, bgd, cut_time,
                 sub_src, sub_tgt, sub_bgd, deterministic: bool = True):
        return self.contrast(feats, src, tgt, bgd, cut_time,
                             sub_src, sub_tgt, sub_bgd,
                             deterministic=deterministic)
