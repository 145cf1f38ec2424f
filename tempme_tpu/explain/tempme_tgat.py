"""TempME explainer variant for TGAT bases (reference models/explainer.py:476-766).

Per-walk features [edge ‖ Δt ‖ src-node ‖ tgt-node] -> transformer encoder over
the 3 events -> mean -> MLP -> self-attention across the walk axis -> MLP ->
sigmoid importance.

The reference forward is broken (``graphlet_emb`` used before assignment,
models/explainer.py:536 — the ``attention_encode`` call was dropped); we
implement the intended dataflow. Its enhance path also feeds an
``out_dim+12``-wide tensor into an encoder built for ``gru_dim``
(models/explainer.py:562-565); we size that encoder correctly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import Features
from ..ops.sampler import Subgraph
from ..ops.segment import walk_to_edge_max
from ..ops.encodings import TimeEncode
from .tempme import WalkInputs, beta_sample, compute_walk_importance

xavier_normal = nn.initializers.xavier_normal()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer with ReLU FFN (torch.nn.TransformerEncoderLayer
    defaults, models/explainer.py:497-504)."""
    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head,
            qkv_features=_round_up(self.d_model, self.n_head),
            out_features=self.d_model,
            dropout_rate=self.dropout, name="self_attn")(
                x, x, deterministic=deterministic)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(
            attn, deterministic=deterministic))
        h = nn.Dense(self.d_ff)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model)(h)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout)(
            h, deterministic=deterministic))
        return x


class TempMETGAT(nn.Module):
    node_dim: int
    edge_dim: int
    out_dim: int = 40
    hid_dim: int = 64
    n_head: int = 8
    dropout: float = 0.1
    if_attn: bool = True
    prior: str = "empirical"

    @property
    def time_dim(self) -> int:
        return self.node_dim

    @property
    def gru_dim(self) -> int:
        return self.edge_dim + self.time_dim + 2 * self.node_dim

    def setup(self):
        self.time_encoder = TimeEncode(dim=self.time_dim, trainable=True)
        self.event_encoder = TransformerEncoderLayer(
            d_model=self.gru_dim, n_head=self.n_head,
            d_ff=32 * self.out_dim, dropout=self.dropout, name="event_enc")
        self.mlp_attn_d1 = nn.Dense(self.hid_dim)
        self.mlp_attn_d2 = nn.Dense(self.out_dim)
        self.walk_encoder = TransformerEncoderLayer(
            d_model=self.out_dim, n_head=self.n_head,
            d_ff=32 * self.out_dim, dropout=self.dropout, name="walk_enc")
        self.walk_encoder_cat = TransformerEncoderLayer(
            d_model=self.out_dim + 12, n_head=self.n_head,
            d_ff=32 * self.out_dim, dropout=self.dropout, name="walk_enc_cat")
        self.head_d1 = nn.Dense(self.hid_dim)
        self.head_d2 = nn.Dense(1)
        self.drop = nn.Dropout(self.dropout)
        # sum-of-walk-scores affinity (MergeLayer_final,
        # models/explainer.py:457-474)
        self.aff_fc = nn.Dense(1, kernel_init=xavier_normal)

    # ------------------------------------------------------------------
    def _combined_features(self, feats: Features, walks: WalkInputs):
        e_feat = feats.edge[walks.eids]                     # [B, W, 3, De]
        delta = walks.ts[..., -1:] - walks.ts
        t_feat = self.time_encoder(delta)                   # [B, W, 3, Dt]
        src_feat = feats.node[walks.nodes[..., 0::2]]
        tgt_feat = feats.node[walks.nodes[..., 1::2]]
        return jnp.concatenate([e_feat, t_feat, src_feat, tgt_feat], axis=-1)

    def attention_encode(self, x, deterministic: bool = True):
        """[B, W, 3, gru_dim] -> [B, W, out_dim]
        (models/explainer.py:701-719)."""
        b, w, l, d = x.shape
        h = self.event_encoder(x.reshape(b * w, l, d),
                               deterministic=deterministic)
        h = h.mean(axis=1).reshape(b, w, d)
        h = nn.relu(self.mlp_attn_d1(h))
        h = self.drop(h, deterministic=deterministic)
        h = self.mlp_attn_d2(h)
        return self.drop(h, deterministic=deterministic)

    def __call__(self, feats: Features, walks: WalkInputs, src_idx, cut_time,
                 tgt_idx, deterministic: bool = True) -> jnp.ndarray:
        """Walk importance [B, W, 1] (models/explainer.py:513-539, intended
        dataflow)."""
        combined = self._combined_features(feats, walks)
        graphlet = self.attention_encode(combined, deterministic)
        if self.if_attn:
            graphlet = self.walk_encoder(graphlet, deterministic=deterministic)
        w = graphlet.shape[1]
        src_emb = jnp.repeat(feats.node[src_idx][:, None, :], w, axis=1)
        tgt_emb = jnp.repeat(feats.node[tgt_idx][:, None, :], w, axis=1)
        h = jnp.concatenate([graphlet, src_emb, tgt_emb], axis=-1)
        h = nn.relu(self.head_d1(h))
        h = self.drop(h, deterministic=deterministic)
        return jax.nn.sigmoid(self.head_d2(h))

    # ------------------------------------------------------------------
    def edge_importance(self, feats: Features, sub: Subgraph, graphlet_imp,
                        walks: WalkInputs, training: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """retrieve_edge_imp (models/explainer.py:721-742): no dependency
        gate; eval returns the raw pooled importance (the TGAT beta_sample
        passes prob through unchanged at eval, models/explainer.py:744-751)."""
        b, w, _ = walks.eids.shape
        edge_walk = walks.eids.reshape(b, w * 3)
        walk_imp = jnp.repeat(graphlet_imp, 3, axis=-1).reshape(b, w * 3)
        imp0 = walk_to_edge_max(edge_walk, walk_imp, sub.eids[0])
        imp1 = walk_to_edge_max(edge_walk, walk_imp, sub.eids[1])
        if training:
            k0, k1 = jax.random.split(self.make_rng("sample"))
            imp0 = beta_sample(k0, imp0, True)
            imp1 = beta_sample(k1, imp1, True)
        imp0 = jnp.where(sub.nodes[0] == 0, 0.0, imp0)
        imp1 = jnp.where(sub.nodes[1] == 0, 0.0, imp1)
        return imp0, imp1

    def retrieve_explanation(self, feats: Features,
                             sub_src, imp_src, walks_src,
                             sub_tgt, imp_tgt, walks_tgt,
                             sub_bgd, imp_bgd, walks_bgd,
                             training: bool = True,
                             deterministic: bool = True):
        """Stacked [3B, width] per-hop edge importances (same layout as
        TempME.retrieve_explanation so the base-contrast dispatch is shared)."""
        s0, s1 = self.edge_importance(feats, sub_src, imp_src, walks_src,
                                      training)
        t0, t1 = self.edge_importance(feats, sub_tgt, imp_tgt, walks_tgt,
                                      training)
        b0, b1 = self.edge_importance(feats, sub_bgd, imp_bgd, walks_bgd,
                                      training)
        return [jnp.concatenate([s0, t0, b0], axis=0),
                jnp.concatenate([s1, t1, b1], axis=0)]

    # ------------------------------------------------------------------
    def walk_embedding(self, feats: Features, walks: WalkInputs, cut_time,
                       node_degree=None, deterministic: bool = True):
        """enhance_predict_walks (models/explainer.py:541-572)."""
        combined = self._combined_features(feats, walks)
        graphlet = self.attention_encode(combined, deterministic)
        cat_oh = jax.nn.one_hot(walks.cat, 12, dtype=graphlet.dtype)
        graphlet = jnp.concatenate([graphlet, cat_oh], axis=-1)
        if self.if_attn:
            graphlet = self.walk_encoder_cat(graphlet,
                                             deterministic=deterministic)
        if node_degree is None:
            node_degree = jnp.ones((feats.node.shape[0],), jnp.float32)
        ww = compute_walk_importance(walks.ts, walks.nodes, cut_time,
                                     node_degree)
        return graphlet * ww[..., None]          # [B, W, out+12]

    def _affinity(self, x1, x2):
        # concat along the walk axis; per-walk score; sum
        x = jnp.concatenate([x1, x2], axis=1)     # [B, 2W, F]
        z = self.aff_fc(x).squeeze(-1)
        return z.sum(axis=-1, keepdims=True)      # [B, 1]

    def enhance_predict_agg(self, feats: Features, cut_time,
                            walks_src, walks_tgt, walks_bgd,
                            node_degree=None, deterministic: bool = True):
        src = self.walk_embedding(feats, walks_src, cut_time, node_degree,
                                  deterministic)
        tgt = self.walk_embedding(feats, walks_tgt, cut_time, node_degree,
                                  deterministic)
        bgd = self.walk_embedding(feats, walks_bgd, cut_time, node_degree,
                                  deterministic)
        return self._affinity(src, tgt), self._affinity(src, bgd)

    def init_all(self, feats: Features, walks, src_idx, cut_time, tgt_idx,
                 sub: Subgraph):
        imp = self(feats, walks, src_idx, cut_time, tgt_idx,
                   deterministic=True)
        self.edge_importance(feats, sub, imp, walks, training=False)
        emb = self.walk_embedding(feats, walks, cut_time, deterministic=True)
        self._affinity(emb, emb)
        return imp
