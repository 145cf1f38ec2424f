"""TempME explainer heads (reference models/explainer.py).

``TempME``     — for TGN / GraphMixer bases: GINE-style event conv over the 3
                 events of each motif walk, motif-level attention (temporal-
                 aware variant by default), optional 12-class one-hot features,
                 MLP -> sigmoid walk importance; walk→edge scatter-max with a
                 dependency gate and Beta-reparameterized sampling; KL sparsity
                 loss against the null-model motif prior; enhance-prediction
                 heads.
``TempMETGAT`` — for TGAT bases: per-walk [edge‖time‖node×2] features, walk
                 self-attention (transformer encoder), sum-of-walk-scores
                 affinity. (The reference's forward has a NameError — the
                 ``attention_encode`` call is missing, models/explainer.py:536;
                 we implement the intended dataflow.)

Walk layout follows ops.sampler.Walks (newest event first), so "slot 2" is the
oldest event e1 — the walk's anchor query in motif attention
(models/explainer.py:31,799).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import Features
from ..ops.encodings import TimeEncode
from ..ops.sampler import Subgraph, Walks
from ..ops.segment import class_mean, walk_to_edge_max

xavier_uniform = nn.initializers.xavier_uniform()
xavier_normal = nn.initializers.xavier_normal()


class WalkInputs(NamedTuple):
    """Walks + the per-walk edge co-occurrence count features that the
    reference precomputes offline ({data}_{mode}_edge.npy,
    processed/data_preprocess.py:346-356); we derive them on device."""
    nodes: jnp.ndarray        # [B, W, 6]
    eids: jnp.ndarray         # [B, W, 3]
    ts: jnp.ndarray           # [B, W, 3]
    cat: jnp.ndarray          # [B, W]
    edge_count: jnp.ndarray   # [B, W, 3, 3]


def make_walk_inputs(walks: Walks) -> WalkInputs:
    from ..ops.segment import edge_cooccurrence_counts
    return WalkInputs(walks.nodes, walks.eids, walks.ts, walks.cat,
                      edge_cooccurrence_counts(walks.eids))


class EventGCN(nn.Module):
    """GINEConv-like event conv: MLP(src + relu(tgt + lin(event)))
    (models/explainer.py:79-96)."""
    node_dim: int
    hid_dim: int

    @nn.compact
    def __call__(self, event_feat, src_feat, tgt_feat):
        event = nn.Dense(self.node_dim, name="lin_event")(event_feat)
        msg = nn.relu(tgt_feat + event)
        h = nn.Dense(self.hid_dim)(src_feat + msg)
        return nn.Dense(self.hid_dim)(nn.relu(h))


class TemporalAwareMotifAttention(nn.Module):
    """Motif attention with temporal recency reweighting
    (models/explainer.py:768-847). ``temporal=False`` gives the plain variant
    (models/explainer.py:12-43)."""
    input_dim: int
    hid_dim: int
    dropout: float = 0.1
    temporal: bool = True
    temporal_bias: float = 0.3

    @nn.compact
    def __call__(self, src_feature, time_idx=None, cut_time=None,
                 deterministic: bool = True):
        # src_feature: [B, W, 3, input_dim]
        b, w = src_feature.shape[0], src_feature.shape[1]
        src = src_feature[:, :, 2:3, :]          # oldest event = query
        tgt = src_feature[:, :, 0:2, :]
        w1 = nn.Dense(self.input_dim, name="W1")
        w2 = nn.Dense(self.input_dim, kernel_init=xavier_uniform,
                      bias_init=nn.initializers.constant(0.1), name="W2")
        wp = w1(src)                              # [B, W, 1, D]
        wq = w2(tgt)                              # [B, W, 2, D]
        scores = jnp.einsum("bwqd,bwkd->bwqk", wp, wq)   # [B, W, 1, 2]
        if self.temporal and time_idx is not None and cut_time is not None:
            sel = time_idx[:, :, :2]
            delta = jnp.abs(cut_time[:, None, None] - sel)
            std = jnp.std(delta, ddof=1) + 1e-6
            tw = jnp.exp(-delta / std)            # [B, W, 2]
            scores = scores * (1.0 - self.temporal_bias
                               + self.temporal_bias * tw[:, :, None, :])
        alpha = nn.softmax(scores, axis=-1)
        if self.temporal:
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
        out = jnp.einsum("bwqk,bwkd->bwqd", alpha, wq)
        out = src + out.sum(axis=2, keepdims=True)
        h = nn.Dense(self.hid_dim)(out)
        h = nn.relu(h)
        if self.temporal:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hid_dim)(h)
        return h.squeeze(2)                       # [B, W, hid]


def beta_sample(key, prob, training: bool):
    """Beta-reparameterized edge-importance sampling
    (models/explainer.py:420-430): α = max(10p, 1), β = max(10(1-p), 1);
    train → Beta(α, β) rsample (jax gamma gradients are implicit-reparam),
    eval → mean α/(α+β)."""
    alpha = jnp.maximum(prob * 10.0, 1.0)
    beta = jnp.maximum((1.0 - prob) * 10.0, 1.0)
    if not training:
        return alpha / (alpha + beta)
    ka, kb = jax.random.split(key)
    ga = jax.random.gamma(ka, alpha)
    gb = jax.random.gamma(kb, beta)
    return ga / (ga + gb + 1e-12)


def kl_sparsity_loss(prob, cat, null_dist, target: float = 0.3,
                     prior: str = "empirical"):
    """Sparsity prior KL (models/explainer.py:432-453). prob: [B, W, 1],
    cat: [B, W], null_dist: [12] in CAT_ORDER."""
    prob = jnp.clip(prob.squeeze(-1), 1e-6, 1 - 1e-6)   # [B, W]
    if prior == "empirical":
        s = jnp.mean(prob, axis=1, keepdims=True)        # [B, 1]
        emp = class_mean(prob, cat, 12)                  # [B, 12]
        emp = s * emp
        null = target * null_dist[None, :]
        kl = ((1 - s) * jnp.log((1 - s) / (1 - target + 1e-6) + 1e-6)
              + emp * jnp.log(emp / (null + 1e-6) + 1e-6))
        return kl.mean()
    kl = (prob * jnp.log(prob / target + 1e-6)
          + (1 - prob) * jnp.log((1 - prob) / (1 - target + 1e-6) + 1e-6))
    return kl.mean()


def compute_walk_importance(time_idx, node_idx, cut_time, node_degree):
    """Soft walk weights: 0.5*recency + 0.5*degree-sigmoid, normalized to mean
    1 (models/explainer.py:260-306)."""
    w = time_idx.shape[1]
    max_t = time_idx.max(axis=-1)                         # [B, W]
    delta = jnp.abs(cut_time[:, None] - max_t)
    recency = jnp.exp(-delta / (jnp.std(delta, ddof=1) + 1e-6))
    valid = node_idx > 0
    degs = jnp.where(valid, node_degree[node_idx], 0.0)
    avg_deg = degs.sum(-1) / (valid.sum(-1).astype(jnp.float32) + 1e-6)
    deg_w = jax.nn.sigmoid((avg_deg - avg_deg.mean())
                           / (jnp.std(avg_deg, ddof=1) + 1e-6))
    imp = 0.5 * recency + 0.5 * deg_w
    return imp / (imp.sum(-1, keepdims=True) / w + 1e-6)


class TempME(nn.Module):
    """Explainer for TGN / GraphMixer bases (models/explainer.py:99-453)."""
    node_dim: int
    edge_dim: int
    out_dim: int = 40
    hid_dim: int = 64
    base_type: str = "tgn"            # tgn | graphmixer
    prior: str = "empirical"
    if_cat: bool = True
    dropout: float = 0.1
    use_temporal_guidance: bool = True
    use_dependency_sampling: bool = True

    @property
    def time_dim(self) -> int:
        return self.node_dim

    @property
    def event_dim(self) -> int:
        return self.edge_dim + self.time_dim + 3

    @property
    def node_emd_dim(self) -> int:
        base = self.hid_dim + self.node_dim
        return base + 12 if self.if_cat else base

    def setup(self):
        self.event_conv = EventGCN(node_dim=self.node_dim, hid_dim=self.hid_dim)
        self.attention = TemporalAwareMotifAttention(
            input_dim=2 * self.hid_dim, hid_dim=self.hid_dim,
            dropout=self.dropout, temporal=self.use_temporal_guidance)
        mlp_dim = self.hid_dim + 12 if self.if_cat else self.hid_dim
        self.head_d1 = nn.Dense(mlp_dim)
        self.head_d2 = nn.Dense(self.hid_dim)
        self.head_d3 = nn.Dense(1)
        self.head_drop = nn.Dropout(self.dropout)
        self.time_encoder = TimeEncode(dim=self.time_dim, trainable=True)
        if self.use_dependency_sampling:
            self.dep_d1 = nn.Dense(self.hid_dim)
            self.dep_d2 = nn.Dense(self.hid_dim // 2)
            self.dep_d3 = nn.Dense(1)
            self.dep_drop1 = nn.Dropout(min(self.dropout * 1.5, 0.99))
            self.dep_drop2 = nn.Dropout(self.dropout)
        self.aff_fc1 = nn.Dense(self.node_emd_dim, kernel_init=xavier_normal)
        self.aff_fc2 = nn.Dense(1, kernel_init=xavier_normal)

    # ------------------------------------------------------------------
    def _walk_features(self, feats: Features, walks: Walks, cut_time):
        from ..ops.gather import gather_rows
        e_feat = gather_rows(feats.edge, walks.eids)    # [B, W, 3, De]
        t_rec = walks.ts
        delta = t_rec[..., -1:] - t_rec                 # Δt vs newest event
        t_feat = self.time_encoder(delta)               # [B, W, 3, Dt]
        event = jnp.concatenate([e_feat, walks.edge_count, t_feat], axis=-1)
        src_feat = gather_rows(feats.node, walks.nodes[..., 0::2])
        tgt_feat = gather_rows(feats.node, walks.nodes[..., 1::2])
        return event, src_feat, tgt_feat

    def __call__(self, feats: Features, walks: Walks, cut_time,
                 deterministic: bool = True) -> jnp.ndarray:
        """Walk importance [B, W, 1] (models/explainer.py:174-201)."""
        event, src_feat, tgt_feat = self._walk_features(feats, walks, cut_time)
        up_src = self.event_conv(event, src_feat, tgt_feat)
        up_tgt = self.event_conv(event, tgt_feat, src_feat)
        updated = jnp.concatenate([up_src, up_tgt], axis=-1)
        h = self.attention(updated, walks.ts, cut_time,
                           deterministic=deterministic)  # [B, W, hid]
        if self.if_cat:
            cat_oh = jax.nn.one_hot(walks.cat, 12, dtype=h.dtype)
            h = jnp.concatenate([h, cat_oh], axis=-1)
        out = nn.relu(self.head_d1(h))
        out = self.head_drop(out, deterministic=deterministic)
        out = nn.relu(self.head_d2(out))
        out = self.head_d3(out)
        return jax.nn.sigmoid(out)                      # [B, W, 1]

    def init_all(self, feats: Features, walks, cut_time, sub: Subgraph):
        """Touches every parameterized path so ``init`` creates the full tree
        (flax only materializes params for layers actually called)."""
        imp = self(feats, walks, cut_time, deterministic=True)
        self.edge_importance(feats, sub, imp, walks, training=False,
                             deterministic=True)
        emb = self.walk_embedding(feats, walks, cut_time, deterministic=True)
        gat = jnp.zeros((emb.shape[0], self.node_dim), emb.dtype)
        x = jnp.concatenate([emb, gat], axis=-1)
        self._affinity(x, x)
        return imp

    # ------------------------------------------------------------------
    def edge_importance(self, feats: Features, sub: Subgraph,
                        graphlet_imp, walks: Walks, training: bool = True,
                        deterministic: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """retrieve_edge_imp_node (models/explainer.py:354-406):
        walk importance -> per-edge importance on hop-0/hop-1 supports."""
        b, w, _ = walks.eids.shape
        edge_walk = walks.eids.reshape(b, w * 3)
        walk_imp = jnp.repeat(graphlet_imp, 3, axis=-1).reshape(b, w * 3)

        if self.use_dependency_sampling:
            e_f = feats.edge[edge_walk]                          # [B, S, De]
            t_enc = self.time_encoder(walks.ts.reshape(b, w * 3))
            x = jnp.concatenate([e_f, t_enc], axis=-1)
            x = nn.relu(self.dep_d1(x))
            x = self.dep_drop1(x, deterministic=deterministic)
            x = nn.relu(self.dep_d2(x))
            x = self.dep_drop2(x, deterministic=deterministic)
            gate = jax.nn.sigmoid(self.dep_d3(x).squeeze(-1))
            walk_imp = walk_imp * (0.5 + 0.5 * gate)

        imp0 = walk_to_edge_max(edge_walk, walk_imp, sub.eids[0])
        imp1 = walk_to_edge_max(edge_walk, walk_imp, sub.eids[1])
        key = self.make_rng("sample") if training else None
        if training:
            k0, k1 = jax.random.split(key)
            imp0 = beta_sample(k0, imp0, True)
            imp1 = beta_sample(k1, imp1, True)
        else:
            imp0 = beta_sample(None, imp0, False)
            imp1 = beta_sample(None, imp1, False)
        imp0 = jnp.where(sub.nodes[0] == 0, 0.0, imp0)
        imp1 = jnp.where(sub.nodes[1] == 0, 0.0, imp1)
        return imp0, imp1

    def retrieve_explanation(self, feats: Features,
                             sub_src, imp_src, walks_src,
                             sub_tgt, imp_tgt, walks_tgt,
                             sub_bgd, imp_bgd, walks_bgd,
                             training: bool = True,
                             deterministic: bool = True):
        """Stacked [3B, ...] per-hop edge importances
        (models/explainer.py:408-418): both hops for TGN, hop-0 only for
        GraphMixer."""
        s0, s1 = self.edge_importance(feats, sub_src, imp_src, walks_src,
                                      training, deterministic)
        t0, t1 = self.edge_importance(feats, sub_tgt, imp_tgt, walks_tgt,
                                      training, deterministic)
        b0, b1 = self.edge_importance(feats, sub_bgd, imp_bgd, walks_bgd,
                                      training, deterministic)
        hop0 = jnp.concatenate([s0, t0, b0], axis=0)
        if self.base_type == "tgn":
            hop1 = jnp.concatenate([s1, t1, b1], axis=0)
            return [hop0, hop1]
        return [hop0]

    # ------------------------------------------------------------------
    # enhance-prediction path (models/explainer.py:203-258)
    # ------------------------------------------------------------------
    def walk_embedding(self, feats: Features, walks: Walks, cut_time,
                       node_degree=None, deterministic: bool = True):
        event, src_feat, tgt_feat = self._walk_features(feats, walks, cut_time)
        up_src = self.event_conv(event, src_feat, tgt_feat)
        up_tgt = self.event_conv(event, tgt_feat, src_feat)
        updated = jnp.concatenate([up_src, up_tgt], axis=-1)
        h = self.attention(updated, walks.ts, cut_time,
                           deterministic=deterministic)      # [B, W, hid]
        if node_degree is None:
            node_degree = jnp.ones((feats.node.shape[0],), jnp.float32)
        ww = compute_walk_importance(walks.ts, walks.nodes, cut_time,
                                     node_degree)
        h = h * ww[..., None]
        h = h.sum(axis=1)                                    # [B, hid]
        if self.if_cat:
            cat_oh = jax.nn.one_hot(walks.cat, 12, dtype=h.dtype).sum(axis=1)
            h = jnp.concatenate([h, cat_oh], axis=-1)
        return h

    def _affinity(self, x1, x2):
        x = jnp.concatenate([x1, x2], axis=-1)
        return self.aff_fc2(nn.relu(self.aff_fc1(x)))

    def enhance_predict_agg(self, feats: Features, cut_time,
                            walks_src: Walks, walks_tgt: Walks,
                            walks_bgd: Walks, src_gat, tgt_gat, bgd_gat,
                            node_degree=None, deterministic: bool = True):
        src_emb = self.walk_embedding(feats, walks_src, cut_time, node_degree,
                                      deterministic)
        tgt_emb = self.walk_embedding(feats, walks_tgt, cut_time, node_degree,
                                      deterministic)
        bgd_emb = self.walk_embedding(feats, walks_bgd, cut_time, node_degree,
                                      deterministic)
        pos = self._affinity(jnp.concatenate([src_emb, src_gat], axis=-1),
                             jnp.concatenate([tgt_emb, tgt_gat], axis=-1))
        neg = self._affinity(jnp.concatenate([src_emb, src_gat], axis=-1),
                             jnp.concatenate([bgd_emb, bgd_gat], axis=-1))
        return pos, neg
