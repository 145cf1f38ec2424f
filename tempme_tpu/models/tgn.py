"""TGN: temporal graph network with node memory (reference TGN/tgn.py +
TGN/modules/*).

The reference's mutable machinery — ``Memory`` (tensor + python-dict message
lists, TGN/modules/memory.py:8-75), ``LastMessageAggregator`` (python loop,
message_aggregator.py:34-55), GRU updater — becomes one explicit, functional
``TGNMemoryState`` threaded through every step:

* "last message wins per node" is a deterministic segment-argmax over batch
  positions (destination-side stores win over source-side for nodes playing
  both roles, matching the reference's append order, tgn.py:179-191);
* one raw-message slot per node suffices: the reference only ever aggregates
  the *last* stored message, so append == overwrite;
* ``backup/restore/detach`` (memory.py:48-75) are value copies / no-ops under
  the functional step boundary.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import SplitTemporalAttention
from ..ops.encodings import TimeEncode
from ..ops.layers import ConcatMerge
from ..ops.gather import gather_rows
from ..ops.sampler import Subgraph
from .common import Features


class TGNMemoryState(NamedTuple):
    memory: jnp.ndarray        # [N, Dm] float32
    last_update: jnp.ndarray   # [N] float32
    msg_buf: jnp.ndarray       # [N, raw_dim] float32 pending raw message
    msg_ts: jnp.ndarray        # [N] float32 pending message timestamp
    msg_valid: jnp.ndarray     # [N] bool


def init_memory_state(num_nodes: int, memory_dim: int, raw_dim: int
                      ) -> TGNMemoryState:
    return TGNMemoryState(
        memory=jnp.zeros((num_nodes, memory_dim), jnp.float32),
        last_update=jnp.zeros((num_nodes,), jnp.float32),
        msg_buf=jnp.zeros((num_nodes, raw_dim), jnp.float32),
        msg_ts=jnp.zeros((num_nodes,), jnp.float32),
        msg_valid=jnp.zeros((num_nodes,), bool),
    )


class TGNAttnLayer(nn.Module):
    """TemporalAttentionLayer (TGN/modules/embedding_module.py:120-182):
    q = [feat || te(0)], k = [ngh_feat || edge || te(Δt)], then a concat-merge
    back to node_dim. Built on the split-projection attention so node/edge
    tables project once per step (ops/attention.py docstring)."""
    node_dim: int
    edge_dim: int
    time_dim: int
    n_head: int
    dropout: float
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        query_dim = self.node_dim + self.time_dim
        d_k = -(-query_dim // self.n_head)
        self.attn = SplitTemporalAttention(
            n_head=self.n_head, d_model=query_dim, d_k=d_k,
            d_node=self.node_dim, d_edge=self.edge_dim, d_time=self.time_dim,
            dropout=self.dropout, compute_dtype=self.compute_dtype)
        self.merger = ConcatMerge(hidden=self.node_dim, out=self.node_dim)

    def project_node_table(self, table):
        return self.attn.project_node_table(table)

    def project_node(self, x):
        return self.attn.project_node(x)

    def project_edge_table(self, table):
        return self.attn.project_edge_table(table)

    def project_edge(self, x):
        return self.attn.project_edge(x)

    def __call__(self, src_feat, src_time_emb, k_nv, v_nv, k_ev, v_ev,
                 ngh_time_emb, mask, explain_weight=None, deterministic=True):
        # src_feat: [Bq, Dn]; projected key/value parts: [Bq, n, h*dk]
        q_node = src_feat[:, None, :]
        residual = jnp.concatenate([q_node, src_time_emb], axis=-1)
        out, attn = self.attn(q_node, src_time_emb, residual,
                              k_nv, v_nv, k_ev, v_ev, ngh_time_emb,
                              mask=mask, explain_weight=explain_weight,
                              deterministic=deterministic)
        out = out.squeeze(1)
        return self.merger(out, src_feat), attn

    def multi_mask(self, src_feat, src_time_emb, k_nv, v_nv, k_ev, v_ev,
                   ngh_time_emb, q_keep, kv_keep):
        """Shared-projection attention under R simultaneous keep masks (ratio
        sweep): q_keep [R, Bq], kv_keep [R, Bq, n] -> [R, Bq, node_dim].
        Dropped entries behave exactly like node-id-0 padding (zero node
        features, masked scores) — see SplitTemporalAttention.multi_mask."""
        q_node = src_feat[:, None, :]
        out = self.attn.multi_mask(q_node, src_time_emb,
                                   k_nv, v_nv, k_ev, v_ev, ngh_time_emb,
                                   q_keep[..., None],
                                   kv_keep)
        out = out.squeeze(2)                         # [R, Bq, d_model]
        src_r = src_feat[None] * q_keep[..., None].astype(src_feat.dtype)
        return self.merger(out, src_r)


class TGN(nn.Module):
    """Config variants mirror the reference factories:

    * ``memory_updater``: "gru" | "rnn" (TGN/modules/memory_updater.py:46-66,
      ``get_memory_updater``) — GRU vs vanilla tanh-RNN cell.
    * ``aggregator``: "last" | "mean" (message_aggregator.py:34-90,
      ``get_message_aggregator``). Pending messages per node always come from
      a single batch (positives are persisted+cleared before new stores,
      TGN/tgn.py:167-191), so a within-batch segment-mean with
      buffer-overwrite reproduces ``MeanMessageAggregator`` exactly.
    * ``message_function``: "mlp" | "identity" (message_function.py:13-40);
      identity keeps the raw message dim (TGN/tgn.py:62-63).
    * ``embedding_type``: "graph_attention" | "identity" | "time"
      (embedding_module.py:184-236,396-443 ``get_embedding_module``); "time"
      is the Jodie-style projection ``memory * (1 + W(Δt_norm))`` with the
      per-side normalized time diffs of TGN/tgn.py:131-140.
    """
    node_dim: int
    edge_dim: int
    num_nodes: int
    n_layers: int = 2
    n_head: int = 2
    dropout: float = 0.1
    message_dim: int = 100      # TGN/tgn.py:17 message_dimension=100
    memory_updater: str = "gru"
    aggregator: str = "last"
    message_function: str = "mlp"
    embedding_type: str = "graph_attention"
    mean_time_shift: Tuple[float, float] = (0.0, 0.0)   # (src, dst)
    std_time_shift: Tuple[float, float] = (1.0, 1.0)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def time_dim(self) -> int:
        return self.node_dim

    @property
    def memory_dim(self) -> int:
        return self.node_dim    # TGN/tgn.py:56 memory_dimension = n_node_features

    @property
    def raw_message_dim(self) -> int:
        return 2 * self.memory_dim + self.edge_dim + self.time_dim

    def setup(self):
        # linear-cos trainable time encoder (TGN/modules/embedding_module.py:90)
        self.time_encoder = TimeEncode(dim=self.time_dim, trainable=True)
        self.attn_layers = [
            TGNAttnLayer(node_dim=self.node_dim, edge_dim=self.edge_dim,
                         time_dim=self.time_dim, n_head=self.n_head,
                         dropout=self.dropout,
                         compute_dtype=self.compute_dtype, name=f"attn_{i}")
            for i in range(self.n_layers)]
        if self.message_function == "mlp":
            self.message_mlp = nn.Sequential([
                nn.Dense(self.raw_message_dim // 2), nn.relu,
                nn.Dense(self.message_dim)])      # MLPMessageFunction
        elif self.message_function != "identity":
            raise ValueError(self.message_function)
        if self.memory_updater == "gru":
            self.memory_cell = nn.GRUCell(features=self.memory_dim,
                                          name="memory_updater")
        elif self.memory_updater == "rnn":
            self.memory_cell = nn.SimpleCell(features=self.memory_dim,
                                             name="memory_updater")
        else:
            raise ValueError(self.memory_updater)
        if self.embedding_type == "time":
            # Jodie NormalLinear: normal(0, 1/sqrt(fan_in)), fan_in = 1
            init = jax.nn.initializers.normal(1.0)
            self.jodie_proj = nn.Dense(self.node_dim, kernel_init=init,
                                       bias_init=init)
        elif self.embedding_type not in ("graph_attention", "identity"):
            raise ValueError(self.embedding_type)
        self.affinity_score = ConcatMerge(hidden=self.node_dim, out=1)

    # ------------------------------------------------------------------
    # memory machinery (functional)
    # ------------------------------------------------------------------
    def updated_memory(self, state: TGNMemoryState
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """get_updated_memory over all nodes (TGN/tgn.py:126,241-252): advance
        memory rows that have a pending message through the update cell."""
        if self.message_function == "mlp":
            msgs = self.message_mlp(state.msg_buf)
        else:                                     # IdentityMessageFunction
            msgs = state.msg_buf
        new_mem, _ = self.memory_cell(state.memory, msgs)
        valid = state.msg_valid[:, None]
        memory = jnp.where(valid, new_mem, state.memory)
        last_update = jnp.where(state.msg_valid, state.msg_ts,
                                state.last_update)
        return memory, last_update

    def _persist_positives(self, state: TGNMemoryState, upd_memory,
                           upd_last_update, positives) -> TGNMemoryState:
        """update_memory(positives) + clear_messages(positives)
        (TGN/tgn.py:167-177)."""
        is_pos = jnp.zeros((self.num_nodes,), bool).at[positives].set(True)
        take = is_pos & state.msg_valid
        memory = jnp.where(take[:, None], upd_memory, state.memory)
        last_update = jnp.where(take, upd_last_update, state.last_update)
        msg_valid = state.msg_valid & ~is_pos
        return state._replace(memory=memory, last_update=last_update,
                              msg_valid=msg_valid)

    def _store_messages(self, state: TGNMemoryState, src, tgt, src_emb,
                        tgt_emb, cut_time, eidx, feats: Features
                        ) -> TGNMemoryState:
        """get_raw_messages + store (TGN/tgn.py:179-191,254-278) with
        last-occurrence-wins semantics via segment-argmax over positions."""
        e_feat = feats.edge[eidx]
        # source-side then destination-side messages (append order ⇒ the
        # destination-side store wins for nodes that are both)
        nodes = jnp.concatenate([src, tgt])
        t_all = jnp.concatenate([cut_time, cut_time])
        delta = t_all - state.last_update[nodes]
        t_enc = self.time_encoder(delta[:, None]).reshape(len(nodes), -1)
        own_emb = jnp.concatenate([src_emb, tgt_emb], axis=0)
        other_emb = jnp.concatenate([tgt_emb, src_emb], axis=0)
        msgs = jnp.concatenate(
            [own_emb, other_emb, jnp.concatenate([e_feat, e_feat], axis=0),
             t_enc], axis=-1)

        # last occurrence per node: segment-max of position index
        pos_idx = jnp.arange(nodes.shape[0], dtype=jnp.int32)
        winner = jnp.full((self.num_nodes,), -1, jnp.int32).at[nodes].max(pos_idx)
        has_msg = winner >= 0
        w = jnp.clip(winner, 0)
        if self.aggregator == "last":
            agg = msgs[w]
        elif self.aggregator == "mean":
            # MeanMessageAggregator (message_aggregator.py:56-90): mean of the
            # batch's raw messages per node, timestamp of the last one.
            cnt = jnp.zeros((self.num_nodes,), jnp.float32).at[nodes].add(1.0)
            total = jnp.zeros((self.num_nodes, msgs.shape[1]),
                              jnp.float32).at[nodes].add(msgs)
            agg = total / jnp.clip(cnt, 1.0)[:, None]
        else:
            raise ValueError(self.aggregator)
        msg_buf = jnp.where(has_msg[:, None],
                            jax.lax.stop_gradient(agg), state.msg_buf)
        msg_ts = jnp.where(has_msg, t_all[w], state.msg_ts)
        msg_valid = state.msg_valid | has_msg
        return state._replace(msg_buf=msg_buf, msg_ts=msg_ts,
                              msg_valid=msg_valid)

    # ------------------------------------------------------------------
    # embedding pyramid (GraphAttentionEmbedding.embedding_update_layer,
    # TGN/modules/embedding_module.py:356-393)
    # ------------------------------------------------------------------
    def _embed_chain(self, feats: Features, memory, anchors, cut_time,
                     sub: Subgraph, explain_weights=None,
                     edge_attr=None, deterministic=True):
        b = anchors.shape[0]
        n = sub.nodes[0].shape[1]
        node_levels = [anchors[:, None]] + [x for x in sub.nodes]
        combined = feats.node + memory       # [N, Dn]: memory added to raw
        # Δt per hop vs parent (embedding_module.py:300-314)
        tfeats = []
        standard = cut_time[:, None]
        for t_rec in sub.ts:
            delta = standard[:, :, None] - t_rec.reshape(b, -1, n)
            tfeats.append(self.time_encoder(delta.reshape(b, -1)))
            standard = t_rec

        num_levels = len(node_levels)
        prev_emb = None                      # updated embeddings from prev step
        for i in range(num_levels - 1):
            t = num_levels - 1 - i
            layer = self.attn_layers[i]
            src_feat = gather_rows(combined, node_levels[t - 1]) \
                .reshape(-1, self.node_dim)
            bq = src_feat.shape[0]
            src_t = self.time_encoder(jnp.zeros((bq, 1), jnp.float32))
            ngh_nodes = node_levels[t]

            if prev_emb is None:
                # raw(+memory) keys: project the [N, Dn] table once; the
                # "gather" of projected rows runs as a one-hot matmul —
                # random row-gathers are DMA-descriptor-bound on TPU
                # (PERF.md: ~20 ms per gather at 230k rows)
                k_tab, v_tab = layer.project_node_table(combined)
                k_nv = gather_rows(k_tab, ngh_nodes).reshape(bq, n, -1)
                v_nv = gather_rows(v_tab, ngh_nodes).reshape(bq, n, -1)
            else:
                k_nv, v_nv = layer.project_node(prev_emb.reshape(bq, n, -1))

            if edge_attr is not None:
                k_ev, v_ev = layer.project_edge(
                    edge_attr[t - 1].reshape(bq, n, -1))
            else:
                # gather RAW (narrow) edge rows, then project per position:
                # gathering from the projected [E, h*dk] table moves
                # h*dk-wide rows through the descriptor-bound DMA path
                e_raw = gather_rows(feats.edge, sub.eids[t - 1]) \
                    .reshape(bq, n, -1)
                k_ev, v_ev = layer.project_edge(e_raw)

            e_t = tfeats[t - 1].reshape(bq, n, -1)
            mask = (ngh_nodes == 0).reshape(bq, n)
            ew = None
            if explain_weights is not None:
                ew = explain_weights[t - 1].reshape(bq, n)
            out, _ = layer(src_feat, src_t, k_nv, v_nv, k_ev, v_ev, e_t, mask,
                           explain_weight=ew, deterministic=deterministic)
            prev_emb = out
        return prev_emb                      # [B, node_dim]

    def _ratio_embed(self, feats: Features, memory, anchors, cut_time,
                     sub: Subgraph, keeps):
        """2-hop embedding under R simultaneous ratio masks
        (threshold_test semantics, temp_exp_main.py:159-241): ``keeps`` is a
        per-hop list of [R, B, width] bools; an un-kept edge behaves exactly
        like node-id-0 padding (masked out of its level's attention; its
        features never contribute because masked scores kill them).

        Everything ratio-INVARIANT — gathers, table projections, time
        encodings, hop-1 attention scores — is computed ONCE; only
        mask/softmax/value-sum and the narrow hop-0 level carry the R axis.
        Returns [R, B, node_dim]."""
        assert self.n_layers == 2 and len(sub.nodes) >= 2
        b = anchors.shape[0]
        n = sub.nodes[0].shape[1]
        r = keeps[0].shape[0]
        combined = feats.node + memory
        tfeats = []
        standard = cut_time[:, None]
        for t_rec in sub.ts[:2]:
            delta = standard[:, :, None] - t_rec.reshape(b, -1, n)
            tfeats.append(self.time_encoder(delta.reshape(b, -1)))
            standard = t_rec

        # ---- deepest level (hop-1 children -> hop-0 parents), shared scores
        layer2 = self.attn_layers[0]
        bq = b * n
        src_feat2 = gather_rows(combined, sub.nodes[0]).reshape(bq,
                                                                self.node_dim)
        src_t2 = self.time_encoder(jnp.zeros((bq, 1), jnp.float32))
        k_tab, v_tab = layer2.project_node_table(combined)
        k_nv2 = gather_rows(k_tab, sub.nodes[1]).reshape(bq, n, -1)
        v_nv2 = gather_rows(v_tab, sub.nodes[1]).reshape(bq, n, -1)
        e_raw2 = gather_rows(feats.edge, sub.eids[1]).reshape(bq, n, -1)
        k_ev2, v_ev2 = layer2.project_edge(e_raw2)
        e_t2 = tfeats[1].reshape(bq, n, -1)
        q_keep2 = (keeps[0] & (sub.nodes[0] != 0)).reshape(r, bq)
        kv_keep2 = (keeps[1] & (sub.nodes[1] != 0)).reshape(r, bq, n)
        emb0 = layer2.multi_mask(src_feat2, src_t2, k_nv2, v_nv2, k_ev2,
                                 v_ev2, e_t2, q_keep2, kv_keep2)  # [R,bq,Dn]

        # ---- hop-0 level: R folds into the batch (narrow: n keys/anchor)
        layer1 = self.attn_layers[1]
        src_feat1 = gather_rows(combined, anchors[:, None]).reshape(
            b, self.node_dim)
        src_t1 = self.time_encoder(jnp.zeros((b, 1), jnp.float32))
        e_raw1 = gather_rows(feats.edge, sub.eids[0]).reshape(b, n, -1)
        k_ev1, v_ev1 = layer1.project_edge(e_raw1)
        e_t1 = tfeats[0].reshape(b, n, -1)
        k_nv1, v_nv1 = layer1.project_node(emb0.reshape(r * b, n, -1))

        def tile(x):
            return jnp.broadcast_to(x[None], (r,) + x.shape).reshape(
                (r * x.shape[0],) + x.shape[1:])

        mask1 = ((sub.nodes[0] == 0)[None] | ~keeps[0]).reshape(r * b, n)
        out, _ = layer1(tile(src_feat1), tile(src_t1), k_nv1, v_nv1,
                        tile(k_ev1), tile(v_ev1), tile(e_t1), mask1,
                        deterministic=True)
        return out.reshape(r, b, self.node_dim)

    def ratio_contrast(self, feats: Features, state: TGNMemoryState,
                       src, tgt, bgd, cut_time,
                       sub_src, sub_tgt, sub_bgd,
                       keeps_src, keeps_tgt, keeps_bgd):
        """Frozen-base fidelity ratio sweep: (pos, neg) logits [R, B] under R
        per-hop keep masks per side, sharing all ratio-invariant base work
        (replaces R stacked ``contrast`` calls). Memory is advanced
        (get_updated_memory) but never persisted — forbidden_memory_update
        semantics (temp_exp_main.py:703-704)."""
        assert self.embedding_type == "graph_attention"
        upd_memory, _ = self.updated_memory(state)
        s = self._ratio_embed(feats, upd_memory, src, cut_time, sub_src,
                              keeps_src)
        t = self._ratio_embed(feats, upd_memory, tgt, cut_time, sub_tgt,
                              keeps_tgt)
        n = self._ratio_embed(feats, upd_memory, bgd, cut_time, sub_bgd,
                              keeps_bgd)
        pos = self.affinity_score(s, t).squeeze(-1)          # [R, B]
        neg = self.affinity_score(s, n).squeeze(-1)
        return pos, neg

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def get_node_emb(self, feats: Features, state: TGNMemoryState,
                     src, tgt, bgd, cut_time, eidx,
                     sub_src, sub_tgt, sub_bgd,
                     explain_weights=None, edge_attr=None,
                     update_memory: bool = True, deterministic: bool = True):
        """Returns ((src_emb, tgt_emb, bgd_emb), new_state)
        (TGN/tgn.py:100-198). ``update_memory=False`` reproduces
        ``forbidden_memory_update`` used by the explainer
        (temp_exp_main.py:703-704)."""
        upd_memory, upd_last = self.updated_memory(state)

        if self.embedding_type == "graph_attention":
            def embed(anchors, sub, ew, ea, side):
                return self._embed_chain(feats, upd_memory, anchors, cut_time,
                                         sub, ew, ea, deterministic)
        elif self.embedding_type == "identity":
            # IdentityEmbedding (embedding_module.py:208-211)
            def embed(anchors, sub, ew, ea, side):
                return upd_memory[anchors]
        else:                                     # "time" (Jodie, :214-236)
            def embed(anchors, sub, ew, ea, side):
                mean = self.mean_time_shift[side]
                std = self.std_time_shift[side]
                td = (cut_time - upd_last[anchors] - mean) / std
                return upd_memory[anchors] * (1.0 + self.jodie_proj(td[:, None]))

        ew = explain_weights or (None, None, None)
        ea = edge_attr or (None, None, None)
        src_emb = embed(src, sub_src, ew[0], ea[0], 0)
        tgt_emb = embed(tgt, sub_tgt, ew[1], ea[1], 1)
        bgd_emb = embed(bgd, sub_bgd, ew[2], ea[2], 1)

        if update_memory:
            positives = jnp.concatenate([src, tgt])
            state = self._persist_positives(state, upd_memory, upd_last,
                                            positives)
            state = self._store_messages(state, src, tgt,
                                         jax.lax.stop_gradient(src_emb),
                                         jax.lax.stop_gradient(tgt_emb),
                                         cut_time, eidx, feats)
        return (src_emb, tgt_emb, bgd_emb), state

    def contrast(self, feats: Features, state: TGNMemoryState,
                 src, tgt, bgd, cut_time, eidx,
                 sub_src, sub_tgt, sub_bgd, explain_weights=None,
                 edge_attr=None, update_memory: bool = True,
                 deterministic: bool = True):
        (s, t, b), state = self.get_node_emb(
            feats, state, src, tgt, bgd, cut_time, eidx, sub_src, sub_tgt,
            sub_bgd, explain_weights, edge_attr, update_memory, deterministic)
        pos = self.affinity_score(s, t)
        neg = self.affinity_score(s, b)
        return (pos, neg), state

    def __call__(self, feats: Features, state: TGNMemoryState,
                 src, tgt, bgd, cut_time, eidx,
                 sub_src, sub_tgt, sub_bgd, deterministic: bool = True):
        return self.contrast(feats, state, src, tgt, bgd, cut_time, eidx,
                             sub_src, sub_tgt, sub_bgd,
                             deterministic=deterministic)
