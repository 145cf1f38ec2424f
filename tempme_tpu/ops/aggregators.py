"""Alternative neighbor-aggregation paths for TGAT.

The reference exposes three aggregation families behind ``attn_agg_method``
(TGAT/TGAT.py:446-460) and two attention score modes behind ``attn_mode``
(TGAT/TGAT.py:99-106):

* ``attn`` + ``prod``  — scaled dot-product attention (the default; the
  TPU-optimized split-projection form lives in ops/attention.py);
* ``attn`` + ``map``   — additive ("map-based") attention
  (``MapBasedMultiHeadAttention``, TGAT/TGAT.py:140-218);
* ``lstm``             — LSTM over the time-sorted neighbor sequence
  (``LSTMPool``, TGAT/TGAT.py:269-296);
* ``mean``             — masked-free mean over [ngh‖edge] features
  (``MeanPool``, TGAT/TGAT.py:298-314).

TPU notes: the reference's map attention materializes a
[(h·B), lq, lk, 2·dk] concat before a Linear(2dk→1).  Because that Linear is
bias-free, it decomposes exactly into w = [w_q; w_k] with
score = q·w_q + k·w_k — two small matmuls plus a broadcast add, no 4-D concat
in HBM.  The LSTM pool runs as a ``flax.linen.RNN`` (lax.scan over the
neighbor axis) — sequential by construction, kept for parity/ablations, not a
perf path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .layers import GatedMerge

xavier_normal = nn.initializers.xavier_normal()


class MapBasedTemporalAttention(nn.Module):
    """Additive multi-head attention (TGAT/TGAT.py:140-218).

    Interface-compatible with ``TemporalMultiHeadAttention``: q [B, Nq, D],
    k [B, Nq*n, D] (keys double as values), boolean ``mask`` [B, Nq*n] where
    True marks padding.

    Deliberate deviations from the reference map path:

    * each query attends only to its own n neighbors (scores [B, Nq, h, n]);
      the reference computes a full lq x lk map over all Nq*n keys
      (TGAT/TGAT.py:185-209), which cross-attends other sources' neighbors
      and mishandles batched masks — here the per-source restriction matches
      the semantics of the prod path;
    * wq/wk/wv use normal(sqrt(2/(d_model+dk))) and weight_map uses
      xavier-normal inits (the reference leaves them at PyTorch Linear
      defaults).
    """
    n_head: int
    d_model: int
    d_k: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 explain_weight: Optional[jnp.ndarray] = None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, nq, _ = q.shape
        n = k.shape[1] // nq
        h, dk = self.n_head, self.d_k
        init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (self.d_model + dk))))
        qh = nn.Dense(h * dk, use_bias=False, kernel_init=init,
                      name="wq_node_transform")(q).reshape(b, nq, h, dk)
        kh = nn.Dense(h * dk, use_bias=False, kernel_init=init,
                      name="wk_node_transform")(k).reshape(b, nq, n, h, dk)
        vh = nn.Dense(h * dk, use_bias=False, kernel_init=init,
                      name="wv_node_transform")(k).reshape(b, nq, n, h, dk)

        # weight_map: Linear(2dk -> 1, bias-free) over concat([q, k]) ==
        # q @ w_q + k @ w_k  (exact decomposition; avoids the [.., lk, 2dk]
        # concat the reference materializes, TGAT/TGAT.py:199-201)
        w_q = self.param("weight_map_q", xavier_normal, (dk, 1))
        w_k = self.param("weight_map_k", xavier_normal, (dk, 1))
        s_q = jnp.einsum("bqhd,do->bqho", qh, w_q)          # [B, Nq, h, 1]
        s_k = jnp.einsum("bqnhd,do->bqhn", kh, w_k)         # [B, Nq, h, n]
        scores = s_q + s_k                                  # [B, Nq, h, n]
        if mask is not None:
            scores = jnp.where(mask.reshape(b, nq, 1, n), -1e10, scores)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        if explain_weight is not None:
            attn = attn * explain_weight.reshape(b, nq, 1, n)
        out = jnp.einsum("bqhn,bqnhd->bqhd", attn, vh).reshape(b, nq, h * dk)
        out = nn.Dense(self.d_model, kernel_init=xavier_normal, name="fc")(out)
        out = nn.leaky_relu(out, negative_slope=0.2)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(name="ln")(out + q)
        return out, attn


class LSTMPool(nn.Module):
    """LSTM neighbor aggregation (TGAT/TGAT.py:269-296): run an LSTM over the
    time-sorted [ngh‖edge‖Δt-enc] sequence, keep the final hidden state, merge
    with the source features.  The reference ignores the padding mask here
    (TGAT/TGAT.py:287 feeds the raw sequence) — preserved for parity."""
    feat_dim: int
    edge_dim: int
    time_dim: int

    @nn.compact
    def __call__(self, src, src_t, seq, seq_t, seq_e, mask=None,
                 explain_weight=None, deterministic: bool = True):
        if explain_weight is not None:
            # the reference LSTMPool.forward takes no explain weight and
            # would TypeError (TGAT/TGAT.py:287); fail loudly, not silently
            raise ValueError("LSTMPool does not support explain weights")
        # src [Bq, Df]; seq/seq_e/seq_t [Bq, n, ·]; mask [Bq, n]
        seq_x = jnp.concatenate([seq, seq_e, seq_t], axis=-1)
        rnn = nn.RNN(nn.OptimizedLSTMCell(features=self.feat_dim),
                     name="lstm")
        hs = rnn(seq_x)                                     # [Bq, n, Df]
        hn = hs[:, -1, :]
        merger = GatedMerge(dim3=self.feat_dim, dim4=self.feat_dim,
                            name="merger")
        return merger(hn, src), None


class MeanPool(nn.Module):
    """Mean-pool neighbor aggregation (TGAT/TGAT.py:298-314): mean of
    [ngh‖edge] over the neighbor axis (unmasked, as in the reference), merged
    with the source features."""
    feat_dim: int
    edge_dim: int

    @nn.compact
    def __call__(self, src, src_t, seq, seq_t, seq_e, mask=None,
                 explain_weight=None, deterministic: bool = True):
        if explain_weight is not None:
            # reference MeanPool.forward takes no explain weight either
            # (TGAT/TGAT.py:308); fail loudly, not silently
            raise ValueError("MeanPool does not support explain weights")
        seq_x = jnp.concatenate([seq, seq_e], axis=-1)
        hn = seq_x.mean(axis=1)                             # [Bq, Df+De]
        merger = GatedMerge(dim3=self.feat_dim, dim4=self.feat_dim,
                            name="merger")
        return merger(hn, src), None


class MapAttnLayer(nn.Module):
    """AttnModel with ``attn_mode='map'`` (TGAT/TGAT.py:317-386, 140-218):
    assembles q = [src‖0-edge‖src_t], k = [ngh‖edge‖ngh_t], runs the additive
    attention, and merges the output with the raw source features. Same call
    signature as LSTMPool/MeanPool (raw per-level features)."""
    feat_dim: int
    edge_dim: int
    time_dim: int
    n_head: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, src_t, seq, seq_t, seq_e, mask=None,
                 explain_weight=None, deterministic: bool = True):
        # src [Bq, Df]; src_t [Bq, 1, Dt]; seq/seq_e/seq_t [Bq, n, ·]
        bq = src.shape[0]
        d_model = self.feat_dim + self.edge_dim + self.time_dim
        zero_e = jnp.zeros((bq, 1, self.edge_dim), src.dtype)
        q = jnp.concatenate([src[:, None, :], zero_e, src_t], axis=-1)
        k = jnp.concatenate([seq, seq_e, seq_t], axis=-1)
        # d_k = d_model // n_head matches the reference parameter shapes
        # (TGAT/TGAT.py:347-352); the output projection maps n_head*d_k back
        # to d_model, so truncation only affects capacity, not shape flow
        attn = MapBasedTemporalAttention(
            n_head=self.n_head, d_model=d_model,
            d_k=max(d_model // self.n_head, 1), dropout=self.dropout,
            name="map_attn")
        out, attn_w = attn(q, k, mask=mask, explain_weight=explain_weight,
                           deterministic=deterministic)
        merger = GatedMerge(dim3=self.feat_dim, dim4=self.feat_dim,
                            name="merger")
        return merger(out.squeeze(1), src), attn_w
