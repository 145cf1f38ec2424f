"""1-query x n-neighbor temporal multi-head attention.

The workhorse aggregation op of TGAT and TGN. Instead of the reference's
reshape-to-bmm pipeline ([B*N_src*n_head, 1, d] batched matmuls,
TGAT/TGAT.py:110-137), we express the whole thing as batched einsums over
[B, N_src, n, h, d] so XLA can tile it onto the MXU in one fused region.

Semantics (TGAT/TGAT.py:55-137, TGN/modules/embedding_module.py:7-87):
  * scores = q.k / sqrt(d_k); padded neighbors filled with -1e10 before softmax
  * dropout ON the attention probabilities
  * optional ``explain_weight`` multiplies the probabilities **post-softmax**
    ("if exp == 0 => masked", TGAT/TGAT.py:77) — the hook the TempME explainer
    uses to knock out edges
  * output proj -> dropout -> LayerNorm(out + residual(q))
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

xavier_normal = nn.initializers.xavier_normal()


class TemporalMultiHeadAttention(nn.Module):
    n_head: int
    d_model: int          # query/residual/output dim
    d_key: int            # raw key/value input dim
    d_k: int              # per-head dim
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 explain_weight: Optional[jnp.ndarray] = None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """q: [B, Nq, d_model]; k (=v): [B, Nngh, d_key];
        mask: [B, Nngh] bool, True = padded; explain_weight: [B, Nngh].
        Returns (output [B, Nq, d_model], attn [B, Nq, h, n])."""
        b, nq, _ = q.shape
        nngh = k.shape[1]
        n = nngh // nq
        h, dk = self.n_head, self.d_k

        qkv_init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (self.d_model + dk))))
        wq = nn.Dense(h * dk, use_bias=False, kernel_init=qkv_init, name="w_q")
        wk = nn.Dense(h * dk, use_bias=False, kernel_init=qkv_init, name="w_k")
        wv = nn.Dense(h * dk, use_bias=False, kernel_init=qkv_init, name="w_v")

        qh = wq(q).reshape(b, nq, h, dk)
        kh = wk(k).reshape(b, nq, n, h, dk)
        vh = wv(k).reshape(b, nq, n, h, dk)

        scores = jnp.einsum("bqhd,bqnhd->bqhn", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(dk))
        if mask is not None:
            m = mask.reshape(b, nq, 1, n)
            scores = jnp.where(m, -1e10, scores)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        if explain_weight is not None:
            attn = attn * explain_weight.reshape(b, nq, 1, n)
        out = jnp.einsum("bqhn,bqnhd->bqhd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, nq, h * dk)
        out = nn.Dense(self.d_model, kernel_init=xavier_normal, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(name="ln")(out + q)
        return out, attn
