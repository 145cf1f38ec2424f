"""1-query x n-neighbor temporal multi-head attention.

The workhorse aggregation op of TGAT and TGN (reference
TGAT/TGAT.py:55-137, TGN/modules/embedding_module.py:7-87). Two forms:

``TemporalMultiHeadAttention`` — the straightforward concat-projection form
    (kept as the reference implementation for parity tests).

``SplitTemporalAttention`` — the TPU-optimized form. The reference projects
    every gathered key position through one [Dn+De+Dt, h*dk] kernel, which
    materializes a [B*n_src, n, 517]-wide concat in HBM (the profiled
    bottleneck). Because the projections are bias-free linears over a concat,
    they decompose exactly:  W_k @ [node‖edge‖time] =
    W_k_node@node + W_k_edge@edge + W_k_time@time.
    Node/edge parts are then projected ONCE per step at the *table* level
    ([N, D] and [E, D] are tiny vs the 10^5-10^6 gathered positions) and
    gathered post-projection; only the Δt-dependent time part is projected
    per position. Matmuls run in the configured compute dtype (bf16 by
    default) with f32 accumulation.

Semantics (identical in both forms):
  * scores = q.k / sqrt(d_k); padded neighbors filled with -1e10 pre-softmax
  * dropout ON the attention probabilities
  * optional ``explain_weight`` multiplies probabilities POST-softmax
    ("if exp == 0 => masked", TGAT/TGAT.py:77) — the TempME knob
  * output proj -> dropout -> LayerNorm(out + residual(q))
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_normal = nn.initializers.xavier_normal()


def _attend(qh, kh, vh, mask, explain_weight, drop_fn, deterministic,
            b, nq, n, h, dk):
    from .pallas import kernels as pk
    apply_drop = (not deterministic) and drop_fn.rate > 0.0
    if pk.enabled():
        # Fused Pallas path: one VMEM pass for score/mask/softmax/
        # [dropout]/explain-weight/value-sum. Training dropout draws come
        # from the module's 'dropout' stream and are shared with the
        # rematerialized backward (kernels._attend_core_drop).
        drop_u = None
        if apply_drop:
            drop_u = jax.random.uniform(drop_fn.make_rng("dropout"),
                                        (b, nq, h, n))
        return pk.fused_attend(qh, kh, vh, mask, explain_weight,
                               1.0 / np.sqrt(dk), drop_u,
                               drop_fn.rate if apply_drop else 0.0)
    scores = jnp.einsum("bqhd,bqnhd->bqhn", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(dk).astype(np.float32)
    if mask is not None:
        scores = jnp.where(mask.reshape(b, nq, 1, n), -1e10, scores)
    attn = nn.softmax(scores, axis=-1)
    attn = drop_fn(attn, deterministic=deterministic)
    if explain_weight is not None:
        attn = attn * explain_weight.reshape(b, nq, 1, n)
    out = jnp.einsum("bqhn,bqnhd->bqhd", attn.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, nq, h * dk), attn


class TemporalMultiHeadAttention(nn.Module):
    """Reference-form concat-projection attention (parity baseline)."""
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
        b, nq, _ = q.shape
        n = k.shape[1] // nq
        h, dk = self.n_head, self.d_k
        qkv_init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (self.d_model + dk))))
        qh = nn.Dense(h * dk, use_bias=False, kernel_init=qkv_init,
                      name="w_q")(q).reshape(b, nq, h, dk)
        kh = nn.Dense(h * dk, use_bias=False, kernel_init=qkv_init,
                      name="w_k")(k).reshape(b, nq, n, h, dk)
        vh = nn.Dense(h * dk, use_bias=False, kernel_init=qkv_init,
                      name="w_v")(k).reshape(b, nq, n, h, dk)
        out, attn = _attend(qh, kh, vh, mask, explain_weight,
                            nn.Dropout(self.dropout), deterministic,
                            b, nq, n, h, dk)
        out = nn.Dense(self.d_model, kernel_init=xavier_normal, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-5, name="ln")(out + q)
        return out, attn.reshape(b, nq, h, n)


class SplitTemporalAttention(nn.Module):
    """TPU-optimized split-projection attention (see module docstring).

    The caller supplies projected key/value parts:
      * ``k_nv``/``v_nv``: node-part projections [B, Nngh, h*dk] — gathered
        from ``project_node_table`` output for raw-feature levels, or computed
        via ``project_node`` for embedding levels;
      * ``k_ev``/``v_ev``: edge-part projections (``project_edge_table`` +
        gather, or ``project_edge``) — may be None (TGAT's zero-edge query);
      * ``ngh_time``: raw time encodings, projected here per position.
    """
    n_head: int
    d_model: int          # residual/output dim (= raw q concat width)
    d_k: int              # per-head dim
    d_node: int
    d_edge: int
    d_time: int
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        h, dk = self.n_head, self.d_k
        init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (self.d_model + dk))))

        def dense(name):
            return nn.Dense(h * dk, use_bias=False, kernel_init=init,
                            dtype=self.compute_dtype, name=name)

        self.wq_node = dense("wq_node")
        self.wq_time = dense("wq_time")
        self.wk_node = dense("wk_node")
        self.wk_edge = dense("wk_edge")
        self.wk_time = dense("wk_time")
        self.wv_node = dense("wv_node")
        self.wv_edge = dense("wv_edge")
        self.wv_time = dense("wv_time")
        self.fc = nn.Dense(self.d_model, kernel_init=xavier_normal,
                           dtype=self.compute_dtype, name="fc")
        self.ln = nn.LayerNorm(epsilon=1e-5, name="ln")
        self.drop = nn.Dropout(self.dropout)

    # -- table / direct projections ------------------------------------
    def project_node_table(self, table):
        """[N, Dn] -> (k_table, v_table) each [N, h*dk]."""
        t = table.astype(self.compute_dtype)
        return self.wk_node(t), self.wv_node(t)

    def project_edge_table(self, table):
        t = table.astype(self.compute_dtype)
        return self.wk_edge(t), self.wv_edge(t)

    def project_node(self, x):
        x = x.astype(self.compute_dtype)
        return self.wk_node(x), self.wv_node(x)

    def project_edge(self, x):
        x = x.astype(self.compute_dtype)
        return self.wk_edge(x), self.wv_edge(x)

    def __call__(self, q_node, q_time, residual,
                 k_nv, v_nv, k_ev, v_ev, ngh_time,
                 mask=None, explain_weight=None, deterministic=True):
        """q_node [B,Nq,Dn], q_time [B,Nq,Dt], residual [B,Nq,d_model];
        k_nv/v_nv [B,Nngh,h*dk]; k_ev/v_ev same or None;
        ngh_time [B,Nngh,Dt]."""
        b, nq, _ = q_node.shape
        n = k_nv.shape[1] // nq
        h, dk = self.n_head, self.d_k

        q = (self.wq_node(q_node.astype(self.compute_dtype))
             + self.wq_time(q_time.astype(self.compute_dtype)))
        tt = ngh_time.astype(self.compute_dtype)
        k = k_nv + self.wk_time(tt)
        v = v_nv + self.wv_time(tt)
        if k_ev is not None:
            k = k + k_ev
            v = v + v_ev

        qh = q.reshape(b, nq, h, dk)
        kh = k.reshape(b, nq, n, h, dk)
        vh = v.reshape(b, nq, n, h, dk)
        out, attn = _attend(qh, kh, vh, mask, explain_weight, self.drop,
                            deterministic, b, nq, n, h, dk)
        out = self.fc(out.astype(self.compute_dtype))
        out = self.drop(out, deterministic=deterministic)
        out = self.ln(out.astype(jnp.float32) + residual)
        return out, attn.reshape(b, nq, h, n)

    def multi_mask_shared_kv(self, q_node, q_time, k_nv, v_nv, k_ev, v_ev,
                             ngh_time, q_keep, kv_pad, residual_zeros=0):
        """Ratio-sweep form for levels whose CHILDREN are never masked (the
        3-layer TGAT deepest level: importance covers hops 0-1 only, so hop-2
        keys are ratio-invariant). K/V and both score terms are computed ONCE;
        per ratio only the cheap recombination
        ``scores_r = q_keep*(q_node.k) + q_time.k``, softmax, and the value
        einsum run. ``kv_pad`` [B, Nq*n] is the base padding mask.
        Returns [R, B, Nq, d_model]."""
        b, nq, _ = q_node.shape
        n = k_nv.shape[1] // nq
        h, dk = self.n_head, self.d_k
        r = q_keep.shape[0]
        cd = self.compute_dtype

        q_np = self.wq_node(q_node.astype(cd))
        q_tp = self.wq_time(q_time.astype(cd))
        tt = ngh_time.astype(cd)
        k = k_nv + self.wk_time(tt)
        v = v_nv + self.wv_time(tt)
        if k_ev is not None:
            k = k + k_ev
            v = v + v_ev
        kh = k.reshape(b, nq, n, h, dk)
        vh = v.reshape(b, nq, n, h, dk)
        s_np = jnp.einsum("bqhd,bqnhd->bqhn", q_np.reshape(b, nq, h, dk), kh,
                          preferred_element_type=jnp.float32)
        s_tp = jnp.einsum("bqhd,bqnhd->bqhn", q_tp.reshape(b, nq, h, dk), kh,
                          preferred_element_type=jnp.float32)
        qk = q_keep.astype(jnp.float32).reshape(r, b, nq, 1, 1)
        scores = (s_np[None] * qk + s_tp[None]) / np.sqrt(dk)  # [R,B,Nq,h,n]
        masked = kv_pad.reshape(1, b, nq, 1, n)
        attn = nn.softmax(jnp.where(masked, -1e10, scores), axis=-1)
        out = jnp.einsum("rbqhn,bqnhd->rbqhd", attn.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32)
        out = self.fc(out.reshape(r, b, nq, h * dk).astype(cd))
        parts = [q_node[None] * q_keep.astype(q_node.dtype)[..., None]]
        if residual_zeros:
            parts.append(jnp.zeros((r, b, nq, residual_zeros), q_node.dtype))
        parts.append(jnp.broadcast_to(q_time[None], (r,) + q_time.shape))
        return self.ln(out.astype(jnp.float32)
                       + jnp.concatenate(parts, axis=-1))

    def multi_mask(self, q_node, q_time, k_nv, v_nv, k_ev, v_ev, ngh_time,
                   q_keep, kv_keep, residual_zeros=0):
        """Ratio-sweep form (temp_exp_main.py:153-272 -> VERDICT r3 weak#3):
        the 16-ratio fidelity sweep re-ran the whole base per ratio, but the
        ratio only changes WHICH node ids are zeroed. Gathers, projections and
        time encodings are computed once; per ratio only cheap elementwise
        keep-scaling + score/softmax/value einsums run.

        Exact threshold-test semantics: a dropped edge's node id becomes 0
        (temp_exp_main.py:168-188), i.e. its NODE features become the zero
        row while its edge/time features stay real. Because the node
        projections are bias-free linears, project(0-row) == 0 ==
        project(x) * 0 — so multiplying the projected node parts by the keep
        indicator reproduces the masked forward exactly, including degenerate
        all-masked softmax rows where the uniform attention averages real
        edge/time values.

        ``q_keep`` [R, B, Nq] / ``kv_keep`` [R, B, Nq*n]: 1.0 = kept (pad
        rows must be 0). Eval-only (no dropout, no explain weights). Returns
        [R, B, Nq, d_model]."""
        b, nq, _ = q_node.shape
        n = k_nv.shape[1] // nq
        h, dk = self.n_head, self.d_k
        r = q_keep.shape[0]
        cd = self.compute_dtype

        q_np = self.wq_node(q_node.astype(cd))            # shared projections
        q_tp = self.wq_time(q_time.astype(cd))
        tt = ngh_time.astype(cd)
        k_t = self.wk_time(tt)
        v_t = self.wv_time(tt)
        if k_ev is not None:
            k_t = k_t + k_ev
            v_t = v_t + v_ev

        qk = q_keep.astype(cd)[..., None]                 # [R, B, Nq, 1]
        kk = kv_keep.astype(cd).reshape(r, b, nq, n, 1)
        q_r = q_np[None] * qk + q_tp[None]                # [R, B, Nq, h*dk]
        k_r = k_nv.reshape(1, b, nq, n, -1) * kk + k_t.reshape(b, nq, n, -1)
        v_r = v_nv.reshape(1, b, nq, n, -1) * kk + v_t.reshape(b, nq, n, -1)

        qh = q_r.reshape(r, b, nq, h, dk)
        kh = k_r.reshape(r, b, nq, n, h, dk)
        vh = v_r.reshape(r, b, nq, n, h, dk)
        scores = jnp.einsum("rbqhd,rbqnhd->rbqhn", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(dk).astype(np.float32)
        masked = kv_keep.reshape(r, b, nq, 1, n) == 0
        scores = jnp.where(masked, -1e10, scores)
        attn = nn.softmax(scores, axis=-1)                # [R, B, Nq, h, n]
        out = jnp.einsum("rbqhn,rbqnhd->rbqhd", attn.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32)
        out = self.fc(out.reshape(r, b, nq, h * dk).astype(cd))
        parts = [q_node[None] * qk.astype(q_node.dtype)]
        if residual_zeros:
            parts.append(jnp.zeros((r, b, nq, residual_zeros), q_node.dtype))
        parts.append(jnp.broadcast_to(q_time[None], (r,) + q_time.shape))
        return self.ln(out.astype(jnp.float32)
                       + jnp.concatenate(parts, axis=-1))
