"""On-device temporal neighbor & motif-walk samplers.

TPU-native replacement for the reference's Python/Numba sampling loops — the
single hottest code path in the reference (utils/graph.py:197-476, flagged in
SURVEY.md as the dominant cost). Everything here is pure jnp + lax, jittable,
fixed-shape, and vmap-free-by-construction (batched directly).

Semantics parity with the reference:

* ``get_temporal_neighbor`` (utils/graph.py:197-231): per (node, t) sample
  ``n`` strictly-earlier events uniformly with replacement, output zero-padded
  ``[B, n]`` records sorted ascending by position (=> time-sorted).
* ``find_k_hop`` (utils/graph.py:233-260): hop ℓ ≥ 2 cuts each neighbor's
  history at the *edge that produced it* (e-path lookup), which equals a
  bisect_left at that edge's timestamp (see data/graph.py docstring).
* ``find_k_walks`` + ``get_next_step`` + ``get_final_step``
  (utils/graph.py:265-476): 3-event temporal motif walks with the 12-class
  anonymous codes. The branchy per-walk case analysis becomes masked candidate
  selection over the union of two CSR slices: Gumbel-argmax on the dense/
  Pallas paths, exact O(log deg) candidate-range counting on the CSR path.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..data.graph import TemporalGraph


def _dense_enabled(g) -> bool:
    """Dense XLA-path gate: CPU only. On TPU the dense math runs as the
    Pallas sampling kernel instead (ops/pallas/sample_kernel.py), which is
    opaque to the XLA fusion pathology that made the un-kerneled dense
    expression hit nondeterministic multi-minute compile stalls (PERF.md r3
    "dense sampler" — resolved in r4 by the kernel; the old
    TEMPME_DENSE_SAMPLER opt-in gate is gone)."""
    if g.dense_ts is None:
        return False
    import jax
    return jax.default_backend() == "cpu"


def _kernel_enabled(g) -> bool:
    """Pallas sampling-kernel gate (TPU default; TEMPME_SAMPLE_KERNEL=0
    disables, =1 forces interpret-mode on CPU for parity tests)."""
    from .pallas import sample_kernel as SK
    return SK.available(g)


class Subgraph(NamedTuple):
    """k-hop temporal support: hop ℓ arrays have width n^(ℓ+1)."""
    nodes: Tuple[jnp.ndarray, ...]   # each [B, n^(l+1)] int32
    eids: Tuple[jnp.ndarray, ...]    # each [B, n^(l+1)] int32
    ts: Tuple[jnp.ndarray, ...]      # each [B, n^(l+1)] float32


class Walks(NamedTuple):
    """Temporal motif walks (3 events, newest first).

    Layout matches the reference exactly (utils/graph.py:303-306):
    ``nodes[..., :] = (src3, tgt3, src2, tgt2, src1, tgt1)``,
    ``eids = (e3, e2, e1)``, ``ts = (t3, t2, t1)``, ``anony = (1, x, t)``.
    ``cat`` is the dense 0..11 motif-class id in the canonical order used by
    the offline annotator (processed/data_preprocess.py:171-178).
    """
    nodes: jnp.ndarray    # [B, W, 6] int32
    eids: jnp.ndarray     # [B, W, 3] int32
    ts: jnp.ndarray       # [B, W, 3] float32
    anony: jnp.ndarray    # [B, W, 3] int32
    cat: jnp.ndarray      # [B, W] int32 in [0, 12)


# Canonical motif-class order (processed/data_preprocess.py:171):
# ["1,2,1","1,2,2","1,2,3","1,2,0","1,3,1","1,3,3","1,3,2","1,3,0",
#  "1,1,3","1,1,2","1,1,1","1,1,0"]
# Lookup table: CAT_LUT[x-1, t] -> class id.
_CAT_LUT = jnp.array([
    # x = 1: t = 0,1,2,3 -> "1,1,0","1,1,1","1,1,2","1,1,3"
    [11, 10, 9, 8],
    # x = 2: "1,2,0","1,2,1","1,2,2","1,2,3"
    [3, 0, 1, 2],
    # x = 3: "1,3,0","1,3,1","1,3,2","1,3,3"
    [7, 4, 6, 5],
], dtype=jnp.int32)

CAT_ORDER = ["1,2,1", "1,2,2", "1,2,3", "1,2,0", "1,3,1", "1,3,3", "1,3,2",
             "1,3,0", "1,1,3", "1,1,2", "1,1,1", "1,1,0"]


def anony_to_cat(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return _CAT_LUT[jnp.clip(x - 1, 0, 2), jnp.clip(t, 0, 3)]


def _bisect_iters(g: TemporalGraph) -> int:
    return max(1, int(math.ceil(math.log2(max(2, g.max_degree + 1)))) + 1)


def cut_by_time(g: TemporalGraph, nodes: jnp.ndarray, times: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bisect_left over node's CSR slice: #events strictly earlier than t.

    Returns (start, cut): node's slice begins at ``start`` and its strictly-
    earlier prefix has length ``cut``. Replaces ``find_before`` + the Numba
    ``bisect_left_adapt`` (utils/graph.py:103-146,511-530).
    """
    nodes = nodes.astype(jnp.int32)
    lo = g.off[nodes]
    hi = g.off[nodes + 1]
    start = lo

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        below = g.ngh_ts[mid] < times
        lo = jnp.where(active & below, mid + 1, lo)
        hi = jnp.where(active & ~below, mid, hi)
        return lo, hi

    lo, hi = lax.fori_loop(0, _bisect_iters(g), body, (lo, hi))
    return start, lo - start


def cut_by_edge(g: TemporalGraph, nodes: jnp.ndarray, eids: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cut index for the e-path lookup: events strictly before edge e's time.

    Equals the reference's tie-exempted ``nodeedge2idx[node][e]``
    (utils/graph.py:77-101,128-135). Node 0 / edge 0 are padding and force an
    empty prefix (utils/graph.py:133 ``if src_idx > 0 else 0``).
    """
    t = g.edge_ts[eids.astype(jnp.int32)]
    start, cut = cut_by_time(g, nodes, t)
    cut = jnp.where((nodes == 0) | (eids == 0), 0, cut)
    return start, cut


def _uniform_pick(key, cut: jnp.ndarray, n: int) -> jnp.ndarray:
    """[Q] cuts -> [Q, n] sorted uniform picks in [0, cut) (0 where cut==0)."""
    q = cut.shape[0]
    u = jax.random.uniform(key, (q, n))
    idx = jnp.floor(u * cut[:, None].astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.maximum(cut[:, None] - 1, 0))
    return jnp.sort(idx, axis=1)


def sample_neighbors(g: TemporalGraph, key, nodes: jnp.ndarray,
                     times: jnp.ndarray, n: int, bias: float = 0.0,
                     eids: jnp.ndarray | None = None,
                     sample_method: str = "multinomial"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k=1 temporal neighbor sampling => ([Q,n] node, [Q,n] eid, [Q,n] ts).

    Vectorized ``get_temporal_neighbor`` (utils/graph.py:197-231), all three
    reference modes:

    * ``multinomial`` + ``bias=0`` — uniform with replacement, sorted output
      (the mode every reference driver uses; NeighborFinder default);
    * ``multinomial`` + ``bias>0`` — exp(-bias*Δt)-weighted multinomial,
      sorted output (utils/graph.py:216-223);
    * ``binary`` — the Numba ``seq_binary_sample`` path (utils/graph.py:
      225-227, 482-507). The reference's backward accept/reject over
      ``compute_binary_prob`` probs w[i]/cumsum(w)[i] telescopes to EXACT
      multinomial sampling with weights w[i] = exp(bias*(ts[i]-max_ts)):
      P(i) = (w[i]/W[i]) * prod_{j>i} (W[j-1]/W[j]) = w[i]/W[cut-1].
      Since times is constant per row, exp(bias*ts) and exp(-bias*(t-ts))
      draw from the same distribution — so "binary" equals the multinomial
      branch except its draws are NOT sorted (the reference sorts only the
      multinomial branch, utils/graph.py:219-227).
    """
    # Pallas fused sampling kernel (TPU): bisect + pick + 3 row gathers in
    # one VMEM-resident pass — the critical-path kernel SURVEY §7.3 calls
    # for. Bit-identical to the CSR path given the same key.
    if _kernel_enabled(g) and sample_method != "binary" and bias == 0.0:
        from .pallas import sample_kernel as SK
        t_cut = times if eids is None else g.edge_ts[eids.astype(jnp.int32)]
        force = None if eids is None else ((nodes == 0) | (eids == 0))
        return SK.sample_rows(g, key, nodes, t_cut, n, force_empty=force)

    # Dense fast path (small graphs, uniform mode, CPU): one-hot matmul row
    # fetches from the padded [N, C] layout + row-local take_along_axis —
    # no bisect loop, no random CSR gathers (PERF.md: those are
    # DMA-descriptor-bound). Draws the same uniforms as the CSR path, so
    # outputs are bit-identical (tests/test_sampler.py).
    if _dense_enabled(g) and sample_method != "binary" and bias == 0.0:
        from .gather import gather_rows
        nodes32 = nodes.astype(jnp.int32)
        t_cut = times if eids is None else g.edge_ts[eids.astype(jnp.int32)]
        rows_ts = gather_rows(g.dense_ts, nodes32)           # [Q, C]
        cut = jnp.sum(rows_ts < t_cut[:, None], axis=1).astype(jnp.int32)
        if eids is not None:
            cut = jnp.where((nodes == 0) | (eids == 0), 0, cut)
        idx = _uniform_pick(key, cut, n)
        valid = cut[:, None] > 0
        rows_node = gather_rows(g.dense_node, nodes32)
        rows_eid = gather_rows(g.dense_eid, nodes32)
        out_node = jnp.take_along_axis(rows_node, idx, axis=1)
        out_eid = jnp.take_along_axis(rows_eid, idx, axis=1)
        out_ts = jnp.take_along_axis(rows_ts, idx, axis=1)
        return (jnp.where(valid, out_node.astype(jnp.int32), 0),
                jnp.where(valid, out_eid.astype(jnp.int32), 0),
                jnp.where(valid, out_ts, 0.0))

    if eids is None:
        start, cut = cut_by_time(g, nodes, times)
    else:
        start, cut = cut_by_edge(g, nodes, eids)

    if sample_method == "binary":
        idx = _decay_pick(g, key, start, cut, times, n, bias, sort=False)
    elif bias == 0.0:
        idx = _uniform_pick(key, cut, n)
    else:
        idx = _decay_pick(g, key, start, cut, times, n, bias)

    pos = start[:, None] + idx
    valid = cut[:, None] > 0
    out_node = jnp.where(valid, g.ngh_node[pos], 0)
    out_eid = jnp.where(valid, g.ngh_eid[pos], 0)
    out_ts = jnp.where(valid, g.ngh_ts[pos], 0.0)
    return out_node, out_eid, out_ts


def _decay_pick(g: TemporalGraph, key, start, cut, times, n: int, bias: float,
                sort: bool = True) -> jnp.ndarray:
    """Exp-decay multinomial sampling with replacement via Gumbel-argmax,
    scanned in chunks over each slice (utils/graph.py:216-227 semantics)."""
    q = start.shape[0]
    chunk = 128
    max_cut = jnp.max(cut)

    def cond(state):
        c, _, _ = state
        return c * chunk < max_cut

    def body(state):
        c, best_score, best_idx = state
        offs = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (q, chunk), 1)
        pos = start[:, None] + offs
        in_range = offs < cut[:, None]
        ts = g.ngh_ts[pos]
        logw = -bias * (times[:, None] - ts)            # log decay weight
        gkey = jax.random.fold_in(key, c)
        gum = jax.random.gumbel(gkey, (q, n, chunk))
        score = jnp.where(in_range[:, None, :], logw[:, None, :] + gum, -jnp.inf)
        chunk_best = jnp.max(score, axis=-1)
        chunk_arg = offs[:, None, :].repeat(n, 1)[
            jnp.arange(q)[:, None], jnp.arange(n)[None, :],
            jnp.argmax(score, axis=-1)]
        take = chunk_best > best_score
        return (c + 1,
                jnp.where(take, chunk_best, best_score),
                jnp.where(take, chunk_arg, best_idx))

    init = (jnp.int32(0), jnp.full((q, n), -jnp.inf), jnp.zeros((q, n), jnp.int32))
    _, _, idx = lax.while_loop(cond, body, init)
    return jnp.sort(idx, axis=1) if sort else idx


def find_k_hop(g: TemporalGraph, key, src: jnp.ndarray, times: jnp.ndarray,
               k: int, n: int, eids: jnp.ndarray | None = None,
               bias: float = 0.0, sample_method: str = "multinomial"
               ) -> Subgraph:
    """Recursive k-hop support (utils/graph.py:233-260), fixed shapes.

    Hop 0 samples each (src, t) uniformly from its strict history; hop ℓ>0
    samples each previous-hop event's endpoint with history cut at that event
    (e-path). Widths: n, n², ..., n^k.
    """
    b = src.shape[0]
    nodes, es, tss = [], [], []
    cur_n, cur_t, cur_e = src, times, eids
    for layer in range(k):
        key, sub = jax.random.split(key)
        qn = cur_n.reshape(-1)
        qt = cur_t.reshape(-1)
        qe = cur_e.reshape(-1) if (cur_e is not None and layer > 0) else (
            cur_e if layer == 0 else None)
        nn, ne, nt = sample_neighbors(g, sub, qn, qt, n, bias=bias, eids=qe,
                                      sample_method=sample_method)
        nodes.append(nn.reshape(b, -1))
        es.append(ne.reshape(b, -1))
        tss.append(nt.reshape(b, -1))
        cur_n, cur_e, cur_t = nn.reshape(-1), ne.reshape(-1), nt.reshape(-1)
    return Subgraph(tuple(nodes), tuple(es), tuple(tss))


# ---------------------------------------------------------------------------
# Motif walks
# ---------------------------------------------------------------------------

def _union_uniform_sample(g: TemporalGraph, key,
                          node_a, node_b, eid_cut, n_draws: int):
    """Uniformly sample ``n_draws`` events (with replacement) from the union of
    node_a's and node_b's histories, both cut strictly before edge ``eid_cut``.

    Vectorized ``get_next_step`` inner loop (utils/graph.py:308-333): computes
    (src_node, ngh_node, eid, ts) per draw; zero-padded where the union is
    empty.
    """
    q = node_a.shape[0]
    if _kernel_enabled(g):
        # Pallas fused union-sampling kernel (TPU) — bit-identical to the
        # dense/CSR paths given the same key.
        from .pallas import sample_kernel as SK
        return SK.sample_union(g, key, node_a, node_b, eid_cut, n_draws)
    if _dense_enabled(g):
        # dense fast path: fetch both nodes' padded rows (one-hot matmuls),
        # count cuts, pick within-row positions — bit-identical draws to the
        # CSR path below
        from .gather import gather_rows
        na, nb = node_a.astype(jnp.int32), node_b.astype(jnp.int32)
        t_cut = g.edge_ts[eid_cut.astype(jnp.int32)]
        rows_ts_a = gather_rows(g.dense_ts, na)
        rows_ts_b = gather_rows(g.dense_ts, nb)
        empty_a = (node_a == 0) | (eid_cut == 0)
        empty_b = (node_b == 0) | (eid_cut == 0)
        cut_a = jnp.where(empty_a, 0,
                          jnp.sum(rows_ts_a < t_cut[:, None], axis=1)
                          .astype(jnp.int32))
        cut_b = jnp.where(empty_b, 0,
                          jnp.sum(rows_ts_b < t_cut[:, None], axis=1)
                          .astype(jnp.int32))
        total = cut_a + cut_b
        u = jax.random.uniform(key, (q, n_draws))
        r = jnp.floor(u * total[:, None].astype(jnp.float32)).astype(jnp.int32)
        r = jnp.clip(r, 0, jnp.maximum(total[:, None] - 1, 0))
        from_a = r < cut_a[:, None]
        j = jnp.where(from_a, r, r - cut_a[:, None])
        j = jnp.clip(j, 0, g.dense_ts.shape[1] - 1)

        def pick(rows_a, rows_b):
            xa = jnp.take_along_axis(rows_a, j, axis=1)
            xb = jnp.take_along_axis(rows_b, j, axis=1)
            return jnp.where(from_a, xa, xb)

        valid = total[:, None] > 0
        out_src = jnp.where(valid, jnp.where(from_a, node_a[:, None],
                                             node_b[:, None]), 0)
        nd = pick(gather_rows(g.dense_node, na), gather_rows(g.dense_node, nb))
        ed = pick(gather_rows(g.dense_eid, na), gather_rows(g.dense_eid, nb))
        tv = pick(rows_ts_a, rows_ts_b)
        return (out_src,
                jnp.where(valid, nd.astype(jnp.int32), 0),
                jnp.where(valid, ed.astype(jnp.int32), 0),
                jnp.where(valid, tv, 0.0))

    start_a, cut_a = cut_by_edge(g, node_a, eid_cut)
    start_b, cut_b = cut_by_edge(g, node_b, eid_cut)
    total = cut_a + cut_b

    u = jax.random.uniform(key, (q, n_draws))
    r = jnp.floor(u * total[:, None].astype(jnp.float32)).astype(jnp.int32)
    r = jnp.clip(r, 0, jnp.maximum(total[:, None] - 1, 0))
    from_a = r < cut_a[:, None]
    pos = jnp.where(from_a, start_a[:, None] + r,
                    start_b[:, None] + (r - cut_a[:, None]))
    valid = total[:, None] > 0
    out_src = jnp.where(valid, jnp.where(from_a, node_a[:, None], node_b[:, None]), 0)
    out_ngh = jnp.where(valid, g.ngh_node[pos], 0)
    out_eid = jnp.where(valid, g.ngh_eid[pos], 0)
    out_ts = jnp.where(valid, g.ngh_ts[pos], 0.0)
    return out_src, out_ngh, out_eid, out_ts


def _masked_union_sample(g: TemporalGraph, key,
                         node_a, node_b, eid_cut,
                         va1, va2, vb1, wildcard):
    """Uniformly sample ONE event from the union of node_a's / node_b's
    histories cut before edge ``eid_cut``, restricted to candidate targets:

      * entries of node_a's slice whose neighbor ∈ {va1, va2}
      * entries of node_b's slice whose neighbor == vb1
      * no restriction where ``wildcard`` is True (the reference's third case).

    This is the vectorized form of ``get_final_step``'s per-walk filtered
    sampling (utils/graph.py:353-474). The dense/Pallas paths use full-width
    Gumbel-argmax; the CSR path counts candidates exactly via the
    (node, neighbor, ts)-sorted secondary CSR and picks one index — both are
    exact-uniform over the candidate set.

    Returns (src_node, ngh_node, eid, ts, found).
    """
    q = node_a.shape[0]
    neg_inf = jnp.float32(-jnp.inf)

    if _kernel_enabled(g):
        # Pallas fused masked-union kernel (TPU) — bit-identical to the
        # dense path given the same key.
        from .pallas import sample_kernel as SK
        return SK.sample_masked_union(g, key, node_a, node_b, eid_cut,
                                      va1, va2, vb1, wildcard)
    if _dense_enabled(g):
        # dense fast path: full-width Gumbel-argmax over both padded rows in
        # one shot (no chunked while_loop, no random CSR gathers). Same
        # exact-uniform-over-matches semantics; the Gumbel stream differs
        # from the chunked CSR path (distribution-equivalent, documented).
        from .gather import gather_rows
        na, nb = node_a.astype(jnp.int32), node_b.astype(jnp.int32)
        t_cut = g.edge_ts[eid_cut.astype(jnp.int32)]
        rows_ts_a = gather_rows(g.dense_ts, na)
        rows_ts_b = gather_rows(g.dense_ts, nb)
        rows_nd_a = gather_rows(g.dense_node, na)
        rows_nd_b = gather_rows(g.dense_node, nb)
        c = g.dense_ts.shape[1]
        in_a = (rows_ts_a < t_cut[:, None]) \
            & ~((node_a == 0) | (eid_cut == 0))[:, None]
        in_b = (rows_ts_b < t_cut[:, None]) \
            & ~((node_b == 0) | (eid_cut == 0))[:, None]
        ngh_a = rows_nd_a.astype(jnp.int32)
        ngh_b = rows_nd_b.astype(jnp.int32)
        match_a = wildcard[:, None] | (ngh_a == va1[:, None]) \
            | (ngh_a == va2[:, None])
        match_b = wildcard[:, None] | (ngh_b == vb1[:, None])
        key_a, key_b = jax.random.split(key)
        sc_a = jnp.where(in_a & match_a,
                         jax.random.gumbel(key_a, (q, c)), neg_inf)
        sc_b = jnp.where(in_b & match_b,
                         jax.random.gumbel(key_b, (q, c)), neg_inf)
        best_a = jnp.max(sc_a, axis=1)
        best_b = jnp.max(sc_b, axis=1)
        from_a = best_a >= best_b
        found = jnp.maximum(best_a, best_b) > neg_inf
        ja = jnp.argmax(sc_a, axis=1)[:, None]
        jb = jnp.argmax(sc_b, axis=1)[:, None]
        j = jnp.where(from_a[:, None], ja, jb)

        def pick(rows_a, rows_b):
            xa = jnp.take_along_axis(rows_a, j, axis=1).squeeze(1)
            xb = jnp.take_along_axis(rows_b, j, axis=1).squeeze(1)
            return jnp.where(from_a, xa, xb)

        rows_ed_a = gather_rows(g.dense_eid, na)
        rows_ed_b = gather_rows(g.dense_eid, nb)
        out_src = jnp.where(found, jnp.where(from_a, node_a, node_b), 0)
        out_ngh = jnp.where(found,
                            pick(rows_nd_a, rows_nd_b).astype(jnp.int32), 0)
        out_eid = jnp.where(found,
                            pick(rows_ed_a, rows_ed_b).astype(jnp.int32), 0)
        out_ts = jnp.where(found, pick(rows_ts_a, rows_ts_b), 0.0)
        return out_src, out_ngh, out_eid, out_ts, found

    # CSR path: size-oblivious O(log deg) candidate counting over the
    # (node, neighbor, ts)-sorted secondary CSR — "events of node n with
    # neighbor x strictly before t" is a contiguous range found by a double
    # bisect, so uniform sampling over the candidate set is a count + one
    # index pick. Replaces the r4 chunked Gumbel scan, which was
    # O(max_degree) per walk and collapsed on heavy-tailed graphs
    # (reddit-scale hot nodes: 700+ sequential 128-wide chunks).
    start_a, cut_a = cut_by_edge(g, node_a, eid_cut)
    start_b, cut_b = cut_by_edge(g, node_b, eid_cut)
    t_cut = g.edge_ts[eid_cut.astype(jnp.int32)]

    def nb_lower(nodes, ngh_val, ts_val):
        """First index in node's slice with (bynb_ngh, bynb_ts) >=
        (ngh_val, ts_val) — vectorized bisect over the secondary CSR."""
        nodes32 = nodes.astype(jnp.int32)
        lo = g.off[nodes32]
        hi = g.off[nodes32 + 1]

        def body(_, lohi):
            lo, hi = lohi
            active = lo < hi
            mid = (lo + hi) // 2
            nm = g.bynb_ngh[mid]
            tm = g.bynb_ts[mid]
            below = (nm < ngh_val) | ((nm == ngh_val) & (tm < ts_val))
            lo = jnp.where(active & below, mid + 1, lo)
            hi = jnp.where(active & ~below, mid, hi)
            return lo, hi

        lo, hi = lax.fori_loop(0, _bisect_iters(g), body, (lo, hi))
        return lo

    neg = jnp.full_like(t_cut, -jnp.inf)

    def cand_range(nodes, x, empty):
        lo = nb_lower(nodes, x, neg)
        hi = nb_lower(nodes, x, t_cut)
        cnt = jnp.where(empty, 0, hi - lo)
        return lo, cnt

    empty_a = (node_a == 0) | (eid_cut == 0)
    empty_b = (node_b == 0) | (eid_cut == 0)
    lo_a1, cnt_a1 = cand_range(node_a, va1, empty_a)
    lo_a2, cnt_a2 = cand_range(node_a, va2, empty_a)
    lo_b1, cnt_b1 = cand_range(node_b, vb1, empty_b)

    # wildcard rows sample uniformly from the FULL cut histories (the
    # reference's unrestricted third case); match rows from the filtered
    # candidate ranges. cut_by_edge already zeroes cuts on empties.
    m_a = jnp.where(wildcard, cut_a, cnt_a1 + cnt_a2)
    m_b = jnp.where(wildcard, cut_b, cnt_b1)
    total = m_a + m_b
    found = total > 0

    u = jax.random.uniform(key, (q,))
    r = jnp.floor(u * total.astype(jnp.float32)).astype(jnp.int32)
    r = jnp.clip(r, 0, jnp.maximum(total - 1, 0))
    from_a = r < m_a
    local = jnp.where(from_a, r, r - m_a)
    # position in the time-sorted arrays (wildcard rows)
    pos_t = jnp.where(from_a, start_a, start_b) + local
    # position in the (node, ngh, ts)-sorted arrays (match rows)
    in_a1 = from_a & (local < cnt_a1)
    pos_n = jnp.where(in_a1, lo_a1 + local,
                      jnp.where(from_a, lo_a2 + (local - cnt_a1),
                                lo_b1 + local))
    out_ngh = jnp.where(wildcard, g.ngh_node[pos_t], g.bynb_ngh[pos_n])
    out_eid = jnp.where(wildcard, g.ngh_eid[pos_t], g.bynb_eid[pos_n])
    out_ts = jnp.where(wildcard, g.ngh_ts[pos_t], g.bynb_ts[pos_n])
    src = jnp.where(from_a, node_a, node_b)
    return (jnp.where(found, src, 0),
            jnp.where(found, out_ngh, 0),
            jnp.where(found, out_eid, 0),
            jnp.where(found, out_ts, 0.0),
            found)


def find_k_walks(g: TemporalGraph, key, src: jnp.ndarray,
                 subgraph: Subgraph, n1: int, n2: int) -> Walks:
    """Sample 3-event temporal motif walks (utils/graph.py:265-306).

    ``n1`` = first-hop fanout (= subgraph hop-0 width), ``n2`` = continuations
    per first event; returns ``n1 * n2`` walks per batch element.
    """
    b = src.shape[0]
    tgt1 = subgraph.nodes[0]          # [B, n1]
    e1 = subgraph.eids[0]
    t1 = subgraph.ts[0]

    # ---- step 2: sample event 2 from union of {src, tgt1} histories < e1
    key, k2 = jax.random.split(key)
    q1 = b * n1
    src_rep = jnp.repeat(src[:, None], n1, axis=1).reshape(q1)
    s2, u2, e2, t2 = _union_uniform_sample(
        g, k2, src_rep, tgt1.reshape(q1), e1.reshape(q1), n2)  # each [q1, n2]

    # Expand event-1 records to [B, n1*n2] (np.repeat along the walk axis,
    # matching utils/graph.py:287-289).
    def rep(x):
        return jnp.repeat(x, n2, axis=1)

    w = n1 * n2
    s1_w = jnp.repeat(src[:, None], w, axis=1)          # [B, W]
    u1_w = rep(tgt1)
    e1_w = rep(e1)
    t1_w = rep(t1)
    s2_w = s2.reshape(b, w)
    u2_w = u2.reshape(b, w)
    e2_w = e2.reshape(b, w)
    t2_w = t2.reshape(b, w)

    # ---- step 3: case analysis + filtered sampling (utils/graph.py:335-476)
    qs1 = s1_w.reshape(-1)
    qu1 = u1_w.reshape(-1)
    qs2 = s2_w.reshape(-1)
    qu2 = u2_w.reshape(-1)
    qe2 = e2_w.reshape(-1)

    case1 = (qs1 == qs2) & (qu1 != qu2)
    case2 = (qu1 == qs2) & (qs1 != qu2)
    case2 = case2 & ~case1
    case3 = ~(case1 | case2)

    node_a = jnp.where(case1, qs1, qu1)
    node_b = qu2
    va1 = jnp.where(case1, qu1, qs1)     # case1: {u1, u2}; case2: {s1, u2}
    va2 = qu2
    vb1 = jnp.where(case1, qu1, qs1)     # case1: {u1};     case2: {s1}

    key, k3 = jax.random.split(key)
    s3, u3, e3, t3, found = _masked_union_sample(
        g, k3, node_a, node_b, qe2, va1, va2, vb1, wildcard=case3)

    # ---- anonymous code (1, x, t): utils/graph.py:386-474
    x = jnp.where(case1, 2, jnp.where(case2, 3, 1))
    t_c1 = jnp.where((s3 == qs1) & (u3 == qu1), 1,
             jnp.where((s3 == qs1) & (u3 == qu2), 2,
               jnp.where((s3 == qu1) & (u3 == qu2), 3, 0)))
    t_c2 = jnp.where((s3 == qu1) & (u3 == qs1), 1,
             jnp.where((s3 == qu1) & (u3 == qu2), 3,
               jnp.where((s3 == qu2) & (u3 == qs1), 2, 0)))
    t_c3 = jnp.where((s3 == qs1) & (u3 != qu1), 3,
             jnp.where((s3 == qu1) & (u3 != qs1), 2,
               jnp.where((s3 == qs1) & (u3 == qu1), 1,
                 jnp.where((s3 == qu1) & (u3 == qs1), 1, 0))))
    t_code = jnp.where(case1, t_c1, jnp.where(case2, t_c2, t_c3))
    t_code = jnp.where(found, t_code, 0)

    anony = jnp.stack([jnp.ones_like(x), x, t_code], axis=-1).reshape(b, w, 3)
    cat = anony_to_cat(x, t_code).reshape(b, w)

    nodes = jnp.stack([
        s3.reshape(b, w), u3.reshape(b, w), s2_w, u2_w, s1_w, u1_w], axis=2)
    eids = jnp.stack([e3.reshape(b, w), e2_w, e1_w], axis=2)
    tss = jnp.stack([t3.reshape(b, w), t2_w, t1_w], axis=2)
    return Walks(nodes.astype(jnp.int32), eids.astype(jnp.int32),
                 tss.astype(jnp.float32), anony.astype(jnp.int32),
                 cat.astype(jnp.int32))
