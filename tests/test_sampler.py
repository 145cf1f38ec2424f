"""Sampler correctness vs an independent numpy oracle.

The oracle re-derives the reference semantics (utils/graph.py) from first
principles: per-node time-sorted adjacency, strictly-earlier prefixes with
tie exemption (bisect_left), uniform sampling supports, and the 12-class
motif-code case analysis. We check *support sets* and *distributions* rather
than exact RNG streams (numpy and jax PRNGs differ by design; SURVEY.md §7.3).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tempme_tpu.data.graph import build_temporal_graph
from tempme_tpu.ops import sampler as S
from tests.conftest import make_events


class Oracle:
    """Independent numpy implementation of the temporal CSR + prefix rules."""

    def __init__(self, events):
        n = events.num_nodes
        self.adj = [[] for _ in range(n)]
        for s, d, e, t in zip(events.src, events.dst, events.e_idx, events.ts):
            self.adj[s].append((int(d), int(e), float(t)))
            self.adj[d].append((int(s), int(e), float(t)))
        for lst in self.adj:
            lst.sort(key=lambda x: x[2])
        self.edge_ts = {int(e): float(t) for e, t in zip(events.e_idx, events.ts)}
        self.edge_ts[0] = 0.0

    def prefix(self, node, cut_time):
        """Strictly-earlier events of `node` (bisect_left semantics)."""
        return [x for x in self.adj[node] if x[2] < cut_time]

    def prefix_by_edge(self, node, e):
        if node == 0 or e == 0:
            return []
        return self.prefix(node, self.edge_ts[e])


def test_cut_by_time_matches_oracle(events):
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    r = np.random.RandomState(1)
    nodes = r.randint(0, events.num_nodes, 200).astype(np.int32)
    times = r.randint(0, int(events.ts.max()) + 2, 200).astype(np.float32)
    start, cut = jax.jit(S.cut_by_time, static_argnums=())(g, jnp.asarray(nodes),
                                                           jnp.asarray(times))
    start, cut = np.asarray(start), np.asarray(cut)
    for k in range(200):
        expect = oracle.prefix(int(nodes[k]), float(times[k]))
        assert cut[k] == len(expect), (nodes[k], times[k], cut[k], len(expect))


def test_cut_by_edge_matches_oracle(events):
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    # Query each edge's endpoints plus padding cases.
    nodes, eids = [], []
    for s, d, e in zip(events.src[:150], events.dst[:150], events.e_idx[:150]):
        nodes += [int(s), int(d), 0]
        eids += [int(e), int(e), 0]
    nodes, eids = np.array(nodes, np.int32), np.array(eids, np.int32)
    _, cut = S.cut_by_edge(g, jnp.asarray(nodes), jnp.asarray(eids))
    cut = np.asarray(cut)
    for k in range(len(nodes)):
        expect = oracle.prefix_by_edge(int(nodes[k]), int(eids[k]))
        assert cut[k] == len(expect)


def test_ties_are_exempted(events):
    """An event must never see same-timestamp events (utils/graph.py:97)."""
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    # Find an edge with a timestamp tie at its source.
    nodes = np.asarray(events.src, np.int32)
    eids = np.asarray(events.e_idx, np.int32)
    _, cut = S.cut_by_edge(g, jnp.asarray(nodes), jnp.asarray(eids))
    cut = np.asarray(cut)
    for k in range(len(nodes)):
        pre = oracle.prefix_by_edge(int(nodes[k]), int(eids[k]))
        ts_e = oracle.edge_ts[int(eids[k])]
        assert all(t < ts_e for (_, _, t) in pre)
        assert cut[k] == len(pre)


def test_sample_neighbors_support_and_padding(events):
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    r = np.random.RandomState(2)
    nodes = r.randint(0, events.num_nodes, 64).astype(np.int32)
    times = r.randint(0, int(events.ts.max()) + 2, 64).astype(np.float32)
    n = 7
    nn, ne, nt = S.sample_neighbors(g, jax.random.PRNGKey(0),
                                    jnp.asarray(nodes), jnp.asarray(times), n)
    nn, ne, nt = np.asarray(nn), np.asarray(ne), np.asarray(nt)
    assert nn.shape == (64, n)
    for k in range(64):
        pre = oracle.prefix(int(nodes[k]), float(times[k]))
        if not pre:
            assert (nn[k] == 0).all() and (ne[k] == 0).all() and (nt[k] == 0).all()
            continue
        allowed = {(a, b, c) for (a, b, c) in pre}
        for j in range(n):
            assert (int(nn[k, j]), int(ne[k, j]), float(nt[k, j])) in allowed
        # time-sorted output (sampled positions sorted ascending)
        assert (np.diff(nt[k]) >= 0).all()


def test_sample_neighbors_uniformity(events):
    """Each history event should be drawn ~uniformly (chi-square-ish check)."""
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    # pick a node with a decent history
    node = max(range(events.num_nodes), key=lambda v: len(oracle.adj[v]))
    t_cut = float(events.ts.max()) + 1.0
    pre = oracle.prefix(node, t_cut)
    m = len(pre)
    draws = 4000
    nn, ne, _ = S.sample_neighbors(
        g, jax.random.PRNGKey(3),
        jnp.full((draws,), node, jnp.int32), jnp.full((draws,), t_cut), 1)
    counts = np.bincount(np.asarray(ne).ravel(), minlength=g.num_edges)
    got = np.array([counts[e] for (_, e, _) in pre], np.float64)
    expect = draws / m
    # generous tolerance: 5 sigma of binomial
    sigma = np.sqrt(draws * (1 / m) * (1 - 1 / m))
    assert np.abs(got - expect).max() < 6 * sigma + 3


def test_find_k_hop_shapes_and_validity(events):
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    b, n, k = 16, 5, 2
    r = np.random.RandomState(3)
    src = r.randint(1, events.num_nodes, b).astype(np.int32)
    times = np.full(b, float(events.ts.max()) + 1, np.float32)
    sub = S.find_k_hop(g, jax.random.PRNGKey(1), jnp.asarray(src),
                       jnp.asarray(times), k, n)
    assert sub.nodes[0].shape == (b, n) and sub.nodes[1].shape == (b, n * n)
    h1n = np.asarray(sub.nodes[0])
    h1e = np.asarray(sub.eids[0])
    h2n = np.asarray(sub.nodes[1]).reshape(b, n, n)
    h2e = np.asarray(sub.eids[1]).reshape(b, n, n)
    h2t = np.asarray(sub.ts[1]).reshape(b, n, n)
    for i in range(b):
        for j in range(n):
            parent, pe = int(h1n[i, j]), int(h1e[i, j])
            pre = oracle.prefix_by_edge(parent, pe)
            if not pre:
                assert (h2n[i, j] == 0).all()
            else:
                allowed = {(a, bb, c) for (a, bb, c) in pre}
                for l in range(n):
                    assert (int(h2n[i, j, l]), int(h2e[i, j, l]),
                            float(h2t[i, j, l])) in allowed


def _walk_case_oracle(oracle, s1, u1, s2, u2, e2):
    """Expected candidate set + (x, t) codes for step 3 (utils/graph.py:335-474)."""
    if s1 == s2 and u1 != u2:
        a_pre = [c for c in oracle.prefix_by_edge(s1, e2) if c[0] in (u1, u2)]
        b_pre = [c for c in oracle.prefix_by_edge(u2, e2) if c[0] == u1]
        cands = [(s1, *c) for c in a_pre] + [(u2, *c) for c in b_pre]
        x = 2
    elif u1 == s2 and s1 != u2:
        a_pre = [c for c in oracle.prefix_by_edge(u1, e2) if c[0] in (s1, u2)]
        b_pre = [c for c in oracle.prefix_by_edge(u2, e2) if c[0] == s1]
        cands = [(u1, *c) for c in a_pre] + [(u2, *c) for c in b_pre]
        x = 3
    else:
        a_pre = oracle.prefix_by_edge(u1, e2)
        b_pre = oracle.prefix_by_edge(u2, e2)
        cands = [(u1, *c) for c in a_pre] + [(u2, *c) for c in b_pre]
        x = 1
    return cands, x


def test_find_k_walks_validity(events):
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    b, n1, n2 = 12, 6, 3
    r = np.random.RandomState(5)
    src = r.randint(1, events.num_nodes, b).astype(np.int32)
    times = np.full(b, float(events.ts.max()) + 1, np.float32)
    sub = S.find_k_hop(g, jax.random.PRNGKey(7), jnp.asarray(src),
                       jnp.asarray(times), 2, n1)
    walks = S.find_k_walks(g, jax.random.PRNGKey(8), jnp.asarray(src), sub,
                           n1, n2)
    nodes = np.asarray(walks.nodes)
    eids = np.asarray(walks.eids)
    tss = np.asarray(walks.ts)
    anony = np.asarray(walks.anony)
    cat = np.asarray(walks.cat)
    assert nodes.shape == (b, n1 * n2, 6)
    assert anony.shape == (b, n1 * n2, 3)
    for i in range(b):
        for w in range(n1 * n2):
            s3, u3, s2, u2, s1, u1 = (int(v) for v in nodes[i, w])
            e3, e2, e1 = (int(v) for v in eids[i, w])
            assert s1 == int(src[i])
            # event 2 must come from union of (s1, u1) histories before e1
            pre_a = oracle.prefix_by_edge(s1, e1)
            pre_b = oracle.prefix_by_edge(u1, e1)
            if not pre_a and not pre_b:
                assert s2 == 0 and u2 == 0 and e2 == 0
            else:
                u_cands = [(s1, *c) for c in pre_a] + [(u1, *c) for c in pre_b]
                assert (s2, u2, e2, float(tss[i, w, 1])) in u_cands
            # event 3: case analysis
            cands, x = _walk_case_oracle(oracle, s1, u1, s2, u2, e2)
            assert anony[i, w, 0] == 1 and anony[i, w, 1] == x
            if not cands:
                assert s3 == 0 and u3 == 0 and e3 == 0
                assert anony[i, w, 2] == 0
            else:
                assert (s3, u3, e3, float(tss[i, w, 0])) in cands
            # cat id consistent with the canonical order
            key = f"1,{anony[i, w, 1]},{anony[i, w, 2]}"
            assert S.CAT_ORDER[int(cat[i, w])] == key


def test_find_k_walks_t_codes(events):
    """Spot-check the t-code chains against the reference's rules."""
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    b, n1, n2 = 10, 5, 2
    src = np.random.RandomState(9).randint(1, events.num_nodes, b).astype(np.int32)
    times = np.full(b, float(events.ts.max()) + 1, np.float32)
    sub = S.find_k_hop(g, jax.random.PRNGKey(17), jnp.asarray(src),
                       jnp.asarray(times), 2, n1)
    walks = S.find_k_walks(g, jax.random.PRNGKey(18), jnp.asarray(src), sub,
                           n1, n2)
    nodes = np.asarray(walks.nodes)
    anony = np.asarray(walks.anony)
    for i in range(b):
        for w in range(n1 * n2):
            s3, u3, s2, u2, s1, u1 = (int(v) for v in nodes[i, w])
            x, t = int(anony[i, w, 1]), int(anony[i, w, 2])
            if s3 == 0 and u3 == 0:
                assert t == 0
                continue
            if x == 2:  # case 1
                expect = 1 if (s3 == s1 and u3 == u1) else \
                         2 if (s3 == s1 and u3 == u2) else \
                         3 if (s3 == u1 and u3 == u2) else 0
            elif x == 3:  # case 2
                expect = 1 if (s3 == u1 and u3 == s1) else \
                         3 if (s3 == u1 and u3 == u2) else \
                         2 if (s3 == u2 and u3 == s1) else 0
            else:  # case 3
                expect = 3 if (s3 == s1 and u3 != u1) else \
                         2 if (s3 == u1 and u3 != s1) else \
                         1 if (s3 == s1 and u3 == u1) or (s3 == u1 and u3 == s1) \
                         else 0
            assert t == expect


def test_binary_sample_method_distribution(events):
    """The "binary" mode (reference seq_binary_sample, utils/graph.py:482-507)
    must draw event i with probability exp(bias*ts_i) / sum_j exp(bias*ts_j)
    over the strict-history prefix — the closed form of the reference's
    backward accept/reject over compute_binary_prob (utils/graph.py:68-75):
    P(i) = (w_i/W_i) * prod_{j>i} (W_{j-1}/W_j) = w_i / W_last.
    """
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    node = max(range(events.num_nodes), key=lambda v: len(oracle.adj[v]))
    t_cut = float(events.ts.max()) + 1.0
    pre = oracle.prefix(node, t_cut)
    ts = np.array([t for (_, _, t) in pre], np.float64)
    bias = 0.02
    w = np.exp(bias * (ts - ts.max()))
    p = w / w.sum()

    draws = 6000
    nn, ne, _ = S.sample_neighbors(
        g, jax.random.PRNGKey(7),
        jnp.full((draws,), node, jnp.int32), jnp.full((draws,), t_cut), 1,
        bias=bias, sample_method="binary")
    counts = np.bincount(np.asarray(ne).ravel(), minlength=g.num_edges)
    got = np.array([counts[e] for (_, e, _) in pre], np.float64)
    expect = draws * p
    sigma = np.sqrt(draws * p * (1 - p))
    assert np.abs(got - expect).max() < 6 * sigma.max() + 3


def test_binary_sample_method_unsorted(events):
    """Unlike the multinomial branch, binary-mode draws are NOT sorted
    (the reference sorts only the multinomial branch, utils/graph.py:219-227)."""
    g = build_temporal_graph(events)
    oracle = Oracle(events)
    node = max(range(events.num_nodes), key=lambda v: len(oracle.adj[v]))
    t_cut = float(events.ts.max()) + 1.0
    _, _, ts_bin = S.sample_neighbors(
        g, jax.random.PRNGKey(11), jnp.asarray([node] * 16, jnp.int32),
        jnp.full((16,), t_cut), 8, bias=0.01, sample_method="binary")
    ts_bin = np.asarray(ts_bin)
    assert (np.diff(ts_bin, axis=1) < 0).any(), "binary draws look sorted"
    # multinomial branch stays time-sorted
    _, _, ts_mul = S.sample_neighbors(
        g, jax.random.PRNGKey(11), jnp.asarray([node] * 16, jnp.int32),
        jnp.full((16,), t_cut), 8, bias=0.01)
    assert (np.diff(np.asarray(ts_mul), axis=1) >= 0).all()


def test_dense_path_bitwise_matches_csr(events):
    """The dense small-graph fast path (data/graph.py dense_* layout) must
    produce BIT-IDENTICAL samples to the CSR bisect path: same uniform draws,
    same cut indices, same records (PERF.md r3 sampler redesign)."""
    import dataclasses
    from tempme_tpu.data.graph import build_temporal_graph
    from tempme_tpu.ops import sampler as S

    g = build_temporal_graph(events)
    assert g.dense_ts is not None, "test events should take the dense path"
    g_csr = dataclasses.replace(g, dense_ts=None, dense_node=None,
                                dense_eid=None)
    r = np.random.RandomState(0)
    q, n = 64, 7
    nodes = jnp.asarray(r.randint(0, g.num_nodes, q).astype(np.int32))
    times = jnp.asarray(
        r.uniform(0, float(np.asarray(events.ts).max()) * 1.2, q)
        .astype(np.float32))
    eids = jnp.asarray(r.randint(0, g.num_edges, q).astype(np.int32))
    key = jax.random.PRNGKey(3)

    for use_eids in (None, eids):
        a = S.sample_neighbors(g, key, nodes, times, n, eids=use_eids)
        b = S.sample_neighbors(g_csr, key, nodes, times, n, eids=use_eids)
        for x, y, name in zip(a, b, ("node", "eid", "ts")):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y),
                err_msg=f"dense vs csr mismatch in {name} "
                        f"(eids={'on' if use_eids is not None else 'off'})")


def test_find_k_walks_validity_csr_path(events):
    """The CSR walk path (dense layout stripped — the large-graph regime
    where heavy-tailed degrees disable the dense/Pallas paths) must produce
    oracle-valid walks: every sampled event 2/3 is a member of the exact
    candidate set, with correct anonymous codes. Exercises the O(log deg)
    secondary-CSR candidate counting that replaced the r4 chunk scan."""
    import dataclasses
    g = build_temporal_graph(events)
    assert g.bynb_ngh is not None
    g_csr = dataclasses.replace(g, dense_ts=None, dense_node=None,
                                dense_eid=None)
    oracle = Oracle(events)
    b, n1, n2 = 12, 6, 3
    r = np.random.RandomState(5)
    src = r.randint(1, events.num_nodes, b).astype(np.int32)
    times = np.full(b, float(events.ts.max()) + 1, np.float32)
    sub = S.find_k_hop(g_csr, jax.random.PRNGKey(7), jnp.asarray(src),
                       jnp.asarray(times), 2, n1)
    walks = S.find_k_walks(g_csr, jax.random.PRNGKey(8), jnp.asarray(src),
                           sub, n1, n2)
    nodes = np.asarray(walks.nodes)
    eids = np.asarray(walks.eids)
    tss = np.asarray(walks.ts)
    anony = np.asarray(walks.anony)
    for i in range(b):
        for w in range(n1 * n2):
            s3, u3, s2, u2, s1, u1 = (int(v) for v in nodes[i, w])
            e3, e2, e1 = (int(v) for v in eids[i, w])
            pre_a = oracle.prefix_by_edge(s1, e1)
            pre_b = oracle.prefix_by_edge(u1, e1)
            if not pre_a and not pre_b:
                assert s2 == 0 and u2 == 0 and e2 == 0
            else:
                u_cands = [(s1, *c) for c in pre_a] + [(u1, *c) for c in pre_b]
                assert (s2, u2, e2, float(tss[i, w, 1])) in u_cands
            cands, x = _walk_case_oracle(oracle, s1, u1, s2, u2, e2)
            assert anony[i, w, 0] == 1 and anony[i, w, 1] == x
            if not cands:
                assert s3 == 0 and u3 == 0 and e3 == 0
                assert anony[i, w, 2] == 0
            else:
                assert (s3, u3, e3, float(tss[i, w, 0])) in cands


def test_masked_union_csr_uniform_over_candidates(events):
    """The CSR masked-union sampler must be exact-uniform over the candidate
    set: over many keys, each candidate of a fixed (node_a, node_b, cut,
    targets) query is drawn with equal frequency (chi-square-style bound)."""
    import dataclasses
    g = build_temporal_graph(events)
    g_csr = dataclasses.replace(g, dense_ts=None, dense_node=None,
                                dense_eid=None)
    oracle = Oracle(events)
    # find a query with a few candidates: node_a with >=2 distinct neighbors
    rng = np.random.RandomState(3)
    picked = None
    for _ in range(200):
        na = int(rng.randint(1, events.num_nodes))
        nb = int(rng.randint(1, events.num_nodes))
        e_cut = int(rng.randint(len(events) // 2, len(events)))
        pre_a = oracle.prefix_by_edge(na, e_cut)
        pre_b = oracle.prefix_by_edge(nb, e_cut)
        nghs_a = sorted({c[0] for c in pre_a})
        nghs_b = sorted({c[0] for c in pre_b})
        if len(nghs_a) >= 2 and len(nghs_b) >= 1:
            va1, va2 = nghs_a[0], nghs_a[1]
            vb1 = nghs_b[0]
            cands = ([(na, *c) for c in pre_a if c[0] in (va1, va2)]
                     + [(nb, *c) for c in pre_b if c[0] == vb1])
            if len(cands) >= 3:
                picked = (na, nb, e_cut, va1, va2, vb1, cands)
                break
    assert picked is not None, "test graph has no suitable query"
    na, nb, e_cut, va1, va2, vb1, cands = picked

    n_rep = 400
    arr = lambda v: jnp.full((n_rep,), v, jnp.int32)
    src, ngh, eid, ts, found = S._masked_union_sample(
        g_csr, jax.random.PRNGKey(42), arr(na), arr(nb), arr(e_cut),
        arr(va1), arr(va2), arr(vb1), jnp.zeros((n_rep,), bool))
    assert bool(np.asarray(found).all())
    drawn = list(zip(np.asarray(src).tolist(), np.asarray(ngh).tolist(),
                     np.asarray(eid).tolist(),
                     np.asarray(ts, np.float32).tolist()))
    cand_tuples = {(p[0], p[1], p[2], float(p[3])) for p in cands}
    counts = {c: 0 for c in cand_tuples}
    for d in drawn:
        assert d in cand_tuples, f"drew non-candidate {d}"
        counts[d] += 1
    k = len(cand_tuples)
    expected = n_rep / k
    for c, cnt in counts.items():
        # 5-sigma binomial bound
        sigma = (n_rep * (1 / k) * (1 - 1 / k)) ** 0.5
        assert abs(cnt - expected) < 5 * sigma + 1, (c, cnt, expected)
