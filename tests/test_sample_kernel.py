"""Pallas CSR-sampling kernel parity (ops/pallas/sample_kernel.py).

Runs the kernels in interpreter mode on the CPU test mesh and asserts
BIT-IDENTITY against the jnp CSR sampler paths given the same PRNG key —
the same uniforms feed both, and floor/scale/clip arithmetic is f32 in both,
so every output element must match exactly (utils/graph.py:197-333 semantics).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_events
from tempme_tpu.data.graph import build_temporal_graph
from tempme_tpu.ops import sampler as S
from tempme_tpu.ops.pallas import sample_kernel as SK


@pytest.fixture(scope="module")
def graph():
    ev = make_events(num_events=600, num_nodes=50, seed=3)
    g = build_temporal_graph(ev)
    assert g.dense_ts is not None
    return g


def csr_only(g):
    return dataclasses.replace(g, dense_ts=None, dense_node=None,
                               dense_eid=None)


def test_sample_rows_bitwise_matches_csr_time_cut(graph):
    key = jax.random.PRNGKey(7)
    r = np.random.RandomState(0)
    nodes = jnp.asarray(r.randint(1, 50, 300).astype(np.int32))
    times = jnp.asarray(r.rand(300).astype(np.float32) * 600)
    k_nd, k_ed, k_ts = SK.sample_rows(graph, key, nodes, times, 7,
                                      interpret=True)
    c_nd, c_ed, c_ts = S.sample_neighbors(csr_only(graph), key, nodes, times,
                                          7)
    np.testing.assert_array_equal(np.asarray(k_nd), np.asarray(c_nd))
    np.testing.assert_array_equal(np.asarray(k_ed), np.asarray(c_ed))
    np.testing.assert_array_equal(np.asarray(k_ts), np.asarray(c_ts))


def test_sample_rows_bitwise_matches_csr_edge_cut(graph):
    key = jax.random.PRNGKey(11)
    r = np.random.RandomState(1)
    nodes = jnp.asarray(r.randint(0, 50, 256).astype(np.int32))
    eids = jnp.asarray(r.randint(0, 600, 256).astype(np.int32))
    times = graph.edge_ts[eids]
    force = (nodes == 0) | (eids == 0)
    k_nd, k_ed, k_ts = SK.sample_rows(graph, key, nodes, times, 5,
                                      force_empty=force, interpret=True)
    c_nd, c_ed, c_ts = S.sample_neighbors(csr_only(graph), key, nodes, times,
                                          5, eids=eids)
    np.testing.assert_array_equal(np.asarray(k_nd), np.asarray(c_nd))
    np.testing.assert_array_equal(np.asarray(k_ed), np.asarray(c_ed))
    np.testing.assert_array_equal(np.asarray(k_ts), np.asarray(c_ts))


def test_sample_union_bitwise_matches_csr(graph):
    key = jax.random.PRNGKey(13)
    r = np.random.RandomState(2)
    na = jnp.asarray(r.randint(0, 50, 200).astype(np.int32))
    nb = jnp.asarray(r.randint(1, 50, 200).astype(np.int32))
    ec = jnp.asarray(r.randint(0, 600, 200).astype(np.int32))
    k = SK.sample_union(graph, key, na, nb, ec, 3, interpret=True)
    c = S._union_uniform_sample(csr_only(graph), key, na, nb, ec, 3)
    for kk, cc, name in zip(k, c, ["src", "ngh", "eid", "ts"]):
        np.testing.assert_array_equal(np.asarray(kk), np.asarray(cc),
                                      err_msg=f"union mismatch in {name}")


def test_find_k_hop_bitwise_with_kernel(graph, monkeypatch):
    """Dispatch through the public find_k_hop with the kernel forced on
    (TEMPME_SAMPLE_KERNEL=1 on CPU -> interpret mode) must equal CSR."""
    monkeypatch.setenv("TEMPME_SAMPLE_KERNEL", "1")
    key = jax.random.PRNGKey(5)
    r = np.random.RandomState(4)
    src = jnp.asarray(r.randint(1, 50, 32).astype(np.int32))
    times = jnp.asarray(r.rand(32).astype(np.float32) * 600)
    sub_k = S.find_k_hop(graph, key, src, times, 2, 6)
    monkeypatch.setenv("TEMPME_SAMPLE_KERNEL", "0")
    sub_c = S.find_k_hop(csr_only(graph), key, src, times, 2, 6)
    for a, b in zip(jax.tree.leaves(sub_k), jax.tree.leaves(sub_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_gated_off_on_large_tables(graph):
    huge = dataclasses.replace(
        graph, dense_ts=jnp.zeros((8192, 64)),
        dense_node=jnp.zeros((8192, 64)), dense_eid=jnp.zeros((8192, 64)))
    assert not SK.available(huge)   # > _MAX_NODES
    assert not SK.available(csr_only(graph))   # no dense layout


def test_sample_masked_union_bitwise_matches_dense(graph):
    """The masked-union kernel (walk event 3) must equal the dense jnp path
    bit-for-bit given the same key (same gumbel stream, same >= side
    tie-break)."""
    key = jax.random.PRNGKey(17)
    r = np.random.RandomState(3)
    q = 220
    na = jnp.asarray(r.randint(0, 50, q).astype(np.int32))
    nb = jnp.asarray(r.randint(1, 50, q).astype(np.int32))
    ec = jnp.asarray(r.randint(0, 600, q).astype(np.int32))
    va1 = jnp.asarray(r.randint(0, 50, q).astype(np.int32))
    va2 = jnp.asarray(r.randint(0, 50, q).astype(np.int32))
    vb1 = jnp.asarray(r.randint(0, 50, q).astype(np.int32))
    wc = jnp.asarray(r.rand(q) < 0.3)
    k = SK.sample_masked_union(graph, key, na, nb, ec, va1, va2, vb1, wc,
                               interpret=True)
    d = S._masked_union_sample(graph, key, na, nb, ec, va1, va2, vb1, wc)
    for kk, dd, name in zip(k, d, ["src", "ngh", "eid", "ts", "found"]):
        np.testing.assert_array_equal(np.asarray(kk), np.asarray(dd),
                                      err_msg=f"masked union mismatch {name}")


def test_find_k_walks_kernel_valid(graph, monkeypatch):
    """find_k_walks through the kernels must produce structurally valid
    walks: anonymous codes in-vocabulary and padding consistent."""
    monkeypatch.setenv("TEMPME_SAMPLE_KERNEL", "1")
    key = jax.random.PRNGKey(23)
    r = np.random.RandomState(6)
    src = jnp.asarray(r.randint(1, 50, 16).astype(np.int32))
    times = jnp.asarray(np.full(16, 600.0, np.float32))
    sub = S.find_k_hop(graph, key, src, times, 2, 6)
    w = S.find_k_walks(graph, jax.random.fold_in(key, 1), src, sub, 6, 3)
    cats = np.asarray(w.cat)
    assert cats.min() >= 0 and cats.max() < 12
    found = np.asarray(w.eids[..., 0]) > 0
    # unfound third events are fully zero-padded
    assert (np.asarray(w.nodes[..., 0])[~found] == 0).all()
    assert (np.asarray(w.ts[..., 0])[~found] == 0).all()
