"""Native host runtime vs the jnp samplers and the python oracle."""
import numpy as np
import pytest

from tempme_tpu.utils import native
from tests.conftest import make_events
from tests.test_sampler import Oracle

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


@pytest.fixture(scope="module")
def hostg():
    events = make_events(500, 40, seed=13)
    g = native.HostGraph(events.src, events.dst, events.e_idx, events.ts,
                         events.num_nodes, events.num_edges)
    return events, g


def test_load_csv_matches_numpy():
    src, dst, ts, label, eidx = native.load_csv(
        "/root/reference/processed/ml_uslegis_sampled.csv")
    from tempme_tpu.data.events import load_csv_events
    ev = load_csv_events("/root/reference/processed/ml_uslegis_sampled.csv")
    assert len(src) == len(ev)
    np.testing.assert_array_equal(src, ev.src)
    np.testing.assert_array_equal(dst, ev.dst)
    np.testing.assert_allclose(ts, ev.ts, rtol=1e-6)
    np.testing.assert_array_equal(eidx, ev.e_idx)


def test_native_neighbors_support(hostg):
    events, g = hostg
    oracle = Oracle(events)
    r = np.random.RandomState(0)
    nodes = r.randint(0, events.num_nodes, 100).astype(np.int32)
    times = r.uniform(0, float(events.ts.max()) + 1, 100).astype(np.float32)
    on, oe, ot = g.sample_neighbors(nodes, times, 6, seed=7)
    for k in range(100):
        pre = oracle.prefix(int(nodes[k]), float(times[k]))
        if not pre:
            assert (on[k] == 0).all()
            continue
        allowed = {(a, b, c) for (a, b, c) in pre}
        for j in range(6):
            assert (int(on[k, j]), int(oe[k, j]), float(ot[k, j])) in allowed
        assert (np.diff(ot[k]) >= 0).all()


def test_native_walks_match_case_analysis(hostg):
    events, g = hostg
    oracle = Oracle(events)
    from tests.test_sampler import _walk_case_oracle
    r = np.random.RandomState(1)
    # build first-hop events by sampling
    src = r.randint(1, events.num_nodes, 200).astype(np.int32)
    times = np.full(200, float(events.ts.max()) + 1, np.float32)
    n1, _, _ = g.sample_neighbors(src, times, 1, seed=3)
    u1 = n1[:, 0]
    e1 = g.sample_neighbors(src, times, 1, seed=3)[1][:, 0]
    out, out_t = g.sample_walks(src, u1, e1, seed=11)
    for w in range(200):
        s1, tgt1, ee1 = int(src[w]), int(u1[w]), int(e1[w])
        s2, u2, e2, s3, u3, e3, x, t = (int(v) for v in out[w])
        pre_a = oracle.prefix_by_edge(s1, ee1)
        pre_b = oracle.prefix_by_edge(tgt1, ee1)
        if not pre_a and not pre_b:
            assert s2 == 0 and u2 == 0 and e2 == 0
        else:
            cands = [(s1, *c) for c in pre_a] + [(tgt1, *c) for c in pre_b]
            assert (s2, u2, e2, float(out_t[w, 0])) in cands
        cands3, xx = _walk_case_oracle(oracle, s1, tgt1, s2, u2, e2)
        assert x == xx
        if not cands3:
            assert s3 == 0 and u3 == 0 and t == 0
        else:
            assert (s3, u3, e3, float(out_t[w, 1])) in cands3
