"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This mirrors how multi-chip sharding is validated without TPU hardware
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def make_events(num_events=400, num_nodes=40, seed=0, allow_node0=False):
    """Synthetic event stream with 1-based edge ids and non-decreasing ts."""
    from tempme_tpu.data.events import EventStream
    r = np.random.RandomState(seed)
    lo = 0 if allow_node0 else 1
    src = r.randint(lo, num_nodes, num_events).astype(np.int32)
    dst = r.randint(lo, num_nodes, num_events).astype(np.int32)
    # Non-decreasing timestamps with duplicates (to exercise tie handling).
    ts = np.sort(r.randint(0, num_events // 2, num_events)).astype(np.float32)
    label = np.zeros(num_events, np.float32)
    e_idx = np.arange(1, num_events + 1, dtype=np.int32)
    return EventStream(src, dst, ts, label, e_idx)


@pytest.fixture(scope="session")
def events():
    return make_events()
