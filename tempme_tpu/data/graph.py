"""CSR temporal adjacency — the framework's graph storage format.

TPU-native re-design of the reference ``NeighborFinder`` (utils/graph.py:12-101):

* per-node neighbor lists sorted by timestamp, flattened into device arrays
  ``(ngh_node, ngh_eid, ngh_ts)`` with ``off[n]:off[n+1]`` giving node n's slice
  — same layout as the reference's ``node_idx_l/node_ts_l/edge_idx_l/off_set_l``
  but built vectorized (lexsort) and living in HBM as jnp arrays;
* the reference's per-node ``nodeedge2idx`` dict (edge-id → cut index with
  timestamp-tie exemption, utils/graph.py:77-101) is replaced by the observation
  that the tie-exempted rank of edge e in node n's list equals
  ``bisect_left(ts_list(n), ts(e))`` — so **both** lookup paths of
  ``find_before`` (by cut-time and by edge-id) reduce to one vectorized binary
  search.  (Deviation: the reference fails to tie-exempt a tie group that runs
  to the end of a neighbor list — utils/graph.py:93 never fires for trailing
  ties; we apply the exemption uniformly, which is the documented intent:
  "an event never sees same-timestamp events".)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .events import EventStream


@struct.dataclass
class TemporalGraph:
    """Device-resident CSR temporal adjacency.

    All arrays are jnp (device) arrays; the struct is a pytree and can be
    closed over or passed through jit boundaries.
    """
    ngh_node: jnp.ndarray   # [T] int32  neighbor node id per directed entry
    ngh_eid: jnp.ndarray    # [T] int32  edge id per entry
    ngh_ts: jnp.ndarray     # [T] float32 timestamp per entry (sorted per node)
    off: jnp.ndarray        # [N+1] int32 CSR offsets
    edge_ts: jnp.ndarray    # [E] float32 timestamp by edge id (0 for padding id 0)
    num_nodes: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    max_degree: int = struct.field(pytree_node=False)
    # Dense padded layout (small graphs only, max_degree <= DENSE_MAX_DEGREE):
    # row n holds node n's time-sorted neighbor records padded to a fixed
    # width. Lets the sampler replace bisect loops + random CSR gathers with
    # one-hot matmul row fetches + row-local take_along_axis — the r3 trace
    # showed random scalar gathers are DMA-descriptor-bound (PERF.md).
    # dense_ts pads with a huge finite sentinel (not +inf: the one-hot
    # matmul row fetch would produce inf*0=NaN) so "ts < t" counting equals
    # bisect_left; dense_node/dense_eid are float32 (ids < 2^24 are exact)
    # so row fetches ride the MXU.
    dense_ts: jnp.ndarray | None = None       # [N, C] f32 (+inf padded)
    dense_node: jnp.ndarray | None = None     # [N, C] f32
    dense_eid: jnp.ndarray | None = None      # [N, C] f32
    # Secondary CSR sorted by (node, neighbor, ts) with the SAME ``off``
    # slices: entries of one (node, neighbor) pair are contiguous and
    # time-sorted, so "events of node n with neighbor x strictly before t"
    # is one O(log deg) double bisect — the size-oblivious form of
    # get_final_step's candidate filtering (utils/graph.py:353-474). The
    # time-ordered chunk scan this replaces was O(max_degree) per walk,
    # which collapses on heavy-tailed graphs (reddit-scale hot nodes).
    bynb_ngh: jnp.ndarray | None = None       # [T] int32
    bynb_eid: jnp.ndarray | None = None       # [T] int32
    bynb_ts: jnp.ndarray | None = None        # [T] float32


DENSE_MAX_DEGREE = 2048       # per-row padded width cap
DENSE_MAX_ENTRIES = 4_000_000  # N*C cap: 3 tables x 4 B stay VMEM-friendly
                               # (full-Enron: 185 x ~1700 = 0.3M entries ok;
                               # wikipedia/reddit-scale blows it -> CSR)


def build_temporal_graph(events: EventStream,
                         num_nodes: int | None = None,
                         num_edges: int | None = None) -> TemporalGraph:
    """Build the CSR adjacency from an event stream (vectorized host build).

    Equivalent to the reference's adjacency construction
    (learn_base.py:139-149 + NeighborFinder.init_off_set, utils/graph.py:33-66):
    every event (u, v, e, t) contributes entries to both endpoints' lists,
    each list sorted ascending by timestamp (stable in file order for ties).
    """
    if num_nodes is None:
        num_nodes = events.num_nodes
    if num_edges is None:
        num_edges = events.num_edges

    src = np.concatenate([events.src, events.dst]).astype(np.int64)
    ngh = np.concatenate([events.dst, events.src]).astype(np.int32)
    eid = np.concatenate([events.e_idx, events.e_idx]).astype(np.int32)
    ts = np.concatenate([events.ts, events.ts]).astype(np.float32)

    # Stable sort by (node, ts): within equal (node, ts) the original event
    # order is preserved, matching python sorted(key=lambda x: x[2]).
    order = np.lexsort((np.arange(len(src)), ts, src))
    src_s, ngh_s, eid_s, ts_s = src[order], ngh[order], eid[order], ts[order]

    counts = np.bincount(src_s, minlength=num_nodes)
    off = np.zeros(num_nodes + 1, dtype=np.int32)
    np.cumsum(counts, out=off[1:])

    edge_ts = np.zeros(num_edges, dtype=np.float32)
    edge_ts[events.e_idx] = events.ts

    max_degree = int(counts.max()) if len(counts) else 0
    dense_ts = dense_node = dense_eid = None
    # Node/edge ids are stored as float32 in the dense layout; only exact for
    # ids < 2^24, so gate the build on that too (ADVICE r3 medium).
    if (0 < max_degree <= DENSE_MAX_DEGREE
            and num_nodes * max_degree <= DENSE_MAX_ENTRIES
            and num_edges < 2**24 and num_nodes < 2**24):
        c = max(8, -(-max_degree // 8) * 8)          # pad width to 8 rows
        dts = np.full((num_nodes, c), np.float32(1e37), np.float32)
        dnd = np.zeros((num_nodes, c), np.float32)
        ded = np.zeros((num_nodes, c), np.float32)
        rank = np.arange(len(src_s)) - off[src_s].astype(np.int64)
        dts[src_s, rank] = ts_s
        dnd[src_s, rank] = ngh_s
        ded[src_s, rank] = eid_s
        dense_ts = jnp.asarray(dts)
        dense_node = jnp.asarray(dnd)
        dense_eid = jnp.asarray(ded)

    # secondary CSR sorted by (node, neighbor, ts) — same off slices
    order2 = np.lexsort((np.arange(len(src)), ts, ngh.astype(np.int64), src))

    return TemporalGraph(
        ngh_node=jnp.asarray(ngh_s),
        ngh_eid=jnp.asarray(eid_s),
        ngh_ts=jnp.asarray(ts_s),
        bynb_ngh=jnp.asarray(ngh[order2]),
        bynb_eid=jnp.asarray(eid[order2]),
        bynb_ts=jnp.asarray(ts[order2]),
        off=jnp.asarray(off),
        edge_ts=jnp.asarray(edge_ts),
        num_nodes=int(num_nodes),
        num_edges=int(num_edges),
        max_degree=max_degree,
        dense_ts=dense_ts,
        dense_node=dense_node,
        dense_eid=dense_eid,
    )
