"""Model-level tests: shapes, finiteness, explain-weight semantics, TGN memory
semantics, and a few-step learning smoke test on synthetic data."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tempme_tpu.data.graph import build_temporal_graph
from tempme_tpu.models.common import Features
from tempme_tpu.ops import sampler as S
from tempme_tpu.train import loops
from tests.conftest import make_events

B, N_DEG, DN, DE = 8, 4, 12, 6


@pytest.fixture(scope="module")
def setup():
    events = make_events(300, 30, seed=3)
    g = build_temporal_graph(events)
    rng = np.random.RandomState(0)
    feats = Features(
        node=jnp.asarray(np.r_[np.zeros((1, DN)),
                               rng.randn(g.num_nodes - 1, DN)].astype(np.float32)),
        edge=jnp.asarray(np.r_[np.zeros((1, DE)),
                               rng.randn(g.num_edges - 1, DE)].astype(np.float32)))
    src = jnp.asarray(rng.randint(1, 30, B).astype(np.int32))
    dst = jnp.asarray(rng.randint(1, 30, B).astype(np.int32))
    ts = jnp.asarray(np.full(B, float(events.ts.max()) + 1, np.float32))
    eidx = jnp.asarray(rng.randint(1, 300, B).astype(np.int32))
    key = jax.random.PRNGKey(0)
    subs = tuple(S.find_k_hop(g, jax.random.fold_in(key, i),
                              x, ts, 2, N_DEG, eids=None)
                 for i, x in enumerate((src, dst, dst)))
    return g, feats, src, dst, ts, eidx, subs, events


def test_tgat_shapes_and_explain_masking(setup):
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgat import TGAT
    model = TGAT(node_dim=DN, edge_dim=DE, num_layers=2, n_head=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        *subs, deterministic=True)
    pos, neg = model.apply(params, feats, src, dst, dst, ts, *subs,
                           deterministic=True)
    assert pos.shape == (B, 1) and neg.shape == (B, 1)
    assert np.isfinite(np.asarray(pos)).all()

    # explain weight of all-ones must reproduce the unweighted output
    ones = [jnp.ones_like(s.nodes[i], jnp.float32)
            for s, i in [(subs[0], 0), (subs[0], 1)]]
    ew = ((ones, ones), (ones, ones))
    # per-side weights: hop lists for src and tgt
    ones_src = [jnp.ones(subs[0].nodes[0].shape, jnp.float32),
                jnp.ones(subs[0].nodes[1].shape, jnp.float32)]
    ones_tgt = [jnp.ones(subs[1].nodes[0].shape, jnp.float32),
                jnp.ones(subs[1].nodes[1].shape, jnp.float32)]
    ones_bgd = [jnp.ones(subs[2].nodes[0].shape, jnp.float32),
                jnp.ones(subs[2].nodes[1].shape, jnp.float32)]
    from tempme_tpu.models.tgat import TGAT as _T
    pos1, neg1 = model.apply(params, feats, src, dst, dst, ts, *subs,
                             explain_weights=((ones_src, ones_tgt),
                                              (ones_src, ones_bgd)),
                             deterministic=True, method=_T.contrast)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(pos1), rtol=1e-5)

    # all-zero explain weights must change the score (edges knocked out)
    zeros_src = [jnp.zeros_like(x) for x in ones_src]
    pos0, _ = model.apply(params, feats, src, dst, dst, ts, *subs,
                          explain_weights=((zeros_src, ones_tgt),
                                           (zeros_src, ones_bgd)),
                          deterministic=True, method=_T.contrast)
    assert not np.allclose(np.asarray(pos), np.asarray(pos0))


def test_graphmixer_shapes(setup):
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.graphmixer import GraphMixer
    model = GraphMixer(node_dim=DN, edge_dim=DE, num_tokens=N_DEG,
                       num_layers=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        *subs, deterministic=True)
    pos, neg = model.apply(params, feats, src, dst, dst, ts, *subs,
                           deterministic=True)
    assert pos.shape == (B, 1) and np.isfinite(np.asarray(pos)).all()
    # ones explain == no explain
    ew = tuple(jnp.ones((B, N_DEG), jnp.float32) for _ in range(3))
    from tempme_tpu.models.graphmixer import GraphMixer as _G
    pos1, _ = model.apply(params, feats, src, dst, dst, ts, *subs,
                          explain_weights=ew, deterministic=True,
                          method=_G.contrast)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(pos1), rtol=1e-5)


def test_tgn_memory_semantics(setup):
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0)
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst, ts,
                        eidx, *subs, deterministic=True)
    (pos, neg), mem1 = model.apply(params, feats, mem, src, dst, dst, ts,
                                   eidx, *subs, deterministic=True,
                                   method=TGN.contrast)
    assert pos.shape == (B, 1)
    # messages stored for the batch's src/dst nodes only
    touched = set(np.asarray(src).tolist()) | set(np.asarray(dst).tolist())
    valid = np.where(np.asarray(mem1.msg_valid))[0]
    assert set(valid.tolist()) == touched
    # msg_ts of touched nodes equals the batch cut time
    assert np.allclose(np.asarray(mem1.msg_ts)[valid], float(ts[0]))
    # a second step advances memory for nodes with pending messages
    (pos2, _), mem2 = model.apply(params, feats, mem1, src, dst, dst, ts + 1,
                                  eidx, *subs, deterministic=True,
                                  method=TGN.contrast)
    changed = np.abs(np.asarray(mem2.memory) - np.asarray(mem1.memory)).sum(1)
    assert (changed[valid] > 0).any()
    untouched = np.setdiff1d(np.arange(g.num_nodes), list(touched))
    assert np.allclose(np.asarray(mem2.memory)[untouched],
                       np.asarray(mem1.memory)[untouched])
    # forbidden_memory_update leaves state untouched
    (_, _), mem3 = model.apply(params, feats, mem1, src, dst, dst, ts + 2,
                               eidx, *subs, deterministic=True,
                               update_memory=False, method=TGN.contrast)
    assert np.allclose(np.asarray(mem3.msg_ts), np.asarray(mem1.msg_ts))
    assert np.allclose(np.asarray(mem3.memory), np.asarray(mem1.memory))


def test_tgn_last_message_wins(setup):
    """A node appearing multiple times in a batch keeps its LAST message
    (destination-side stores win; message_aggregator.py:34-55)."""
    g, feats, _, _, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0)
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    src = jnp.asarray(np.array([5, 5, 7, 9, 5, 7, 9, 9], np.int32))
    dst = jnp.asarray(np.array([6, 8, 5, 6, 6, 6, 6, 5], np.int32))
    params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst, ts,
                        eidx, *subs, deterministic=True)
    (_, _), mem1 = model.apply(params, feats, mem, src, dst, dst, ts, eidx,
                               *subs, deterministic=True, method=TGN.contrast)
    # node 5: last occurrence is as dst of event 7 (position B+7 in the
    # [src; dst] concatenation) -> its message must use e_feat of eidx[7]
    e7 = int(np.asarray(eidx)[7])
    msg5 = np.asarray(mem1.msg_buf)[5]
    efeat = np.asarray(feats.edge)[e7]
    got = msg5[2 * DN:2 * DN + DE]
    np.testing.assert_allclose(got, efeat, rtol=1e-5)


def test_training_learns_synthetic_pattern():
    """A few steps of TGAT training on a separable synthetic stream should
    reduce loss."""
    events = make_events(400, 24, seed=11)
    g = build_temporal_graph(events)
    rng = np.random.RandomState(1)
    feats = Features(
        node=jnp.asarray(np.r_[np.zeros((1, DN)),
                               rng.randn(g.num_nodes - 1, DN)].astype(np.float32)),
        edge=jnp.asarray(np.r_[np.zeros((1, DE)),
                               rng.randn(g.num_edges - 1, DE)].astype(np.float32)))
    from tempme_tpu.models.tgat import TGAT
    model = TGAT(node_dim=DN, edge_dim=DE, num_layers=2, n_head=2, dropout=0.0)
    opt = optax.adam(1e-2)
    dst_table = jnp.asarray(np.unique(events.dst))
    step = loops.make_base_train_step(model, g, feats, dst_table, 2, N_DEG, opt)
    batches = list(loops.iter_batches(events, 64, True, 0, True))
    key = jax.random.PRNGKey(0)
    b = batches[0]
    _, s0, s1, s2 = loops.sample_support(g, key, b, dst_table, 2, N_DEG)
    params = model.init({"params": key, "dropout": key}, feats, b.src, b.dst,
                        b.dst, b.ts, s0, s1, s2, deterministic=True)
    state = loops.TrainState(params, opt.init(params), key)
    losses = []
    for i in range(12):
        state, aux = step(state, batches[i % len(batches)])
        losses.append(float(aux["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def _tgn_apply(setup, **kw):
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0, **kw)
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst, ts,
                        eidx, *subs, deterministic=True)
    (pos, neg), mem1 = model.apply(params, feats, mem, src, dst, dst, ts,
                                   eidx, *subs, deterministic=True,
                                   method=model.contrast)
    return model, params, mem, mem1, pos


def test_tgn_rnn_updater_variant(setup):
    """RNNMemoryUpdater (memory_updater.py:49-66): runs, updates memory, and
    swaps the GRU cell for a SimpleCell (different param structure)."""
    model, params, mem, mem1, pos = _tgn_apply(setup, memory_updater="rnn")
    assert pos.shape == (B, 1) and np.isfinite(np.asarray(pos)).all()
    upd = params["params"]["memory_updater"]
    assert "r" not in upd and "z" not in upd      # no GRU gates
    # a second step advances memory rows with pending messages
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN
    (_, _), mem2 = model.apply(params, feats, mem1, src, dst, dst, ts + 1,
                               eidx, *subs, deterministic=True,
                               method=TGN.contrast)
    valid = np.where(np.asarray(mem1.msg_valid))[0]
    changed = np.abs(np.asarray(mem2.memory) - np.asarray(mem1.memory)).sum(1)
    assert (changed[valid] > 0).any()


def test_tgn_mean_aggregator_variant(setup):
    """MeanMessageAggregator (message_aggregator.py:56-90): a node with
    several messages in a batch stores their mean; the edge-feature slice of
    the stored message must equal the mean of the occurrences' edge feats."""
    g, feats, _, _, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    src = jnp.asarray(np.array([5, 5, 7, 9, 5, 7, 9, 9], np.int32))
    dst = jnp.asarray(np.array([6, 8, 5, 6, 6, 6, 6, 5], np.int32))
    outs = {}
    for agg in ("last", "mean"):
        model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                    n_layers=2, n_head=2, dropout=0.0, aggregator=agg)
        mem = init_memory_state(g.num_nodes, model.memory_dim,
                                model.raw_message_dim)
        params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst,
                            ts, eidx, *subs, deterministic=True)
        (_, _), mem1 = model.apply(params, feats, mem, src, dst, dst, ts,
                                   eidx, *subs, deterministic=True,
                                   method=TGN.contrast)
        outs[agg] = np.asarray(mem1.msg_buf)
    # node 8 occurs once (dst of event 1): mean == last
    np.testing.assert_allclose(outs["mean"][8], outs["last"][8], rtol=1e-5)
    # node 6 occurs 5 times (dst of events 0,3,4,5,6): msgs differ, and the
    # edge-feature slice equals the mean of those events' edge features
    assert not np.allclose(outs["mean"][6], outs["last"][6])
    e = np.asarray(feats.edge)[np.asarray(eidx)[[0, 3, 4, 5, 6]]].mean(0)
    np.testing.assert_allclose(outs["mean"][6][2 * DN:2 * DN + DE], e,
                               rtol=1e-4)


def test_tgn_identity_message_variant(setup):
    """IdentityMessageFunction (message_function.py:29-40): raw messages feed
    the memory cell directly; no message MLP parameters exist."""
    model, params, mem, mem1, pos = _tgn_apply(setup,
                                               message_function="identity")
    assert pos.shape == (B, 1) and np.isfinite(np.asarray(pos)).all()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert not any("message_mlp" in n for n in names)
    valid = np.where(np.asarray(mem1.msg_valid))[0]
    assert len(valid) > 0


def test_tgn_identity_embedding_variant(setup):
    """IdentityEmbedding (embedding_module.py:208-211): node embedding is the
    updated memory row."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0, embedding_type="identity")
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst, ts,
                        eidx, *subs, deterministic=True)
    # warm the memory with one step, then compare embeddings to memory rows
    (_, _), mem1 = model.apply(params, feats, mem, src, dst, dst, ts, eidx,
                               *subs, deterministic=True, method=TGN.contrast)
    (src_e, tgt_e, _), _ = model.apply(params, feats, mem1, src, dst, dst,
                                       ts + 1, eidx, *subs,
                                       deterministic=True,
                                       update_memory=False,
                                       method=TGN.get_node_emb)
    upd_mem, _ = model.apply(params, mem1, method=TGN.updated_memory)
    np.testing.assert_allclose(np.asarray(src_e),
                               np.asarray(upd_mem)[np.asarray(src)], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt_e),
                               np.asarray(upd_mem)[np.asarray(dst)], rtol=1e-5)


def test_tgn_time_embedding_variant(setup):
    """TimeEmbedding / Jodie (embedding_module.py:214-236): embedding is
    memory * (1 + W(normalized dt)) with per-side shift statistics."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0, embedding_type="time",
                mean_time_shift=(2.0, 3.0), std_time_shift=(5.0, 7.0))
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst, ts,
                        eidx, *subs, deterministic=True)
    (_, _), mem1 = model.apply(params, feats, mem, src, dst, dst, ts, eidx,
                               *subs, deterministic=True, method=TGN.contrast)
    (src_e, tgt_e, _), _ = model.apply(params, feats, mem1, src, dst, dst,
                                       ts + 1, eidx, *subs,
                                       deterministic=True,
                                       update_memory=False,
                                       method=TGN.get_node_emb)
    upd_mem, upd_last = model.apply(params, mem1, method=TGN.updated_memory)
    upd_mem, upd_last = np.asarray(upd_mem), np.asarray(upd_last)
    k = np.asarray(params["params"]["jodie_proj"]["kernel"])
    b_ = np.asarray(params["params"]["jodie_proj"]["bias"])
    for emb, anchors, mean, std in ((src_e, src, 2.0, 5.0),
                                    (tgt_e, dst, 3.0, 7.0)):
        a = np.asarray(anchors)
        td = (np.asarray(ts + 1) - upd_last[a] - mean) / std
        want = upd_mem[a] * (1.0 + td[:, None] @ k + b_)
        np.testing.assert_allclose(np.asarray(emb), want, rtol=2e-4, atol=1e-5)


def test_compute_time_statistics():
    from tempme_tpu.data.events import EventStream, compute_time_statistics
    ev = EventStream(src=np.array([1, 1, 2], np.int32),
                     dst=np.array([2, 3, 3], np.int32),
                     ts=np.array([10.0, 25.0, 40.0], np.float32),
                     label=np.zeros(3, np.float32),
                     e_idx=np.array([1, 2, 3], np.int32))
    (m_src, m_dst), (s_src, s_dst) = compute_time_statistics(ev)
    # src gaps: [10-0, 25-10, 40-0] = [10, 15, 40]
    np.testing.assert_allclose(m_src, np.mean([10, 15, 40]))
    np.testing.assert_allclose(s_src, np.std([10, 15, 40]))
    # dst gaps: [10-0, 25-0, 40-25] = [10, 25, 15]
    np.testing.assert_allclose(m_dst, np.mean([10, 25, 15]))
    np.testing.assert_allclose(s_dst, np.std([10, 25, 15]))


@pytest.mark.parametrize("kw", [
    dict(agg_method="attn", attn_mode="map"),
    dict(agg_method="lstm"),
    dict(agg_method="mean"),
    dict(use_time="pos", pos_seq_len=N_DEG * N_DEG),
    dict(use_time="empty"),
])
def test_tgat_variants(setup, kw):
    """TGAT aggregator / attention-mode / time-encoding variants
    (TGAT/TGAT.py:435-460 factories): run contrast end-to-end, finite [B,1]
    logits, and variant params actually differ from the default path."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgat import TGAT
    model = TGAT(node_dim=DN, edge_dim=DE, num_layers=2, n_head=2,
                 dropout=0.0, **kw)
    params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        *subs, deterministic=True)
    pos, neg = model.apply(params, feats, src, dst, dst, ts, *subs,
                           deterministic=True)
    assert pos.shape == (B, 1) and neg.shape == (B, 1)
    assert np.isfinite(np.asarray(pos)).all()
    assert np.isfinite(np.asarray(neg)).all()


def test_tgat_map_attention_explain_semantics(setup):
    """Map attention keeps the explain-weight contract: all-ones weights
    reproduce the unweighted output; zero weights change it."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgat import TGAT
    model = TGAT(node_dim=DN, edge_dim=DE, num_layers=2, n_head=2,
                 dropout=0.0, agg_method="attn", attn_mode="map")
    params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        *subs, deterministic=True)
    pos, _ = model.apply(params, feats, src, dst, dst, ts, *subs,
                         deterministic=True)
    def hop_ones(s):
        return [jnp.ones(s.nodes[0].shape, jnp.float32),
                jnp.ones(s.nodes[1].shape, jnp.float32)]
    ones = (( hop_ones(subs[0]), hop_ones(subs[1])),
            ( hop_ones(subs[0]), hop_ones(subs[2])))
    pos1, _ = model.apply(params, feats, src, dst, dst, ts, *subs,
                          explain_weights=ones, deterministic=True,
                          method=TGAT.contrast)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(pos1), rtol=1e-4)
    zeros = (([jnp.zeros(subs[0].nodes[0].shape, jnp.float32),
               jnp.zeros(subs[0].nodes[1].shape, jnp.float32)],
              hop_ones(subs[1])),
             (hop_ones(subs[0]), hop_ones(subs[2])))
    pos0, _ = model.apply(params, feats, src, dst, dst, ts, *subs,
                          explain_weights=zeros, deterministic=True,
                          method=TGAT.contrast)
    assert not np.allclose(np.asarray(pos), np.asarray(pos0))


def test_tgat_pool_variants_reject_explain_weights(setup):
    """LSTMPool/MeanPool raise on explain weights rather than silently
    dropping them (the reference forward would TypeError)."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgat import TGAT
    for agg in ("lstm", "mean"):
        model = TGAT(node_dim=DN, edge_dim=DE, num_layers=2, n_head=2,
                     dropout=0.0, agg_method=agg)
        params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                            *subs, deterministic=True)
        ones = [jnp.ones(subs[0].nodes[0].shape, jnp.float32),
                jnp.ones(subs[0].nodes[1].shape, jnp.float32)]
        with pytest.raises(ValueError):
            model.apply(params, feats, src, dst, dst, ts, *subs,
                        explain_weights=((ones, ones), (ones, ones)),
                        deterministic=True, method=TGAT.contrast)


def test_tgn_padded_batch_does_not_pollute_memory():
    """A drop_remainder=False final batch (mask=False padded rows pointing at
    the dataset's first events) must leave memory exactly as a truncated batch
    would: padded stores route to the padding node and row 0 is scrubbed
    (ADVICE r2: multihost padding hazard)."""
    import optax
    import __graft_entry__ as ge
    from tempme_tpu.models.tgn import TGN, init_memory_state
    from tempme_tpu.train import loops
    from tempme_tpu.train.learn_tgn import make_tgn_train_step

    ev, g, feats = ge._tiny_setup(dn=16, de=8)
    b, n = 8, 4
    model = TGN(node_dim=16, edge_dim=8, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0,
                compute_dtype=jnp.float32)
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    r = np.random.RandomState(3)
    src = r.randint(1, 32, b).astype(np.int32)
    dst = r.randint(1, 32, b).astype(np.int32)
    ts = np.full(b, float(ev.ts.max()) + 1, np.float32)
    eidx = r.randint(1, len(ev), b).astype(np.int32)
    # batch with 3 padded rows duplicating REAL events (the hazard)
    mask = np.r_[np.ones(5, bool), np.zeros(3, bool)]
    src[5:], dst[5:], eidx[5:] = ev.src[0], ev.dst[0], ev.e_idx[0]
    padded = loops.Batch(*(jnp.asarray(x) for x in (src, dst, ts, eidx, mask)))

    key = jax.random.PRNGKey(0)
    from tempme_tpu.ops import sampler as S
    subs = tuple(S.find_k_hop(g, jax.random.fold_in(key, i),
                              padded.src, padded.ts, 2, n)
                 for i in range(3))
    params = model.init({"params": key, "dropout": key}, feats, mem,
                        padded.src, padded.dst, padded.dst, padded.ts,
                        padded.eidx, *subs, deterministic=True)
    optimizer = optax.adam(1e-3)
    dst_table = jnp.asarray(np.unique(ev.dst))
    step = make_tgn_train_step(model, g, feats, dst_table, n, optimizer)
    state = loops.TrainState(params, optimizer.init(params), key)
    _, mem_pad, _ = step(state, mem, padded)

    # padded rows' nodes must have stored nothing
    for node in (int(ev.src[0]), int(ev.dst[0])):
        if node not in set(src[:5]) | set(dst[:5]):
            assert not bool(np.asarray(mem_pad.msg_valid)[node]), node
    # padding row 0 scrubbed
    assert not bool(np.asarray(mem_pad.msg_valid)[0])
    np.testing.assert_array_equal(np.asarray(mem_pad.msg_buf[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(mem_pad.memory[0]), 0.0)


def test_tgat_remat_matches_no_remat(setup):
    """remat=True must be a pure memory/recompute trade: outputs AND grads
    match the remat=False model to f32 roundoff (XLA reorders fusions across
    the remat boundary, so bit-exactness is not guaranteed)."""
    g, feats, src, dst, ts, eidx, subs, events = setup
    from tempme_tpu.models.tgat import TGAT
    key = jax.random.PRNGKey(1)
    sub3 = tuple(S.find_k_hop(g, jax.random.fold_in(key, i), x, ts, 3, N_DEG)
                 for i, x in enumerate((src, dst, dst)))
    base = TGAT(node_dim=DN, edge_dim=DE, num_layers=3, n_head=2, dropout=0.0)
    rem = TGAT(node_dim=DN, edge_dim=DE, num_layers=3, n_head=2, dropout=0.0,
               remat=True)
    params = base.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts, *sub3,
                       deterministic=True)
    params_r = rem.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        *sub3, deterministic=True)
    assert jax.tree.structure(params) == jax.tree.structure(params_r)

    def loss(m):
        def f(p):
            pos, neg = m.apply(p, feats, src, dst, dst, ts, *sub3,
                               deterministic=True)
            return jnp.mean(jax.nn.log_sigmoid(pos)) - \
                jnp.mean(jax.nn.log_sigmoid(-neg))
        return f

    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rem))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("ties", [False, True])
def test_tgn_ratio_contrast_matches_stacked_sweep(setup, ties):
    """The shared-work ratio sweep (TGN.ratio_contrast) must reproduce the
    stacked masked-subgraph forward (threshold_test semantics,
    temp_exp_main.py:159-241) for every ratio, including degenerate rows
    where a kept parent has all children dropped. ``ties=True`` quantizes
    the importances so many values are exactly equal — both paths must break
    ties identically (ADVICE r4)."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.tgn import TGN, init_memory_state
    from tempme_tpu.train.temp_exp_main import (keep_masks_for_ratios,
                                                mask_supports_for_ratios)
    model = TGN(node_dim=DN, edge_dim=DE, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0)
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    # non-trivial memory so the hop-0 q masking actually matters; row 0 stays
    # zero (padding node never receives messages, so memory[0] == 0 by
    # construction — the invariant the shared-work path relies on)
    m = np.random.RandomState(5).randn(g.num_nodes, model.memory_dim) * 0.1
    m[0] = 0.0
    mem = mem._replace(memory=jnp.asarray(m.astype(np.float32)))
    params = model.init(jax.random.PRNGKey(0), feats, mem, src, dst, dst, ts,
                        eidx, *subs, deterministic=True)

    ratios = (0.01, 0.05, 0.1, 0.2, 0.3)
    r = len(ratios)
    rng = np.random.RandomState(7)
    # explanation: per hop [3B, width] importance in (0, 1); the ties case
    # quantizes to 4 levels so top-k boundaries land on exact ties
    imp0 = rng.rand(3 * B, N_DEG).astype(np.float32)
    imp1 = rng.rand(3 * B, N_DEG * N_DEG).astype(np.float32)
    if ties:
        imp0 = np.round(imp0 * 4) / 4
        imp1 = np.round(imp1 * 4) / 4
    explanation = [jnp.asarray(imp0), jnp.asarray(imp1)]

    # fast path
    keeps = keep_masks_for_ratios(explanation, ratios, N_DEG)
    pos_f, neg_f = model.apply(params, feats, mem, src, dst, dst, ts,
                               subs[0], subs[1], subs[2],
                               keeps[0], keeps[1], keeps[2],
                               method=TGN.ratio_contrast)

    # reference stacked path
    masked = mask_supports_for_ratios(explanation, subs, ratios, N_DEG, "tgn")

    def tile(x):
        return jnp.broadcast_to(x[None], (r,) + x.shape).reshape(
            (-1,) + x.shape[1:])

    (pos_s, neg_s), _ = model.apply(params, feats, mem, tile(src), tile(dst),
                                    tile(dst), tile(ts), tile(eidx),
                                    masked[0], masked[1], masked[2],
                                    update_memory=False, deterministic=True,
                                    method=TGN.contrast)
    np.testing.assert_allclose(np.asarray(pos_f), np.asarray(pos_s)
                               .reshape(r, B), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(neg_f), np.asarray(neg_s)
                               .reshape(r, B), rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("n_layers,ties", [(2, False), (3, False), (3, True)])
def test_tgat_ratio_contrast_matches_stacked_sweep(setup, n_layers, ties):
    """TGAT.ratio_contrast (shared-work pyramid sweep, VERDICT r4 weak#3)
    must reproduce the stacked masked-subgraph forward for every ratio at
    both supported depths, including exactly tied importances."""
    g, feats, src, dst, ts, eidx, subs2, _ = setup
    from tempme_tpu.models.tgat import TGAT
    from tempme_tpu.train.temp_exp_main import (keep_masks_for_ratios,
                                                mask_supports_for_ratios)
    key = jax.random.PRNGKey(4)
    subs = tuple(S.find_k_hop(g, jax.random.fold_in(key, i), x, ts,
                              n_layers, N_DEG)
                 for i, x in enumerate((src, dst, dst)))
    model = TGAT(node_dim=DN, edge_dim=DE, num_layers=n_layers, n_head=2,
                 dropout=0.0, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        *subs, deterministic=True)

    ratios = (0.01, 0.05, 0.1, 0.2, 0.3)
    r = len(ratios)
    rng = np.random.RandomState(7)
    imp0 = rng.rand(3 * B, N_DEG).astype(np.float32)
    imp1 = rng.rand(3 * B, N_DEG * N_DEG).astype(np.float32)
    if ties:
        imp0 = np.round(imp0 * 4) / 4
        imp1 = np.round(imp1 * 4) / 4
    explanation = [jnp.asarray(imp0), jnp.asarray(imp1)]

    keeps = keep_masks_for_ratios(explanation, ratios, N_DEG)
    pos_f, neg_f = model.apply(params, feats, src, dst, dst, ts,
                               subs[0], subs[1], subs[2],
                               keeps[0], keeps[1], keeps[2],
                               method=TGAT.ratio_contrast)

    masked = mask_supports_for_ratios(explanation, subs, ratios, N_DEG,
                                      "tgat")

    def tile(x):
        return jnp.broadcast_to(x[None], (r,) + x.shape).reshape(
            (-1,) + x.shape[1:])

    pos_s, neg_s = model.apply(params, feats, tile(src), tile(dst),
                               tile(dst), tile(ts),
                               masked[0], masked[1], masked[2],
                               deterministic=True, method=TGAT.contrast)
    np.testing.assert_allclose(np.asarray(pos_f),
                               np.asarray(pos_s).reshape(r, B),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(neg_f),
                               np.asarray(neg_s).reshape(r, B),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("ties", [False, True])
def test_graphmixer_ratio_contrast_matches_stacked_sweep(setup, ties):
    """GraphMixer.ratio_contrast (shared gathers/encodings/projection, mixer
    folded over R) must reproduce the stacked masked forward bit-for-bit up
    to float tolerance, including the affine-projection bias at dropped
    slots and exactly tied importances."""
    g, feats, src, dst, ts, eidx, subs, _ = setup
    from tempme_tpu.models.graphmixer import GraphMixer
    from tempme_tpu.train.temp_exp_main import (keep_masks_for_ratios,
                                                mask_supports_for_ratios)
    model = GraphMixer(node_dim=DN, edge_dim=DE, num_tokens=N_DEG,
                       num_layers=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), feats, src, dst, dst, ts,
                        subs[0], subs[1], subs[2], deterministic=True)

    ratios = (0.01, 0.05, 0.1, 0.2, 0.3)
    r = len(ratios)
    rng = np.random.RandomState(9)
    imp0 = rng.rand(3 * B, N_DEG).astype(np.float32)
    if ties:
        imp0 = np.round(imp0 * 4) / 4
    explanation = [jnp.asarray(imp0)]

    keeps = keep_masks_for_ratios(explanation, ratios, N_DEG, use_hops=1)
    pos_f, neg_f = model.apply(params, feats, src, dst, dst, ts,
                               subs[0], subs[1], subs[2],
                               keeps[0][0], keeps[1][0], keeps[2][0],
                               method=GraphMixer.ratio_contrast)

    masked = mask_supports_for_ratios(explanation, subs, ratios, N_DEG,
                                      "graphmixer")

    def tile(x):
        return jnp.broadcast_to(x[None], (r,) + x.shape).reshape(
            (-1,) + x.shape[1:])

    pos_s, neg_s = model.apply(params, feats, tile(src), tile(dst),
                               tile(dst), tile(ts),
                               masked[0], masked[1], masked[2],
                               deterministic=True, method=GraphMixer.contrast)
    np.testing.assert_allclose(np.asarray(pos_f),
                               np.asarray(pos_s).reshape(r, B),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(neg_f),
                               np.asarray(neg_s).reshape(r, B),
                               rtol=1e-5, atol=1e-6)
