"""Golden per-layer parity against the actual PyTorch reference.

BASELINE.json's north-star acceptance criterion ("per-layer activations match
the PyTorch reference (allclose)", SURVEY.md §4 item (2)): import the
reference models from /root/reference, inject IDENTICAL numpy subgraphs/walks
into both implementations (the sampler stays out of the loop, SURVEY.md §7.3),
transfer weights across, and assert allclose.

Weight-transfer direction per model:

* TGAT / GraphMixer / TempME — reference → ours. Our split-projection
  attention (ops/attention.py:95-183) decomposes the reference's concat
  projection exactly (bias-free linear over a concat == sum of per-part
  linears), so the reference's randomly-initialized weights are split
  row-wise into our parameterization.
* TGN — ours → reference. The reference's TemporalAttentionLayer uses
  per-head dim d_k = FULL key_dim (TGN/modules/embedding_module.py:35-56,
  a much wider parameterization than ours); our weights embed into it by
  zero-padding each head's projection rows and rescaling for the differing
  1/sqrt(d_k) temperature.

Tolerances: float32 everywhere (models instantiated with
compute_dtype=float32); rtol 2e-4 absorbs LayerNorm epsilon differences
(flax 1e-6 vs torch 1e-5) and reduction-order noise.

Skipped automatically when torch or /root/reference are unavailable.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

RTOL, ATOL = 2e-4, 1e-5


# ---------------------------------------------------------------------------
# reference import machinery
# ---------------------------------------------------------------------------

def _import_ref(modname, relpath):
    """Import a reference file as a standalone module (no package side
    effects)."""
    import importlib.util
    key = f"refparity_{modname}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(
        key, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_tgat():
    return _import_ref("tgat", "TGAT/TGAT.py")


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# shared fixture data: a tiny graph + padded k-hop supports
# ---------------------------------------------------------------------------

def _fixture(seed=0, b=4, n=3, layers=2, dn=8, de=4, num_nodes=12,
             num_edges=20):
    """Random node/edge tables (row 0 zero = padding) + a [b, n], [b, n^2],
    ... support pyramid with zero padding sprinkled in, exactly the shapes
    the reference's find_k_hop emits (utils/graph.py:233-260)."""
    r = np.random.RandomState(seed)
    node_feat = np.r_[np.zeros((1, dn)), r.randn(num_nodes - 1, dn)] \
        .astype(np.float32)
    edge_feat = np.r_[np.zeros((1, de)), r.randn(num_edges - 1, de)] \
        .astype(np.float32)
    src = r.randint(1, num_nodes, b).astype(np.int32)
    cut = (100.0 + r.rand(b) * 10).astype(np.float32)
    nodes, eids, ts = [], [], []
    t_parent = cut[:, None]
    for h in range(layers):
        w = n ** (h + 1)
        nd = r.randint(0, num_nodes, (b, w)).astype(np.int32)
        nd[r.rand(b, w) < 0.25] = 0                      # padding
        ei = np.where(nd == 0, 0,
                      r.randint(1, num_edges, (b, w))).astype(np.int32)
        tt = (np.repeat(t_parent, n, axis=1) * (0.5 + 0.5 * r.rand(b, w))) \
            .astype(np.float32)
        tt = np.where(nd == 0, 0.0, tt)
        nodes.append(nd)
        eids.append(ei)
        ts.append(tt)
        t_parent = tt
    return dict(node_feat=node_feat, edge_feat=edge_feat, src=src, cut=cut,
                nodes=nodes, eids=eids, ts=ts, b=b, n=n, dn=dn, de=de)


def _jnp_subgraph(fx):
    import jax.numpy as jnp
    from tempme_tpu.ops.sampler import Subgraph
    return Subgraph(nodes=tuple(jnp.asarray(x) for x in fx["nodes"]),
                    eids=tuple(jnp.asarray(x) for x in fx["eids"]),
                    ts=tuple(jnp.asarray(x) for x in fx["ts"]))


# ---------------------------------------------------------------------------
# TGAT
# ---------------------------------------------------------------------------

def _tgat_params_from_ref(ref_model, layers, dn, de):
    """Reference TGAT state -> our flax param tree (split-projection
    mapping, see module docstring)."""
    def g(t):
        return t.detach().numpy()

    params = {"time_encoder": {
        "freq": g(ref_model.time_encoder.basis_freq),
        "phase": g(ref_model.time_encoder.phase)}}
    for i in range(layers):
        am = ref_model.attn_model_list[i]
        mha = am.multi_head_target
        wq = g(mha.w_qs.weight).T      # [d_model, h*dk]
        wk = g(mha.w_ks.weight).T
        wv = g(mha.w_vs.weight).T
        attn = {
            "wq_node": {"kernel": wq[:dn]},
            "wq_time": {"kernel": wq[dn + de:]},
            "wk_node": {"kernel": wk[:dn]},
            "wk_edge": {"kernel": wk[dn:dn + de]},
            "wk_time": {"kernel": wk[dn + de:]},
            "wv_node": {"kernel": wv[:dn]},
            "wv_edge": {"kernel": wv[dn:dn + de]},
            "wv_time": {"kernel": wv[dn + de:]},
            "fc": {"kernel": g(mha.fc.weight).T, "bias": g(mha.fc.bias)},
            "ln": {"scale": g(mha.layer_norm.weight),
                   "bias": g(mha.layer_norm.bias)},
        }
        merger = {
            nm: {"kernel": g(getattr(am.merger, nm).weight).T,
                 "bias": g(getattr(am.merger, nm).bias)}
            for nm in ("fc11", "fc12", "fc21", "fc22")}
        params[f"attn_{i}"] = {"attn": attn, "merger": merger}
    params["affinity_score"] = {
        nm: {"kernel": g(getattr(ref_model.affinity_score, nm).weight).T,
             "bias": g(getattr(ref_model.affinity_score, nm).bias)}
        for nm in ("fc1", "fc2")}
    return {"params": params}


@pytest.mark.parametrize("layers", [1, 2, 3])
def test_tgat_forward_parity(ref_tgat, layers):
    """forward_msg pyramid (TGAT/TGAT.py:607-706) + contrast affinity
    (TGAT/TGAT.py:461-481,543-551): per-layer-count embeddings and pos/neg
    logits allclose between reference torch and our jnp model with
    transferred weights."""
    import jax.numpy as jnp
    from tempme_tpu.models.common import Features
    from tempme_tpu.models.tgat import TGAT

    fx = _fixture(seed=layers, layers=layers)
    torch.manual_seed(layers)
    ref = ref_tgat.TGAT(fx["node_feat"], fx["edge_feat"],
                        num_neighbors=fx["n"], num_layers=layers,
                        n_head=1, drop_out=0.0)
    ref.eval()

    with torch.no_grad():
        ref_emb = ref.forward_msg(fx["src"], fx["cut"],
                                  (fx["nodes"], fx["eids"], fx["ts"]))

    model = TGAT(node_dim=fx["dn"], edge_dim=fx["de"], num_layers=layers,
                 n_head=1, dropout=0.0, compute_dtype=jnp.float32)
    params = _tgat_params_from_ref(ref, layers, fx["dn"], fx["de"])
    feats = Features(node=jnp.asarray(fx["node_feat"]),
                     edge=jnp.asarray(fx["edge_feat"]))
    sub = _jnp_subgraph(fx)
    our_emb = model.apply(params, feats, jnp.asarray(fx["src"]),
                          jnp.asarray(fx["cut"]), sub, deterministic=True,
                          method=TGAT.node_embed)
    np.testing.assert_allclose(_np(our_emb), ref_emb.numpy(),
                               rtol=RTOL, atol=ATOL,
                               err_msg=f"TGAT {layers}-layer embedding")

    # contrast: reuse the same support for tgt/bgd (shapes are what matter)
    with torch.no_grad():
        ref_pos, ref_neg = ref.contrast(
            fx["src"], fx["src"], fx["src"], fx["cut"], None,
            (fx["nodes"], fx["eids"], fx["ts"]),
            (fx["nodes"], fx["eids"], fx["ts"]),
            (fx["nodes"], fx["eids"], fx["ts"]))
    pos, neg = model.apply(params, feats, jnp.asarray(fx["src"]),
                           jnp.asarray(fx["src"]), jnp.asarray(fx["src"]),
                           jnp.asarray(fx["cut"]), sub, sub, sub,
                           deterministic=True, method=TGAT.contrast)
    np.testing.assert_allclose(_np(pos), ref_pos.numpy(), rtol=RTOL,
                               atol=ATOL)
    np.testing.assert_allclose(_np(neg), ref_neg.numpy(), rtol=RTOL,
                               atol=ATOL)


def test_tgat_explain_weight_parity(ref_tgat):
    """The post-softmax explain-weight hook (TGAT/TGAT.py:76-78) behaves
    identically: weighted contrast logits allclose."""
    import jax.numpy as jnp
    from tempme_tpu.models.common import Features
    from tempme_tpu.models.tgat import TGAT

    layers = 2
    fx = _fixture(seed=7, layers=layers)
    torch.manual_seed(7)
    ref = ref_tgat.TGAT(fx["node_feat"], fx["edge_feat"],
                        num_neighbors=fx["n"], num_layers=layers,
                        n_head=1, drop_out=0.0)
    ref.eval()
    r = np.random.RandomState(3)
    imp = [[_t(r.rand(*x.shape).astype(np.float32)) for x in fx["nodes"]]
           for _ in range(4)]
    exp_weights = [[imp[0], imp[1]], [imp[2], imp[3]]]
    with torch.no_grad():
        ref_pos, ref_neg = ref.contrast(
            fx["src"], fx["src"], fx["src"], fx["cut"], None,
            (fx["nodes"], fx["eids"], fx["ts"]),
            (fx["nodes"], fx["eids"], fx["ts"]),
            (fx["nodes"], fx["eids"], fx["ts"]),
            if_explain=True, exp_weights=exp_weights)

    model = TGAT(node_dim=fx["dn"], edge_dim=fx["de"], num_layers=layers,
                 n_head=1, dropout=0.0, compute_dtype=jnp.float32)
    params = _tgat_params_from_ref(ref, layers, fx["dn"], fx["de"])
    feats = Features(node=jnp.asarray(fx["node_feat"]),
                     edge=jnp.asarray(fx["edge_feat"]))
    sub = _jnp_subgraph(fx)
    ew = [[[jnp.asarray(w.numpy()) for w in side] for side in pair]
          for pair in exp_weights]
    pos, neg = model.apply(params, feats, jnp.asarray(fx["src"]),
                           jnp.asarray(fx["src"]), jnp.asarray(fx["src"]),
                           jnp.asarray(fx["cut"]), sub, sub, sub,
                           explain_weights=ew, deterministic=True,
                           method=TGAT.contrast)
    np.testing.assert_allclose(_np(pos), ref_pos.numpy(), rtol=RTOL,
                               atol=ATOL)
    np.testing.assert_allclose(_np(neg), ref_neg.numpy(), rtol=RTOL,
                               atol=ATOL)


# ---------------------------------------------------------------------------
# TGN
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_tgn_mod():
    """Import the reference TGN package with a numba stub (numba is not in
    this image; only the sampler needs it and parity injects subgraphs)."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    return importlib.import_module("TGN.tgn")


def _tgn_ref_from_ours(ref, params, dn, de, layers):
    """Transfer OUR randomly-initialized params into the reference TGN
    (zero-padding embedding, see module docstring). n_head must be 1."""
    p = params["params"]

    def T(x):
        return torch.from_numpy(np.asarray(x).T.copy())

    def A(x):
        return torch.from_numpy(np.asarray(x).copy())

    with torch.no_grad():
        # linear-cos time encoder (TGN/modules/embedding_module.py:88-100)
        ref.time_encoder.w.weight.copy_(
            A(p["time_encoder"]["freq"]).reshape(-1, 1))
        ref.time_encoder.w.bias.copy_(A(p["time_encoder"]["phase"]))
        # message MLP (message_function.py:13-26)
        mm = p["message_mlp"]
        ref.message_function.mlp[0].weight.copy_(T(mm["layers_0"]["kernel"]))
        ref.message_function.mlp[0].bias.copy_(A(mm["layers_0"]["bias"]))
        ref.message_function.mlp[2].weight.copy_(T(mm["layers_2"]["kernel"]))
        ref.message_function.mlp[2].bias.copy_(A(mm["layers_2"]["bias"]))
        # GRU cell (memory_updater.py:46-52): torch gate order (r, z, n);
        # torch's b_ir/b_hr split is additive so ours lands in bias_ih
        gru = p["memory_updater"]
        w_ih = torch.cat([T(gru["ir"]["kernel"]), T(gru["iz"]["kernel"]),
                          T(gru["in"]["kernel"])], dim=0)
        w_hh = torch.cat([T(gru["hr"]["kernel"]), T(gru["hz"]["kernel"]),
                          T(gru["hn"]["kernel"])], dim=0)
        b_ih = torch.cat([A(gru["ir"]["bias"]), A(gru["iz"]["bias"]),
                          A(gru["in"]["bias"])])
        b_hh = torch.cat([torch.zeros_like(A(gru["hn"]["bias"]))] * 2
                         + [A(gru["hn"]["bias"])])
        cell = ref.memory_updater.memory_updater
        cell.weight_ih.copy_(w_ih)
        cell.weight_hh.copy_(w_hh)
        cell.bias_ih.copy_(b_ih)
        cell.bias_hh.copy_(b_hh)
        # attention layers (embedding_module.py:118-182): ref per-head dim is
        # the FULL key_dim; embed ours by zero-padding + temperature rescale
        dt = dn
        q_dim, k_dim = dn + dt, dn + de + dt
        dk_ours = q_dim
        scale = float(np.sqrt(k_dim) / np.sqrt(dk_ours))
        for i in range(layers):
            a = p[f"attn_{i}"]["attn"]
            mha = ref.embedding_module.attention_models[i].multi_head_target
            wq = np.concatenate([a["wq_node"]["kernel"],
                                 a["wq_time"]["kernel"]], axis=0)  # [q_dim, dk]
            wk = np.concatenate([a["wk_node"]["kernel"],
                                 a["wk_edge"]["kernel"],
                                 a["wk_time"]["kernel"]], axis=0)  # [k_dim, dk]
            wv = np.concatenate([a["wv_node"]["kernel"],
                                 a["wv_edge"]["kernel"],
                                 a["wv_time"]["kernel"]], axis=0)
            # reference key layout is [node || edge || time]
            # (TemporalAttentionLayer.forward: cat([ngh, edge, time]))
            pad_q = np.zeros((k_dim - dk_ours, q_dim), np.float32)
            pad_k = np.zeros((k_dim - dk_ours, k_dim), np.float32)
            mha.w_qs.weight.copy_(torch.from_numpy(
                np.concatenate([np.asarray(wq).T, pad_q], axis=0)))
            mha.w_ks.weight.copy_(torch.from_numpy(
                np.concatenate([np.asarray(wk).T * scale, pad_k], axis=0)))
            mha.w_vs.weight.copy_(torch.from_numpy(
                np.concatenate([np.asarray(wv).T, pad_k], axis=0)))
            fc = np.zeros((q_dim, k_dim), np.float32)
            fc[:, :dk_ours] = np.asarray(a["fc"]["kernel"]).T
            mha.fc.weight.copy_(torch.from_numpy(fc))
            mha.fc.bias.copy_(A(a["fc"]["bias"]))
            mha.layer_norm.weight.copy_(A(a["ln"]["scale"]))
            mha.layer_norm.bias.copy_(A(a["ln"]["bias"]))
            mg = p[f"attn_{i}"]["merger"]
            ref_mg = ref.embedding_module.attention_models[i].merger
            ref_mg.fc1.weight.copy_(T(mg["fc1"]["kernel"]))
            ref_mg.fc1.bias.copy_(A(mg["fc1"]["bias"]))
            ref_mg.fc2.weight.copy_(T(mg["fc2"]["kernel"]))
            ref_mg.fc2.bias.copy_(A(mg["fc2"]["bias"]))
        aff = p["affinity_score"]
        ref.affinity_score.fc1.weight.copy_(T(aff["fc1"]["kernel"]))
        ref.affinity_score.fc1.bias.copy_(A(aff["fc1"]["bias"]))
        ref.affinity_score.fc2.weight.copy_(T(aff["fc2"]["kernel"]))
        ref.affinity_score.fc2.bias.copy_(A(aff["fc2"]["bias"]))


def _ref_subgraph(fx):
    return ([x.astype(np.int64) for x in fx["nodes"]],
            [x.astype(np.int64) for x in fx["eids"]],
            [x.astype(np.float64) for x in fx["ts"]])


def test_tgn_memory_and_embedding_parity(ref_tgn_mod):
    """TGN two-batch sequence (TGN/tgn.py:100-218 + GraphAttentionEmbedding,
    embedding_module.py:356-393): contrast logits, pending raw messages,
    persisted memory and last_update all allclose across two consecutive
    batches (the second batch exercises GRU advance + persist + re-store)."""
    import jax
    import jax.numpy as jnp
    from tempme_tpu.models.common import Features
    from tempme_tpu.models.tgn import TGN, init_memory_state

    dn, de, layers, n, b = 8, 4, 2, 3, 4
    num_nodes, num_edges = 12, 20
    fxs = [_fixture(seed=s, b=b, n=n, layers=layers, dn=dn, de=de,
                    num_nodes=num_nodes, num_edges=num_edges)
           for s in (11, 12, 13, 21, 22, 23)]
    node_feat, edge_feat = fxs[0]["node_feat"], fxs[0]["edge_feat"]

    model = TGN(node_dim=dn, edge_dim=de, num_nodes=num_nodes, n_layers=layers,
                n_head=1, dropout=0.0, compute_dtype=jnp.float32)
    mem0 = init_memory_state(num_nodes, model.memory_dim,
                             model.raw_message_dim)
    feats = Features(node=jnp.asarray(node_feat), edge=jnp.asarray(edge_feat))
    r = np.random.RandomState(5)
    src1 = r.randint(1, num_nodes, b).astype(np.int32)
    tgt1 = r.randint(1, num_nodes, b).astype(np.int32)
    bgd1 = r.randint(1, num_nodes, b).astype(np.int32)
    e1 = r.randint(1, num_edges, b).astype(np.int32)
    cut1 = fxs[0]["cut"]
    src2, tgt2, bgd2 = (np.r_[src1[:2], r.randint(1, num_nodes, b - 2)]
                        .astype(np.int32),
                        r.randint(1, num_nodes, b).astype(np.int32),
                        r.randint(1, num_nodes, b).astype(np.int32))
    e2 = r.randint(1, num_edges, b).astype(np.int32)
    cut2 = (cut1 + 50.0).astype(np.float32)

    subs1 = [_jnp_subgraph(fx) for fx in fxs[:3]]
    subs2 = [_jnp_subgraph(fx) for fx in fxs[3:]]
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0)}, feats, mem0,
        jnp.asarray(src1), jnp.asarray(tgt1), jnp.asarray(bgd1),
        jnp.asarray(cut1), jnp.asarray(e1), *subs1, deterministic=True)

    ref = ref_tgn_mod.TGN(node_feat, edge_feat, n_neighbors=n, device="cpu",
                          n_layers=layers, n_heads=1, dropout=0.0)
    ref.eval()
    _tgn_ref_from_ours(ref, jax.device_get(params), dn, de, layers)

    @jax.jit
    def run(mem, src, tgt, bgd, cut, eidx, s0, s1, s2):
        from tempme_tpu.models.tgn import TGN as _TGN
        return model.apply(params, feats, mem, src, tgt, bgd, cut, eidx,
                           s0, s1, s2, deterministic=True,
                           method=_TGN.contrast)

    state = mem0
    for step, (src, tgt, bgd, cut, eidx, subs, fx3) in enumerate([
            (src1, tgt1, bgd1, cut1, e1, subs1, fxs[:3]),
            (src2, tgt2, bgd2, cut2, e2, subs2, fxs[3:])]):
        with torch.no_grad():
            ref_pos, ref_neg = ref.contrast(
                src, tgt, bgd, cut, eidx, *[_ref_subgraph(f) for f in fx3])
        (pos, neg), state = run(state, jnp.asarray(src), jnp.asarray(tgt),
                                jnp.asarray(bgd), jnp.asarray(cut),
                                jnp.asarray(eidx), *subs)
        np.testing.assert_allclose(_np(pos), ref_pos.numpy(), rtol=RTOL,
                                   atol=ATOL,
                                   err_msg=f"TGN pos logits batch {step}")
        np.testing.assert_allclose(_np(neg), ref_neg.numpy(), rtol=RTOL,
                                   atol=ATOL,
                                   err_msg=f"TGN neg logits batch {step}")
        # memory state vs the reference's Memory module
        np.testing.assert_allclose(_np(state.memory),
                                   ref.memory.memory.detach().numpy(),
                                   rtol=RTOL, atol=ATOL,
                                   err_msg=f"TGN memory batch {step}")
        np.testing.assert_allclose(_np(state.last_update),
                                   ref.memory.last_update.detach().numpy(),
                                   rtol=RTOL, atol=ATOL,
                                   err_msg=f"TGN last_update batch {step}")
        # pending raw messages: reference keeps per-node lists; ours keeps the
        # last (the only one the "last" aggregator ever reads)
        for node in range(num_nodes):
            msgs = ref.memory.messages.get(node, [])
            if not msgs:
                assert not bool(_np(state.msg_valid)[node]), node
            else:
                assert bool(_np(state.msg_valid)[node]), node
                np.testing.assert_allclose(
                    _np(state.msg_buf)[node], msgs[-1][0].detach().numpy(),
                    rtol=RTOL, atol=ATOL,
                    err_msg=f"TGN raw message node {node} batch {step}")


# ---------------------------------------------------------------------------
# GraphMixer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_graphmixer():
    return _import_ref("graphmixer", "GraphM/graphmixer.py")


def _graphmixer_params_from_ref(ref, layers):
    def g(t):
        return t.detach().numpy()

    def lin(mod):
        return {"kernel": g(mod.weight).T, "bias": g(mod.bias)}

    params = {"projection": lin(ref.projection_layer),
              "output_layer": lin(ref.output_layer),
              "affinity_score": {"fc1": lin(ref.affinity_score.fc1),
                                 "fc2": lin(ref.affinity_score.fc2)}}
    for i in range(layers):
        mx = ref.mlp_mixers[i]
        params[f"mixer_{i}"] = {
            "token_norm": {"scale": g(mx.token_norm.weight),
                           "bias": g(mx.token_norm.bias)},
            "token_ffn": {"Dense_0": lin(mx.token_feedforward.ffn[0]),
                          "Dense_1": lin(mx.token_feedforward.ffn[3])},
            "channel_norm": {"scale": g(mx.channel_norm.weight),
                             "bias": g(mx.channel_norm.bias)},
            "channel_ffn": {"Dense_0": lin(mx.channel_feedforward.ffn[0]),
                            "Dense_1": lin(mx.channel_feedforward.ffn[3])},
        }
    return {"params": params}


@pytest.mark.parametrize("use_explain", [False, True])
def test_graphmixer_parity(ref_graphmixer, use_explain):
    """compute_node_temporal_embeddings + contrast
    (GraphM/graphmixer.py:143-222) incl. the three explain-weight injection
    points (:158-189): logits allclose under transferred weights."""
    import jax.numpy as jnp
    from tempme_tpu.models.common import Features
    from tempme_tpu.models.graphmixer import GraphMixer

    fx = _fixture(seed=31, layers=2)
    b, n = fx["b"], fx["n"]
    torch.manual_seed(31)
    ref = ref_graphmixer.GraphMixer(fx["node_feat"], fx["edge_feat"],
                                    n_neighbors=n, device="cpu",
                                    num_tokens=n, num_layers=2, dropout=0.0)
    ref.eval()

    exp = None
    ref_exp = None
    if use_explain:
        r = np.random.RandomState(4)
        w = r.rand(3 * b, n).astype(np.float32)
        ref_exp = [_t(w)]
        exp = tuple(jnp.asarray(w[i * b:(i + 1) * b]) for i in range(3))

    sub_ref = _ref_subgraph(fx)
    with torch.no_grad():
        ref_pos, ref_neg = ref.contrast(
            fx["src"], fx["src"], fx["src"], fx["cut"], None,
            sub_ref, sub_ref, sub_ref, explain_weights=ref_exp)

    model = GraphMixer(node_dim=fx["dn"], edge_dim=fx["de"], num_tokens=n,
                       num_layers=2, dropout=0.0)
    params = _graphmixer_params_from_ref(ref, 2)
    feats = Features(node=jnp.asarray(fx["node_feat"]),
                     edge=jnp.asarray(fx["edge_feat"]))
    sub = _jnp_subgraph(fx)
    pos, neg = model.apply(params, feats, jnp.asarray(fx["src"]),
                           jnp.asarray(fx["src"]), jnp.asarray(fx["src"]),
                           jnp.asarray(fx["cut"]), sub, sub, sub,
                           explain_weights=exp, deterministic=True,
                           method=GraphMixer.contrast)
    np.testing.assert_allclose(_np(pos), ref_pos.numpy(), rtol=RTOL,
                               atol=ATOL)
    np.testing.assert_allclose(_np(neg), ref_neg.numpy(), rtol=RTOL,
                               atol=ATOL)


# ---------------------------------------------------------------------------
# TempME explainer
# ---------------------------------------------------------------------------

NULL12 = (np.arange(1, 13, dtype=np.float64) / np.arange(1, 13).sum())


@pytest.fixture(scope="module")
def ref_explainer():
    """Import models/explainer.py with stubs for torch_scatter (absent in this
    image; emulated in plain torch per VERDICT r2 missing#1) and the reference
    `utils` package (get_null_distribution runs a numba sampling pass)."""
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter(src, index, dim=-1, dim_size=None, reduce="sum"):
            # [B, S] or [B, S, 1] along dim 1/-1 with a [B, S] index — the only
            # forms the explainer uses (models/explainer.py:389,443);
            # torch_scatter broadcasts a lower-rank index over trailing dims
            if src.dim() == 3 and index.dim() == 2:
                assert dim == 1
                index = index.unsqueeze(-1).expand_as(src)
                out = torch.zeros(src.shape[0], dim_size, src.shape[2],
                                  dtype=src.dtype)
            else:
                assert dim in (-1, 1) and src.dim() == 2
                out = torch.zeros(src.shape[0], dim_size, dtype=src.dtype)
            d = 1
            if reduce == "max":
                out.scatter_reduce_(d, index, src, reduce="amax",
                                    include_self=True)
            elif reduce == "mean":
                out.scatter_reduce_(d, index, src, reduce="mean",
                                    include_self=False)
            else:
                out.scatter_reduce_(d, index, src, reduce="sum",
                                    include_self=True)
            return out

        ts.scatter = scatter
        sys.modules["torch_scatter"] = ts
    if "utils" not in sys.modules or not hasattr(sys.modules["utils"],
                                                 "get_null_distribution"):
        u = types.ModuleType("utils")
        u.get_null_distribution = lambda data_name: {
            i: float(NULL12[i]) for i in range(12)}
        sys.modules["utils"] = u
    return _import_ref("explainer", "models/explainer.py")


class _FakeBase:
    """Duck-typed stand-in for the frozen base model the reference explainer
    reads feature tables from (models/explainer.py:129-130)."""

    def __init__(self, node_feat, edge_feat):
        self.n_feat_th = torch.from_numpy(node_feat)
        self.e_feat_th = torch.from_numpy(edge_feat)
        self.node_raw_features = torch.nn.Embedding.from_pretrained(
            self.n_feat_th, padding_idx=0, freeze=True)
        self.edge_raw_features = torch.nn.Embedding.from_pretrained(
            self.e_feat_th, padding_idx=0, freeze=True)


def _walk_fixture(seed=0, b=3, w=5, dn=8, de=4, num_nodes=12, num_edges=20):
    fx = _fixture(seed=seed, b=b, n=3, layers=2, dn=dn, de=de,
                  num_nodes=num_nodes, num_edges=num_edges)
    r = np.random.RandomState(seed + 100)
    nodes = r.randint(1, num_nodes, (b, w, 6)).astype(np.int32)
    eids = r.randint(1, num_edges, (b, w, 3)).astype(np.int32)
    ts = np.sort(r.rand(b, w, 3).astype(np.float32) * 100.0, axis=-1)
    cat = r.randint(0, 12, (b, w)).astype(np.int32)
    fx.update(dict(wnodes=nodes, weids=eids, wts=ts, wcat=cat, w=w))
    return fx


def _jnp_walks(fx):
    import jax.numpy as jnp
    from tempme_tpu.explain.tempme import make_walk_inputs
    from tempme_tpu.ops.sampler import Walks
    walks = Walks(nodes=jnp.asarray(fx["wnodes"]), eids=jnp.asarray(fx["weids"]),
                  ts=jnp.asarray(fx["wts"]),
                  anony=jnp.zeros(fx["wts"].shape, jnp.int32),
                  cat=jnp.asarray(fx["wcat"]))
    return make_walk_inputs(walks)


def _tempme_params_from_ref(ref):
    def g(t):
        return t.detach().numpy()

    def lin(mod):
        return {"kernel": g(mod.weight).T, "bias": g(mod.bias)}

    return {"params": {
        "event_conv": {"lin_event": lin(ref.event_conv.lin_event),
                       "Dense_0": lin(ref.event_conv.MLP[0]),
                       "Dense_1": lin(ref.event_conv.MLP[2])},
        "attention": {"W1": lin(ref.attention.W1),
                      "W2": lin(ref.attention.W2),
                      "Dense_0": lin(ref.attention.MLP[0]),
                      "Dense_1": lin(ref.attention.MLP[3])},
        "head_d1": lin(ref.MLP[0]),
        "head_d2": lin(ref.MLP[3]),
        "head_d3": lin(ref.MLP[5]),
        "time_encoder": {"freq": g(ref.time_encoder.basis_freq),
                         "phase": g(ref.time_encoder.phase)},
        "dep_d1": lin(ref.edge_dependency_gcn[0]),
        "dep_d2": lin(ref.edge_dependency_gcn[3]),
        "dep_d3": lin(ref.edge_dependency_gcn[6]),
        "aff_fc1": lin(ref.affinity_score.fc1),
        "aff_fc2": lin(ref.affinity_score.fc2),
    }}


def _make_ref_tempme(ref_explainer, fx):
    base = _FakeBase(fx["node_feat"], fx["edge_feat"])
    torch.manual_seed(17)
    ref = ref_explainer.TempME(base, "tgn", "parity_dummy", out_dim=8,
                               hid_dim=16, dropout_p=0.0, device="cpu")
    ref.eval()
    return ref


def _ref_walks_tuple(fx):
    return (fx["wnodes"].astype(np.int64), fx["weids"].astype(np.int64),
            fx["wts"].astype(np.float32), fx["wcat"].astype(np.int64), None)


def test_tempme_forward_parity(ref_explainer):
    """TempME.forward walk importance (models/explainer.py:174-201) incl. the
    temporal-aware attention fork addition (:768-847): allclose."""
    import jax.numpy as jnp
    from tempme_tpu.explain.tempme import TempME
    from tempme_tpu.models.common import Features

    fx = _walk_fixture(seed=41)
    ref = _make_ref_tempme(ref_explainer, fx)
    walks = _jnp_walks(fx)
    edge_identify = np.asarray(walks.edge_count).astype(np.float64)

    with torch.no_grad():
        ref_imp = ref.forward(_ref_walks_tuple(fx), fx["cut"], edge_identify)

    model = TempME(node_dim=fx["dn"], edge_dim=fx["de"], out_dim=8, hid_dim=16,
                   base_type="tgn", dropout=0.0)
    params = _tempme_params_from_ref(ref)
    feats = Features(node=jnp.asarray(fx["node_feat"]),
                     edge=jnp.asarray(fx["edge_feat"]))
    imp = model.apply(params, feats, walks, jnp.asarray(fx["cut"]),
                      deterministic=True)
    np.testing.assert_allclose(_np(imp), ref_imp.numpy(), rtol=RTOL, atol=ATOL)


def test_tempme_edge_importance_parity(ref_explainer):
    """retrieve_edge_imp_node eval path (models/explainer.py:354-406):
    dependency gate -> scatter-max -> gather -> Beta mean -> mask, allclose
    (torch_scatter emulated in plain torch)."""
    import jax.numpy as jnp
    from tempme_tpu.explain.tempme import TempME
    from tempme_tpu.models.common import Features

    fx = _walk_fixture(seed=42)
    ref = _make_ref_tempme(ref_explainer, fx)
    walks = _jnp_walks(fx)
    b, w = fx["b"], fx["w"]
    r = np.random.RandomState(9)
    imp = r.rand(b, w, 1).astype(np.float32)

    sub_ref = _ref_subgraph(fx)
    with torch.no_grad():
        ref0, ref1 = ref.retrieve_edge_imp_node(
            sub_ref, _t(imp), _ref_walks_tuple(fx), training=False)

    model = TempME(node_dim=fx["dn"], edge_dim=fx["de"], out_dim=8, hid_dim=16,
                   base_type="tgn", dropout=0.0)
    params = _tempme_params_from_ref(ref)
    feats = Features(node=jnp.asarray(fx["node_feat"]),
                     edge=jnp.asarray(fx["edge_feat"]))
    imp0, imp1 = model.apply(params, feats, _jnp_subgraph(fx),
                             jnp.asarray(imp), walks, training=False,
                             deterministic=True,
                             method=TempME.edge_importance)
    np.testing.assert_allclose(_np(imp0), ref0.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(imp1), ref1.numpy(), rtol=RTOL, atol=ATOL)


def test_tempme_kl_loss_parity(ref_explainer):
    """kl_loss empirical prior (models/explainer.py:432-453): scatter-mean per
    motif class vs null distribution, allclose."""
    import jax.numpy as jnp
    from tempme_tpu.explain.tempme import kl_sparsity_loss

    fx = _walk_fixture(seed=43)
    ref = _make_ref_tempme(ref_explainer, fx)
    b, w = fx["b"], fx["w"]
    r = np.random.RandomState(10)
    prob = r.rand(b, w, 1).astype(np.float32)

    with torch.no_grad():
        # the reference is only ever called with the unsqueezed [B, W, 1]
        # importance (temp_exp_main.py:625-630)
        ref_kl = ref.kl_loss(_t(prob), _ref_walks_tuple(fx), target=0.3)
    kl = kl_sparsity_loss(jnp.asarray(prob), jnp.asarray(fx["wcat"]),
                          jnp.asarray(NULL12.astype(np.float32)), target=0.3)
    np.testing.assert_allclose(float(kl), float(ref_kl), rtol=RTOL, atol=ATOL)


def test_tempme_enhance_parity(ref_explainer):
    """enhance_predict_agg (models/explainer.py:203-258) incl.
    compute_walk_importance soft weighting (:260-306): pos/neg scores
    allclose."""
    import jax.numpy as jnp
    from tempme_tpu.explain.tempme import TempME
    from tempme_tpu.models.common import Features

    fx = _walk_fixture(seed=44)
    ref = _make_ref_tempme(ref_explainer, fx)
    walks = _jnp_walks(fx)
    b = fx["b"]
    r = np.random.RandomState(11)
    gat = [r.randn(b, fx["dn"]).astype(np.float32) for _ in range(3)]
    edge_identify = np.asarray(walks.edge_count).astype(np.float64)

    with torch.no_grad():
        ref_pos, ref_neg = ref.enhance_predict_agg(
            fx["cut"], _ref_walks_tuple(fx), _ref_walks_tuple(fx),
            _ref_walks_tuple(fx),
            (edge_identify, edge_identify, edge_identify),
            _t(gat[0]), _t(gat[1]), _t(gat[2]))

    model = TempME(node_dim=fx["dn"], edge_dim=fx["de"], out_dim=8, hid_dim=16,
                   base_type="tgn", dropout=0.0)
    params = _tempme_params_from_ref(ref)
    feats = Features(node=jnp.asarray(fx["node_feat"]),
                     edge=jnp.asarray(fx["edge_feat"]))
    pos, neg = model.apply(params, feats, jnp.asarray(fx["cut"]), walks,
                           walks, walks, jnp.asarray(gat[0]),
                           jnp.asarray(gat[1]), jnp.asarray(gat[2]),
                           deterministic=True,
                           method=TempME.enhance_predict_agg)
    # walk-sum + affinity stack accumulates float32 reduction-order noise
    # beyond the per-layer tolerance; 1e-3 still pins the math
    np.testing.assert_allclose(_np(pos), ref_pos.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(_np(neg), ref_neg.numpy(), rtol=1e-3, atol=1e-4)
