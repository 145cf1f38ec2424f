"""Parity tests for the Pallas kernels (interpret mode on the CPU mesh).

Each kernel is checked against its jnp reference implementation for forward
allclose and gradient allclose (the custom VJP re-runs the jnp reference, so
grads must match bitwise up to float tolerance).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tempme_tpu.ops.pallas import kernels as pk
from tempme_tpu.ops.segment import walk_to_edge_max_jnp


def _rand_attn_inputs(seed=0, b=3, nq=5, n=7, h=2, dk=11):
    r = np.random.RandomState(seed)
    qh = jnp.asarray(r.randn(b, nq, h, dk), jnp.float32)
    kh = jnp.asarray(r.randn(b, nq, n, h, dk), jnp.float32)
    vh = jnp.asarray(r.randn(b, nq, n, h, dk), jnp.float32)
    mask = jnp.asarray(r.rand(b, nq, 1, n) < 0.3)
    # One fully-masked query exercises the uniform-softmax fallback.
    mask = mask.at[0, 0].set(True)
    ew = jnp.asarray(r.rand(b, nq, 1, n), jnp.float32)
    return qh, kh, vh, mask, ew


def _ref_attend(qh, kh, vh, mask, ew):
    b, nq, h, dk = qh.shape
    n = kh.shape[2]
    scores = jnp.einsum("bqhd,bqnhd->bqhn", qh, kh) / np.sqrt(dk)
    scores = jnp.where(mask.reshape(b, nq, 1, n), -1e10, scores)
    attn = jax.nn.softmax(scores, axis=-1) * ew.reshape(b, nq, 1, n)
    out = jnp.einsum("bqhn,bqnhd->bqhd", attn, vh)
    return out.reshape(b, nq, h * dk), attn


def test_fused_attend_forward_matches_jnp():
    qh, kh, vh, mask, ew = _rand_attn_inputs()
    dk = qh.shape[-1]
    out_p, attn_p = pk.fused_attend(qh, kh, vh, mask, ew, 1.0 / np.sqrt(dk))
    out_r, attn_r = _ref_attend(qh, kh, vh, mask, ew)
    np.testing.assert_allclose(out_p, out_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(attn_p, attn_r, rtol=1e-5, atol=1e-6)


def test_fused_attend_none_mask_and_weight():
    qh, kh, vh, _, _ = _rand_attn_inputs(seed=1)
    dk = qh.shape[-1]
    out_p, attn_p = pk.fused_attend(qh, kh, vh, None, None, 1.0 / np.sqrt(dk))
    b, nq, h, _ = qh.shape
    n = kh.shape[2]
    ones = jnp.ones((b, nq, 1, n), jnp.float32)
    out_r, attn_r = _ref_attend(qh, kh, vh, jnp.zeros_like(ones, bool), ones)
    np.testing.assert_allclose(out_p, out_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(attn_p, attn_r, rtol=1e-5, atol=1e-6)


def test_fused_attend_grads_match_jnp():
    qh, kh, vh, mask, ew = _rand_attn_inputs(seed=2)
    dk = qh.shape[-1]
    ct = np.random.RandomState(3).randn(*(qh.shape[:2] + (qh.shape[2] * dk,))
                                        ).astype(np.float32)

    def loss_p(qh, kh, vh, ew):
        out, _ = pk.fused_attend(qh, kh, vh, mask, ew, 1.0 / np.sqrt(dk))
        return jnp.sum(out * ct)

    def loss_r(qh, kh, vh, ew):
        out, _ = _ref_attend(qh, kh, vh, mask, ew)
        return jnp.sum(out * ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(qh, kh, vh, ew)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(qh, kh, vh, ew)
    for p, r in zip(gp, gr):
        np.testing.assert_allclose(p, r, rtol=1e-4, atol=1e-5)


def test_fused_attend_row_padding():
    # b*nq*h = 1*1*3 = 3 rows, not a multiple of the 8-row tile.
    qh, kh, vh, mask, ew = _rand_attn_inputs(seed=4, b=1, nq=1, n=5, h=3, dk=4)
    out_p, _ = pk.fused_attend(qh, kh, vh, mask, ew, 0.5)
    b, nq, h, dk = qh.shape
    n = kh.shape[2]
    scores = jnp.einsum("bqhd,bqnhd->bqhn", qh, kh) * 0.5
    scores = jnp.where(mask.reshape(b, nq, 1, n), -1e10, scores)
    attn = jax.nn.softmax(scores, axis=-1) * ew.reshape(b, nq, 1, n)
    out_r = jnp.einsum("bqhn,bqnhd->bqhd", attn, vh).reshape(b, nq, h * dk)
    np.testing.assert_allclose(out_p, out_r, rtol=1e-5, atol=1e-5)


def test_walk_to_edge_max_matches_jnp():
    r = np.random.RandomState(0)
    b, s, t = 4, 27, 33
    ids = jnp.asarray(r.randint(0, 20, (b, s)), jnp.int32)
    imp = jnp.asarray(r.rand(b, s), jnp.float32)
    tgt = jnp.asarray(r.randint(0, 20, (b, t)), jnp.int32)
    out_p = pk.walk_to_edge_max(ids, imp, tgt)
    out_r = walk_to_edge_max_jnp(ids, imp, tgt)
    np.testing.assert_allclose(out_p, out_r, rtol=1e-6, atol=1e-6)


def test_walk_to_edge_max_grads_match_jnp():
    r = np.random.RandomState(1)
    b, s, t = 3, 15, 10
    ids = jnp.asarray(r.randint(0, 8, (b, s)), jnp.int32)
    imp = jnp.asarray(r.rand(b, s), jnp.float32)
    tgt = jnp.asarray(r.randint(0, 8, (b, t)), jnp.int32)
    ct = jnp.asarray(r.rand(b, t), jnp.float32)

    gp = jax.grad(lambda w: jnp.sum(pk.walk_to_edge_max(ids, w, tgt) * ct))(imp)
    gr = jax.grad(lambda w: jnp.sum(walk_to_edge_max_jnp(ids, w, tgt) * ct))(imp)
    np.testing.assert_allclose(gp, gr, rtol=1e-6, atol=1e-6)


def test_dispatch_respects_env(monkeypatch):
    monkeypatch.setenv("TEMPME_PALLAS", "0")
    assert not pk.enabled()
    monkeypatch.setenv("TEMPME_PALLAS", "1")
    assert pk.enabled()


def test_attention_module_same_under_pallas(monkeypatch):
    """The full flax attention module must produce identical outputs whether
    the fused Pallas path (interpret mode here) or the jnp path runs."""
    from tempme_tpu.ops.attention import TemporalMultiHeadAttention

    r = np.random.RandomState(5)
    b, nq, n, d = 2, 3, 6, 16
    q = jnp.asarray(r.randn(b, nq, d), jnp.float32)
    k = jnp.asarray(r.randn(b, nq * n, d), jnp.float32)
    mask = jnp.asarray(r.rand(b, nq, n) < 0.3)
    mod = TemporalMultiHeadAttention(n_head=2, d_model=d, d_key=d, d_k=8,
                                     dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), q, k, mask)

    monkeypatch.setenv("TEMPME_PALLAS", "0")
    out_j, attn_j = mod.apply(params, q, k, mask)
    monkeypatch.setenv("TEMPME_PALLAS", "1")
    out_p, attn_p = mod.apply(params, q, k, mask)
    np.testing.assert_allclose(out_p, out_j, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(attn_p, attn_j, rtol=1e-5, atol=1e-6)
