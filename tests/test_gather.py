"""gather_rows correctness (ADVICE r3 high): the one-hot matmul path must
return table rows bit-exact (Precision.HIGHEST), including integer-valued
f32 id tables whose values exceed bf16's 8-bit mantissa, and must clamp
out-of-range indices exactly like jitted ``table[idx]``.

The same checks run on the real TPU chip via
``python -m tempme_tpu.tools.tpu_smoke`` (the CPU matmul is exact regardless
of precision flag, which is how the original bug escaped the suite).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tempme_tpu.ops.gather import gather_rows


def test_integer_id_tables_exact():
    # Edge-id-like values well past 256 (bf16 rounds these).
    table = jnp.asarray(
        np.arange(1, 2001, dtype=np.float32).reshape(500, 4) * 7.0)
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 500, (64, 30)))
    out = jax.jit(gather_rows)(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_float_tables_exact():
    r = np.random.RandomState(1)
    table = jnp.asarray(r.randn(300, 16).astype(np.float32))
    idx = jnp.asarray(r.randint(0, 300, (128,)))
    out = jax.jit(gather_rows)(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_out_of_range_clamps_like_indexing():
    table = jnp.asarray(np.arange(40, dtype=np.float32).reshape(10, 4))
    idx = jnp.asarray([-3, 0, 9, 11, 100])
    out = jax.jit(gather_rows)(table, idx)
    ref = jax.jit(lambda t, i: t[i])(table, idx)   # jit clamps OOR indices
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_large_table_falls_back_to_plain_gather():
    table = jnp.asarray(np.random.RandomState(2)
                        .randn(5000, 8).astype(np.float32))
    idx = jnp.asarray([0, 4999, 17])
    out = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_chunked_one_hot_path_exact(monkeypatch):
    """Above the one-hot byte budget, gather_rows chunks the one-hot operand
    instead of falling back to random DMA gathers; results stay exact."""
    from tempme_tpu.ops import gather as G
    monkeypatch.setattr(G, "ONE_HOT_BYTES", 64 * 1024)
    r = np.random.RandomState(3)
    table = jnp.asarray(r.randn(300, 16).astype(np.float32))
    idx = jnp.asarray(r.randint(0, 300, (64, 30)))
    out = G.gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])
