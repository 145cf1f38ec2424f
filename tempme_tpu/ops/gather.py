"""TPU-friendly row gathers.

The r3 trace of the TGN train step (logs/profile_r3, PERF.md) showed the step
is DMA-descriptor-bound: random row gathers from the projected node/edge K/V
tables (``table[idx]`` with ~230k random indices, 688-byte rows) each occupied
~20 ms of async DMA time — per-descriptor overhead, not bandwidth. On TPU a
gather from a SMALL table is far faster expressed as a one-hot matmul: the MXU
streams the whole table sequentially and the "gather" becomes dense compute.

``gather_rows`` dispatches to the one-hot form when BOTH
  * the table is small (N <= ONE_HOT_MAX rows — the one-hot FLOPs stay
    negligible), and
  * the materialized one-hot operand stays under ONE_HOT_BYTES
    (rows * N * 2 bytes in bf16 — dot operands are materialized).

The reference's benchmark graphs (Enron 184 nodes, USLegis 224) sit far under
both limits for node tables; edge tables (8.8k-125k rows) fall back to plain
gathers of the RAW (narrow) feature rows.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

ONE_HOT_MAX = 2048                  # max table rows for the one-hot path
ONE_HOT_BYTES = 256 * 1024 * 1024   # max materialized one-hot operand


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [N, D], idx [...] int -> [..., D]; equals ``table[idx]``.

    Out-of-range idx are clamped to [0, N-1], matching jitted ``table[idx]``
    semantics exactly. The one-hot matmul runs at Precision.HIGHEST so f32
    table rows (including integer-valued id tables) come back bit-exact —
    the TPU default single-pass bf16 matmul would round every row
    (ADVICE r3 high: edge ids > 256 were misrounded through bf16's 8-bit
    mantissa).
    """
    n = table.shape[0]
    rows = int(np.prod(idx.shape)) if idx.ndim else 1
    dt = table.dtype if table.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    if n > ONE_HOT_MAX:
        return table[idx]
    idx = jnp.where(idx < 0, idx + n, idx)   # Python-style negative wrap,
    idx = jnp.clip(idx, 0, n - 1)            # then XLA clamp — ≡ table[idx]
    tbl = table.astype(dt)

    def one_hot_rows(flat_idx):
        oh = jax.nn.one_hot(flat_idx, n, dtype=dt)
        return jnp.matmul(oh, tbl, preferred_element_type=table.dtype,
                          precision=jax.lax.Precision.HIGHEST)

    max_rows = ONE_HOT_BYTES // (n * jnp.dtype(dt).itemsize)
    if rows <= max_rows:
        out = one_hot_rows(idx)
    else:
        # large-batch path: chunk the one-hot operand under the byte budget
        # instead of falling back to descriptor-bound random DMA gathers
        # (the r4 batch sweep showed bs>=1024 regressing through that
        # fallback). Pad to a whole number of chunks, loop statically.
        flat = idx.reshape(-1)
        n_chunks = -(-rows // max_rows)
        pad = n_chunks * max_rows - rows
        flat = jnp.pad(flat, (0, pad))
        parts = [one_hot_rows(flat[i * max_rows:(i + 1) * max_rows])
                 for i in range(n_chunks)]
        out = jnp.concatenate(parts, axis=0)[:rows] \
            .reshape(idx.shape + (tbl.shape[1],))
    return out.astype(table.dtype)
