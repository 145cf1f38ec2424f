"""On-device smoke checks that must run on the REAL backend (the pytest suite
pins jax to a virtual CPU mesh, where f32 matmuls are exact and TPU-only
numerics bugs are invisible — ADVICE r3 high).

Run: ``python -m tempme_tpu.tools.tpu_smoke``  (on whatever backend jax
selects; on TPU this exercises the MXU precision paths).

Checks:
  1. gather_rows one-hot path returns f32 rows bit-exact, including
     integer-valued id tables with values > 256 (bf16 mantissa overflow).
  2. gather_rows OOR clamping matches jitted table[idx].
  3. dense-layout id roundtrip: float32-encoded edge ids up to 2^24-1 survive
     a gather_rows fetch + int cast exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tempme_tpu.ops.gather import gather_rows

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind})")
    failures = 0

    # 1. integer-valued f32 id table, values up to ~125k (Enron edge count)
    r = np.random.RandomState(0)
    ids = r.randint(0, 125_235, (1024, 8)).astype(np.float32)
    table = jnp.asarray(ids)
    idx = jnp.asarray(r.randint(0, 1024, (256, 30)))
    out = np.asarray(jax.jit(gather_rows)(table, idx))
    ok = np.array_equal(out, ids[np.asarray(idx)])
    print(f"integer-id gather exact: {'OK' if ok else 'FAIL'}")
    failures += not ok

    # 2. OOR clamp parity with table[idx]
    t2 = jnp.asarray(np.arange(80, dtype=np.float32).reshape(20, 4))
    i2 = jnp.asarray([-5, 0, 19, 25])
    o2 = np.asarray(jax.jit(gather_rows)(t2, i2))
    ref = np.asarray(jax.jit(lambda t, i: t[i])(t2, i2))
    ok = np.array_equal(o2, ref)
    print(f"OOR clamp parity:        {'OK' if ok else 'FAIL'}")
    failures += not ok

    # 3. float32-encoded ids near the 2^24 exactness ceiling
    big = np.array([[2.0**24 - 1, 2.0**23 + 1, 8_832.0, 125_235.0]],
                   np.float32).repeat(64, 0)
    o3 = np.asarray(jax.jit(gather_rows)(
        jnp.asarray(big), jnp.arange(64)))
    ok = np.array_equal(o3.astype(np.int64), big.astype(np.int64))
    print(f"2^24-1 id roundtrip:     {'OK' if ok else 'FAIL'}")
    failures += not ok

    if failures:
        raise SystemExit(f"{failures} smoke check(s) FAILED")
    print("all smoke checks passed")


if __name__ == "__main__":
    main()
