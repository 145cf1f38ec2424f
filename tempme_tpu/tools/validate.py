"""Environment + model-behavior validation.

Reference parity:
  * test_setup.py:12-156 — datasets load with sane shapes, imports resolve,
    directory layout exists.
  * validate_fixes.py:16-150 — explainer forward on dummy in-memory walks is
    consistent between train and eval mode, walk-importance weights are
    positive/finite with non-trivial variance, the dependency gate is wired.

Each check returns (name, ok, detail); ``main`` prints a table and exits
non-zero on any failure.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def check_imports() -> tuple:
    try:
        import jax, flax, optax  # noqa: F401
        import tempme_tpu.models, tempme_tpu.explain  # noqa: F401
        import tempme_tpu.ops.pallas  # noqa: F401
        return ("imports", True, f"jax {jax.__version__}, "
                f"backend={jax.default_backend()}")
    except Exception as e:  # pragma: no cover
        return ("imports", False, repr(e))


def check_dataset(data: str, data_dir: str) -> tuple:
    try:
        from ..data.events import load_dataset
        ds = load_dataset(data, data_dir)
        e, n = ds.full.num_edges, ds.full.num_nodes
        ok = (len(ds.full) > 0 and ds.edge_feat.shape[0] >= e
              and ds.node_feat.shape[0] >= n
              and np.all(np.diff(ds.full.ts) >= 0))
        return (f"dataset:{data}", ok,
                f"{len(ds.full)} events, {n} nodes, "
                f"edge_feat {ds.edge_feat.shape}, node_feat {ds.node_feat.shape}")
    except Exception as e:
        return (f"dataset:{data}", False, repr(e))


def _dummy_walks(b=4, w=12, num_nodes=30, num_edges=50, seed=0):
    import jax.numpy as jnp
    from ..ops.sampler import Walks, anony_to_cat
    r = np.random.RandomState(seed)
    nodes = r.randint(1, num_nodes, (b, w, 6)).astype(np.int32)
    eids = r.randint(1, num_edges, (b, w, 3)).astype(np.int32)
    ts = np.sort(r.rand(b, w, 3).astype(np.float32) * 100.0, axis=-1)[..., ::-1]
    x = r.randint(1, 4, (b, w)).astype(np.int32)
    t = r.randint(0, 4, (b, w)).astype(np.int32)
    anony = np.stack([np.ones_like(x), x, t], axis=-1)
    cat = np.asarray(anony_to_cat(jnp.asarray(x), jnp.asarray(t)))
    return Walks(jnp.asarray(nodes), jnp.asarray(eids),
                 jnp.asarray(ts.copy()), jnp.asarray(anony), jnp.asarray(cat))


def check_explainer_consistency() -> tuple:
    """Train-mode vs eval-mode forward on dummy walks: same shapes, finite,
    bounded divergence (validate_fixes.py:16-77)."""
    try:
        import jax
        import jax.numpy as jnp
        from ..explain.tempme import TempME
        from ..models.common import Features

        num_nodes, num_edges, dn, de = 30, 50, 16, 8
        r = np.random.RandomState(0)
        feats = Features(node=jnp.asarray(r.randn(num_nodes, dn), jnp.float32),
                         edge=jnp.asarray(r.randn(num_edges, de), jnp.float32))
        walks = _dummy_walks(num_nodes=num_nodes, num_edges=num_edges)
        cut = jnp.full((4,), 120.0, jnp.float32)
        m = TempME(node_dim=dn, edge_dim=de, out_dim=16, hid_dim=16,
                   dropout=0.2)
        params = m.init({"params": jax.random.PRNGKey(0)}, feats, walks, cut,
                        deterministic=True)
        imp_eval = m.apply(params, feats, walks, cut, deterministic=True)
        imp_train = m.apply(params, feats, walks, cut, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        gap = float(jnp.mean(jnp.abs(imp_eval - imp_train)))
        ok = (imp_eval.shape == imp_train.shape == (4, 12, 1)
              and bool(jnp.all(jnp.isfinite(imp_eval)))
              and bool(jnp.all((imp_eval >= 0) & (imp_eval <= 1)))
              and gap < 0.5)
        return ("explainer train/eval consistency", ok,
                f"shape {tuple(imp_eval.shape)}, |train-eval| mean {gap:.4f}")
    except Exception as e:
        return ("explainer train/eval consistency", False, repr(e))


def check_walk_importance() -> tuple:
    """Walk-importance weights: positive, finite, mean 1, non-zero variance
    (validate_fixes.py:80-128)."""
    try:
        import jax.numpy as jnp
        from ..explain.tempme import compute_walk_importance
        walks = _dummy_walks(seed=1)
        deg = jnp.asarray(np.random.RandomState(2).rand(30) * 20,
                          jnp.float32)
        cut = jnp.full((4,), 120.0, jnp.float32)
        ww = compute_walk_importance(walks.ts, walks.nodes, cut, deg)
        ok = (bool(jnp.all(jnp.isfinite(ww))) and bool(jnp.all(ww >= 0))
              and abs(float(ww.mean()) - 1.0) < 1e-3
              and float(ww.std()) > 1e-4)
        return ("walk-importance weights", ok,
                f"mean {float(ww.mean()):.4f}, std {float(ww.std()):.4f}")
    except Exception as e:
        return ("walk-importance weights", False, repr(e))


def check_pallas_parity() -> tuple:
    """Fused kernels match the jnp reference (interpret mode off-TPU)."""
    try:
        import jax.numpy as jnp
        from ..ops.pallas import kernels as pk
        from ..ops.segment import walk_to_edge_max_jnp
        r = np.random.RandomState(0)
        ids = jnp.asarray(r.randint(0, 20, (2, 36)), jnp.int32)
        imp = jnp.asarray(r.rand(2, 36), jnp.float32)
        tgt = jnp.asarray(r.randint(0, 20, (2, 30)), jnp.int32)
        err = float(jnp.max(jnp.abs(
            pk.walk_to_edge_max(ids, imp, tgt)
            - walk_to_edge_max_jnp(ids, imp, tgt))))
        return ("pallas kernel parity", err < 1e-6, f"max err {err:.2e}")
    except Exception as e:
        return ("pallas kernel parity", False, repr(e))


def run_all(data: str, data_dir: str) -> list:
    return [check_imports(), check_dataset(data, data_dir),
            check_explainer_consistency(), check_walk_importance(),
            check_pallas_parity()]


def main(argv=None) -> int:
    p = argparse.ArgumentParser("validate setup + explainer behavior")
    p.add_argument("-d", "--data", type=str, default="uslegis_sampled")
    p.add_argument("--data_dir", type=str,
                   default=os.environ.get("TEMPME_DATA_DIR",
                                          "/root/reference/processed"))
    args = p.parse_args(argv)
    results = run_all(args.data, args.data_dir)
    width = max(len(n) for n, _, _ in results)
    failed = 0
    for name, ok, detail in results:
        print(f"{'PASS' if ok else 'FAIL'}  {name:<{width}}  {detail}")
        failed += 0 if ok else 1
    print(f"{len(results) - failed}/{len(results)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
