"""Explanation visualizations.

Reference parity:
  * visualize_explanations.py:17-120 — per-sample edge-importance plots from a
    trained base + explainer pair, written into an output directory.
  * visualize_improvements.py:14-80 — before/after training-curve comparison.

All plotting is pure-matplotlib on host; model evaluation happens in the same
jitted paths the explainer driver uses.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


# ---------------------------------------------------------------------------
# pure plotting primitives (unit-testable without checkpoints)
# ---------------------------------------------------------------------------

def plot_edge_importance(eids: np.ndarray, imps: np.ndarray, ts: np.ndarray,
                         cut_time: float, path: str, title: str = "") -> str:
    """Scatter of per-edge importance vs event recency for one sample.

    eids/imps/ts are the flattened (hop-0 [+ hop-1]) support arrays; padding
    (eid 0) rows are dropped.
    """
    plt = _plt()
    keep = eids > 0
    eids, imps, ts = eids[keep], imps[keep], ts[keep]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    dt = cut_time - ts
    ax1.scatter(dt, imps, s=14, c=imps, cmap="viridis", vmin=0, vmax=1)
    ax1.set_xlabel("Δt before prediction")
    ax1.set_ylabel("edge importance")
    ax1.set_title(title or "importance vs recency")
    order = np.argsort(-imps)
    top = order[:min(30, len(order))]
    ax2.barh(range(len(top)), imps[top], color="tab:blue")
    ax2.set_yticks(range(len(top)))
    ax2.set_yticklabels([f"e{e}" for e in eids[top]], fontsize=6)
    ax2.invert_yaxis()
    ax2.set_xlabel("importance")
    ax2.set_title("top edges")
    fig.tight_layout()
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_motif_distribution(cat_counts: np.ndarray, null_dist: np.ndarray,
                            path: str) -> str:
    """Observed motif-class frequencies vs the null-model prior (12 classes,
    ops/sampler.py CAT_ORDER)."""
    plt = _plt()
    from ..ops.sampler import CAT_ORDER
    obs = cat_counts / max(cat_counts.sum(), 1.0)
    x = np.arange(12)
    fig, ax = plt.subplots(figsize=(8, 3.5))
    ax.bar(x - 0.2, obs, 0.4, label="observed")
    ax.bar(x + 0.2, null_dist, 0.4, label="null model")
    ax.set_xticks(x)
    ax.set_xticklabels(CAT_ORDER, rotation=45, fontsize=7)
    ax.set_ylabel("frequency")
    ax.legend()
    fig.tight_layout()
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_improvement_curves(histories: dict, path: str,
                            metric: str = "aps") -> str:
    """Before/after comparison (visualize_improvements.py): ``histories`` maps
    a label (e.g. "base", "enhanced") to a list of per-epoch metric values."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, vals in histories.items():
        ax.plot(range(1, len(vals) + 1), vals, marker="o", label=label)
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric)
    ax.set_title(f"{metric} over training")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


# ---------------------------------------------------------------------------
# checkpoint-driven driver (reference visualize_explanations.py main path)
# ---------------------------------------------------------------------------

def visualize_explanations(data: str, base_type: str, data_dir: str,
                           ckpt_dir: str, out_dir: str, n_samples: int = 6,
                           seed: int = 0) -> list:
    import jax
    import jax.numpy as jnp
    from ..config import DEGREE_DICT
    from ..data.events import load_dataset, RandEdgeSampler
    from ..data.graph import build_temporal_graph
    from ..models.common import Features
    from ..train import loops
    from ..train.base_loader import load_base
    from ..train.temp_exp_main import sample_explainer_inputs
    from ..utils.checkpoint import load_checkpoint

    ds = load_dataset(data, data_dir)
    g = build_temporal_graph(ds.full, ds.full.num_nodes, ds.full.num_edges)
    feats = Features(node=jnp.asarray(ds.node_feat),
                     edge=jnp.asarray(ds.edge_feat))
    base = load_base(osp.join(ckpt_dir, "tgnn",
                              f"{base_type}_{data}.msgpack"), feats)
    n_degree = int(base.meta.get("n_degree", DEGREE_DICT.get(data, 20)))

    # checkpoint layout written by temp_exp_main: explainer/{base}/{data}
    exp_ckpt = osp.join(ckpt_dir, "explainer", base_type, f"{data}.msgpack")
    from ..utils.checkpoint import load_meta
    meta = load_meta(exp_ckpt)
    if base_type == "tgat":
        from ..explain.tempme_tgat import TempMETGAT as Cls
        explainer = Cls(node_dim=meta["node_dim"], edge_dim=meta["edge_dim"],
                        out_dim=meta["out_dim"], hid_dim=meta["hid_dim"])
    else:
        from ..explain.tempme import TempME as Cls
        explainer = Cls(node_dim=meta["node_dim"], edge_dim=meta["edge_dim"],
                        out_dim=meta["out_dim"], hid_dim=meta["hid_dim"],
                        base_type=base_type)

    sampler = RandEdgeSampler([ds.test.src], [ds.test.dst], seed=seed)
    dst_table = jnp.asarray(sampler.dst_list)
    key = jax.random.PRNGKey(seed)
    batch = next(loops.iter_batches(ds.test, max(n_samples, 2), shuffle=True,
                                    seed=seed, drop_remainder=True))
    _, subs, walks = sample_explainer_inputs(g, key, batch, dst_table,
                                             n_degree)
    # init a parameter template of the right structure, then restore into it
    if base_type == "tgat":
        template = explainer.init({"params": key}, feats, walks[0], batch.src,
                                  batch.ts, batch.dst, subs[0],
                                  method=Cls.init_all)
    else:
        template = explainer.init({"params": key}, feats, walks[0], batch.ts,
                                  subs[0], method=Cls.init_all)
    exp_params, _ = load_checkpoint(exp_ckpt, template)
    sub_src, walks_src = subs[0], walks[0]
    if base_type == "tgat":
        imp = explainer.apply(exp_params, feats, walks_src, batch.src,
                              batch.ts, batch.dst, deterministic=True)
        imp0, imp1 = explainer.apply(
            exp_params, feats, sub_src, imp, walks_src,
            method=Cls.edge_importance, training=False)
    else:
        imp = explainer.apply(exp_params, feats, walks_src, batch.ts,
                              deterministic=True)
        imp0, imp1 = explainer.apply(
            exp_params, feats, sub_src, imp, walks_src,
            method=Cls.edge_importance, training=False)

    paths = []
    for i in range(min(n_samples, batch.src.shape[0])):
        eids = np.concatenate([np.asarray(sub_src.eids[0][i]),
                               np.asarray(sub_src.eids[1][i])])
        imps = np.concatenate([np.asarray(imp0[i]), np.asarray(imp1[i])])
        ts = np.concatenate([np.asarray(sub_src.ts[0][i]),
                             np.asarray(sub_src.ts[1][i])])
        paths.append(plot_edge_importance(
            eids, imps, ts, float(batch.ts[i]),
            osp.join(out_dir, f"{base_type}_{data}_sample{i}.png"),
            title=f"{base_type}/{data} event {int(batch.eidx[i])}"))

    cat = np.asarray(walks_src.cat).ravel()
    counts = np.bincount(cat, minlength=12)[:12].astype(np.float64)
    from ..explain.null_model import estimate_null_distribution
    null = estimate_null_distribution(ds.full, n_degree, ds.node_feat,
                                      ds.edge_feat, seed=seed)
    paths.append(plot_motif_distribution(
        counts, np.asarray(null),
        osp.join(out_dir, f"{base_type}_{data}_motifs.png")))
    print(f"wrote {len(paths)} figures to {out_dir}")
    return paths


def main(argv=None) -> int:
    p = argparse.ArgumentParser("render explanation visualizations")
    p.add_argument("-d", "--data", type=str, default="uslegis_sampled")
    p.add_argument("--base_type", type=str, default="tgn")
    p.add_argument("--data_dir", type=str,
                   default=os.environ.get("TEMPME_DATA_DIR",
                                          "/root/reference/processed"))
    p.add_argument("--ckpt_dir", type=str, default="params")
    p.add_argument("--out_dir", type=str, default="explanation_visualizations")
    p.add_argument("--n_samples", type=int, default=6)
    args = p.parse_args(argv)
    visualize_explanations(args.data, args.base_type, args.data_dir,
                           args.ckpt_dir, args.out_dir, args.n_samples)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
