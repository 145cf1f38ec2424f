"""Per-node degree table for explainer walk-importance weighting.

Reference: compute_node_degrees.py:20-79 counts how many events touch each
node (src or dst, over the full stream) and patches the explainer's
``node_degree`` buffer. Here the table is a plain ``[num_nodes] float32``
array fed to ``TempME.walk_embedding`` / ``compute_walk_importance``
(explain/tempme.py) — row 0 stays 0 (padding id).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.events import EventStream, load_dataset


def compute_node_degrees(events: EventStream, num_nodes: int | None = None
                         ) -> np.ndarray:
    n = int(num_nodes if num_nodes is not None else events.num_nodes)
    deg = np.zeros(n, np.float32)
    np.add.at(deg, events.src, 1.0)
    np.add.at(deg, events.dst, 1.0)
    deg[0] = 0.0
    return deg


def save_node_degrees(path: str, deg: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, deg)


def load_node_degrees(path: str) -> np.ndarray:
    return np.load(path).astype(np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("compute per-node degrees")
    p.add_argument("-d", "--data", type=str, default="uslegis_sampled")
    p.add_argument("--data_dir", type=str,
                   default=os.environ.get("TEMPME_DATA_DIR",
                                          "/root/reference/processed"))
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    ds = load_dataset(args.data, args.data_dir)
    deg = compute_node_degrees(ds.full)
    out = args.out or f"params/node_degrees_{args.data}.npy"
    save_node_degrees(out, deg)
    nz = deg[deg > 0]
    print(f"{args.data}: {len(deg)} nodes, degree mean={nz.mean():.1f} "
          f"median={np.median(nz):.0f} max={nz.max():.0f} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
