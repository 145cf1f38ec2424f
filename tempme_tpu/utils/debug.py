"""Debug / sanitizer mode (SURVEY.md §5.2; VERDICT r3 missing#5).

The reference has no race detection or sanitizers (its only concurrency is a
misused ThreadPoolExecutor, processed/data_preprocess.py:284-295). The TPU
framework is deterministic by construction (pure jitted steps, explicit RNG
keys), so this mode guards the remaining failure classes:

* numeric faults      — ``install()`` turns on jax_debug_nans/jax_debug_infs
                        so the failing primitive is re-run un-jitted and
                        reported at op granularity;
* finiteness          — ``check_finite(tree)`` host-scans a pytree and names
                        the offending leaf path;
* donation/aliasing   — the epoch scans donate their carry buffers
                        (train/loops.py donate_argnums); XLA silently falls
                        back to copying when a donated buffer cannot be
                        aliased (layout/sharding mismatch), which doubles peak
                        HBM. ``assert_donated(*arrays)`` verifies the buffers
                        were really consumed;
* collective drift    — ``assert_collectives(fn_hlo, golden)`` re-counts the
                        collectives XLA inserted into a sharded step and
                        compares against a committed golden (the SCALING.md
                        table as a regression test: an unplanned all-gather in
                        the memory-routing path shows up as a count change).

Enable with ``TEMPME_DEBUG=1`` (drivers call ``install()`` and add the
epoch-level checks automatically).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def enabled() -> bool:
    return os.environ.get("TEMPME_DEBUG", "") == "1"


def install() -> None:
    """Turn on op-level NaN/Inf detection (debug mode only — re-runs the
    offending computation eagerly, so it costs throughput)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    print("[debug] TEMPME_DEBUG=1: jax_debug_nans/infs on, donation and "
          "finiteness checks active")


def check_finite(tree, where: str) -> None:
    """Host-side finiteness scan; raises naming the first offending leaf."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype.kind in "fc" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"[debug] non-finite values in {where} at "
                f"{jax.tree_util.keystr(path)}: "
                f"{np.count_nonzero(~np.isfinite(arr))}/{arr.size} bad")


def assert_donated(*arrays, where: str = "") -> None:
    """After calling a jitted fn with donate_argnums, its donated inputs must
    have been consumed (buffer deleted). If XLA could not alias them
    (layout/sharding mismatch) they remain live — peak memory silently
    doubles. Pass the PRE-CALL input arrays here."""
    bad = []
    for i, a in enumerate(jax.tree.leaves(arrays)):
        if hasattr(a, "is_deleted") and not a.is_deleted():
            bad.append(i)
    if bad:
        raise AssertionError(
            f"[debug] {len(bad)} donated buffer(s) were NOT consumed in "
            f"{where or 'jitted call'} (XLA fell back to copying; donation "
            f"aliasing failed for leaf indices {bad[:8]})")


def count_collectives(hlo_text: str) -> dict:
    """Collective-op census of a compiled HLO module (same matcher as
    tools/scaling_report.analyze_hlo)."""
    from ..tools.scaling_report import analyze_hlo
    return analyze_hlo(hlo_text)["counts"]


def assert_collectives(hlo_text: str, golden: dict, where: str = "") -> None:
    """Compare a sharded step's collective counts against a committed golden
    (regenerate with tools/scaling_report if an intentional sharding change
    shifts them)."""
    got = count_collectives(hlo_text)
    if got != dict(golden):
        raise AssertionError(
            f"[debug] collective counts drifted in {where or 'step'}: "
            f"got {got}, golden {dict(golden)} — if intentional, regenerate "
            f"goldens via tools/scaling_report")
