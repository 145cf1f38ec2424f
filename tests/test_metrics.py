"""utils/metrics.py vs sklearn (the reference's metric source,
learn_base.py:243-253). Every headline quality number flows through these
functions, so they are validated directly against sklearn on adversarial
inputs (ties, masks, degenerate classes)."""
import numpy as np
import pytest

from tempme_tpu.utils import metrics as M

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def _cases():
    r = np.random.RandomState(7)
    cases = []
    # generic continuous scores
    for n in (10, 101, 1000):
        y = (r.rand(n) > 0.5).astype(float)
        s = r.rand(n)
        cases.append((y, s))
    # heavy ties (quantized scores)
    y = (r.rand(500) > 0.3).astype(float)
    s = np.round(r.rand(500), 1)
    cases.append((y, s))
    # all scores identical
    cases.append((np.array([1.0, 0.0, 1.0, 0.0]), np.full(4, 0.5)))
    # perfect / inverted ranking
    cases.append((np.array([0, 0, 1, 1.0]), np.array([0.1, 0.2, 0.8, 0.9])))
    cases.append((np.array([0, 0, 1, 1.0]), np.array([0.9, 0.8, 0.2, 0.1])))
    return cases


def test_roc_auc_matches_sklearn():
    for y, s in _cases():
        assert M.roc_auc_score(y, s) == pytest.approx(
            sklearn_metrics.roc_auc_score(y, s), abs=1e-12)


def test_average_precision_matches_sklearn():
    for y, s in _cases():
        assert M.average_precision_score(y, s) == pytest.approx(
            sklearn_metrics.average_precision_score(y, s), abs=1e-12)


def test_accuracy_matches_sklearn():
    for y, s in _cases():
        assert M.accuracy_score(y, s) == pytest.approx(
            sklearn_metrics.accuracy_score(y, s > 0.5), abs=1e-12)


def test_masked_metrics_equal_unpadded():
    r = np.random.RandomState(3)
    y = (r.rand(64) > 0.5).astype(float)
    s = r.rand(64)
    # pad with garbage rows that the mask must exclude
    yp = np.r_[y, np.ones(8)]
    sp = np.r_[s, np.zeros(8)]
    m = np.r_[np.ones(64, bool), np.zeros(8, bool)]
    assert M.roc_auc_score(yp, sp, m) == pytest.approx(
        M.roc_auc_score(y, s), abs=1e-12)
    assert M.average_precision_score(yp, sp, m) == pytest.approx(
        M.average_precision_score(y, s), abs=1e-12)
    assert M.accuracy_score(yp, sp, mask=m) == pytest.approx(
        M.accuracy_score(y, s), abs=1e-12)


def test_degenerate_single_class_is_nan():
    assert np.isnan(M.roc_auc_score(np.ones(4), np.random.rand(4)))
    assert np.isnan(M.average_precision_score(np.zeros(4), np.random.rand(4)))


def test_early_stop_monitor():
    m = M.EarlyStopMonitor(max_round=2)
    assert not m.early_stop_check(0.5)
    assert not m.early_stop_check(0.6)    # improved -> reset
    assert not m.early_stop_check(0.6)    # flat 1
    assert m.early_stop_check(0.6)        # flat 2 -> stop
