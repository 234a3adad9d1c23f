"""Metric golden tests vs sklearn (SURVEY.md §4): confusion matrix,
OA, Cohen's kappa, per-class F1, and IGNORE handling."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import (
    cohen_kappa_score,
    confusion_matrix as sk_confusion,
    f1_score,
)

from dynseg.data.tiles import IGNORE_LABEL
from dynseg.metrics import batch_accuracy, confusion_matrix, scores_from_confusion


def test_confusion_and_scores_vs_sklearn(rng):
    n, nc = 5000, 4
    y_true = rng.integers(0, nc, n).astype(np.int32)
    y_pred = np.where(
        rng.random(n) < 0.7, y_true, rng.integers(0, nc, n)
    ).astype(np.int32)

    cm = np.asarray(confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), nc))
    np.testing.assert_array_equal(cm, sk_confusion(y_true, y_pred, labels=range(nc)))

    s = scores_from_confusion(cm)
    assert abs(s["oa"] - (y_true == y_pred).mean()) < 1e-9
    assert abs(s["kappa"] - cohen_kappa_score(y_true, y_pred)) < 1e-9
    np.testing.assert_allclose(
        s["f1"], f1_score(y_true, y_pred, average=None, labels=range(nc)), atol=1e-12
    )
    assert abs(s["mean_f1"] - f1_score(y_true, y_pred, average="macro")) < 1e-9


def test_ignore_label_excluded(rng):
    nc = 3
    y_true = np.array([0, 1, 2, IGNORE_LABEL, IGNORE_LABEL], np.int32)
    y_pred = np.array([0, 1, 0, 2, 1], np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), nc))
    assert cm.sum() == 3
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 0] == 1


def test_batch_accuracy_masks_ignore():
    logits = jnp.array([[[[5.0, 0.0], [0.0, 5.0]]]])  # (1,1,2,2): preds 0,1
    labels = jnp.array([[[0, IGNORE_LABEL]]])
    assert float(batch_accuracy(logits, labels)) == 1.0
    labels2 = jnp.array([[[1, 1]]])
    assert float(batch_accuracy(logits, labels2)) == 0.5


def test_empty_confusion():
    s = scores_from_confusion(np.zeros((3, 3)))
    assert s["oa"] == 0.0 and s["kappa"] == 0.0


def test_erode_boundaries_bruteforce_golden():
    """erode_boundaries == brute-force 'ignore every pixel with a
    different-labeled pixel within Chebyshev radius r'."""
    from dynseg.data.tiles import IGNORE_LABEL
    from dynseg.metrics import erode_boundaries

    rng = np.random.default_rng(7)
    mask = (rng.uniform(size=(21, 17)) * 3).astype(np.int32)
    # blocky regions so boundaries are sparse
    mask = np.kron(mask[::3, ::3], np.ones((3, 3), np.int32))[:21, :17]
    for r in (1, 2, 3):
        got = erode_boundaries(mask, r)
        h, w = mask.shape
        want = mask.copy()
        for i in range(h):
            for j in range(w):
                lo_i, hi_i = max(0, i - r), min(h, i + r + 1)
                lo_j, hi_j = max(0, j - r), min(w, j + r + 1)
                if (mask[lo_i:hi_i, lo_j:hi_j] != mask[i, j]).any():
                    want[i, j] = IGNORE_LABEL
        np.testing.assert_array_equal(got, want, err_msg=f"radius {r}")


def test_erode_boundaries_edge_cases():
    from dynseg.metrics import erode_boundaries

    uniform = np.full((8, 8), 2, np.int32)
    np.testing.assert_array_equal(erode_boundaries(uniform, 3), uniform)
    m = np.arange(9, dtype=np.int32).reshape(3, 3)
    np.testing.assert_array_equal(erode_boundaries(m, 0), m)  # radius 0 = no-op
    assert erode_boundaries(m, 1) is not m  # always a copy when r > 0


def test_balanced_batch_accuracy_golden(rng):
    """balanced_batch_accuracy == sklearn balanced_accuracy_score over
    valid pixels (mean per-class recall, classes present only)."""
    from sklearn.metrics import balanced_accuracy_score

    from dynseg.data.tiles import IGNORE_LABEL
    from dynseg.metrics import balanced_batch_accuracy

    nc = 4
    logits = jnp.asarray(rng.normal(size=(3, 8, 9, nc)).astype(np.float32))
    labels = rng.integers(0, nc, size=(3, 8, 9)).astype(np.int32)
    labels[0, :2] = IGNORE_LABEL
    got = float(balanced_batch_accuracy(logits, jnp.asarray(labels), nc))
    preds = np.argmax(np.asarray(logits), -1)
    v = labels != IGNORE_LABEL
    want = balanced_accuracy_score(labels[v], preds[v])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_balanced_batch_accuracy_imbalance_sensitivity():
    """The design point: a majority-class predictor scores high on plain
    accuracy but low on balanced accuracy."""
    from dynseg.metrics import balanced_batch_accuracy, batch_accuracy

    labels = jnp.asarray(np.array([[0] * 95 + [1] * 5], np.int32))
    logits = jnp.zeros((1, 100, 2)).at[..., 0].set(10.0)  # always class 0
    np.testing.assert_allclose(float(batch_accuracy(logits, labels)),
                               0.95, atol=1e-6)
    np.testing.assert_allclose(
        float(balanced_batch_accuracy(logits, labels, 2)), 0.5, atol=1e-6)
