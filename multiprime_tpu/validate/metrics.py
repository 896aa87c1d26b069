"""Experimental-validation metrics (ROC.py / gradient / dimer-correlation
equivalents) without the sklearn/matplotlib dependencies.

* roc_analysis        — ACC / MCC / ROC-AUC of capture predictions
  (test_data/ROC/ROC.py semantics: ACC rounds both sides, AUC by the
  trapezoid over the ranked ROC curve)
* pair_coverage_join  — predicted vs scan-measured pair coverage
  (Primer_pair_coverage_for_gradient.py:68-125)
* dimer_correlation   — predicted Loss/dG sums vs experimental dimer data
  (dimer_prediction_exp_correlation.py:52-87)
"""

from __future__ import annotations

import math

import numpy as np


def acc(y_true, y_pred):
    y_true = np.asarray(y_true, float)
    y_pred = np.asarray(y_pred, float)
    hits = sum(round(float(a)) == round(float(b))
               for a, b in zip(y_true, y_pred))
    return round(hits / len(y_pred), 2)


def mcc(y_true, y_pred):
    t = np.asarray(np.round(y_true), int)
    p = np.asarray(np.round(y_pred), int)
    tp = int(((t == 1) & (p == 1)).sum())
    tn = int(((t == 0) & (p == 0)).sum())
    fp = int(((t == 0) & (p == 1)).sum())
    fn = int(((t == 1) & (p == 0)).sum())
    denom = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    if denom == 0:
        return 0.0
    return (tp * tn - fp * fn) / denom


def roc_curve_points(y_true, scores):
    y_true = np.asarray(y_true, float)
    scores = np.asarray(scores, float)
    order = np.argsort(-scores, kind="stable")
    y = y_true[order]
    s = scores[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    # keep last point of each distinct threshold
    distinct = np.concatenate([np.diff(s) != 0, [True]])
    tps, fps = tps[distinct], fps[distinct]
    tpr = np.concatenate([[0.0], tps / max(tps[-1], 1)])
    fpr = np.concatenate([[0.0], fps / max(fps[-1], 1)])
    return fpr, tpr


def roc_auc(y_true, scores):
    fpr, tpr = roc_curve_points(y_true, scores)
    return float(np.trapezoid(tpr, fpr))


def roc_analysis(csv_path, out_path=None):
    """ROC.csv (sample,real,predict) -> dict of ACC/MCC/AUC (+tsv report)."""
    rows = [line.strip().split(",") for line in
            open(csv_path, encoding="utf-8-sig").read().splitlines()[1:]
            if line.strip()]
    real = np.array([float(r[1]) for r in rows])
    pred = np.array([float(r[2]) for r in rows])
    result = {"acc": acc(real, pred), "mcc": mcc(real, pred),
              "auc": roc_auc(real, pred)}
    if out_path:
        with open(out_path, "w") as f:
            f.write("metric\tvalue\n")
            for k, v in result.items():
                f.write("%s\t%s\n" % (k, v))
    return result


def pair_coverage_join(predicted_rows, scanned_pair_counts):
    """Join designed pair coverage vs scan-measured counts.

    predicted_rows: iterable of (primer_f, primer_r, predicted_count)
    scanned_pair_counts: {"F\\tR": measured}
    -> list of (F, R, predicted, measured)
    """
    out = []
    for f, r, pred in predicted_rows:
        out.append((f, r, pred, scanned_pair_counts.get(f + "\t" + r, 0)))
    return out


def dimer_correlation(predicted, experimental):
    """Pearson r between predicted dimer scores and experimental signal."""
    x = np.asarray(predicted, float)
    y = np.asarray(experimental, float)
    if x.std() == 0 or y.std() == 0:
        return 0.0
    return float(np.corrcoef(x, y)[0, 1])
