"""Evaluation statistics for classifier scores: the classify_stats.py
toolbox (ROC/AUC, distance from diagonal, accuracy at best threshold,
d-prime, Briar score, presence ROC) in numpy."""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def roc_curve(scores: Sequence[float], truth: Sequence[bool]):
    """Returns (false_positive_rate, true_positive_rate, thresholds) sorted
    by descending threshold."""
    scores = np.asarray(scores, np.float64)
    truth = np.asarray(truth, bool)
    order = np.argsort(-scores)
    scores = scores[order]
    truth = truth[order]
    tp = np.cumsum(truth)
    fp = np.cumsum(~truth)
    n_pos = max(int(truth.sum()), 1)
    n_neg = max(int((~truth).sum()), 1)
    return fp / n_neg, tp / n_pos, scores


def calc_auc(scores, truth) -> float:
    """Area under the ROC curve (trapezoidal)."""
    fpr, tpr, _ = roc_curve(scores, truth)
    fpr = np.concatenate([[0.0], fpr, [1.0]])
    tpr = np.concatenate([[0.0], tpr, [1.0]])
    return float(np.trapezoid(tpr, fpr))


def distance_from_diagonal(scores, truth) -> float:
    """Max distance of the ROC curve from the chance diagonal (scaled so a
    perfect classifier scores ~0.707)."""
    fpr, tpr, _ = roc_curve(scores, truth)
    return float(np.max((tpr - fpr) / math.sqrt(2.0))) if len(fpr) else 0.0


def best_accuracy(scores, truth) -> tuple[float, float]:
    """(accuracy, threshold) at the accuracy-maximising score threshold."""
    fpr, tpr, th = roc_curve(scores, truth)
    truth = np.asarray(truth, bool)
    n_pos = int(truth.sum())
    n_neg = len(truth) - n_pos
    if len(th) == 0:
        return 0.0, 0.0
    correct = tpr * n_pos + (1.0 - fpr) * n_neg
    i = int(np.argmax(correct))
    return float(correct[i] / max(len(truth), 1)), float(th[i])


def dprime(scores, truth) -> float:
    """d' sensitivity index: separation of the class score distributions."""
    scores = np.asarray(scores, np.float64)
    truth = np.asarray(truth, bool)
    pos = scores[truth]
    neg = scores[~truth]
    if len(pos) < 2 or len(neg) < 2:
        return 0.0
    sd = math.sqrt(0.5 * (pos.var() + neg.var()))
    if sd == 0:
        return 0.0
    return float((pos.mean() - neg.mean()) / sd)


def briar_score(scores, truth) -> float:
    """Mean squared probability error ("briar" sic, classify_stats.py)."""
    scores = np.asarray(scores, np.float64)
    truth = np.asarray(truth, np.float64)
    return float(np.mean((scores - truth) ** 2))


def presence_roc(scores, truth, window: int = 60):
    """Presence detection: aggregate per-window scores into blocks (e.g.
    minutes, for bird surveys) by max, then ROC over blocks."""
    scores = np.asarray(scores, np.float64)
    truth = np.asarray(truth, bool)
    n = len(scores) // window
    if n == 0:
        return 0.0
    bs = scores[:n * window].reshape(n, window).max(axis=1)
    bt = truth[:n * window].reshape(n, window).any(axis=1)
    return calc_auc(bs, bt)


def calc_core_stats(scores, truth) -> dict:
    """The headline bundle the Trainer prints (classify_stats.py
    calc_core_stats)."""
    acc, thresh = best_accuracy(scores, truth)
    return {
        "auc": calc_auc(scores, truth),
        "dfd": distance_from_diagonal(scores, truth),
        "accuracy": acc,
        "threshold": thresh,
        "dprime": dprime(scores, truth),
        "briar": briar_score(scores, truth),
    }


class Welford:
    """Running mean/variance (Welford), as classify.py:444-474 keeps for
    per-class probability streams."""

    def __init__(self):
        self.n = 0
        self.mean = 0.0
        self.m2 = 0.0

    def add(self, x: float):
        self.n += 1
        d = x - self.mean
        self.mean += d / self.n
        self.m2 += d * (x - self.mean)

    @property
    def variance(self) -> float:
        return self.m2 / self.n if self.n > 1 else 0.0

    @property
    def stddev(self) -> float:
        return math.sqrt(self.variance)
