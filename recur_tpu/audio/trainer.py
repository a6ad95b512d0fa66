"""Training/evaluation driver over labelled audio files: the classify.py
Trainer (classify.py:181-475) without GStreamer.

Cycles training epochs (shuffled file batches, n_channels files at a time)
with test epochs that accumulate per-class scores into ROC/AUC/d' stats, and
auto-saves nets that beat the running records with decaying thresholds
(classify.py:374-414).
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Sequence

import numpy as np

from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.timings import target_string_for_channel
from recur_tpu.audio.wavio import read_wav
from recur_tpu.audio import stats as cstats


@dataclasses.dataclass
class LabelledFile:
    path: str
    targets: str                 # per-group class chars, e.g. "M" or "Mkx"


def class_from_filename(path: str) -> str:
    """The timings-free convention: first char of the basename is the class
    (classify.py:703-721)."""
    return os.path.basename(path)[0]


def lr_sqrt_exp(base_lr: float, t: float, decay: float = 0.707,
                offset: float = 0.0, minimum: float = 1e-6) -> float:
    """'sqrt-exponential' learn-rate schedule (classify.py:477-506)."""
    return max(base_lr * decay ** np.sqrt(t + offset), minimum)


def lr_inverse_time(base_lr: float, t: float, offset: float = 1.0,
                    minimum: float = 1e-6) -> float:
    return max(base_lr * offset / (offset + t), minimum)


class Trainer:
    def __init__(self, classifier: AudioClassifier,
                 training_files: Sequence[LabelledFile],
                 test_files: Sequence[LabelledFile],
                 lr_schedule: str = "sqrt-exponential",
                 lr_decay: float = 0.9, lr_min: float = 1e-6,
                 seed: int = 1, verbose: bool = True,
                 timings: dict | None = None):
        self.c = classifier
        self.training_files = list(training_files)
        self.test_files = list(test_files)
        self.rng = random.Random(seed)
        self.base_lr = classifier.learn_rate
        self.lr_schedule = lr_schedule
        self.lr_decay = lr_decay
        self.lr_min = lr_min
        self.verbose = verbose
        self.cycle = 0
        # {filename: [(group, class, time, template)]} from audio/timings
        self.timings = timings or {}
        # record-beating auto-save with decaying records (classify.py:374-398)
        self.records: dict[str, float] = {}
        self.record_decay = 0.996

    # ---- one training pass over the shuffled file list ----
    def train_epoch(self):
        files = self.training_files[:]
        self.rng.shuffle(files)
        C = self.c.n_channels
        self.c.training = True
        for i in range(0, len(files) - C + 1, C):
            batch = files[i:i + C]
            pcm, targets = self._load_batch(batch)
            self.c.reset_state()
            self.c.set_target_string(self._targets_for(batch, targets))
            self.c.feed(pcm)
            self.c.flush()
        self.cycle += 1
        t = float(self.cycle)
        if self.lr_schedule == "sqrt-exponential":
            self.c.learn_rate = lr_sqrt_exp(self.base_lr, t, self.lr_decay,
                                            minimum=self.lr_min)
        elif self.lr_schedule == "inverse-time":
            self.c.learn_rate = lr_inverse_time(self.base_lr, t,
                                                minimum=self.lr_min)

    def _targets_for(self, batch, targets) -> str:
        """Per-channel target strings: timed events from a timings file when
        available (classify.py's timing-driven targets), else the file's
        static class at t=0."""
        parts = []
        for j, (f, t) in enumerate(zip(batch, targets)):
            ev = (self.timings.get(f.path)
                  or self.timings.get(os.path.basename(f.path)))
            if ev:
                parts.append(target_string_for_channel(ev, j))
            else:
                parts.append(f"c{j}t0:{t}")
        return " ".join(parts)

    def _load_batch(self, batch: Sequence[LabelledFile]):
        pcms = []
        for f in batch:
            data, _ = read_wav(f.path, target_rate=self.c.rate)
            pcms.append(data)
        n = min(len(p) for p in pcms)
        pcm = np.stack([p[:n] for p in pcms])
        return pcm, [f.targets for f in batch]

    # ---- test pass: accumulate per-class scores, ROC stats ----
    def test_epoch(self) -> dict:
        self.c.training = False
        group = self.c.groups[0]
        scores: list[float] = []
        truth: list[bool] = []
        per_class: dict[str, list] = {ch: [] for ch in group.classes}
        correct = total = 0
        C = self.c.n_channels
        files = self.test_files
        for i in range(0, len(files), C):
            batch = files[i:i + C]
            while len(batch) < C:
                batch = list(batch) + [batch[-1]]
            pcm, targets = self._load_batch(batch)
            self.c.reset_state()
            self.c.set_target_string(self._targets_for(batch, targets))
            msgs = self.c.feed(pcm) + self.c.flush()
            for m in msgs:
                for j, t in enumerate(targets):
                    key = f"channel {j}, group 0 correct"
                    if key in m:
                        correct += m[key]
                        total += 1
                    for k, ch in enumerate(group.classes):
                        p = m.get(f"channel {j}, group 0 {ch}")
                        if p is None:
                            continue
                        per_class[ch].append(p)
                        if len(group.classes) == 2 and k == 0:
                            scores.append(p)
                            truth.append(t[0] == group.classes[0])
        result = {"windows": total,
                  "accuracy": correct / total if total else 0.0}
        if scores:
            result.update(cstats.calc_core_stats(np.array(scores),
                                                 np.array(truth)))
        self._maybe_save_records(result)
        if self.verbose:
            line = " ".join(f"{k} {v:.3f}" for k, v in result.items()
                            if isinstance(v, float))
            print(f"cycle {self.cycle}: {line}", flush=True)
        return result

    def _maybe_save_records(self, result: dict):
        for key in ("auc", "accuracy", "dprime"):
            v = result.get(key)
            if v is None:
                continue
            rec = self.records.get(key, 0.0)
            if v > rec:
                self.records[key] = v
                base, ext = os.path.splitext(self.c.net_filename)
                name = f"{base}-best-{key}{ext}"
                self.c.save(name)
                if self.verbose:
                    print(f"new {key} record {v:.4f} -> {name}", flush=True)
            else:
                self.records[key] = rec * self.record_decay

    def run(self, cycles: int = 10) -> dict:
        result = {}
        for _ in range(cycles):
            self.train_epoch()
            result = self.test_epoch()
            self.c.save()
        return result
