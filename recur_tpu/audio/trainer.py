"""Training/evaluation driver over labelled audio files: the classify.py
Trainer (classify.py:181-475) without GStreamer.

Architecture: each channel is an independent full-length audio stream.  A
background loader thread assembles fixed-shape PCM blocks (one device call
each) from per-channel file queues — the host-side input pipeline that
GStreamer's threads provided in the reference (SURVEY.md §2.9) — while the
main thread feeds the device.  Files are never truncated to the shortest in
a batch: a channel that finishes a file starts its next one mid-block, and a
channel with nothing left is padded with silence under a '-' (no-train)
target so it neither trains nor contaminates test statistics.

Per test epoch it accumulates, per group and class: correct/run counts,
Welford mean/variance of the probability streams split by right/wrong
(classify.py:444-474), and (p, correct) AUC lists; evaluate_test() prints
the colourised per-class dashboard with AUC/accuracy/d' (classify.py:
262-399) and auto-saves nets that beat decaying records (decay 0.9997,
classify.py:374-398).  Activity-bias stream duplication matches
classify-train:127-134.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
import queue
import random
import threading
import time
from math import sqrt
from typing import Iterator, Sequence

import numpy as np

from recur_tpu.audio.classify import (AudioClassifier, ClassEvent,
                                      parse_target_string)
from recur_tpu.utils import avio
from recur_tpu.audio import stats as cstats
from recur_tpu.utils import colour


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


def estimate_feature_normalisation(classifier: AudioClassifier,
                                   files: Sequence[LabelledFile],
                                   max_windows_per_file: int = 512):
    """Set the classifier's feature offsets/scales to per-feature
    mean / 1/stddev over a sample of files — the find-feature-means →
    --feature-offsets/--feature-scales workflow of the reference
    (scripts/find-feature-means; gstclassify.c:2040-2051).  Raw log-power
    features sit around 15–25, which swamps the unit-scale hidden feedback;
    without normalisation the net tends to learn only class priors."""
    import jax.numpy as jnp

    feats = []
    half = classifier.window_size // 2
    # probe one channel wide: _features_for_frames keeps Δ-feature state
    # shaped [order, n_channels, raw], so borrow a 1-wide buffer for the
    # probe instead of tiling every frame across all channels.  Probe RAW
    # features: disable any installed normalisation for the duration so a
    # re-estimation measures absolute statistics, not ones relative to the
    # previous offsets/scales (which would compound to ~0/1).
    saved_prev = classifier._prev_features
    saved_off = classifier.feature_offsets.copy()
    saved_scale = classifier.feature_scales.copy()
    classifier._prev_features = jnp.zeros(
        (saved_prev.shape[0], 1, saved_prev.shape[2]), jnp.float32)
    classifier.feature_offsets[:] = 0.0
    classifier.feature_scales[:] = 1.0
    try:
        for f in files:
            data = avio.read_audio(f.path, classifier.rate)
            n = (len(data) - half) // half * half
            if n <= 0:
                continue
            frames = np.lib.stride_tricks.sliding_window_view(
                data[:n + half], classifier.window_size)[::half]
            frames = frames[:max_windows_per_file]
            x = classifier._features_for_frames(
                jnp.asarray(frames[:, None, :], jnp.float32))
            feats.append(np.asarray(x)[:, 0, :])
    finally:
        # the probe ran on its own 1-wide Δ buffer; the classifier's real
        # Δ state is restored untouched
        classifier._prev_features = saved_prev
        classifier.feature_offsets[:] = saved_off
        classifier.feature_scales[:] = saved_scale
    if not feats:
        raise ValueError(
            "estimate_feature_normalisation: no usable audio in the sample "
            f"({len(files)} file(s), each shorter than one analysis window)")
    all_feats = np.concatenate(feats)
    mu = all_feats.mean(axis=0)
    sd = all_feats.std(axis=0) + 1e-6
    classifier.set_feature_normalisation(offsets=mu, scales=1.0 / sd)
    return mu, 1.0 / sd


def eternal_shuffler(streams: Sequence[Sequence[LabelledFile]],
                     rng: random.Random) -> Iterator[LabelledFile]:
    """Yield forever from a randomly chosen stream's cycle
    (classify.py:173-179)."""
    cycles = [itertools.cycle(s) for s in streams if s]
    while True:
        yield next(rng.choice(cycles))


def eternal_alternator(streams: Sequence[Sequence[LabelledFile]]
                       ) -> Iterator[LabelledFile]:
    """Round-robin over the streams' cycles (classify.py:165-171)."""
    cycles = [itertools.cycle(s) for s in streams if s]
    while True:
        for c in cycles:
            yield next(c)


# ---------------------------------------------------------------------------
# the background block loader (host-side input pipeline)
# ---------------------------------------------------------------------------

def _stream_blocks(plans: list[list[LabelledFile]], rate: int,
                   block_samples: int, half: int, n_groups: int,
                   timings: dict):
    """Generator: assemble fixed-shape [C, block_samples] PCM blocks from
    per-channel file queues, loading WAVs lazily (IO happens wherever this
    generator runs — under _prefetch, in a background thread).

    Yields (pcm_block, phrases) where phrases are target phrases with times
    relative to the start of this epoch's stream.
    """
    C = len(plans)
    queues = [list(p) for p in plans]
    bufs = [np.zeros(0, np.float32) for _ in range(C)]
    cursors = [0] * C                     # read position within bufs[j]
    offsets = [0 for _ in range(C)]       # samples consumed per channel
    ended = [False] * C
    while True:
        block = np.zeros((C, block_samples), np.float32)
        phrases: list[str] = []
        any_audio = False
        for j in range(C):
            filled = 0
            while filled < block_samples:
                if cursors[j] >= len(bufs[j]):
                    if not queues[j]:
                        if not ended[j]:
                            # stop-training marker at the channel's stream end
                            t = offsets[j] / rate
                            phrases.append(f"c{j}t{t}:{'-' * n_groups}")
                            ended[j] = True
                        break
                    f = queues[j].pop(0)
                    data = avio.read_audio(f.path, rate)
                    bufs[j] = np.asarray(data, np.float32)
                    cursors[j] = 0
                    t0 = offsets[j] / rate
                    ev = (timings.get(f.path)
                          or timings.get(os.path.basename(f.path)))
                    if ev:
                        for (_, _, secs, tpl) in ev:
                            targets = tpl.split(":", 1)[1]
                            phrases.append(f"c{j}t{secs + t0}:{targets}")
                    else:
                        phrases.append(f"c{j}t{t0}:{f.targets}")
                c = cursors[j]
                n = min(block_samples - filled, len(bufs[j]) - c)
                if n:
                    block[j, filled:filled + n] = bufs[j][c:c + n]
                    cursors[j] = c + n
                    filled += n
                    offsets[j] += n
                    any_audio = True
        if not any_audio:
            if phrases:
                # all channels ended exactly on a block boundary: the
                # stop-training markers still must reach the consumer, or
                # stale targets leak into the next epoch
                yield None, phrases
            return
        yield block, phrases


_DONE = object()


def _prefetch(gen, depth: int = 3):
    """Run a generator in a daemon thread, yielding its items from a bounded
    queue — the input pipeline overlaps file IO with device compute.

    If the consumer stops early (device error mid-epoch, caller breaks out),
    the producer must not block forever in q.put holding multi-MB PCM
    blocks: every put polls a stop event that the consumer sets on exit."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for item in gen:
                if not put(item):
                    return
            put(_DONE)
        except BaseException as e:       # surface IO errors in the consumer
            put(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


# ---------------------------------------------------------------------------
# the Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Alternates training and test epochs over labelled audio, reference
    Trainer semantics: training keeps recurrent state across epochs (only
    test epochs forget, classify.py:216-226), learn-rate schedule applied per
    cycle, records auto-saved with decaying thresholds."""

    RECORD_DECAY = 0.9997     # classify.py:385

    def __init__(self, classifier: AudioClassifier,
                 training_files: Sequence[LabelledFile],
                 test_files: Sequence[LabelledFile],
                 lr_schedule: str = "sqrt-exponential",
                 lr_decay: float = 0.9, lr_min: float = 1e-6,
                 seed: int = 1, verbose: bool = True,
                 timings: dict | None = None,
                 activity_bias: int = 0,
                 files_per_epoch: int | None = None,
                 no_save_net: bool = False):
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
        self.no_save_net = no_save_net
        # {filename: [(group, class, time, template)]} from audio/timings
        self.timings = timings or {}
        # activity-bias stream duplication (classify-train:127-134): n extra
        # streams of only the files that actually have class changes, each
        # dropping its first i files so the copies cycle out of sync
        streams = [self.training_files]
        active = [f for f in self.training_files
                  if len(self.timings.get(f.path)
                         or self.timings.get(os.path.basename(f.path))
                         or ()) > 1]
        for i in range(activity_bias):
            if not active[i:]:
                break
            s = active[:]
            self.rng.shuffle(s)
            streams.append(s[i:])
        self.trainers = eternal_shuffler(streams, self.rng)
        self.files_per_epoch = files_per_epoch or classifier.n_channels
        # decaying records for auto-save: per-class aucs + the 8 aggregates
        self.decaying_records: dict[str, float] = {}

    # ---- plumbing ----
    def _install_events(self, phrases: list[str], window_offset: int):
        """Parse epoch-relative target phrases, shift to absolute window
        numbers, and merge into the classifier's event list."""
        if not phrases:
            return
        evs = parse_target_string(
            " ".join(phrases), self.c.groups, self.c.n_channels,
            self.c.window_size, self.c.lag, self.c.rate)
        evs = [ClassEvent(e.window_no + window_offset, e.channel, e.group,
                          e.target) for e in evs]
        self.c.events = sorted(self.c.events + evs)

    def _prune_events(self):
        """Drop events already folded into the classifier's current-target
        state (targets_for_windows consumed everything <= window_no)."""
        w = self.c.window_no
        self.c.events = [e for e in self.c.events if e.window_no > w]

    def _run_stream(self, plans: list[list[LabelledFile]]) -> list[dict]:
        """Feed the per-channel file plans through the classifier as
        fixed-shape blocks prepared by the background loader."""
        half = self.c.window_size // 2
        block_samples = self.c.BLOCK_WINDOWS * half
        w0 = self.c.window_no
        msgs: list[dict] = []
        gen = _stream_blocks(plans, self.c.rate, block_samples, half,
                             len(self.c.groups), self.timings)
        for block, phrases in _prefetch(gen):
            self._install_events(phrases, w0)
            if block is None:      # final stop-markers with no audio left
                continue
            msgs.extend(self.c.feed(block))
            self._prune_events()
        msgs.extend(self.c.flush())
        return msgs

    def _assign_files(self, files: list[LabelledFile]) -> list[list[LabelledFile]]:
        """One file per channel first, extras to the channel with the least
        queued audio (by file size) — balances lengths without truncating."""
        C = self.c.n_channels
        plans: list[list[LabelledFile]] = [[] for _ in range(C)]
        sizes = [0] * C
        for i, f in enumerate(files):
            j = i if i < C else int(np.argmin(sizes))
            plans[j].append(f)
            try:
                sizes[j] += os.path.getsize(f.path)
            except OSError:
                sizes[j] += 1
        return plans

    # ---- one training epoch ----
    def train_epoch(self):
        files = [next(self.trainers) for _ in range(self.files_per_epoch)]
        self.c.training = True
        # per-set setup hook: random-alignment phase shift + one-shot weight
        # noise (gst_classify_setup, gstclassify.c:1330-1369)
        self.c.begin_set()
        t0 = time.time()
        w0 = self.c.window_no
        self._run_stream(self._assign_files(files))
        self.elapsed = time.time() - t0
        self.windows_per_second = ((self.c.window_no - w0)
                                   * self.c.n_channels / max(self.elapsed,
                                                             1e-9))
        self.cycle += 1
        t = float(self.cycle)
        if self.lr_schedule == "sqrt-exponential":
            self.c.learn_rate = lr_sqrt_exp(self.base_lr, t, self.lr_decay,
                                            minimum=self.lr_min)
        elif self.lr_schedule == "inverse-time":
            self.c.learn_rate = lr_inverse_time(self.base_lr, t,
                                                minimum=self.lr_min)

    # ---- test epoch: accumulate per-class scores, ROC stats ----
    def test_epoch(self) -> dict:
        groups = self.c.groups
        self.c.training = False
        self.c.reset_state()        # test epochs forget (classify.py:218)
        self.c.events = []
        # per-group accumulators (classify.py on_element, :444-474)
        test_scores = [{x: 0 for x in g.classes} for g in groups]
        test_runs = [{x: 0 for x in g.classes} for g in groups]
        # Welford per class, split by whether the class was the target
        pstats = [{x: (cstats.Welford(), cstats.Welford())
                   for x in g.classes} for g in groups]
        # true mean cross-entropy: Welford of -log2 p(target) per group
        # (averaging p first and logging after would be Jensen-biased low)
        xe_stats = [cstats.Welford() for _ in groups]
        # AUC targets: the second class for binary groups, all otherwise
        auc_lists: dict[tuple[int, str], list] = {}
        for gi, g in enumerate(groups):
            targets = (g.classes[1] if len(g.classes) == 2 else g.classes)
            for x in targets:
                auc_lists[(gi, x)] = []

        t0 = time.time()
        windows_done = 0   # reset_state() zeroes window_no every batch
        files = self.test_files
        C = self.c.n_channels
        for i in range(0, len(files), C):
            batch = list(files[i:i + C])
            self.c.reset_state()
            self.c.events = []
            msgs = self._run_stream(self._assign_files(batch))
            windows_done += self.c.window_no
            for m in msgs:
                for j in range(min(C, len(batch))):
                    for gi, g in enumerate(groups):
                        tgt = m.get(f"channel {j}, group {gi} target")
                        if tgt is None:
                            continue
                        corr = m.get(f"channel {j}, group {gi} correct", 0)
                        test_scores[gi][tgt] += corr
                        test_runs[gi][tgt] += 1
                        for x in g.classes:
                            p = m.get(f"channel {j}, group {gi} {x}")
                            if p is None:
                                continue
                            right = x == tgt
                            pstats[gi][x][right].add(p)
                            if right:
                                xe_stats[gi].add(
                                    -np.log2(max(float(p), 1e-9)))
                            lst = auc_lists.get((gi, x))
                            if lst is not None:
                                lst.append((p, right))
        elapsed = time.time() - t0
        result = self.evaluate_test(test_scores, test_runs, pstats,
                                    auc_lists)
        result["windows"] = sum(sum(r.values()) for r in test_runs)
        result["test_windows_per_second"] = (
            windows_done * C / max(elapsed, 1e-9))
        live = [w for w in xe_stats if w.n]
        result["xe_bits"] = (sum(w.mean for w in live) / len(live)
                             if live else float("nan"))
        return result

    def evaluate_test(self, test_scores, test_runs, pstats, auc_lists
                      ) -> dict:
        """The colourised per-group dashboard + record-beating auto-save
        (classify.py:265-399)."""
        groups = self.c.groups
        result: dict = {"groups": []}
        record_beaten = []
        all_aucs: list[float] = []
        all_accs: list[float] = []
        for gi, g in enumerate(groups):
            out = [f"{self.c.net_basename}:{gi} " if len(groups) > 1
                   else f"{self.c.net_basename} "]
            aucs, dfds, accuracies = [], [], []
            auc_pairs = []      # (class, auc) — aucs alone can be sparse
            rightness = gap_p = ratio_p = 0.0
            count_p = 0
            dprime = 0.0
            gres: dict = {}
            for x in g.classes:
                out.append(f"{colour.C_STANDOUT}|{x}|{colour.C_NORMAL}")
                wrong, right = pstats[gi][x]
                wrong_p, right_p = wrong.mean, right.mean
                wrong_var = wrong.variance
                right_var = right.variance
                gap = right_p - wrong_p
                gap_p += gap
                if wrong_p:
                    ratio_p += right_p / wrong_p
                    count_p += 1
                dp = gap / (sqrt(0.5 * (right_var + wrong_var)) or 1e99)
                dprime += dp
                cres = {"right_p": right_p, "wrong_p": wrong_p, "dprime": dp}
                lst = auc_lists.get((gi, x))
                # AUC needs at least one positive and one negative example
                if lst and 0 < sum(c for _, c in lst) < len(lst):
                    scores = np.array([p for p, _ in lst])
                    truth = np.array([c for _, c in lst])
                    core = cstats.calc_core_stats(scores, truth)
                    cres.update(core)
                    auc_pairs.append((x, core["auc"]))
                    aucs.append(core["auc"])
                    dfds.append(core["dfd"])
                    accuracies.append(core["accuracy"])
                    out.append("%s.%03d%s %s.%03d%s" % (
                        colour.colourise_float01(abs(core["auc"] - 0.5) * 2),
                        int(core["auc"] * 1000 + 0.5), colour.C_NORMAL,
                        colour.colourise_float01(core["accuracy"]),
                        int(core["accuracy"] * 1000), colour.C_NORMAL))
                else:
                    out.append(".")
                r = test_runs[gi][x]
                if r:
                    frac = test_scores[gi][x] / r
                    rightness += frac
                    rs = "%dk" % int(r * 1e-3 + 0.5) if r >= 10000 else str(r)
                    out.append(" %s%2d%%%s/%s" % (
                        colour.colourise_float01(frac),
                        int(frac * 100 + 0.5), colour.C_GREY, rs))
                    cres["rightness"] = frac
                else:
                    out.append(" untested ")
                out.append("%s t%s%2d%s±%02d f%s%2d%s±%02d%s " % (
                    colour.C_NORMAL, colour.C_GREEN,
                    int(right_p * 99.99 + 0.5), colour.C_GREY,
                    int(sqrt(right_var) * 99.99 + 0.5), colour.C_RED,
                    int(wrong_p * 99.99 + 0.5), colour.C_GREY,
                    int(sqrt(wrong_var) * 99.99 + 0.5), colour.C_NORMAL))
                gres_key = x
                gres[gres_key] = cres
            n_cl = len(g.classes)
            if count_p:
                ratio_p /= count_p
            mean_auc = sum(aucs) / len(aucs) if aucs else 0.0
            mean_dfd = sum(dfds) / len(dfds) if dfds else 0.0
            mean_acc = (sum(accuracies) / len(accuracies)
                        if accuracies else 0.0)
            dprime /= n_cl
            gap_p /= n_cl
            rightness /= n_cl
            out.append(" Σ 🚀%s.%03d%s ✓%s.%03d%s %s%2d%%%s ≏%s.%02d%s ×%.1f"
                       " d'%s%.2f%s" % (
                           colour.colourise_float01((mean_auc - 0.5) * 2),
                           int(mean_auc * 1000 + 0.5), colour.C_NORMAL,
                           colour.colourise_float01(mean_acc),
                           int(mean_acc * 1000), colour.C_NORMAL,
                           colour.colourise_float01(rightness),
                           int(rightness * 100 + 0.5), colour.C_NORMAL,
                           colour.colourise_float01(gap_p * 1.5),
                           int(gap_p * 100 + 0.5), colour.C_NORMAL,
                           ratio_p,
                           colour.colourise_float01(dprime * 0.4),
                           dprime, colour.C_NORMAL))
            if self.verbose:
                print("".join(out), flush=True)
            result["groups"].append({
                "classes": gres, "auc": mean_auc, "accuracy": mean_acc,
                "dfd": mean_dfd, "dprime": dprime, "rightness": rightness,
                "gap_p": gap_p, "ratio_p": ratio_p})
            all_aucs.extend(aucs)
            all_accs.extend(accuracies)
            # record-beating auto-save with decaying thresholds
            metrics = {f"g{gi}-auc-{x}": a for x, a in auc_pairs}
            metrics.update({
                f"g{gi}-rightness": rightness, f"g{gi}-ratio": ratio_p,
                f"g{gi}-gap": gap_p, f"g{gi}-ratio-gap": ratio_p * gap_p,
                f"g{gi}-dprime": dprime, f"g{gi}-auc": mean_auc,
                f"g{gi}-dfd": mean_dfd, f"g{gi}-accuracy": mean_acc})
            for k, v in metrics.items():
                rec = self.decaying_records.get(k, 0.0)
                if v > rec:
                    record_beaten.append(k)
                    self.decaying_records[k] = v
                else:
                    self.decaying_records[k] = rec * self.RECORD_DECAY
        g0 = result["groups"][0]
        result["auc"] = (sum(all_aucs) / len(all_aucs)
                         if all_aucs else g0["auc"])
        result["accuracy"] = (sum(all_accs) / len(all_accs)
                              if all_accs else g0["accuracy"])
        # aggregate like auc/accuracy: mean over groups (a single-group net
        # still reports exactly its group's d')
        result["dprime"] = (sum(g["dprime"] for g in result["groups"])
                            / len(result["groups"]))
        if record_beaten and not self.no_save_net:
            base, ext = os.path.splitext(self.c.net_filename)
            tag = "auc-%d-acc-%d-dprime-%d" % (
                int(result["auc"] * 1000 + 0.5),
                int(result["accuracy"] * 1000 + 0.5),
                int(result["dprime"] * 100 + 0.5))
            name = f"{base}-best-gen{self.c.generation}-{tag}{ext}"
            self.c.save(name)
            if self.verbose:
                print(f"{colour.C_GREY}records {', '.join(record_beaten)}"
                      f" -> {name}{colour.C_NORMAL}", flush=True)
        return result

    def run(self, cycles: int = 10, test_interval: int = 1) -> dict:
        result: dict = {}
        for i in range(cycles):
            self.train_epoch()
            if self.verbose:
                print(f"cycle {self.cycle}: gen {self.c.generation} "
                      f"lr {self.c.learn_rate:.3g} "
                      f"{self.windows_per_second:,.0f} windows/s",
                      flush=True)
            if (i + 1) % test_interval == 0 or i == cycles - 1:
                result = self.test_epoch()
            if not self.no_save_net:
                self.c.save()
        return result
