"""Char-level language model training: the TPU equivalent of
charmodel-predict.c.

The reference's per-character hot loop trains N weight-sharing "taps" reading
one text at spaced offsets (charmodel-predict.c:272-311).  Here the taps are
the stream axis: a [S, T+1] token block per report interval is one jitted
scan (engine.char_train_chunk), so a whole report interval runs on-device
with no host round-trips.

Ventropy, the adaptive learn-rate schedule, confabulation and the key-value
log keep the reference's exact semantics (and log key names, so ./plot works
unchanged).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu import engine
from recur_tpu.engine import TrainHyper
from recur_tpu.models.alphabet import Alphabet
from recur_tpu.nn import LearningMethod, Net
from recur_tpu.ops.core import biased_softmax, forward_step
from recur_tpu.ops.conditioning import weight_noise
from recur_tpu.utils.kvlog import KvLog


class Schedule:
    """Adaptive learn-rate schedule (rnn_char_init_schedule + eval_simple,
    charmodel-predict.c:82-135): drop the learn rate by learn_rate_mul when
    the validation entropy stops beating a random sample of recent scores.

    The reference comparison is a single (noisy) validation score against the
    max of ~recent_len/3 sampled recent scores, so one unlucky validation can
    trigger a drop even while the trend is still improving — over a long run
    the rate decays to the floor (the round-2 endurance continuation's
    pathology).  ``trend=True`` selects a noise-aware variant: keep the last
    recent_len scores *in order*, compare the mean of the newer half against
    the mean of the older half only once per half-window (independent tests,
    no multiple-comparisons decay), and drop only when the improvement is
    not statistically positive (older − newer < its own standard error,
    estimated from the within-half variances).  A genuinely improving run
    holds its rate; a genuinely flat one still drops within ~recent_len
    evals."""

    def __init__(self, recent_len: int = 0, learn_rate_min: float = 1e-9,
                 learn_rate_mul: float = 0.7, adjust_noise: bool = False,
                 trend: bool = False):
        self.recent = [1e10] * recent_len
        self.recent_len = recent_len
        self.timeout = recent_len
        self.learn_rate_min = learn_rate_min
        self.learn_rate_mul = learn_rate_mul
        self.adjust_noise = adjust_noise
        self.trend = trend
        self.ordered: list = []
        self.check_countdown = 0

    def _drop(self, model: "CharModel", score: float, why: str,
              verbose: bool):
        self.timeout = self.recent_len
        model.learn_rate = max(self.learn_rate_min,
                               model.learn_rate * self.learn_rate_mul)
        if self.adjust_noise:
            model.presynaptic_noise *= self.learn_rate_mul
            model.periodic_weight_noise *= self.learn_rate_mul
        if verbose:
            print(f"generation {model.generation}: entropy {score:.4g} "
                  f"{why}; learn_rate -> {model.learn_rate:.3g}")

    def eval(self, model: "CharModel", score: float, verbose: bool = False):
        if self.recent_len == 0 or model.learn_rate <= self.learn_rate_min:
            return
        if self.trend:
            self.ordered.append(score)
            if len(self.ordered) > self.recent_len:
                self.ordered.pop(0)
            if self.timeout:
                self.timeout -= 1
                return
            if len(self.ordered) < self.recent_len:
                return
            if self.check_countdown:
                self.check_countdown -= 1
                return
            half = self.recent_len // 2
            self.check_countdown = max(half - 1, 0)  # fresh half each test
            o, n = np.asarray(self.ordered[:half]), \
                np.asarray(self.ordered[half:])
            improvement = float(o.mean() - n.mean())
            # 1-element halves have no sample variance: degrade to a plain
            # mean comparison instead of a NaN standard error
            se = (float(np.sqrt(o.var(ddof=1) / len(o) +
                                n.var(ddof=1) / len(n)))
                  if min(len(o), len(n)) > 1 else 0.0)
            if improvement >= se:
                return      # improvement is statistically positive
            self._drop(model, score,
                       f"trend stalled (improvement {improvement:.4g} "
                       f"< s.e. {se:.4g})", verbose)
            return
        sample_size = self.recent_len // 3
        i = model.net.rng.rand_small_int(self.recent_len)
        self.recent[i] = score
        if self.timeout:
            self.timeout -= 1
            return
        i += 1
        for _ in range(sample_size):
            if i >= self.recent_len:
                i = 0
            if score < self.recent[i]:
                return
            i += 1
        self._drop(model, score,
                   f"exceeds {sample_size} recent samples", verbose)


class Ventropy:
    """Lapped validation cross-entropy (RnnCharVentropy,
    charmodel-predict.c:216-257), running on a stateless weight-sharing
    evaluation stream."""

    def __init__(self, cfg: nn.RnnConfig, text: np.ndarray, lap: int = 1):
        self.cfg = cfg
        self.text = np.asarray(text, dtype=np.int32)
        self.lap = max(lap, 1)
        self.lapsize = len(self.text) // self.lap if len(self.text) else 0
        self.history = [0.0] * self.lap
        self.counter = 0
        self.entropy = 0.0
        self.hidden = jnp.zeros((1, cfg.h_size), jnp.float32)

    def calc(self, params: nn.RnnParams, lap: bool = True) -> float:
        if len(self.text) == 0:
            return 0.0
        if self.lap > 1 and lap:
            self.counter = (self.counter + 1) % self.lap
            seg = self.text[self.lapsize * self.counter:
                            self.lapsize * (self.counter + 1)]
            skip = min(self.lapsize // 10, 5)
            self.hidden, ent = engine.char_cross_entropy_seq(
                self.cfg, params, self.hidden, jnp.asarray(seg)[None], skip)
            self.history[self.counter] = float(ent[0])
            vals = [h for h in self.history if h != 0.0]
            self.entropy = sum(vals) / len(vals) if vals else 0.0
        else:
            skip = min(len(self.text) // 10, 5)
            self.hidden, ent = engine.char_cross_entropy_seq(
                self.cfg, params, self.hidden, jnp.asarray(self.text)[None],
                skip)
            self.entropy = float(ent[0])
            self.history[0] = self.entropy
        return self.entropy


def ensemble_alphabet(nets, names=None) -> Alphabet:
    """The shared alphabet of an ensemble's members.

    Raises ValueError if any member encodes text differently — scoring with
    mismatched alphabets indexes every other member's softmax with the wrong
    token ids and produces plausible-looking nonsense."""
    from recur_tpu.models.alphabet import Metadata
    names = list(names) if names else [f"net {i}" for i in range(len(nets))]
    alpha = Metadata.parse(nets[0].metadata).to_alphabet()
    for name, other in zip(names[1:], nets[1:]):
        oa = Metadata.parse(other.metadata).to_alphabet()
        if (oa.points, oa.collapsed_points, oa.flags) != (
                alpha.points, alpha.collapsed_points, alpha.flags):
            raise ValueError(f"{name}: alphabet differs from {names[0]} — "
                             "ensemble members must encode text identically")
    return alpha


def member_probs(net: Net, tokens, prefix=None,
                 warm_laps: int = 0) -> np.ndarray:
    """One ensemble member's predictive distributions over tokens[1:].

    Runs the net from zero hidden — optionally primed with `prefix` tokens
    and/or `warm_laps` full passes over `tokens` first.  One warm lap
    reproduces Ventropy's carried hidden state (the training logs'
    v_entropy always scores with a hidden warmed by earlier validation
    passes of the same text), making scores directly comparable to logged
    best_v_entropy values; warm_laps=0 is a cold-start score."""
    hidden = jnp.zeros((1, net.cfg.h_size), jnp.float32)
    x = jnp.asarray(np.asarray(tokens[:-1], np.int32))[None]
    if prefix is not None and len(prefix):
        # rnn_char_prime (text-cross-entropy.c:145-148)
        hidden, _ = engine.char_forward_seq(
            net.cfg, net.params, hidden,
            jnp.asarray(np.asarray(prefix, np.int32))[None])
    for _ in range(warm_laps):
        hidden, _ = engine.char_forward_seq(net.cfg, net.params, hidden, x)
    _, outs = engine.char_forward_seq(net.cfg, net.params, hidden, x)
    return np.asarray(jax.nn.softmax(
        outs[0, :, :net.cfg.output_size], axis=-1))


def combine_probs(stacked: np.ndarray, op: str = "mixture") -> np.ndarray:
    """Combine ensemble members' [n, T, vocab] predictive distributions:
    arithmetic mixture of probabilities (default) or renormalised geometric
    mean (product of experts)."""
    if op == "mixture":
        return stacked.mean(axis=0)
    if op == "geometric":
        q = np.exp(np.log(stacked + 1e-30).mean(axis=0))
        return q / q.sum(axis=-1, keepdims=True)
    raise ValueError(f"unknown ensemble op {op!r}")


def ensemble_confabulate(nets, alphabet: Alphabet, char_len: int,
                         bias: float = 0.0, prefix=None, seed: int = 0,
                         start_point: int = -1, stop_point: int = -1,
                         ensemble_op: str = "mixture") -> str:
    """Sample text from the per-char mixture of an ensemble's predictive
    distributions (beyond the reference: its confab is single-net,
    text-confabulate.c).  Each member carries its own hidden state through
    the generated sequence; bias sharpens each member's distribution
    (biased_softmax, the single-net semantics) before combining, and
    bias >= 100 takes the argmax of the combined distribution."""
    rng = np.random.default_rng(seed)
    hiddens = [jnp.zeros((1, n.cfg.h_size), jnp.float32) for n in nets]
    tok = 0
    if prefix is not None and len(prefix):
        px = jnp.asarray(np.asarray(prefix, np.int32))[None]
        hiddens = [engine.char_forward_seq(n.cfg, n.params, h, px)[0]
                   for n, h in zip(nets, hiddens)]
        tok = int(prefix[-1])

    def step(tok):
        ps = []
        for i, n in enumerate(nets):
            x = jax.nn.one_hot(jnp.array([tok]), n.cfg.raw_input_size,
                               dtype=jnp.float32)
            fwd = forward_step(n.cfg, n.params, hiddens[i], x)
            hiddens[i] = fwd.hidden
            logits = fwd.output[0, :n.cfg.output_size]
            ps.append(np.asarray(biased_softmax(logits, float(bias)),
                                 np.float64))
        q = combine_probs(np.stack(ps)[:, None, :], ensemble_op)[0]
        if bias >= 100:
            return int(np.argmax(q))
        q = q / q.sum()
        return int(rng.choice(len(q), p=q))

    out = []
    if start_point >= 0 and char_len > 0:
        for _ in range(100000):
            tok = step(tok)
            if tok == start_point:
                break
        out.append(tok)
    for _ in range(char_len):
        tok = step(tok)
        out.append(tok)
        if tok == stop_point:
            break
    return alphabet.decode(out)


class CharModel:
    """RnnCharModel + rnn_char_epoch: the full training harness."""

    def __init__(self, net: Net, alphabet: Alphabet, n_streams: int = 1,
                 learning_style: LearningMethod = LearningMethod.MOMENTUM_WEIGHTED,
                 batch_size: int = 1, momentum_soft_start: float = 0.0,
                 report_interval: int = 1024, save_net: bool = True,
                 filename: Optional[str] = None,
                 periodic_weight_noise: float = 0.0,
                 log: Optional[KvLog] = None, seed: int = 0,
                 history_dtype=jnp.float32, bptt_impl: str = "buffered",
                 unroll: int = 1, walk_unroll: int = 1,
                 periodic_pgm_dump: str = "",
                 temporal_pgm_dump: bool = False, basename: str = "net",
                 ema_weight: float = 0.0,
                 distill_teachers: Optional[list] = None,
                 distill_alpha: float = 1.0, distill_temp: float = 1.0,
                 snapshot_every: int = 0):
        self.net = net
        self.alphabet = alphabet
        self.cfg = net.cfg
        self.n_streams = n_streams
        self.hyper = TrainHyper(
            learning_style=LearningMethod(learning_style),
            momentum_soft_start=momentum_soft_start,
            batch_size=batch_size,
            use_noise=net.cfg.presynaptic_noise > 0.0,
            condition=False,  # char multi-tap path skips conditioning
            bptt_impl=bptt_impl, unroll=unroll, walk_unroll=walk_unroll)
        self.report_interval = report_interval
        self.save_net = save_net
        self.filename = filename
        self.periodic_weight_noise = periodic_weight_noise
        self.log = log or KvLog()
        self.schedule = Schedule(0)
        # weight-image debugging (rnn_multi_pgm_dump / temporal_ppm,
        # text-predict.c:617-620 + pgm_dump.h) at each report
        self.periodic_pgm_dump = periodic_pgm_dump
        self.basename = basename
        self._temporal_ppm = None
        if temporal_pgm_dump:
            from recur_tpu.utils.pgm import TemporalPPM
            self._temporal_ppm = TemporalPPM(
                net.cfg.h_size, 300, f"{basename}-hidden")
        # live scalars (mirrored into device state each chunk)
        self.learn_rate = net.learn_rate
        self.momentum = net.momentum
        self.presynaptic_noise = net.cfg.presynaptic_noise
        # device state
        self.params = net.params
        self.bptt = nn.new_bptt_state(net.cfg, n_streams,
                                      learn_rate=net.learn_rate,
                                      momentum=net.momentum)
        self.bptt = dataclasses.replace(
            self.bptt, generation=jnp.uint32(net.generation),
            ho_scale=jnp.float32(net.ho_scale))
        if net.min_error_factor:
            self.bptt = dataclasses.replace(
                self.bptt,
                min_error_factor=jnp.full((n_streams,), net.min_error_factor,
                                          jnp.float32))
        self.state = nn.new_state(net.cfg, n_streams,
                                  history_dtype=history_dtype,
                                  factored=(bptt_impl == "factored"))
        self.key = jax.random.PRNGKey(seed)
        # Polyak/EMA weight averaging (beyond-reference extension): keep an
        # exponential moving average of the weights on device, updated once
        # per chunk with the per-generation decay compounded; validation
        # scores the averaged net (v_entropy) alongside the raw one
        # (v_entropy_raw).  SGD-with-momentum trajectories on this model
        # family oscillate around the valley floor; the average sits lower.
        self.ema_weight = float(ema_weight)
        self.ema_params = (jax.tree.map(jnp.copy, self.params)
                           if self.ema_weight > 0.0 else None)
        self._raw_ventropy = None
        # record-validation snapshot: long runs decay past their best
        # point (the trend schedule rides the floor while v_entropy climbs
        # back up), so the net that validation actually crowned is saved
        # as <filename>.best whenever v_entropy sets a new record — the
        # same save-on-record semantics as classify.py's decaying-record
        # auto-save (SURVEY §2.8), applied to the char pillar.  A sidecar
        # <filename>.best.json records the score so a RESUMED run (--reload,
        # endurance legs) keeps the historical record instead of
        # overwriting it with its own first (worse) validation.
        self._best_vent = float("inf")
        # periodic snapshots (<filename>.g<N>k): independently-timed saves
        # of the validation-scored weights every `snapshot_every`
        # generations.  One long run then yields several decorrelated
        # ensemble members for free — measured: a run's .best and final
        # .ema twins bought the 29-member mixture 0.005 bits over
        # best-only (PERF.md, ensemble_best35.json).
        self.snapshot_every = int(snapshot_every)
        self._next_snapshot_gen = (
            self.snapshot_every
            * (net.generation // self.snapshot_every + 1)
            if self.snapshot_every else 0)
        # Read the sidecar UNCONDITIONALLY (not just on resumed nets): a
        # fresh gen-0 run pointed at a filename whose .best records a
        # better historical score must not clobber it — exactly what
        # happened when a crashed continuation restarted from scratch and
        # overwrote a 1.9894 .best with its own 2.04 descent (round 3d).
        if filename:
            try:
                import json as _json
                with open(filename + ".best.json") as f:
                    self._best_vent = float(_json.load(f)["v_entropy"])
                if net.generation == 0:
                    # deliberate fresh runs reusing an old filename would
                    # otherwise silently never write .best until they beat
                    # the stale record — say so (delete <filename>.best* or
                    # pick a new filename to reset the record)
                    print(f"note: fresh net inherits .best record "
                          f"{self._best_vent:.4f} from {filename}.best.json;"
                          f" .best is only written below it", flush=True)
            except (OSError, ValueError, KeyError):
                pass
        # ensemble distillation (beyond-reference, engine.char_distill_step):
        # frozen teacher nets run in the training scan and blend the target
        # toward their predictive mixture.  Teachers must share the
        # student's alphabet (same output slots); each carries its own
        # per-stream hidden state so its predictions are as warmed as the
        # student's.
        self.distill_alpha = float(distill_alpha)
        self.distill_temp = float(distill_temp)
        self._teacher_cfgs = ()
        self._teacher_params = ()
        self._teacher_hiddens = ()
        if distill_teachers:
            for t in distill_teachers:
                if t.cfg.output_size != net.cfg.output_size:
                    raise ValueError(
                        f"teacher output size {t.cfg.output_size} != "
                        f"student {net.cfg.output_size} — teachers must "
                        "share the student's alphabet")
            self._teacher_cfgs = tuple(t.cfg for t in distill_teachers)
            self._teacher_params = tuple(t.params for t in distill_teachers)
            self._teacher_hiddens = tuple(
                jnp.zeros((n_streams, t.cfg.h_size), jnp.float32)
                for t in distill_teachers)
        # confab state
        self._confab_hidden = jnp.zeros((1, net.cfg.h_size), jnp.float32)
        self._confab_char = 0

    def _update_ema(self, n_gens: int):
        if self.ema_params is None:
            return
        f = jnp.float32(self.ema_weight ** n_gens)
        self.ema_params = jax.tree.map(
            lambda e, p: e * f + p * (1.0 - f), self.ema_params, self.params)

    @property
    def generation(self) -> int:
        return int(self.bptt.generation)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ---- confabulation (rnn_char_confabulate, charmodel-predict.c:137-179) --
    def confabulate(self, char_len: int, bias: float = 0.0,
                    start_point: int = -1, stop_point: int = -1) -> str:
        cfg = self.cfg
        if start_point < 0 and stop_point < 0:
            # fast path: sample the whole string in one device call
            hidden, toks = engine.char_confab_chunk(
                cfg, self.params, self._confab_hidden, char_len,
                jnp.asarray([self._confab_char], jnp.int32),
                jnp.float32(bias), self._next_key())
            self._confab_hidden = hidden
            syms = np.asarray(toks[0])
            self._confab_char = int(syms[-1]) if len(syms) else                 self._confab_char
            return self.alphabet.decode(syms)
        out_syms = []
        n = self._confab_char
        hidden = self._confab_hidden
        if start_point >= 0 and char_len > 0:
            for _ in range(100000):
                hidden, n = self._guess_next(hidden, n, bias)
                if n == start_point:
                    break
            out_syms.append(n)
        for _ in range(char_len):
            hidden, n = self._guess_next(hidden, n, bias)
            out_syms.append(n)
            if n == stop_point:
                break
        self._confab_char = n
        self._confab_hidden = hidden
        return self.alphabet.decode(out_syms)

    def _guess_next(self, hidden, tok: int, bias: float):
        """guess_next_character (charmodel-predict.c:29-60): biased-softmax
        sampling with the host JSF64 rng; bias >= 100 → argmax."""
        cfg = self.cfg
        x = jax.nn.one_hot(jnp.array([tok]), cfg.raw_input_size,
                           dtype=jnp.float32)
        fwd = forward_step(cfg, self.params, hidden, x)
        logits = np.asarray(fwd.output[0, :cfg.output_size], np.float64)
        if bias >= 100:
            return fwd.hidden, int(np.argmax(logits))
        probs = np.asarray(
            biased_softmax(jnp.asarray(logits, jnp.float32), bias))
        while True:
            r = self.net.rng.rand_double()
            accum = np.cumsum(probs)
            idx = int(np.searchsorted(accum, r, side="right"))
            if idx < len(probs):
                return fwd.hidden, idx

    # ---- priming / scoring ----
    def prime(self, text: np.ndarray):
        """rnn_char_prime: run text through the confab stream."""
        if len(text) == 0:
            return 0
        hidden, _ = engine.char_forward_seq(
            self.cfg, self.params, self._confab_hidden,
            jnp.asarray(text, jnp.int32)[None])
        self._confab_hidden = hidden
        self._confab_char = int(text[-1])
        return self._confab_char

    def cross_entropy(self, text: np.ndarray, skip: int = 5) -> float:
        hidden = jnp.zeros((1, self.cfg.h_size), jnp.float32)
        _, ent = engine.char_cross_entropy_seq(
            self.cfg, self.params, hidden, jnp.asarray(text, jnp.int32)[None],
            min(skip, max(len(text) // 10, 0)))
        return float(ent[0])

    # ---- the epoch loop (rnn_char_epoch, charmodel-predict.c:260-405) ----
    def epoch(self, text: np.ndarray, ventropy: Optional[Ventropy] = None,
              start: int = 0, stop: int = 0, confab_size: int = 80,
              confab_bias: float = 0.0, quietness: int = 0,
              chunk_size: Optional[int] = None) -> bool:
        """Train one pass over `text` (u8/int symbol array).  Returns True if
        the stop generation was reached."""
        text = np.asarray(text, dtype=np.int32)
        S = self.n_streams
        L = len(text) - 1
        if L < 2:
            return False
        spacing = L // S
        # device chunk: capped independently of the report interval (a huge
        # report interval must not become a huge token block)
        chunk = chunk_size or min(self.report_interval, 4096)
        offsets = (np.arange(S) * spacing)[:, None]   # [S,1]

        report_counter = self.generation % self.report_interval
        t0 = time.monotonic()
        acc = {"error": 0.0, "entropy": 0.0, "correct": 0.0, "depth": 0.0,
               "ih_scale": 0.0, "top_error": 0.0, "bptt_error": 0.0,
               "n": 0}
        # partial interval at entry keeps report cadence aligned with
        # net->generation, like report_scale in the reference
        i = start
        while i < L:
            n = min(chunk, L - i, self.report_interval - report_counter)
            # the read offset wraps modulo L = len-1, but the target is
            # always the true next char text[idx+1] — at the wrap the pair
            # is (text[L-1] -> text[L]), NOT (text[L-1] -> text[0])
            # (charmodel-predict.c:295-301)
            idx = (i + np.arange(n)[None, :] + offsets) % L
            xs_tok = jnp.asarray(text[idx])
            ys_tok = jnp.asarray(text[idx + 1])
            self._sync_scalars()
            # --batch-size > 1 runs the windowed batched-walk formulation
            # wherever the piece divides into apply windows (the sequential
            # path covers ragged tails and non-buffered impls exactly)
            if self._teacher_cfgs:
                (self.params, self.bptt, self.state, self._teacher_hiddens,
                 totals) = engine.char_distill_chunk_xy(
                    self.cfg, self.hyper, self._teacher_cfgs,
                    self.params, self.bptt, self.state,
                    self._teacher_hiddens, self._teacher_params,
                    xs_tok, ys_tok, self._next_key(),
                    jnp.float32(self.momentum),
                    jnp.float32(self.presynaptic_noise),
                    jnp.float32(self.distill_alpha),
                    jnp.float32(self.distill_temp))
            else:
                chunk_fn = (engine.char_train_window_chunk_xy
                            if self.hyper.batch_size > 1
                            and not self.cfg.has_bottom
                            and self.hyper.bptt_impl == "buffered"
                            and n % self.hyper.batch_size == 0
                            else engine.char_train_chunk_xy)
                self.params, self.bptt, self.state, totals = chunk_fn(
                    self.cfg, self.hyper, self.params, self.bptt, self.state,
                    xs_tok, ys_tok, self._next_key(),
                    jnp.float32(self.momentum),
                    jnp.float32(self.presynaptic_noise))
            self._pull_scalars()
            self._update_ema(n)
            acc["error"] += float(totals.error)
            acc["entropy"] += float(totals.entropy)
            acc["correct"] += float(totals.correct)
            acc["depth"] += float(totals.depth)
            acc["ih_scale"] += float(totals.ih_scale)
            acc["top_error"] += float(totals.top_error)
            acc["bptt_error"] += float(totals.bptt_error)
            acc["n"] += n * S
            i += n
            report_counter += n
            if report_counter >= self.report_interval:
                report_counter = 0
                t1 = time.monotonic()
                elapsed = max(t1 - t0, 1e-9)
                t0 = t1
                per_sec = acc["n"] / elapsed
                self._report(acc, ventropy, per_sec, confab_size,
                             confab_bias, quietness)
                acc = {"error": 0.0, "entropy": 0.0, "correct": 0.0,
                       "depth": 0.0, "ih_scale": 0.0, "top_error": 0.0,
                       "bptt_error": 0.0, "n": 0}
            if stop and self.generation >= stop:
                self._finalize()
                return True
        return False

    def _sync_scalars(self):
        self.bptt = dataclasses.replace(
            self.bptt, learn_rate=jnp.float32(self.learn_rate),
            momentum=jnp.float32(self.momentum))

    def _pull_scalars(self):
        pass  # device never changes learn_rate/momentum; nothing to pull

    def _report(self, acc, ventropy, per_sec, confab_size, confab_bias,
                quietness):
        n = max(acc["n"], 1)
        t_entropy = acc["entropy"] / n
        t_error = acc["error"] / n
        accuracy = acc["correct"] / n
        # with EMA averaging on, validation (and hence the adaptive
        # schedule) scores the averaged weights; the raw net's score is
        # still measured and logged (v_entropy_raw) on an independent
        # carried validation state, so both trajectories stay comparable
        vent_raw = None
        if ventropy and self.ema_params is not None:
            if self._raw_ventropy is None:
                import copy
                self._raw_ventropy = copy.deepcopy(ventropy)
            vent_raw = self._raw_ventropy.calc(self.params)
        v_params = self.ema_params if self.ema_params is not None \
            else self.params
        vent = ventropy.calc(v_params) if ventropy else 0.0
        if confab_size and quietness < 1:
            k = self.generation >> 10
            confab = self.confabulate(confab_size, confab_bias)
            confab = confab.replace("\n", "\\n")
            print(f"{k:5d}k e.{int(t_error*100+0.5):02d} t{t_entropy:.2f} "
                  f"v{vent:.2f} a.{int(accuracy*100+0.5):02d} "
                  f"{per_sec:.0f}/s |{confab}|", flush=True)
        self.log.log_float("t_error", t_error)
        self.log.log_float("t_entropy", t_entropy)
        self.log.log_float("v_entropy", vent)
        if vent_raw is not None:
            self.log.log_float("v_entropy_raw", vent_raw)
        self.log.log_float("momentum", self.momentum)
        self.log.log_float("accuracy", accuracy)
        self.log.log_float("learn-rate", self.learn_rate)
        self.log.log_float("per_second", per_sec)
        self.log.log_int("generation", self.generation)
        # per-generation net log keys (rnn_log_net + bptt logging,
        # recur-nn.c:415-448, 762-770), reported as interval means here —
        # keeps ./plot's DEFAULT_KEYS working
        self.log.log_float("depth", acc["depth"] / n)
        self.log.log_float("ih_scale", acc["ih_scale"] / n)
        self.log.log_float("top_error_raw", acc["top_error"] / n)
        self.log.log_float("error_sum", acc["bptt_error"] / n)
        self.log.log_float("error_gain",
                           acc["bptt_error"] / (acc["top_error"] + 1e-6))
        self.log.log_float("error", t_error)
        self.log.log_float("correct", accuracy)
        if self.cfg.flags & nn.Flag.LOG_HIDDEN_SUM:
            h = np.asarray(self.state.hidden)
            self.log.log_float("hidden_sum", float(h.sum() / h.shape[0]))
            self.log.log_float("hidden_magnitude", float(
                np.sqrt((h * h).sum(axis=1)).mean()))
            self.log.log_float("hidden_zeros", float(
                (h == 0.0).sum(axis=1).mean() / self.cfg.hidden_size))
        if self.cfg.flags & nn.Flag.LOG_WEIGHT_SUM:
            self.log.log_float("weight_sum", float(
                np.abs(np.asarray(self.params.ih)).sum()))
        self.log.flush()
        if (ventropy and self.save_net and self.filename
                and vent < self._best_vent):
            self._best_vent = vent
            self._save_snapshot(v_params, self.filename + ".best", vent)
        if (ventropy and self.save_net and self.filename
                and self.snapshot_every
                and self.generation >= self._next_snapshot_gen):
            self._save_snapshot(
                v_params, f"{self.filename}.g{self._next_snapshot_gen}",
                vent)
            while self._next_snapshot_gen <= self.generation:
                self._next_snapshot_gen += self.snapshot_every
        if self.save_net and self.filename:
            self.save(self.filename, backup=True)
        self.schedule.eval(self, vent, quietness < 2)
        if self.periodic_weight_noise:
            self.params = weight_noise(self.cfg, self.params,
                                       self._next_key(),
                                       jnp.float32(self.periodic_weight_noise))
        if self.periodic_pgm_dump:
            from recur_tpu.utils.pgm import multi_pgm_dump
            self.net.params = self.params
            multi_pgm_dump(self.net, self.periodic_pgm_dump, self.basename,
                           bptt=self.bptt)
        if self._temporal_ppm is not None:
            self._temporal_ppm.add_row(np.asarray(self.state.hidden[0]))

    def _finalize(self):
        if self.save_net and self.filename:
            self.save(self.filename, backup=True)

    def _save_snapshot(self, params, filename: str, v_entropy: float):
        """Write `params` (the validation-scored weights) as a .net file
        without disturbing the live net, plus a .json sidecar recording the
        score (read back on --reload so resumed runs keep the record)."""
        raw, gen = self.net.params, self.net.generation
        self.net.params = params
        self.net.generation = self.generation
        self.net.learn_rate = float(self.learn_rate)
        self.net.momentum = float(self.momentum)
        self.net.min_error_factor = float(self.bptt.min_error_factor[0])
        nn.save_net(self.net, filename, backup=False)
        self.net.params, self.net.generation = raw, gen
        import json as _json
        with open(filename + ".json", "w") as f:
            _json.dump({"v_entropy": float(v_entropy),
                        "generation": self.generation}, f)

    def save(self, filename: str, backup: bool = False):
        """Sync device state back into the host Net and write the .net file.
        With EMA averaging on, the averaged net (the one validation scores)
        is saved alongside as <filename>.ema."""
        self.net.params = self.params
        self.net.generation = self.generation
        self.net.learn_rate = float(self.learn_rate)
        self.net.momentum = float(self.momentum)
        self.net.min_error_factor = float(self.bptt.min_error_factor[0])
        nn.save_net(self.net, filename, backup=backup)
        if self.ema_params is not None:
            raw = self.net.params
            self.net.params = self.ema_params
            nn.save_net(self.net, filename + ".ema", backup=False)
            self.net.params = raw
