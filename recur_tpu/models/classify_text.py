"""Per-character text classification (language/author ID):
charmodel-classify.c rebuilt on the batched engine.

A classified text is (symbol, class) pairs; class NO_CLASS (0xff) marks
characters that forward through the net but don't train (lag margins,
ignore_start regions).  Training runs N streams at spaced offsets, exactly
like the char-LM multi-tap, with the class as the softmax target.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.engine import TrainHyper
from recur_tpu.models.alphabet import Alphabet
from recur_tpu.nn import LearningMethod, Net, RnnConfig
from recur_tpu.ops.core import (advance_history, capped_log2,
                                dispatch_calc_deltas, forward_step)
from recur_tpu.ops.optimizers import apply_learning, momentum_soft_start
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.utils.kvlog import KvLog

NO_CLASS = 0xFF


def adjust_text_lag(classes: np.ndarray, lag: int) -> np.ndarray:
    """rnn_char_adjust_text_lag (charmodel-classify.c:31-57): shift labels in
    time; out-of-range positions become NO_CLASS."""
    out = np.full_like(classes, NO_CLASS)
    if lag > 0:
        out[lag:] = classes[:-lag]
    elif lag < 0:
        out[:lag] = classes[-lag:]
    else:
        out[:] = classes
    return out


def alloc_classified_text(blocks: Sequence[tuple[str, bytes | str]],
                          alphabet: Alphabet, ignore_start: int = 0,
                          class_lut: Optional[dict] = None
                          ) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """rnn_char_alloc_classified_text (charmodel-init.c:378-427): encode
    (class_name, text) blocks into parallel symbol/class arrays.  The first
    ignore_start chars of each block get NO_CLASS."""
    names: list[str] = []
    if class_lut is None:
        class_lut = {}
        for name, _ in blocks:
            if name not in class_lut:
                class_lut[name] = len(class_lut)
                names.append(name)
    else:
        names = sorted(class_lut, key=class_lut.get)
    syms: list[np.ndarray] = []
    cls: list[np.ndarray] = []
    for name, text in blocks:
        e = alphabet.encode(text)
        c = np.full(len(e), class_lut[name], np.uint8)
        c[:ignore_start] = NO_CLASS
        syms.append(e)
        cls.append(c)
    return np.concatenate(syms), np.concatenate(cls), names


class ClassifyStats(NamedTuple):
    error: jax.Array
    entropy: jax.Array
    correct: jax.Array
    seen: jax.Array


def classify_train_step(cfg: RnnConfig, hyper: TrainHyper, params, bptt,
                        state, x_tok, y_class, key, momentum_target,
                        presynaptic_noise):
    """One (symbol, class) step for S streams; class == NO_CLASS forwards
    without training (charmodel-classify.c:114-154)."""
    S = x_tok.shape[0]
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
    nk, ck = jax.random.split(key)
    fwd = forward_step(cfg, params, state.hidden, x,
                       noise_key=nk if hyper.use_noise else None,
                       presynaptic_noise=presynaptic_noise)
    state = advance_history(state, fwd.input_row)
    state = nn.RnnState(hidden=fwd.hidden, history=state.history,
                        head=state.head)
    live = (y_class != NO_CLASS)
    y_safe = jnp.where(live, y_class, 0).astype(jnp.int32)
    p = jax.nn.softmax(fwd.output[:, :cfg.output_size], axis=-1)
    onehot = jax.nn.one_hot(y_safe, cfg.output_size, dtype=jnp.float32)
    err = (onehot - p) * live[:, None].astype(jnp.float32)
    o_error = jnp.zeros((S, cfg.o_size), jnp.float32)
    o_error = o_error.at[:, :cfg.output_size].set(err)
    winner = jnp.argmax(p, axis=1)
    # one-hot contraction, not take_along_axis (TPU gathers are slow)
    p_t = jnp.sum(p * onehot[:, :cfg.output_size], axis=1)

    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, fwd.bottom_inputs, o_error,
                    bptt.min_error_factor, bptt.learn_rate)
    params, bptt = apply_learning(cfg, params, bptt, d.ih_delta, d.ho_delta,
                                  d.bottom_delta, hyper.learning_style,
                                  momentum, hyper.bottom_learn_rate_scale)
    # NO_CLASS streams skip rnn_bptt_calc_deltas in the reference
    # (charmodel-classify.c:144-160), so their adaptive min_error_factor
    # must not move: a zero-error walk trips at step 1 and would erode it
    # by ~(1 - .023) per masked char until the early-exit floor vanishes.
    bptt = dataclasses.replace(
        bptt,
        min_error_factor=jnp.where(live, d.min_error_factor,
                                   bptt.min_error_factor),
        ih_scale=d.stats["ih_scale"],
        generation=bptt.generation + 1)
    if hyper.condition:
        params, bptt = condition_net(cfg, params, bptt, ck)
    livef = live.astype(jnp.float32)
    stats = ClassifyStats(
        error=(1.0 - p_t) * livef,
        entropy=-capped_log2(jnp.maximum(p_t, 1e-38)) * livef,
        correct=(winner == y_safe).astype(jnp.float32) * livef,
        seen=livef)
    return params, bptt, state, stats


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def classify_train_chunk(cfg, hyper, params, bptt, state, tokens, classes,
                         key, momentum_target, presynaptic_noise):
    """tokens/classes: [S, T]."""
    xs = jnp.moveaxis(tokens, 1, 0)
    cs = jnp.moveaxis(classes, 1, 0)
    keys = jax.random.split(key, xs.shape[0])

    def body(carry, inp):
        params, bptt, state = carry
        x, c, k = inp
        params, bptt, state, stats = classify_train_step(
            cfg, hyper, params, bptt, state, x, c, k, momentum_target,
            presynaptic_noise)
        return (params, bptt, state), jax.tree.map(jnp.sum, stats)

    (params, bptt, state), stats = jax.lax.scan(
        body, (params, bptt, state), (xs, cs, keys))
    return params, bptt, state, jax.tree.map(jnp.sum, stats)


@partial(jax.jit, static_argnums=(0,))
def classify_eval_seq(cfg, params, hidden, tokens, classes):
    """Validation pass (charmodel-classify.c:174-196): mean XE / error over
    labelled positions.  tokens/classes: [S, T]."""
    xs = jnp.moveaxis(tokens, 1, 0)

    def body(h, x_tok):
        x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, h, x)
        return fwd.hidden, fwd.output

    hidden, outs = jax.lax.scan(body, hidden, xs)
    p = jax.nn.softmax(outs[:, :, :cfg.output_size], axis=-1)
    cs = jnp.moveaxis(classes, 1, 0)
    live = (cs != NO_CLASS)
    y_safe = jnp.where(live, cs, 0).astype(jnp.int32)
    oh = jax.nn.one_hot(y_safe, cfg.output_size, dtype=p.dtype)
    p_t = jnp.sum(p * oh, axis=2)
    livef = live.astype(jnp.float32)
    div = jnp.maximum(livef.sum(), 1.0)
    v_entropy = (-capped_log2(jnp.maximum(p_t, 1e-38)) * livef).sum() / div
    v_error = ((1.0 - p_t) * livef).sum() / div
    return hidden, v_entropy, v_error, p


class TextClassifier:
    """RnnCharClassifier + rnn_char_classify_epoch."""

    def __init__(self, net: Net, alphabet: Alphabet, class_names: list[str],
                 n_streams: int = 1,
                 learning_style=LearningMethod.MOMENTUM_WEIGHTED,
                 momentum_soft_start: float = 0.0, report_interval: int = 1024,
                 filename: Optional[str] = None, save_net: bool = True,
                 log: Optional[KvLog] = None, seed: int = 0):
        self.net = net
        self.alphabet = alphabet
        self.class_names = class_names
        self.cfg = net.cfg
        self.n_streams = n_streams
        self.hyper = TrainHyper(learning_style=LearningMethod(learning_style),
                                momentum_soft_start=momentum_soft_start,
                                use_noise=net.cfg.presynaptic_noise > 0.0,
                                condition=False)
        self.report_interval = report_interval
        self.filename = filename
        self.save_net = save_net
        self.log = log or KvLog()
        self.learn_rate = net.learn_rate
        self.momentum = net.momentum
        self.params = net.params
        self.bptt = nn.new_bptt_state(net.cfg, n_streams,
                                      learn_rate=net.learn_rate,
                                      momentum=net.momentum)
        self.bptt = dataclasses.replace(self.bptt,
                                        generation=jnp.uint32(net.generation))
        self.state = nn.new_state(net.cfg, n_streams)
        self.key = jax.random.PRNGKey(seed)
        self._v_hidden = jnp.zeros((1, net.cfg.h_size), jnp.float32)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def generation(self) -> int:
        return int(self.bptt.generation)

    def epoch(self, symbols: np.ndarray, classes: np.ndarray,
              validation: Optional[tuple[np.ndarray, np.ndarray]] = None,
              quietness: int = 0, chunk_size: int = 512) -> dict:
        """One pass over the classified text with S spaced streams.  Returns
        the last report's stats dict."""
        S = self.n_streams
        L = len(symbols)
        spacing = L // S
        offs = (np.arange(S) * spacing)[:, None]
        # prime (charmodel-classify.c:99-112): a few unlogged chars
        prime = min(L // (S * 20), 10)
        if prime:
            idx = (np.arange(prime)[None, :] + offs) % L
            from recur_tpu.models.multihead import multihead_spin
            self.state = multihead_spin(
                self.cfg, self.params, self.cfg.input_size, self.state,
                jnp.asarray(symbols[idx]),
                self.cfg.presynaptic_noise > 0.0, self._next_key(),
                jnp.float32(self.cfg.presynaptic_noise))
        acc = dict(error=0.0, entropy=0.0, correct=0.0, seen=0.0)
        last_report = {}
        report_counter = self.generation % self.report_interval
        t0 = time.monotonic()
        i = prime
        while i < L:
            n = min(chunk_size, L - i, self.report_interval - report_counter)
            idx = (i + np.arange(n)[None, :] + offs) % L
            self.bptt = dataclasses.replace(
                self.bptt, learn_rate=jnp.float32(self.learn_rate))
            self.params, self.bptt, self.state, tot = classify_train_chunk(
                self.cfg, self.hyper, self.params, self.bptt, self.state,
                jnp.asarray(symbols[idx].astype(np.int32)),
                jnp.asarray(classes[idx].astype(np.int32)),
                self._next_key(), jnp.float32(self.momentum),
                jnp.float32(self.cfg.presynaptic_noise))
            for k in acc:
                acc[k] += float(getattr(tot, k))
            i += n
            report_counter += n
            if report_counter >= self.report_interval:
                report_counter = 0
                elapsed = max(time.monotonic() - t0, 1e-9)
                t0 = time.monotonic()
                last_report = self._report(acc, validation, elapsed,
                                           quietness)
                acc = dict(error=0.0, entropy=0.0, correct=0.0, seen=0.0)
        return last_report

    def _report(self, acc, validation, elapsed, quietness) -> dict:
        seen = max(acc["seen"], 1.0)
        r = {"t_error": acc["error"] / seen,
             "t_entropy": acc["entropy"] / seen,
             "accuracy": acc["correct"] / seen,
             "per_second": seen / elapsed}
        for k, v in r.items():
            self.log.log_float(k, v)
        self.log.log_float("momentum", self.momentum)
        self.log.log_float("learn-rate", self.learn_rate)
        if validation is not None:
            vs, vc = validation
            self._v_hidden, v_ent, v_err, _ = classify_eval_seq(
                self.cfg, self.params, self._v_hidden,
                jnp.asarray(vs.astype(np.int32))[None],
                jnp.asarray(vc.astype(np.int32))[None])
            r["v_entropy"] = float(v_ent)
            r["v_error"] = float(v_err)
            self.log.log_float("v_entropy", r["v_entropy"])
            self.log.log_float("v_error", r["v_error"])
        if quietness < 1:
            print(" ".join(f"{k} {v:.3f}" for k, v in r.items()), flush=True)
        self.log.flush()
        if self.save_net and self.filename:
            self.save(self.filename)
        return r

    def classify_text(self, symbols: np.ndarray) -> np.ndarray:
        """Per-char class probabilities for a document
        (text-classify-results.c)."""
        hidden = jnp.zeros((1, self.cfg.h_size), jnp.float32)
        dummy = np.zeros(len(symbols), np.int32)
        _, _, _, p = classify_eval_seq(
            self.cfg, self.params, hidden,
            jnp.asarray(symbols.astype(np.int32))[None],
            jnp.asarray(dummy)[None])
        return np.asarray(p[:, 0, :])   # [T, n_classes]

    def save(self, filename: str, backup: bool = True):
        self.net.params = self.params
        self.net.generation = self.generation
        self.net.learn_rate = float(self.learn_rate)
        self.net.min_error_factor = float(self.bptt.min_error_factor[0])
        nn.save_net(self.net, filename, backup=backup)
