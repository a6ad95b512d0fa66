"""Jitted training engine: compose forward + BPTT + optimizer + conditioning
into a single step, and scan it over time.

This replaces the reference's per-character hot loop (rnn_char_epoch,
charmodel-predict.c:260-405; SURVEY.md §3.1): one traced `step` handles all S
streams at once (the synchronic mini-batch), `lax.scan` runs it over a chunk
of T characters, and the whole chunk is one XLA program — no host round trips
inside the loop.

Learning-rate/momentum/noise are traced scalars inside BpttState, so live
property changes (the reference's GObject set_property path) are plain array
updates, never recompiles.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from recur_tpu.nn import (
    BpttState,
    LearningMethod,
    RnnConfig,
    RnnParams,
    RnnState,
)
from recur_tpu.ops.core import (
    advance_history,
    advance_history_factored,
    capped_log2,
    dispatch_calc_deltas,
    forward_step,
    softmax_best_guess_error,
)
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.ops.optimizers import apply_learning, momentum_soft_start


class StepStats(NamedTuple):
    error: jax.Array       # [S] training error (1 - p_target)
    entropy: jax.Array     # [S] -log2 p_target contribution
    correct: jax.Array     # [S] winner == target
    depth: jax.Array       # [S] effective BPTT depth used
    ih_scale: jax.Array    # [S]
    top_error: jax.Array   # [S]
    bptt_error: jax.Array  # [S] error sum where the BPTT walk stopped


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """Static training options (hashable; part of the jit key)."""
    learning_style: LearningMethod = LearningMethod.MOMENTUM_WEIGHTED
    momentum_soft_start: float = 0.0
    batch_size: int = 1          # diachronic gradient accumulation period
    use_noise: bool = False      # presynaptic noise on/off (static)
    bottom_learn_rate_scale: float = 1.0
    # whether to run the conditioning cycle each step.  The reference's
    # multi-tap char path skips it (charmodel-predict.c:288-312); the
    # single-tap path (rnn_bptt_calculate) and gstclassify run it.
    condition: bool = True
    # unroll factor for the BPTT backward walk's depth scan.  Each walk
    # step is a small [S, h] x [h, i] matmul whose runtime is dominated by
    # fixed per-op overhead at small hidden sizes (the caravel h=100 shape
    # spends most of its step in the 50 sequential micro-matmuls);
    # unrolling amortises the scan machinery without changing any math.
    walk_unroll: int = 1
    # dtype for the BPTT history ring and error trajectory.  The backward
    # walk re-reads the whole ring every step, so at large stream counts
    # training is HBM-bound on it; bf16 halves that traffic.  f32 is exact
    # reference parity.
    history_dtype: str = "float32"
    # BPTT gradient formulation: "buffered" (one walk + one big einsum over
    # an [S, depth, h] error-trajectory buffer — the throughput champion),
    # "twopass" (replay the walk, accumulating per-step outer products —
    # less HBM at ~1.5x the matvecs; measures ~2.2x slower on the chip), or
    # "factored" (char models only: the ring stores [bias, hidden] + token
    # ids instead of the dense row — ~18% less ring state, vocab gradient
    # via one-hot einsums; ~80% of buffered's throughput).  All agree to
    # f32 tolerance.  See ops/core.py calc_deltas{,_twopass,_factored}.
    bptt_impl: str = "buffered"
    # lax.scan unroll factor for the per-step training scans: >1 merges k
    # steps into one loop iteration, amortising the ~100µs/iteration floor
    # of the tunneled chip (CLAUDE.md) at the cost of compile time.  The
    # math is identical (unrolling is pure inlining).
    unroll: int = 1
    # dtype for the top-layer error tensors (softmax probabilities and
    # o_error).  At multihead widths (caravel o=3652) the per-char
    # elementwise chain over [S, o_size] tensors is the dominant HBM
    # traffic; bf16 halves it (the backward matmuls still accumulate f32).
    # f32 is exact reference parity.  Only the multihead path honours this.
    top_dtype: str = "float32"


def _char_step_forward(cfg: RnnConfig, hyper: TrainHyper,
                       params: RnnParams, state: RnnState,
                       x_tok: jax.Array, key: jax.Array,
                       presynaptic_noise: jax.Array):
    """Shared head of the per-char training step: one-hot, forward, ring
    advance.  Returns (fwd, state, x, conditioning_key)."""
    x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
    nk, ck = jax.random.split(key)
    fwd = forward_step(cfg, params, state.hidden, x,
                       noise_key=nk if hyper.use_noise else None,
                       presynaptic_noise=presynaptic_noise)
    if hyper.bptt_impl == "factored":
        state = advance_history_factored(state, fwd.input_row, x_tok)
    else:
        state = advance_history(state, fwd.input_row)
    state = dataclasses.replace(state, hidden=fwd.hidden)
    return fwd, state, x, ck


def char_train_step(cfg: RnnConfig, hyper: TrainHyper,
                    params: RnnParams, bptt: BpttState, state: RnnState,
                    x_tok: jax.Array, y_tok: jax.Array, key: jax.Array,
                    momentum_target: jax.Array, presynaptic_noise: jax.Array,
                    ):
    """One character across S streams: forward, error, BPTT, weight update.

    Equivalent to the multi-tap inner loop of rnn_char_epoch
    (charmodel-predict.c:288-312) with rnn_apply_learning once per step.
    """
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    fwd, state, _, ck = _char_step_forward(cfg, hyper, params, state, x_tok,
                                           key, presynaptic_noise)
    o_error, winner, p_target = softmax_best_guess_error(
        fwd.output[:, :cfg.output_size], y_tok)
    params, bptt, d = _char_step_apply(cfg, hyper, params, bptt, state, fwd,
                                       o_error, ck, momentum)
    stats = StepStats(
        error=1.0 - p_target,
        entropy=-capped_log2(p_target),
        correct=(winner == y_tok).astype(jnp.float32),
        depth=d.stats["depth"],
        ih_scale=d.stats["ih_scale"],
        top_error=d.stats["top_error_scaled"],
        bptt_error=d.stats["error_sum"],
    )
    return params, bptt, state, stats


def _char_step_apply(cfg: RnnConfig, hyper: TrainHyper, params: RnnParams,
                     bptt: BpttState, state: RnnState, fwd, o_error,
                     ck: jax.Array, momentum: jax.Array):
    """Shared tail of the per-char training step: BPTT deltas, diachronic
    accumulation, apply, conditioning.  o_error: [S, output_size] (the
    negative XE gradient); padded to o_size here."""
    o_error = jnp.pad(o_error, ((0, 0), (0, cfg.o_size - cfg.output_size)))

    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl, factored_ok=True,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, fwd.bottom_inputs, o_error,
                  bptt.min_error_factor, bptt.learn_rate)

    gen = bptt.generation + 1
    if hyper.batch_size > 1:
        # diachronic accumulation (recur-nn.c:980-997)
        ih_acc = bptt.ih_delta + d.ih_delta
        ho_acc = bptt.ho_delta + d.ho_delta
        b_acc = (bptt.bottom_delta + d.bottom_delta
                 if d.bottom_delta is not None else bptt.bottom_delta)
        apply_now = (gen % hyper.batch_size) == 0

        def do_apply(args):
            params, bptt = args
            p2, b2 = apply_learning(cfg, params, bptt, ih_acc, ho_acc, b_acc,
                                    hyper.learning_style, momentum,
                                    hyper.bottom_learn_rate_scale)
            b2 = dataclasses.replace(
                b2, ih_delta=jnp.zeros_like(ih_acc),
                ho_delta=jnp.zeros_like(ho_acc),
                bottom_delta=(jnp.zeros_like(b_acc)
                              if b_acc is not None else None))
            return p2, b2

        def no_apply(args):
            params, bptt = args
            b2 = dataclasses.replace(
                bptt, ih_delta=ih_acc, ho_delta=ho_acc, bottom_delta=b_acc)
            return params, b2

        params, bptt = jax.lax.cond(apply_now, do_apply, no_apply,
                                    (params, bptt))
    else:
        params, bptt = apply_learning(cfg, params, bptt, d.ih_delta,
                                      d.ho_delta, d.bottom_delta,
                                      hyper.learning_style, momentum,
                                      hyper.bottom_learn_rate_scale)
    bptt = dataclasses.replace(bptt, min_error_factor=d.min_error_factor,
                               ih_scale=d.stats["ih_scale"],
                               generation=gen)
    if hyper.condition:
        params, bptt = condition_net(cfg, params, bptt, ck)
    return params, bptt, d


def _char_chunk_scan(cfg, hyper, params, bptt, state, xs, ys, key,
                     momentum_target, presynaptic_noise):
    """Shared body: scan char_train_step over time-major xs/ys [T, S]."""
    keys = jax.random.split(key, xs.shape[0])

    def body(carry, inp):
        params, bptt, state = carry
        x_tok, y_tok, k = inp
        params, bptt, state, stats = char_train_step(
            cfg, hyper, params, bptt, state, x_tok, y_tok, k,
            momentum_target, presynaptic_noise)
        summed = jax.tree.map(jnp.sum, stats)
        return (params, bptt, state), summed

    (params, bptt, state), stats = jax.lax.scan(
        body, (params, bptt, state), (xs, ys, keys),
        unroll=getattr(hyper, "unroll", 1))
    totals = jax.tree.map(jnp.sum, stats)
    return params, bptt, state, totals


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def char_train_chunk(cfg: RnnConfig, hyper: TrainHyper,
                     params: RnnParams, bptt: BpttState, state: RnnState,
                     tokens: jax.Array, key: jax.Array,
                     momentum_target: jax.Array,
                     presynaptic_noise: jax.Array):
    """Train on a [S, T+1] token block: scan char_train_step over T steps.

    tokens[s, t] is input at step t; tokens[s, t+1] is its target.
    Returns (params, bptt, state, summed_stats) — stats are summed over steps
    and streams, ready for the report-interval accumulators.
    """
    xs = jnp.moveaxis(tokens[:, :-1], 1, 0)   # [T, S]
    ys = jnp.moveaxis(tokens[:, 1:], 1, 0)
    return _char_chunk_scan(cfg, hyper, params, bptt, state, xs, ys, key,
                            momentum_target, presynaptic_noise)


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def char_train_chunk_xy(cfg: RnnConfig, hyper: TrainHyper,
                        params: RnnParams, bptt: BpttState, state: RnnState,
                        xs_tokens: jax.Array, ys_tokens: jax.Array,
                        key: jax.Array, momentum_target: jax.Array,
                        presynaptic_noise: jax.Array):
    """char_train_chunk with separate input/target blocks [S, T].

    Needed where targets are not simply the next input: the multi-tap epoch
    wraps each stream's READ offset at len-1 but still targets the true
    next character text[offset+1] (charmodel-predict.c:295-301), so at the
    wrap the pair is (text[len-2] -> text[len-1]) while the next input
    restarts at text[0]."""
    xs = jnp.moveaxis(xs_tokens, 1, 0)   # [T, S]
    ys = jnp.moveaxis(ys_tokens, 1, 0)
    return _char_chunk_scan(cfg, hyper, params, bptt, state, xs, ys, key,
                            momentum_target, presynaptic_noise)


# ----------------------------------------------------------------------------
# ensemble distillation (beyond the reference): train a student on soft
# targets from frozen teacher nets running in the same jitted scan
# ----------------------------------------------------------------------------

def char_distill_step(cfg: RnnConfig, hyper: TrainHyper, tcfgs,
                      params: RnnParams, bptt: BpttState, state: RnnState,
                      t_hiddens, t_params, x_tok: jax.Array, y_tok: jax.Array,
                      key: jax.Array, momentum_target: jax.Array,
                      presynaptic_noise: jax.Array, alpha: jax.Array,
                      temp: jax.Array):
    """char_train_step with the error blended toward an in-graph teacher
    ensemble's predictive mixture (knowledge distillation, Hinton et al.
    2015).  Teachers are frozen: each runs one clean forward per char on the
    same one-hot input, carrying its own hidden state [S, h_k]; the target
    becomes (1-alpha)*onehot(y) + alpha*mean_k softmax(logits_k / temp).
    alpha=0 reproduces char_train_step bit-for-bit (same key splits), and
    the shared tail (_char_step_apply) keeps diachronic batch accumulation,
    conditioning and the adaptive-min-error bookkeeping identical.

    The teacher forwards add ~2K matmuls per char next to the walk's
    depth*1; at flagship shapes a 6-teacher distillation costs ~40% extra
    FLOPs.  Stats keep their hard-label meaning (p_target, winner vs y)."""
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    fwd, state, x, ck = _char_step_forward(cfg, hyper, params, state, x_tok,
                                           key, presynaptic_noise)
    o_error, winner, p_target = softmax_best_guess_error(
        fwd.output[:, :cfg.output_size], y_tok)
    # teacher mixture over the student's (shared-alphabet) output slots
    new_th = []
    q_sum = jnp.zeros_like(o_error)
    for tcfg, tp, th in zip(tcfgs, t_params, t_hiddens):
        tf = forward_step(tcfg, tp, th, x)
        new_th.append(tf.hidden)
        q_sum = q_sum + jax.nn.softmax(
            tf.output[:, :cfg.output_size] / temp, axis=-1)
    q_mix = q_sum / len(tcfgs)
    onehot = jax.nn.one_hot(y_tok, cfg.output_size, dtype=o_error.dtype)
    # o_error is onehot - p (the negative XE gradient, ops/core.py:93-109);
    # blending the target toward q_mix adds alpha * (q_mix - onehot)
    o_error = o_error + alpha * (q_mix - onehot)
    params, bptt, d = _char_step_apply(cfg, hyper, params, bptt, state, fwd,
                                       o_error, ck, momentum)
    stats = StepStats(
        error=1.0 - p_target,
        entropy=-capped_log2(p_target),
        correct=(winner == y_tok).astype(jnp.float32),
        depth=d.stats["depth"],
        ih_scale=d.stats["ih_scale"],
        top_error=d.stats["top_error_scaled"],
        bptt_error=d.stats["error_sum"],
    )
    return params, bptt, state, tuple(new_th), stats


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4, 5, 6))
def char_distill_chunk_xy(cfg: RnnConfig, hyper: TrainHyper, tcfgs,
                          params: RnnParams, bptt: BpttState,
                          state: RnnState, t_hiddens, t_params,
                          xs_tokens: jax.Array, ys_tokens: jax.Array,
                          key: jax.Array, momentum_target: jax.Array,
                          presynaptic_noise: jax.Array, alpha: jax.Array,
                          temp: jax.Array):
    """char_train_chunk_xy with in-graph teacher soft targets.  t_hiddens is
    a tuple of [S, h_k] carried teacher states (donated); t_params a tuple of
    frozen teacher RnnParams."""
    xs = jnp.moveaxis(xs_tokens, 1, 0)   # [T, S]
    ys = jnp.moveaxis(ys_tokens, 1, 0)
    keys = jax.random.split(key, xs.shape[0])

    def body(carry, inp):
        params, bptt, state, th = carry
        x_tok, y_tok, k = inp
        params, bptt, state, th, stats = char_distill_step(
            cfg, hyper, tcfgs, params, bptt, state, th, t_params,
            x_tok, y_tok, k, momentum_target, presynaptic_noise, alpha, temp)
        return (params, bptt, state, th), jax.tree.map(jnp.sum, stats)

    (params, bptt, state, t_hiddens), stats = jax.lax.scan(
        body, (params, bptt, state, t_hiddens), (xs, ys, keys),
        unroll=getattr(hyper, "unroll", 1))
    totals = jax.tree.map(jnp.sum, stats)
    return params, bptt, state, t_hiddens, totals


def _char_window_scan(cfg, hyper, params, bptt, state, xs, ys, key,
                      momentum_target, presynaptic_noise):
    """Windowed diachronic-batch training: scan over batch_size-char
    windows, each = a thin forward scan + ONE [S*batch]-batched backward
    walk + one weight apply (ops.core.calc_deltas_window) — the reference's
    --batch-size cadence (recur-nn.c:980-997) scheduled TPU-first.  The
    per-char serial chain shrinks to just the forward recurrence; the walk
    and the optimizer amortise over the window.

    xs/ys: [T, S] time-major; T must be a multiple of hyper.batch_size.
    Same per-char math as the sequential path at equal batch_size; the
    apply cadence counts from the chunk start, and the adaptive min-error
    floor composes per window (calc_deltas_window's documented deviation).
    """
    from recur_tpu.ops.core import calc_deltas_window

    B = hyper.batch_size
    T, S = xs.shape
    assert T % B == 0, f"chunk length {T} not a multiple of batch {B}"
    assert not cfg.has_bottom, "windowed batch: bottom layer unsupported"
    depth = cfg.depth
    hdtype = state.history.dtype
    ring_idx = (state.head + 1 + jnp.arange(depth)) % depth
    tail0 = jnp.take(state.history, ring_idx, axis=1)        # [S, D, i]
    xw_all = xs.reshape(T // B, B, S)
    yw_all = ys.reshape(T // B, B, S)
    keys = jax.random.split(key, T // B)

    def window(carry, inp):
        params, bptt, hidden, tail = carry
        xw, yw, k = inp                                      # [B, S]
        nkeys = jax.random.split(k, B)
        momentum = momentum_soft_start(bptt.generation, momentum_target,
                                       hyper.momentum_soft_start)
        mef = bptt.min_error_factor

        # forward + top-layer backprop per char (window_bptt_setup): only
        # [S, h] errors and [S] thresholds buffer across the window
        def fstep(carry_t, inp_t):
            h, ho_acc = carry_t
            x_tok, y_tok, nk_t = inp_t
            x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
            fwd = forward_step(cfg, params, h, x,
                               noise_key=nk_t if hyper.use_noise else None,
                               presynaptic_noise=presynaptic_noise)
            o_error, winner, p_target = softmax_best_guess_error(
                fwd.output[:, :cfg.output_size], y_tok)
            o_error = jnp.pad(
                o_error, ((0, 0), (0, cfg.o_size - cfg.output_size)))
            from recur_tpu.ops.core import window_bptt_setup
            su, ho_delta = window_bptt_setup(cfg, params, fwd.hidden,
                                             o_error, mef, bptt.learn_rate)
            return (fwd.hidden, ho_acc + ho_delta), (
                fwd.input_row, su, winner, p_target)

        ho0 = jnp.zeros((cfg.h_size, cfg.o_size), jnp.float32)
        (hidden, ho_delta), (rows_w, su_w, winners, p_target) = jax.lax.scan(
            fstep, (hidden, ho0), (xw, yw, nkeys), unroll=hyper.unroll)
        su_w = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), su_w)

        rows_full = jnp.concatenate(
            [tail[:, 1:], jnp.moveaxis(rows_w, 0, 1).astype(hdtype)], axis=1)
        d = calc_deltas_window(
            cfg, params, rows_full, su_w, mef,
            bptt.learn_rate, walk_unroll=hyper.walk_unroll)
        # fold in deltas a preceding ragged per-char piece accumulated
        # (zeroed after: no-op from the second window on)
        params, bptt = apply_learning(
            cfg, params, bptt, d.ih_delta + bptt.ih_delta,
            ho_delta + bptt.ho_delta, None,
            hyper.learning_style, momentum,
            hyper.bottom_learn_rate_scale)
        bptt = dataclasses.replace(bptt,
                                   ih_delta=jnp.zeros_like(bptt.ih_delta),
                                   ho_delta=jnp.zeros_like(bptt.ho_delta),
                                   min_error_factor=d.min_error_factor,
                                   ih_scale=d.stats["ih_scale"],
                                   generation=bptt.generation + B)
        stats = StepStats(
            error=jnp.sum(1.0 - p_target),
            entropy=jnp.sum(-capped_log2(p_target)),
            correct=jnp.sum((winners == yw).astype(jnp.float32)),
            depth=jnp.sum(d.stats["depth"]),
            ih_scale=jnp.sum(d.stats["ih_scale_sum"]),
            top_error=jnp.sum(d.stats["top_error_scaled"]),
            bptt_error=jnp.sum(d.stats["error_sum"]),
        )
        return (params, bptt, hidden, rows_full[:, -depth:]), stats

    carry0 = (params, bptt, state.hidden, tail0)
    (params, bptt, hidden, tail), stats = jax.lax.scan(
        window, carry0, (xw_all, yw_all, keys))
    # rebuild the ring (newest at head = depth-1) for interoperability with
    # the per-char paths and checkpointing
    state = dataclasses.replace(state, hidden=hidden, history=tail,
                                head=jnp.int32(depth - 1))
    totals = jax.tree.map(jnp.sum, stats)
    return params, bptt, state, totals


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def char_train_window_chunk_xy(cfg: RnnConfig, hyper: TrainHyper,
                               params: RnnParams, bptt: BpttState,
                               state: RnnState, xs_tokens: jax.Array,
                               ys_tokens: jax.Array, key: jax.Array,
                               momentum_target: jax.Array,
                               presynaptic_noise: jax.Array):
    """char_train_chunk_xy with the windowed batch_size formulation."""
    xs = jnp.moveaxis(xs_tokens, 1, 0)
    ys = jnp.moveaxis(ys_tokens, 1, 0)
    return _char_window_scan(cfg, hyper, params, bptt, state, xs, ys, key,
                             momentum_target, presynaptic_noise)


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def char_train_window_chunk(cfg: RnnConfig, hyper: TrainHyper,
                            params: RnnParams, bptt: BpttState,
                            state: RnnState, tokens: jax.Array,
                            key: jax.Array, momentum_target: jax.Array,
                            presynaptic_noise: jax.Array):
    """char_train_chunk with the windowed batch_size formulation."""
    xs = jnp.moveaxis(tokens[:, :-1], 1, 0)
    ys = jnp.moveaxis(tokens[:, 1:], 1, 0)
    return _char_window_scan(cfg, hyper, params, bptt, state, xs, ys, key,
                             momentum_target, presynaptic_noise)


@partial(jax.jit, static_argnums=(0,))
def char_forward_seq(cfg: RnnConfig, params: RnnParams, hidden: jax.Array,
                     tokens: jax.Array):
    """Stateless forward over a token sequence (no training): returns final
    hidden and all output logits.  hidden: [S, h_size]; tokens: [S, T]."""
    xs = jnp.moveaxis(tokens, 1, 0)

    def body(h, x_tok):
        x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, h, x)
        return fwd.hidden, fwd.output

    hidden, outs = jax.lax.scan(body, hidden, xs)
    return hidden, jnp.moveaxis(outs, 0, 1)   # [S, T, o_size]


@partial(jax.jit, static_argnums=(0,))
def char_cross_entropy_seq(cfg: RnnConfig, params: RnnParams,
                           hidden: jax.Array, tokens: jax.Array,
                           skip: int):
    """get_cross_entropy (charmodel-predict.c:62-80): mean -log2 p(next char)
    over a sequence, skipping the first `skip` predictions.  tokens: [S, T]."""
    S, T = tokens.shape
    hidden, outs = char_forward_seq(cfg, params, hidden, tokens[:, :-1])
    logits = outs[:, :, :cfg.output_size]
    logp2 = jax.nn.log_softmax(logits, axis=-1) / jnp.log(2.0)
    tgt = tokens[:, 1:]
    oh = jax.nn.one_hot(tgt, cfg.output_size, dtype=logp2.dtype)
    p2 = jnp.sum(logp2 * oh, axis=-1)
    p2 = jnp.maximum(p2, -100.0)
    mask = (jnp.arange(T - 1) >= skip).astype(jnp.float32)
    ent = -(p2 * mask).sum(axis=1) / mask.sum()
    return hidden, ent


# ----------------------------------------------------------------------------
# generic dense-feature trainer (the rnnumpy / audio-classify style step)
# ----------------------------------------------------------------------------

class DenseStats(NamedTuple):
    error: jax.Array      # [S] Σ error at nonzero-target outputs
    accuracy: jax.Array   # [S] count of |error|<0.5 at nonzero targets
    trained: jax.Array    # [S] whether this row trained


def dense_train_step(cfg: RnnConfig, hyper: TrainHyper,
                     params: RnnParams, bptt: BpttState, state: RnnState,
                     x, target, train_mask, key, momentum_target,
                     presynaptic_noise):
    """One row of dense features across S streams (py-recur-numpy.c:396-455
    semantics: error = target - softmax(out), masked rows forward without
    training).  x: [S, input_size] (or bottom_input_size); target:
    [S, output_size]; train_mask: [S] float 0/1."""
    import dataclasses as _dc
    S = x.shape[0]
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    nk, ck = jax.random.split(key)
    fwd = forward_step(cfg, params, state.hidden, x,
                       noise_key=nk if hyper.use_noise else None,
                       presynaptic_noise=presynaptic_noise)
    state = advance_history(state, fwd.input_row)
    state = dataclasses.replace(state, hidden=fwd.hidden)

    logits = fwd.output[:, :cfg.output_size]
    p = jax.nn.softmax(logits, axis=-1)
    err = (target - p) * train_mask[:, None]
    o_error = jnp.zeros((S, cfg.o_size), jnp.float32)
    o_error = o_error.at[:, :cfg.output_size].set(err)

    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, fwd.bottom_inputs, o_error,
                  bptt.min_error_factor, bptt.learn_rate)

    gen = bptt.generation + 1
    if hyper.batch_size > 1:
        ih_acc = bptt.ih_delta + d.ih_delta
        ho_acc = bptt.ho_delta + d.ho_delta
        b_acc = (bptt.bottom_delta + d.bottom_delta
                 if d.bottom_delta is not None else bptt.bottom_delta)
        apply_now = (gen % hyper.batch_size) == 0

        def do_apply(args):
            params, bptt = args
            p2, b2 = apply_learning(cfg, params, bptt, ih_acc, ho_acc, b_acc,
                                    hyper.learning_style, momentum,
                                    hyper.bottom_learn_rate_scale)
            b2 = _dc.replace(
                b2, ih_delta=jnp.zeros_like(ih_acc),
                ho_delta=jnp.zeros_like(ho_acc),
                bottom_delta=(jnp.zeros_like(b_acc)
                              if b_acc is not None else None))
            return p2, b2

        def no_apply(args):
            params, bptt = args
            return params, _dc.replace(bptt, ih_delta=ih_acc,
                                       ho_delta=ho_acc, bottom_delta=b_acc)

        params, bptt = jax.lax.cond(apply_now, do_apply, no_apply,
                                    (params, bptt))
    else:
        params, bptt = apply_learning(cfg, params, bptt, d.ih_delta,
                                      d.ho_delta, d.bottom_delta,
                                      hyper.learning_style, momentum,
                                      hyper.bottom_learn_rate_scale)
    # masked rows skip calc_deltas in the reference (py-recur-numpy.c
    # balance `continue`), so their adaptive min_error_factor must hold —
    # a zero-error walk would otherwise erode it every masked row
    bptt = dataclasses.replace(
        bptt,
        min_error_factor=jnp.where(train_mask > 0.0, d.min_error_factor,
                                   bptt.min_error_factor),
        ih_scale=d.stats["ih_scale"],
        generation=gen)
    if hyper.condition:
        params, bptt = condition_net(cfg, params, bptt, ck)

    live = (target != 0.0).astype(jnp.float32)
    stats = DenseStats(
        error=jnp.sum(err * live, axis=1),
        accuracy=jnp.sum((jnp.abs(err) < 0.5) * live, axis=1) * train_mask,
        trained=train_mask)
    return params, bptt, state, stats


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def dense_train_chunk(cfg: RnnConfig, hyper: TrainHyper,
                      params, bptt, state, features, targets, train_mask,
                      key, momentum_target, presynaptic_noise):
    """Scan dense_train_step over time.  features: [S, T, in]; targets:
    [S, T, out]; train_mask: [S, T]."""
    S, T = features.shape[:2]
    xs = jnp.moveaxis(features, 1, 0)
    ts = jnp.moveaxis(targets, 1, 0)
    ms = jnp.moveaxis(train_mask, 1, 0)
    keys = jax.random.split(key, T)

    def body(carry, inp):
        params, bptt, state = carry
        x, t, m, k = inp
        params, bptt, state, stats = dense_train_step(
            cfg, hyper, params, bptt, state, x, t, m, k, momentum_target,
            presynaptic_noise)
        return (params, bptt, state), jax.tree.map(jnp.sum, stats)

    (params, bptt, state), stats = jax.lax.scan(
        body, (params, bptt, state), (xs, ts, ms, keys),
        unroll=getattr(hyper, "unroll", 1))
    return params, bptt, state, jax.tree.map(jnp.sum, stats)


@partial(jax.jit, static_argnums=(0, 3))
def dense_forward_seq(cfg: RnnConfig, params: RnnParams, hidden, use_noise,
                      features, key, presynaptic_noise):
    """Stateful forward over dense rows; returns (hidden, softmax probs
    [S, T, output_size]) — Net_classify (py-recur-numpy.c:498-545)."""
    xs = jnp.moveaxis(features, 1, 0)
    T = xs.shape[0]
    keys = jax.random.split(key, T)

    def body(h, inp):
        x, k = inp
        fwd = forward_step(cfg, params, h, x,
                           noise_key=k if use_noise else None,
                           presynaptic_noise=presynaptic_noise)
        return fwd.hidden, jax.nn.softmax(fwd.output[:, :cfg.output_size],
                                          axis=-1)

    hidden, probs = jax.lax.scan(body, hidden, (xs, keys))
    return hidden, jnp.moveaxis(probs, 0, 1)


@partial(jax.jit, static_argnums=(0, 3))
def char_confab_chunk(cfg: RnnConfig, params: RnnParams, hidden, n_chars: int,
                      start_tok, bias, key):
    """In-graph confabulation: sample n_chars tokens per stream in ONE device
    call (the host-looped guess_next_character costs a device round trip per
    character).  Sampling uses biased_softmax + categorical draw — same
    distribution as the reference's rand_double scan, different RNG.

    hidden: [S, h_size]; start_tok: [S] int.  Returns (hidden, tokens [S, n]).
    """
    from recur_tpu.ops.core import biased_softmax as _bs

    keys = jax.random.split(key, n_chars)

    def body(carry, k):
        hidden, tok = carry
        x = jax.nn.one_hot(tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, hidden, x)
        logits = fwd.output[:, :cfg.output_size]
        probs = _bs(logits, bias)
        nxt = jnp.where(
            bias >= 100.0,
            jnp.argmax(logits, axis=-1),
            jax.random.categorical(k, jnp.log(jnp.maximum(probs, 1e-30)),
                                   axis=-1))
        return (fwd.hidden, nxt), nxt

    (hidden, _), toks = jax.lax.scan(body, (hidden, start_tok), keys)
    return hidden, jnp.moveaxis(toks, 0, 1)
