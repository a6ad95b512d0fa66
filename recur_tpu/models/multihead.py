"""Multi-head ("multi-softmax") char modelling: one RNN with n_classes
independent softmax heads over the alphabet, used for authorship/language ID
(charmodel-multi-predict.c; the basis of the PAN "caravel" project).

Training semantics (multi_softmax_error, charmodel-multi-predict.c:18-58):
the target class's head always trains; every other head trains with
probability `leakage`.  The reference builds sparse RecurErrorRange lists so
its CPU backward only touches active output spans — on TPU the same thing is
a mask on o_error (inactive heads contribute exactly zero to both ho_delta
and the backpropagated h_error, so masking is semantically identical).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from recur_tpu.nn import BpttState, RnnConfig, RnnParams, RnnState
from recur_tpu.engine import TrainHyper
from recur_tpu.ops.core import (
    advance_history,
    advance_history_factored,
    capped_log2,
    dispatch_calc_deltas,
    forward_step,
)
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.ops.optimizers import apply_learning, momentum_soft_start


class MultiStats(NamedTuple):
    error: jax.Array      # [S] 1 - p_target on the target head
    entropy: jax.Array    # [S] -log2(p_target)


def _softmax_td(logits: jax.Array, td) -> jax.Array:
    """Per-head softmax in the top dtype.  For bf16 the cast happens BEFORE
    the exp so XLA fuses the f32->bf16 convert into the producing matmul's
    epilogue and the whole [S, C, A] elementwise chain reads/writes half
    the bytes; the normalising sum still accumulates f32 (a bf16 sum over
    an alphabet-wide axis loses ~1% which would bias every head)."""
    if td == jnp.float32:
        return jax.nn.softmax(logits, axis=-1)
    z = logits.astype(td)
    e = jnp.exp(z - jnp.max(z, axis=-1, keepdims=True))
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    return e / s.astype(td)


def multihead_train_step(cfg: RnnConfig, hyper: TrainHyper, alphabet_len: int,
                         params: RnnParams, bptt: BpttState, state: RnnState,
                         x_tok, y_tok, target_class, leakage, key,
                         momentum_target, presynaptic_noise):
    """One char step for S streams, each with its own target class.

    x_tok/y_tok/target_class: [S] ints; leakage: scalar probability.
    """
    S = x_tok.shape[0]
    n_classes = cfg.output_size // alphabet_len
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
    nk, lk, ck = jax.random.split(key, 3)
    fwd = forward_step(cfg, params, state.hidden, x,
                       noise_key=nk if hyper.use_noise else None,
                       presynaptic_noise=presynaptic_noise)
    if hyper.bptt_impl == "factored":
        # the multihead input is a one-hot char, so the one-hot-factored
        # ring applies exactly as in the single-head path: ~43% less walk
        # HBM traffic at the caravel shape (i=176 -> W=101 rows + tokens)
        state = advance_history_factored(state, fwd.input_row, x_tok)
    else:
        state = advance_history(state, fwd.input_row)
    state = dataclasses.replace(state, hidden=fwd.hidden)

    # top_dtype=bfloat16 keeps every [S, o_size]-wide tensor (p, o_error)
    # in bf16: at caravel widths the elementwise chain over these tensors
    # is the step's dominant HBM traffic (PERF.md); the backward matmuls
    # still accumulate f32 (_bptt_setup)
    td = jnp.bfloat16 if hyper.top_dtype == "bfloat16" else jnp.float32
    logits = fwd.output[:, :n_classes * alphabet_len].reshape(
        S, n_classes, alphabet_len)
    p = _softmax_td(logits, td)
    onehot = jax.nn.one_hot(y_tok, alphabet_len, dtype=td)
    head_err = onehot[:, None, :] - p                     # [S, C, A]
    is_target = (jnp.arange(n_classes)[None, :] ==
                 target_class[:, None])                   # [S, C]
    leak = jax.random.uniform(lk, (S, n_classes)) < leakage
    active = (is_target | leak).astype(td)
    o_err = head_err * active[:, :, None]
    o_error = jnp.zeros((S, cfg.o_size), td)
    o_error = o_error.at[:, :n_classes * alphabet_len].set(
        o_err.reshape(S, -1))

    # err on the target head at the target char = 1 - p_target.
    # One-hot contraction, not take_along_axis: the TPU lowering of the
    # per-row double gather cost ~230us/char at caravel shapes (measured);
    # the einsum against masks already in hand is ~free.
    p_t = jnp.einsum("sca,sc,sa->s", p, is_target.astype(td), onehot,
                     preferred_element_type=jnp.float32)

    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl, factored_ok=True,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, fwd.bottom_inputs, o_error,
                    bptt.min_error_factor, bptt.learn_rate)

    gen = bptt.generation + 1
    ih_acc = bptt.ih_delta + d.ih_delta
    ho_acc = bptt.ho_delta + d.ho_delta
    apply_now = (gen % hyper.batch_size) == 0 if hyper.batch_size > 1 else True

    def do_apply(args):
        params, bptt = args
        p2, b2 = apply_learning(cfg, params, bptt, ih_acc, ho_acc, None,
                                hyper.learning_style, momentum,
                                hyper.bottom_learn_rate_scale)
        b2 = dataclasses.replace(b2, ih_delta=jnp.zeros_like(ih_acc),
                                 ho_delta=jnp.zeros_like(ho_acc))
        return p2, b2

    if hyper.batch_size > 1:
        def no_apply(args):
            params, bptt = args
            return params, dataclasses.replace(bptt, ih_delta=ih_acc,
                                               ho_delta=ho_acc)
        params, bptt = jax.lax.cond(apply_now, do_apply, no_apply,
                                    (params, bptt))
    else:
        params, bptt = do_apply((params, bptt))
    bptt = dataclasses.replace(bptt, min_error_factor=d.min_error_factor,
                               ih_scale=d.stats["ih_scale"],
                               generation=gen)
    if hyper.condition:
        params, bptt = condition_net(cfg, params, bptt, ck)
    stats = MultiStats(error=1.0 - p_t, entropy=-capped_log2(p_t))
    return params, bptt, state, stats


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4, 5))
def multihead_train_window_chunk(cfg: RnnConfig, hyper: TrainHyper,
                                 alphabet_len: int, params, bptt, state,
                                 tokens, target_class, leakage, key,
                                 momentum_target, presynaptic_noise):
    """multihead training with hyper.batch_size = B > 1 as a scan over
    B-char WINDOWS: a thin forward scan per window, then ONE [S*B]-batched
    backward walk (ops.core.calc_deltas_window) and one weight apply — the
    reference's own diachronic batch cadence
    (charmodel-multi-predict.c:249-262) scheduled TPU-first.  T must be a
    multiple of B (callers chunk accordingly).

    vs the per-char path at batch_size=B: same per-char forward/backward
    math; the apply happens every B chars from the CHUNK START (the
    sequential path follows generation % B), and the adaptive
    min_error_factor composes per window (see calc_deltas_window)."""
    from recur_tpu.ops.core import (calc_deltas_window,
                                    calc_deltas_window_factored)

    B = hyper.batch_size
    S, T1 = tokens.shape
    T = T1 - 1
    assert T % B == 0, f"chunk length {T} not a multiple of batch {B}"
    n_classes = cfg.output_size // alphabet_len
    n_windows = T // B
    depth = cfg.depth
    hdtype = state.history.dtype
    factored = hyper.bptt_impl == "factored"
    W = state.history.shape[2]        # input_offset when factored, else i

    # the ring's last D rows, oldest -> newest (the window buffer's seed)
    ring_idx = (state.head + 1 + jnp.arange(depth)) % depth
    tail0 = jnp.take(state.history, ring_idx, axis=1)   # [S, D, i] or [.., W]
    tok_tail0 = (jnp.take(state.tokens, ring_idx, axis=1)
                 if factored else jnp.zeros((S, depth), jnp.int32))

    xs = jnp.moveaxis(tokens[:, :-1].reshape(S, n_windows, B), 1, 0)
    ys = jnp.moveaxis(tokens[:, 1:].reshape(S, n_windows, B), 1, 0)
    keys = jax.random.split(key, n_windows)

    def window(carry, inp):
        params, bptt, hidden, tail, tok_tail = carry
        xw, yw, k = inp                                     # [S, B]
        nk, lk = jax.random.split(k)
        nkeys = jax.random.split(nk, B)
        leaks = jax.random.split(lk, B)
        momentum = momentum_soft_start(bptt.generation, momentum_target,
                                       hyper.momentum_soft_start)
        mef = bptt.min_error_factor

        # forward + top-layer backprop per char: the [S, o_size] top error
        # is consumed here, inside the scan (window_bptt_setup) — only the
        # small [S, h] errors and [S] thresholds buffer across the window
        def fstep(carry_t, inp_t):
            h, ho_acc = carry_t
            x_tok, y_tok, nk_t, lk_t = inp_t
            x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
            fwd = forward_step(cfg, params, h, x,
                               noise_key=nk_t if hyper.use_noise else None,
                               presynaptic_noise=presynaptic_noise)
            td = (jnp.bfloat16 if hyper.top_dtype == "bfloat16"
                  else jnp.float32)
            logits = fwd.output[:, :n_classes * alphabet_len].reshape(
                S, n_classes, alphabet_len)
            p = _softmax_td(logits, td)
            onehot = jax.nn.one_hot(y_tok, alphabet_len, dtype=td)
            head_err = onehot[:, None, :] - p
            is_target = (jnp.arange(n_classes)[None, :] ==
                         target_class[:, None])
            leak = jax.random.uniform(lk_t, (S, n_classes)) < leakage
            active = (is_target | leak).astype(td)
            o_error = jnp.zeros((S, cfg.o_size), td)
            o_error = o_error.at[:, :n_classes * alphabet_len].set(
                (head_err * active[:, :, None]).reshape(S, -1))
            p_t = jnp.einsum("sca,sc,sa->s", p, is_target.astype(td),
                             onehot, preferred_element_type=jnp.float32)
            from recur_tpu.ops.core import window_bptt_setup
            su, ho_delta = window_bptt_setup(cfg, params, fwd.hidden,
                                             o_error, mef, bptt.learn_rate)
            return (fwd.hidden, ho_acc + ho_delta), (fwd.input_row, su, p_t)

        ho0 = jnp.zeros((cfg.h_size, cfg.o_size), jnp.float32)
        (hidden, ho_delta), (rows_w, su_w, p_t) = jax.lax.scan(
            fstep, (hidden, ho0),
            (jnp.moveaxis(xw, 1, 0), jnp.moveaxis(yw, 1, 0), nkeys, leaks),
            unroll=hyper.unroll)
        # [B, S, *] -> [S, B, *]
        rows_w = jnp.moveaxis(rows_w, 0, 1)
        su_w = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), su_w)
        p_t = jnp.moveaxis(p_t, 0, 1)                       # [S, B]

        if factored:
            # the window buffer holds only the [bias, hidden] section plus
            # token ids — the walk re-reads ~43% fewer bytes per depth step
            rows_full = jnp.concatenate(
                [tail[:, 1:], rows_w[:, :, :W].astype(hdtype)], axis=1)
            toks_full = jnp.concatenate([tok_tail[:, 1:], xw], axis=1)
            d = calc_deltas_window_factored(
                cfg, params, rows_full, toks_full, su_w, mef,
                bptt.learn_rate, walk_unroll=hyper.walk_unroll)
        else:
            toks_full = tok_tail                  # unused, shape-stable
            rows_full = jnp.concatenate(
                [tail[:, 1:], rows_w.astype(hdtype)], axis=1)  # [S,D-1+B,i]
            d = calc_deltas_window(cfg, params, rows_full, su_w,
                                   mef, bptt.learn_rate,
                                   walk_unroll=hyper.walk_unroll)
        # fold in any deltas a preceding per-char piece accumulated toward
        # its next apply (mixing ragged sequential pieces with windowed
        # ones must not strand gradients in the accumulators); zeroed
        # after, so this is a no-op from the second window on
        params, bptt = apply_learning(
            cfg, params, bptt, d.ih_delta + bptt.ih_delta,
            ho_delta + bptt.ho_delta, None, hyper.learning_style,
            momentum, hyper.bottom_learn_rate_scale)
        bptt = dataclasses.replace(bptt,
                                   ih_delta=jnp.zeros_like(bptt.ih_delta),
                                   ho_delta=jnp.zeros_like(bptt.ho_delta),
                                   min_error_factor=d.min_error_factor,
                                   ih_scale=d.stats["ih_scale"],
                                   generation=bptt.generation + B)
        stats = MultiStats(error=jnp.sum(1.0 - p_t),
                           entropy=jnp.sum(-capped_log2(p_t)))
        return (params, bptt, hidden, rows_full[:, -depth:],
                toks_full[:, -depth:]), stats

    carry0 = (params, bptt, state.hidden, tail0, tok_tail0)
    (params, bptt, hidden, tail, tok_tail), stats = jax.lax.scan(
        window, carry0, (xs, ys, keys))
    # rebuild the ring (newest at head = depth-1) so save/reload and the
    # per-char paths stay interoperable
    state = RnnState(hidden=hidden, history=tail,
                     head=jnp.int32(depth - 1),
                     tokens=tok_tail if factored else state.tokens)
    return params, bptt, state, jax.tree.map(jnp.sum, stats)


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4, 5))
def multihead_train_chunk(cfg: RnnConfig, hyper: TrainHyper, alphabet_len: int,
                          params, bptt, state, tokens, target_class,
                          leakage, key, momentum_target, presynaptic_noise):
    """Scan multihead_train_step over a [S, T+1] token block.
    target_class: [S]."""
    S, T1 = tokens.shape
    T = T1 - 1
    xs = jnp.moveaxis(tokens[:, :-1], 1, 0)
    ys = jnp.moveaxis(tokens[:, 1:], 1, 0)
    keys = jax.random.split(key, T)

    def body(carry, inp):
        params, bptt, state = carry
        x_tok, y_tok, k = inp
        params, bptt, state, stats = multihead_train_step(
            cfg, hyper, alphabet_len, params, bptt, state, x_tok, y_tok,
            target_class, leakage, k, momentum_target, presynaptic_noise)
        return (params, bptt, state), jax.tree.map(jnp.sum, stats)

    (params, bptt, state), stats = jax.lax.scan(
        body, (params, bptt, state), (xs, ys, keys),
        unroll=getattr(hyper, "unroll", 1))
    return params, bptt, state, jax.tree.map(jnp.sum, stats)


@partial(jax.jit, static_argnums=(0, 2, 5))
def multihead_spin(cfg: RnnConfig, params: RnnParams, alphabet_len: int,
                   state: RnnState, tokens, use_noise: bool = False,
                   key=None, presynaptic_noise=0.0):
    """rnn_char_multitext_spin (charmodel-multi-predict.c:283-304): run text
    through the net updating state/history without training.  The reference
    forwards with net->presynaptic_noise (one_hot_opinion(net, text[i],
    net->presynaptic_noise)), so spin-through must be as noisy as training
    for the primed state to match."""
    xs = jnp.moveaxis(tokens, 1, 0)
    keys = (jax.random.split(key, xs.shape[0]) if use_noise
            else jnp.zeros((xs.shape[0], 2), jnp.uint32))

    def body(state, inp):
        x_tok, k = inp
        x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, state.hidden, x,
                           noise_key=k if use_noise else None,
                           presynaptic_noise=presynaptic_noise)
        state2 = advance_history(state, fwd.input_row)
        return RnnState(hidden=fwd.hidden, history=state2.history,
                        head=state2.head), None

    state, _ = jax.lax.scan(body, state, (xs, keys))
    return state


@partial(jax.jit, static_argnums=(0, 2, 4))
def multihead_cross_entropy(cfg: RnnConfig, params: RnnParams,
                            alphabet_len: int, tokens, ignore_start: int):
    """rnn_char_multi_cross_entropy (charmodel-multi-predict.c:350-372):
    per-class mean -log2 p(next char).  tokens: [S, T] (S independent
    texts); returns [S, n_classes]."""
    n_classes = cfg.output_size // alphabet_len
    S, T = tokens.shape
    hidden = jnp.zeros((S, cfg.h_size), jnp.float32)
    xs = jnp.moveaxis(tokens[:, :-1], 1, 0)

    def body(h, x_tok):
        x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, h, x)
        return fwd.hidden, fwd.output

    hidden, outs = jax.lax.scan(body, hidden, xs)     # outs [T-1, S, o]
    logits = outs[:, :, :n_classes * alphabet_len].reshape(
        T - 1, S, n_classes, alphabet_len)
    logp2 = jax.nn.log_softmax(logits, axis=-1) / jnp.log(2.0)
    tgt = jnp.moveaxis(tokens[:, 1:], 1, 0)           # [T-1, S]
    oh = jax.nn.one_hot(tgt, alphabet_len, dtype=logp2.dtype)
    p2 = jnp.einsum("tsca,tsa->tsc", logp2, oh)       # [T-1, S, C]
    p2 = jnp.maximum(p2, -100.0)
    mask = (jnp.arange(T - 1) >= ignore_start).astype(jnp.float32)
    ent = -(p2 * mask[:, None, None]).sum(axis=0) / mask.sum()
    return ent


@partial(jax.jit, static_argnums=(0, 2))
def multihead_xe_accumulate(cfg: RnnConfig, params: RnnParams,
                            alphabet_len: int, hidden, tokens, skip):
    """One chunk of the per-class XE sum with a carried hidden state, so a
    long document scores as a few fixed-shape device calls instead of one
    length-shaped program per document (each distinct shape is an XLA
    recompile).  tokens: [S, T]; skip: traced int — predictions with local
    index < skip are ignored (pass ignore_start - chars_already_seen).
    Returns (hidden, -log2 p sums [S, n_classes], counted predictions)."""
    n_classes = cfg.output_size // alphabet_len
    S, T = tokens.shape
    xs = jnp.moveaxis(tokens[:, :-1], 1, 0)

    def body(h, x_tok):
        x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, h, x)
        return fwd.hidden, fwd.output

    hidden, outs = jax.lax.scan(body, hidden, xs)     # [T-1, S, o]
    logits = outs[:, :, :n_classes * alphabet_len].reshape(
        T - 1, S, n_classes, alphabet_len)
    logp2 = jax.nn.log_softmax(logits, axis=-1) / jnp.log(2.0)
    tgt = jnp.moveaxis(tokens[:, 1:], 1, 0)
    oh = jax.nn.one_hot(tgt, alphabet_len, dtype=logp2.dtype)
    p2 = jnp.einsum("tsca,tsa->tsc", logp2, oh)
    p2 = jnp.maximum(p2, -100.0)
    mask = (jnp.arange(T - 1) >= skip).astype(jnp.float32)
    sums = -(p2 * mask[:, None, None]).sum(axis=0)    # [S, C]
    return hidden, sums, mask.sum()


@partial(jax.jit, static_argnums=(0, 2, 3))
def multihead_confab_chunk(cfg: RnnConfig, params: RnnParams,
                           alphabet_len: int, n_chars: int,
                           hidden, last_tok, bias, key):
    """In-graph multi-confab (multi_confab, charmodel-multi-predict.c:
    145-197): stream m samples from head m.  hidden: [C, h_size];
    last_tok: [C].  Returns (hidden, tokens [C, n_chars])."""
    from recur_tpu.ops.core import biased_softmax
    n_classes = cfg.output_size // alphabet_len
    keys = jax.random.split(key, n_chars)
    own_head = jnp.arange(n_classes)

    def body(carry, k):
        hidden, tok = carry
        x = jax.nn.one_hot(tok, cfg.raw_input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, hidden, x)
        logits = fwd.output[:, :n_classes * alphabet_len].reshape(
            n_classes, n_classes, alphabet_len)
        eye = jax.nn.one_hot(own_head, n_classes, dtype=logits.dtype)
        mine = jnp.einsum("cka,ck->ca", logits, eye)   # head m of stream m
        probs = biased_softmax(mine, bias)
        nxt = jnp.where(
            bias >= 100.0, jnp.argmax(mine, axis=-1),
            jax.random.categorical(k, jnp.log(jnp.maximum(probs, 1e-30)),
                                   axis=-1))
        return (fwd.hidden, nxt), nxt

    (hidden, _), toks = jax.lax.scan(body, (hidden, last_tok), keys)
    return hidden, jnp.moveaxis(toks, 0, 1)
