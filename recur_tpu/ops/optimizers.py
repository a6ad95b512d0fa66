"""The reference's seven learning methods (rnn_apply_learning,
recur-nn.c:452-678), as pure elementwise updates on weight pytrees.

All methods update (weights, momentum, aux) from an accumulated delta.  Note
recur's sign convention: delta is the *negative* gradient (top error is
onehot - softmax), so every method ADDS its step.

The ho matrix learns at rate*ho_scale, ih at rate, bottom at
rate*learn_rate_scale (recur-nn.c:601-678).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from recur_tpu.nn import BpttState, LearningMethod, RnnConfig, RnnParams


class MatUpdate(NamedTuple):
    weights: jax.Array
    momentum: jax.Array
    aux: Optional[jax.Array]


def momentum_soft_start(generation, max_momentum, soft_start):
    """rnn_calculate_momentum_soft_start (recur-nn.c:595-599)."""
    g = generation.astype(jnp.float32) if hasattr(generation, "astype") else float(generation)
    return jnp.minimum(max_momentum, 1.0 - soft_start / (1.0 + g + 2.0 * soft_start))


def _weighted(w, d, m, aux, rate, momentum, momentum_weight):
    """apply_learning_with_momentum (recur-nn.c:455-489)."""
    t = d * rate
    w = w + t + m * momentum_weight
    m = (m + t) * momentum
    return MatUpdate(w, m, aux)


def _nesterov(w, d, m, aux, rate, momentum, _mw):
    """apply_learning_with_nesterov_momentum (recur-nn.c:494-509)."""
    t = d * rate
    w = w + t
    m = (m + t) * momentum
    w = w + m
    return MatUpdate(w, m, aux)


def _adagrad(w, d, m, aux, rate, _momentum, _mw):
    """apply_adagrad_learning (recur-nn.c:511-525).  m is the accumulator
    (kept in the momentum slot, as the reference does).  Guard a==0 so the
    method works even without the reference's nonzero "ballast" init."""
    a = m + d * d
    step = jnp.where(a > 0.0, d * rate / jnp.sqrt(jnp.maximum(a, 1e-38)), 0.0)
    return MatUpdate(w + step, a, aux)


def _adadelta(w, d, m, aux, rate, decay, _mw):
    """apply_adadelta_learning (recur-nn.c:527-558) — the reference's
    abs-value variant with `rate` as the epsilon-like renewal floor."""
    renewal = 1.0 - decay
    g = m * decay + jnp.abs(d) * renewal + rate
    step = aux * decay / g * d
    s = aux * decay + jnp.abs(step) * renewal + rate
    return MatUpdate(w + step, g, s)


def _rprop(w, d, m, aux, rate, _decay, _mw):
    """apply_rprop_learning (recur-nn.c:560-593).  m holds prev gradient,
    aux holds prev step size."""
    shrink, grow = 0.5, 1.2
    max_step = 1.0 * rate
    min_step = 1e-6 * rate
    agree = d * m
    step = jnp.where(agree > 0.0, jnp.minimum(aux * grow, max_step),
                     jnp.where(agree < 0.0, jnp.maximum(aux * shrink, min_step),
                               aux))
    d_eff = jnp.where(agree < 0.0, 0.0, d)
    w = jnp.where(d_eff > 0.0, w + step, w - step)
    return MatUpdate(w, d_eff, step)


def _update_mat(method: LearningMethod, w, d, m, aux, rate, momentum,
                momentum_weight):
    if method == LearningMethod.MOMENTUM_NESTEROV:
        return _nesterov(w, d, m, aux, rate, momentum, momentum_weight)
    if method == LearningMethod.ADAGRAD:
        return _adagrad(w, d, m, aux, rate, momentum, momentum_weight)
    if method == LearningMethod.ADADELTA:
        return _adadelta(w, d, m, aux, rate, momentum, momentum_weight)
    if method == LearningMethod.RPROP:
        return _rprop(w, d, m, aux, rate, momentum, momentum_weight)
    if method == LearningMethod.MOMENTUM_SIMPLIFIED_NESTEROV:
        mw = momentum / (1.0 + momentum)
    elif method == LearningMethod.MOMENTUM_CLASSICAL:
        mw = 1.0
    else:  # MOMENTUM_WEIGHTED
        mw = momentum_weight
    return _weighted(w, d, m, aux, rate, momentum, mw)


def apply_learning(cfg: RnnConfig, params: RnnParams, bptt: BpttState,
                   ih_delta, ho_delta, bottom_delta,
                   method: LearningMethod, momentum,
                   bottom_learn_rate_scale: float = 1.0
                   ) -> tuple[RnnParams, BpttState]:
    """rnn_apply_learning (recur-nn.c:601-678): one weight update from the
    accumulated (stream-summed) deltas.  `method` is static."""
    method = LearningMethod(method)
    rate = bptt.learn_rate
    up_ho = _update_mat(method, params.ho, ho_delta, bptt.ho_momentum,
                        bptt.ho_aux, rate * bptt.ho_scale, momentum,
                        bptt.momentum_weight)
    up_ih = _update_mat(method, params.ih, ih_delta, bptt.ih_momentum,
                        bptt.ih_aux, rate, momentum, bptt.momentum_weight)
    new_params = RnnParams(ih=up_ih.weights, ho=up_ho.weights,
                           bottom=params.bottom)
    new_bptt = BpttState(
        ih_momentum=up_ih.momentum, ho_momentum=up_ho.momentum,
        ih_aux=up_ih.aux, ho_aux=up_ho.aux,
        bottom_momentum=bptt.bottom_momentum, bottom_aux=bptt.bottom_aux,
        learn_rate=bptt.learn_rate, ho_scale=bptt.ho_scale,
        momentum=bptt.momentum, momentum_weight=bptt.momentum_weight,
        min_error_factor=bptt.min_error_factor, ih_scale=bptt.ih_scale,
        generation=bptt.generation,
        ih_delta=bptt.ih_delta, ho_delta=bptt.ho_delta,
        bottom_delta=bptt.bottom_delta)
    if cfg.has_bottom and bottom_delta is not None and params.bottom is not None:
        up_b = _update_mat(method, params.bottom, bottom_delta,
                           bptt.bottom_momentum, bptt.bottom_aux,
                           rate * bottom_learn_rate_scale, momentum,
                           bptt.momentum_weight)
        new_params.bottom = up_b.weights
        new_bptt.bottom_momentum = up_b.momentum
        new_bptt.bottom_aux = up_b.aux
    return new_params, new_bptt
