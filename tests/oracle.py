"""A deliberately literal, slow numpy oracle of the reference's single-net
training step, used to validate the batched/jitted engine numerically.

Each function mirrors one C routine's exact control flow (loops, early exits,
in-place buffer swaps) so any semantic drift in the fast path shows up as a
numeric mismatch in the tests.
"""

from __future__ import annotations

import numpy as np

MAX_TOP_ERROR_FACTOR = 2.0
MAX_ERROR_GAIN = 2.0
ERROR_GAIN_CEILING = 1.0
MIN_ERROR_GAIN = 1e-8
MAX_MIN_ERROR_FACTOR = 1e-2
ABS_MIN_ERROR_FACTOR = 1e-20

RELU, RESQRT, RECLIP20 = 1, 2, 5


def soft_clip(s, halfmax):
    x = s / halfmax
    fudge = 0.99 + x * x / 100.0
    return 2.0 * x / (1.0 + x * x * fudge)


class OracleNet:
    def __init__(self, input_size, hidden_size, output_size, depth,
                 activation=RELU, adaptive_min_error=True, seed=0,
                 learn_rate=1e-3, momentum=0.95, momentum_weight=0.5,
                 ho_scale=1.0):
        def al4(n):
            return (n + 3) & ~3
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.output_size = output_size
        self.i_size = al4(hidden_size + input_size + 1)
        self.h_size = al4(hidden_size + 1)
        self.o_size = al4(output_size)
        self.depth = depth
        self.activation = activation
        self.adaptive = adaptive_min_error
        self.input_offset = hidden_size + 1
        rng = np.random.default_rng(seed)
        self.ih = np.zeros((self.i_size, self.h_size), np.float32)
        self.ho = np.zeros((self.h_size, self.o_size), np.float32)
        # live regions only, like the reference's offset/width init
        self.ih[:hidden_size + input_size + 1, 1:hidden_size + 1] = \
            rng.normal(0, 0.1, (hidden_size + input_size + 1, hidden_size)).astype(np.float32)
        self.ho[:hidden_size + 1, :output_size] = \
            rng.normal(0, 0.1, (hidden_size + 1, output_size)).astype(np.float32)
        self.hidden = np.zeros(self.h_size, np.float32)
        self.history = np.zeros((depth, self.i_size), np.float32)
        self.head = 0
        self.ih_momentum = np.zeros_like(self.ih)
        self.ho_momentum = np.zeros_like(self.ho)
        self.learn_rate = learn_rate
        self.momentum = momentum
        self.momentum_weight = momentum_weight
        self.ho_scale = ho_scale
        self.min_error_factor = 1e-12 * self.h_size
        self.generation = 0

    # ---- rnn_bptt_advance + rnn_opinion (one-hot input) ----
    def step_forward(self, x_dense):
        self.head = (self.head + 1) % self.depth
        row = self.history[self.head]
        row[:] = 0.0
        row[:self.hidden_size + 1] = self.hidden[:self.hidden_size + 1]
        row[0] = 1.0
        row[self.input_offset:self.input_offset + self.input_size] = x_dense
        # maybe_scale_inputs
        s = row.sum()
        softclip = self.i_size * 16.0
        if s > softclip:
            row *= soft_clip(s, softclip)
        h = row @ self.ih
        if self.activation == RESQRT:
            h = np.where(h > 0, np.sqrt(np.maximum(h, 0) + 1.0) - 1.0, 0.0)
        elif self.activation == RECLIP20:
            h = np.clip(h, 0.0, 20.0)
        else:
            h = np.maximum(h, 0.0)
        h[self.hidden_size + 1:] = 0.0
        h[0] = 1.0
        self.hidden = h.astype(np.float32)
        return self.hidden @ self.ho

    def calc_deltas(self, o_error):
        """rnn_bptt_calc_deltas, non-accumulating, with the C loop's exact
        early-exit bookkeeping."""
        h_err = np.zeros(self.i_size, np.float32)
        top_error_sum = 0.0
        for y in range(1, self.h_size):
            e = 0.0
            if self.hidden[y] != 0.0:
                e = float(self.ho[y, :] @ o_error)
                top_error_sum += abs(e)
            h_err[y] = e
        halfmax = self.h_size * MAX_TOP_ERROR_FACTOR
        if top_error_sum > halfmax:
            scale = soft_clip(top_error_sum, halfmax)
            h_err[:self.h_size] *= scale
            top_scaled = scale * top_error_sum
        else:
            top_scaled = top_error_sum

        ho_delta = np.outer(self.hidden, o_error).astype(np.float32)
        ih_delta = np.zeros_like(self.ih)
        max_error_sum = MAX_ERROR_GAIN * top_scaled + 1.0
        ceiling = ERROR_GAIN_CEILING * top_scaled
        min_error_gain = MIN_ERROR_GAIN * top_scaled
        min_error_sum = min(self.min_error_factor / self.learn_rate,
                            min_error_gain)
        offset = self.head
        error_sum = 0.0
        t = self.depth
        while t > 0:
            inputs = self.history[offset]
            h_err[0] = 0.0
            h_err[self.input_offset:self.h_size] = 0.0
            i_err = np.zeros(self.i_size, np.float32)
            error_sum = 0.0
            for y in range(self.i_size):
                inp = inputs[y]
                if inp != 0.0 and (self.activation != RECLIP20 or inp < 20.0):
                    ih_delta[y, :] += h_err[:self.h_size] * inp
                    e = float(self.ih[y, :] @ h_err[:self.h_size])
                    if self.activation == RESQRT:
                        e /= 2.0 * (inp + 1.0)
                    i_err[y] = e
                    error_sum += e * e
            h_err = i_err
            if error_sum <= min_error_sum or error_sum > max_error_sum:
                break   # t stays (the C for-loop break semantics)
            t -= 1
            offset = offset - 1 if offset else self.depth - 1

        if error_sum > ceiling:
            ih_scale = soft_clip(error_sum, max_error_sum)
        else:
            ih_scale = 1.0
            if self.adaptive:
                depth_error = self.depth // 4 - t
                if (self.min_error_factor < MAX_MIN_ERROR_FACTOR and
                        (min_error_gain != min_error_sum or depth_error < 0)):
                    self.min_error_factor *= (1.0 + depth_error * 1e-3)
                self.min_error_factor = max(self.min_error_factor,
                                            ABS_MIN_ERROR_FACTOR)
        ih_delta *= ih_scale
        self.generation += 1
        return ih_delta, ho_delta, ih_scale

    # ---- apply_learning_with_momentum (weighted) ----
    def apply_weighted(self, ih_delta, ho_delta, momentum=None):
        momentum = self.momentum if momentum is None else momentum
        for w, d, m, rate in (
                (self.ho, ho_delta, self.ho_momentum,
                 self.learn_rate * self.ho_scale),
                (self.ih, ih_delta, self.ih_momentum, self.learn_rate)):
            t = d * rate
            w += t + m * self.momentum_weight
            m += t
            m *= momentum


def softmax_np(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def one_hot_error(output, output_size, target):
    p = softmax_np(output[:output_size])
    err = -p
    err[target] += 1.0
    o_error = np.zeros(len(output), np.float32)
    o_error[:output_size] = err
    return o_error, int(np.argmax(p)), float(p[target])


def apply_weighted_mw(w, d, m, rate, momentum, momentum_weight):
    """apply_learning_with_momentum (recur-nn.c:455-489) with an explicit
    momentum_weight — MOMENTUM_CLASSICAL passes 1.0 and
    MOMENTUM_SIMPLIFIED_NESTEROV passes momentum/(1+momentum)
    (rnn_apply_learning's dispatch, recur-nn.c:650-663)."""
    t = d * rate
    w += t + m * momentum_weight
    m += t
    m *= momentum


def apply_nesterov(w, d, m, rate, momentum):
    """apply_learning_with_nesterov_momentum (recur-nn.c:494-509)."""
    t = d * rate
    w += t
    m += t
    m *= momentum
    w += m


def apply_adagrad(w, d, acc, rate):
    """apply_adagrad_learning (recur-nn.c:511-525)."""
    for i in np.ndindex(w.shape):
        a = acc[i] + d[i] * d[i]
        w[i] += d[i] * rate / np.sqrt(a)
        acc[i] = a


def apply_adadelta(w, d, g_acc, s_acc, rate, decay):
    """apply_adadelta_learning, abs-value variant (recur-nn.c:527-558)."""
    renewal = 1.0 - decay
    for i in np.ndindex(w.shape):
        g = g_acc[i] * decay
        s = s_acc[i] * decay
        g += abs(d[i]) * renewal + rate
        step = s / g * d[i]
        s += abs(step) * renewal + rate
        g_acc[i] = g
        s_acc[i] = s
        w[i] += step


def apply_rprop(w, d, prev_grad, prev_step, rate):
    """apply_rprop_learning (recur-nn.c:560-593)."""
    shrink, grow = 0.5, 1.2
    max_step, min_step = 1.0 * rate, 1e-6 * rate
    for i in np.ndindex(w.shape):
        dd = d[i]
        p = prev_grad[i]
        step = prev_step[i]
        if dd * p > 0.0:
            step = min(step * grow, max_step)
        elif dd * p < 0.0:
            step = max(step * shrink, min_step)
            dd = 0.0
        if dd > 0.0:
            w[i] += step
        else:
            w[i] -= step
        prev_step[i] = step
        prev_grad[i] = dd
