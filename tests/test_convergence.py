"""End-to-end learning tests, the spirit of test/test_fb_backprop.c: the net
must actually learn a periodic FizzBuzz sequence within a budget."""

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu import engine
from recur_tpu.engine import TrainHyper
from recur_tpu.nn import Flag, LearningMethod, RnnConfig
from recur_tpu.ops import init as winit


def fizzbuzz_symbols(n, a=5, b=3):
    """Symbol i in 0..3: bit0 = (i % b == 0), bit1 = (i % a == 0)
    (test_fb_backprop.c FIZZBUZZ macro, periods 5/3 => period-15 pattern)."""
    x = np.arange(n)
    return (((x % a == 0).astype(int) << 1) + (x % b == 0)).astype(np.int32)


def test_fizzbuzz_convergence():
    # deltas are summed over streams (synchronic batch), so the learn rate
    # scales down with S — same behaviour as the reference's multi-tap
    S, T_budget, lr = 8, 4500, 0.002 / 8
    hidden = 39
    # long enough that no stream wraps (wrapping breaks the period-15 phase)
    seq = fizzbuzz_symbols(T_budget + 15 * 7 * S + 600)
    flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
    net = nn.new_net(4, hidden, 4, flags=flags, rng_seed=2, depth=30,
                     learn_rate=lr, momentum=0.95)
    p = winit.default_init_params(net.cfg)
    winit.randomise_weights(net, p)
    cfg = net.cfg
    hyper = TrainHyper(learning_style=LearningMethod.MOMENTUM_WEIGHTED,
                       condition=True)
    params = net.params
    bptt = nn.new_bptt_state(cfg, S, learn_rate=lr, momentum=0.95)
    state = nn.new_state(cfg, S)
    key = jax.random.PRNGKey(0)

    # S streams at spaced offsets of the periodic sequence
    offs = (np.arange(S) * 15 * 7)[:, None]
    chunk = 500
    acc_last = 0.0
    for i in range(0, T_budget, chunk):
        idx = (i + np.arange(chunk + 1)[None, :] + offs) % (len(seq) - 1)
        tokens = jnp.asarray(seq[idx])
        key, k = jax.random.split(key)
        params, bptt, state, totals = engine.char_train_chunk(
            cfg, hyper, params, bptt, state, tokens, k,
            jnp.float32(0.95), jnp.float32(0.0))
        acc_last = float(totals.correct) / (chunk * S)
    assert acc_last > 0.95, f"failed to learn fizzbuzz: accuracy {acc_last}"

    # the trained net must also confabulate the right pattern deterministically
    hidden_s = jnp.zeros((1, cfg.h_size), jnp.float32)
    toks = []
    t = jnp.asarray(seq[:30])[None]
    hidden_s, outs = engine.char_forward_seq(cfg, params, hidden_s, t)
    c = int(seq[30])
    for _ in range(45):
        hidden_s, outs = engine.char_forward_seq(
            cfg, params, hidden_s, jnp.asarray([[c]]))
        c = int(jnp.argmax(outs[0, 0, :cfg.output_size]))
        toks.append(c)
    want = fizzbuzz_symbols(100)[31:31 + 45]
    agree = float(np.mean(np.asarray(toks) == want))
    assert agree > 0.9, f"confab diverges from fizzbuzz: {agree}"
