"""jit-vs-eager parity (SURVEY.md §4's TPU-appropriate addition): the same
step traced under jit and run op-by-op must agree."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn, engine
from recur_tpu.engine import TrainHyper
from recur_tpu.nn import Flag
from recur_tpu.ops import init as winit


@pytest.mark.slow
def test_char_step_jit_vs_eager():
    net = nn.new_net(7, 11, 7, flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                     rng_seed=3, depth=5, learn_rate=0.01)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=True)
    S = 3
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 7, size=(S, 9)))
    key = jax.random.PRNGKey(1)
    args = (jnp.float32(0.9), jnp.float32(0.0))

    def run():
        params = jax.tree.map(jnp.copy, net.params)
        bptt = nn.new_bptt_state(cfg, S, 0.01, 0.9)
        state = nn.new_state(cfg, S)
        keys = jax.random.split(key, 8)
        for t in range(8):
            params, bptt, state, stats = engine.char_train_step(
                cfg, hyper, params, bptt, state, toks[:, t], toks[:, t + 1],
                keys[t], *args)
        return params, state, stats

    with jax.disable_jit():
        p_eager, s_eager, st_eager = run()
    p_jit, s_jit, st_jit = run()

    np.testing.assert_allclose(np.asarray(p_jit.ih), np.asarray(p_eager.ih),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_jit.ho), np.asarray(p_eager.ho),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_jit.hidden),
                               np.asarray(s_eager.hidden),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(st_jit.entropy.sum()),
                               float(st_eager.entropy.sum()), rtol=1e-4)
