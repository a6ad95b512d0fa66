"""The fused forward Pallas kernel must match the XLA forward_step exactly
(run in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.nn import Flag
from recur_tpu.ops import init as winit
from recur_tpu.ops.core import forward_step
from recur_tpu.ops.pallas_kernels import fused_rnn_forward


@pytest.mark.parametrize("out_kind", ["none", "sigmoid"])
def test_fused_forward_matches_xla(out_kind):
    net = nn.new_net(33, 99, 3, flags=Flag.STANDARD, rng_seed=5, depth=4)
    winit.randomise_weights(net)
    cfg = net.cfg
    S = 16
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.uniform(0, 1, (S, cfg.h_size)).astype(np.float32))
    hidden = hidden.at[:, 0].set(1.0)
    hidden = hidden.at[:, cfg.hidden_size + 1:].set(0.0)
    x = jnp.asarray(rng.uniform(0, 1, (S, cfg.input_size)).astype(np.float32))

    fwd = forward_step(cfg, net.params, hidden, x)
    want_h = np.asarray(fwd.hidden)
    want_o = np.asarray(fwd.output)
    if out_kind == "sigmoid":
        want_o = np.asarray(jax.nn.sigmoid(fwd.output))

    got_h, got_o = fused_rnn_forward(cfg, net.params, (hidden, x),
                                     out_kind, True)
    np.testing.assert_allclose(np.asarray(got_h), want_h, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_o), want_o, rtol=1e-5,
                               atol=1e-6)


def test_fused_forward_softclip_path():
    """Huge inputs must hit the emergency soft-clip identically."""
    net = nn.new_net(8, 15, 3, flags=Flag.STANDARD, rng_seed=2, depth=4)
    winit.randomise_weights(net)
    cfg = net.cfg
    hidden = jnp.zeros((4, cfg.h_size), jnp.float32).at[:, 0].set(1.0)
    x = jnp.full((4, cfg.input_size), 1e4, jnp.float32)
    fwd = forward_step(cfg, net.params, hidden, x)
    got_h, got_o = fused_rnn_forward(cfg, net.params, (hidden, x),
                                     "none", True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(fwd.output),
                               rtol=1e-4, atol=1e-5)
