"""Bottom (extra feed-forward) layer nets: RNN_NET_FLAG_BOTTOM_LAYER
(recur-nn.h:211-227, rnn_new_with_bottom_layer)."""

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn, engine
from recur_tpu.engine import TrainHyper
from recur_tpu.nn import Flag
from recur_tpu.ops import init as winit
from test_convergence import fizzbuzz_symbols


def make_bottom_net():
    # alphabet one-hots (4) -> bottom layer -> 6 features -> RNN h=23
    net = nn.new_net(6, 23, 4,
                     flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                     rng_seed=4, depth=10, learn_rate=0.001,
                     bottom_input_size=4)
    winit.randomise_weights(net)
    return net


def test_bottom_net_shapes_and_training():
    net = make_bottom_net()
    cfg = net.cfg
    assert cfg.has_bottom
    assert net.params.bottom is not None
    assert cfg.raw_input_size == 4
    S = 4
    hyper = TrainHyper(condition=False)
    bptt = nn.new_bptt_state(cfg, S, 0.001, 0.9)
    state = nn.new_state(cfg, S)
    seq = fizzbuzz_symbols(3000)
    offs = (np.arange(S) * 105)[:, None]
    accs = []
    key = jax.random.PRNGKey(0)
    for i in range(0, 2500, 500):
        idx = (i + np.arange(501)[None, :] + offs) % (len(seq) - 1)
        key, k = jax.random.split(key)
        net.params, bptt, state, tot = engine.char_train_chunk(
            cfg, hyper, net.params, bptt, state, jnp.asarray(seq[idx]), k,
            jnp.float32(0.9), jnp.float32(0.0))
        accs.append(float(tot.correct) / (500 * S))
    assert accs[-1] > max(accs[0] + 0.1, 0.7), accs
    # bottom weights actually moved
    assert not np.allclose(np.asarray(net.params.bottom), 0.0)


def test_bottom_net_save_load(tmp_path):
    net = make_bottom_net()
    p = str(tmp_path / "b.net")
    nn.save_net(net, p)
    net2 = nn.load_net(p)
    assert net2.cfg.has_bottom
    assert net2.cfg.bottom_input_size == 4
    np.testing.assert_array_equal(np.asarray(net2.params.bottom),
                                  np.asarray(net.params.bottom))


def test_weight_noise_bottom_region():
    """weight_noise targets the reference region of the bottom matrix —
    input rows 1..bottom_input_size+1, output cols 0..input_size in our
    [bottom_i, bottom_o] layout (recur-nn.c:878-882 transposed).  The old
    transposed indices crashed whenever input_size > bottom_i_size."""
    from recur_tpu.ops.conditioning import weight_noise

    # input_size (6) > bottom_i_size (align4(4+1)=8? no: 4+1->8);
    # use a wide net where the transposed slice could not even fit
    net = nn.new_net(20, 11, 4,
                     flags=Flag.STANDARD, rng_seed=1, depth=5,
                     bottom_input_size=4)
    winit.randomise_weights(net)
    cfg = net.cfg
    assert cfg.input_size > cfg.bottom_i_size  # the old-crash shape
    p0 = jax.tree.map(jnp.copy, net.params)
    p1 = weight_noise(cfg, net.params, jax.random.PRNGKey(0),
                      jnp.float32(0.1))
    b0 = np.asarray(p0.bottom)
    b1 = np.asarray(p1.bottom)
    diff = b1 - b0
    live = diff[1:cfg.bottom_input_size + 1, :cfg.input_size]
    assert np.count_nonzero(live) > live.size // 2
    # bias row, pad rows and pad cols untouched
    assert np.all(diff[0] == 0)
    assert np.all(diff[cfg.bottom_input_size + 1:] == 0)
    assert np.all(diff[:, cfg.input_size:] == 0)
