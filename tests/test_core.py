"""Numeric validation of the batched/jitted NN core against the literal
numpy oracle (single-stream), plus multi-stream equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.nn import Activation, Flag, LearningMethod, RnnConfig
from recur_tpu.ops.core import calc_deltas, forward_step, advance_history
from recur_tpu.ops.optimizers import apply_learning
from recur_tpu import engine
from recur_tpu.engine import TrainHyper

import oracle as orc


def make_pair(input_size=5, hidden_size=7, output_size=4, depth=6,
              activation=Activation.RELU, seed=0):
    """Build an oracle net and a matching jax (cfg, params, state, bptt)."""
    o = orc.OracleNet(input_size, hidden_size, output_size, depth,
                      activation=int(activation), seed=seed)
    flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
    cfg = RnnConfig(input_size=input_size, hidden_size=hidden_size,
                    output_size=output_size, flags=flags, depth=depth,
                    activation=activation)
    params = nn.RnnParams(ih=jnp.asarray(o.ih), ho=jnp.asarray(o.ho))
    state = nn.new_state(cfg, 1)
    bptt = nn.new_bptt_state(cfg, 1, learn_rate=o.learn_rate,
                             momentum=o.momentum)
    return o, cfg, params, state, bptt


def sync_state(o, cfg):
    """Copy oracle's hidden/history into a 1-stream RnnState."""
    return nn.RnnState(hidden=jnp.asarray(o.hidden)[None],
                       history=jnp.asarray(o.history)[None],
                       head=jnp.int32(o.head))


@pytest.mark.parametrize("activation",
                         [Activation.RELU, Activation.RESQRT,
                          Activation.RECLIP20])
def test_forward_matches_oracle(activation):
    o, cfg, params, state, bptt = make_pair(activation=activation, seed=3)
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(o.hidden)[None]
    for step in range(8):
        tok = int(rng.integers(0, cfg.input_size))
        out_o = o.step_forward(np.eye(cfg.input_size, dtype=np.float32)[tok])
        x = jax.nn.one_hot(jnp.array([tok]), cfg.input_size, dtype=jnp.float32)
        fwd = forward_step(cfg, params, hidden, x)
        hidden = fwd.hidden
        np.testing.assert_allclose(np.asarray(fwd.output[0]), out_o,
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(hidden[0]), o.hidden,
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("activation",
                         [Activation.RELU, Activation.RESQRT,
                          Activation.RECLIP20])
def test_calc_deltas_matches_oracle(activation):
    o, cfg, params, state, bptt = make_pair(activation=activation, seed=7)
    rng = np.random.default_rng(2)
    # run some forwards to populate history and hidden
    for _ in range(10):
        tok = int(rng.integers(0, cfg.input_size))
        out = o.step_forward(np.eye(cfg.input_size, dtype=np.float32)[tok])
    o_error, _, _ = orc.one_hot_error(out, cfg.output_size,
                                      int(rng.integers(0, cfg.output_size)))
    state = sync_state(o, cfg)
    mef_before = o.min_error_factor
    ih_d_o, ho_d_o, scale_o = o.calc_deltas(o_error.copy())

    d = calc_deltas(cfg, params, state, None, jnp.asarray(o_error)[None],
                    jnp.asarray([mef_before], jnp.float32),
                    jnp.float32(o.learn_rate))
    np.testing.assert_allclose(np.asarray(d.ho_delta), ho_d_o,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.ih_delta), ih_d_o,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(d.stats["ih_scale"][0]), scale_o,
                               rtol=1e-4)
    np.testing.assert_allclose(float(d.min_error_factor[0]),
                               o.min_error_factor, rtol=1e-4)


def test_training_trajectory_matches_oracle():
    """Full train loop, S=1: weights must track the oracle for many steps."""
    o, cfg, params, state, bptt = make_pair(output_size=5, seed=11)
    hyper = TrainHyper(condition=False)  # oracle has no conditioning
    rng = np.random.default_rng(4)
    # keep well under the chaos horizon: ReLU boundaries amplify f32
    # rounding, and XLA's run-to-run scheduling variation showed up as
    # intermittent failures at 36+ steps
    toks = rng.integers(0, cfg.input_size, size=20)
    key = jax.random.PRNGKey(0)
    mom = jnp.float32(o.momentum)

    for i in range(len(toks) - 1):
        out = o.step_forward(np.eye(cfg.input_size, dtype=np.float32)[toks[i]])
        o_error, _, _ = orc.one_hot_error(out, cfg.output_size, toks[i + 1])
        ih_d, ho_d, _ = o.calc_deltas(o_error)
        # multi-tap path: momentum soft start with 0 => momentum unchanged
        o.apply_weighted(ih_d, ho_d)

        params, bptt, state, stats = engine.char_train_step(
            cfg, hyper, params, bptt, state,
            jnp.array([toks[i]]), jnp.array([toks[i + 1]]), key,
            mom, jnp.float32(0.0))

    # tolerance note: the gradient einsum's reduction order differs from
    # the oracle's loop order; ReLU boundaries amplify those last-bit
    # differences along the trajectory.  A semantic bug shows up orders of
    # magnitude larger than this (and is caught exactly by the synced
    # per-step tests).
    np.testing.assert_allclose(np.asarray(params.ih), o.ih,
                               rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(params.ho), o.ho,
                               rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.hidden[0]), o.hidden,
                               rtol=5e-2, atol=5e-4)


@pytest.mark.slow
def test_multi_stream_equals_summed_oracles():
    """S=3 streams sharing weights == 3 oracle clones writing one delta array
    (the synchronic mini-batch, recur-nn-init.c:221-243).

    States are re-synced from the oracles every step so the comparison tests
    the *semantics* (per-step summed deltas, per-stream min_error_factor),
    not the chaotic divergence of f32 trajectories."""
    S = 3
    o0, cfg, params, state, bptt = make_pair(output_size=5, seed=21)
    oracles = [orc.OracleNet(cfg.input_size, cfg.hidden_size, cfg.output_size,
                             cfg.depth, seed=21) for _ in range(S)]
    for o in oracles:
        o.ih = oracles[0].ih
        o.ho = oracles[0].ho
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.input_size, size=(S, 25))

    for i in range(toks.shape[1] - 1):
        ih_sum = np.zeros_like(oracles[0].ih)
        ho_sum = np.zeros_like(oracles[0].ho)
        o_errs = []
        for s, o in enumerate(oracles):
            out = o.step_forward(
                np.eye(cfg.input_size, dtype=np.float32)[toks[s, i]])
            o_error, _, _ = orc.one_hot_error(out, cfg.output_size,
                                              toks[s, i + 1])
            o_errs.append(o_error)
        state = nn.RnnState(
            hidden=jnp.asarray(np.stack([o.hidden for o in oracles])),
            history=jnp.asarray(np.stack([o.history for o in oracles])),
            head=jnp.int32(oracles[0].head))
        params = nn.RnnParams(ih=jnp.asarray(oracles[0].ih.copy()),
                              ho=jnp.asarray(oracles[0].ho.copy()))
        mef = jnp.asarray([o.min_error_factor for o in oracles], jnp.float32)
        from recur_tpu.ops.core import calc_deltas as jax_calc_deltas
        d = jax_calc_deltas(cfg, params, state, None,
                            jnp.asarray(np.stack(o_errs)), mef,
                            jnp.float32(1e-3))
        for s, o in enumerate(oracles):
            ih_d, ho_d, _ = o.calc_deltas(o_errs[s])
            ih_sum += ih_d
            ho_sum += ho_d
        np.testing.assert_allclose(np.asarray(d.ih_delta), ih_sum,
                                   rtol=1e-4, atol=1e-6, err_msg=f"step {i}")
        np.testing.assert_allclose(np.asarray(d.ho_delta), ho_sum,
                                   rtol=1e-4, atol=1e-6, err_msg=f"step {i}")
        np.testing.assert_allclose(
            np.asarray(d.min_error_factor),
            np.array([o.min_error_factor for o in oracles]), rtol=1e-5)
        oracles[0].apply_weighted(ih_sum, ho_sum)


@pytest.mark.slow
def test_chunk_equals_stepwise():
    """char_train_chunk(scan) == repeated char_train_step."""
    o, cfg, params, state, bptt = make_pair(seed=31)
    hyper = TrainHyper(condition=False)
    rng = np.random.default_rng(6)
    S, T = 2, 12
    state = nn.new_state(cfg, S)
    bptt = nn.new_bptt_state(cfg, S)
    toks = jnp.asarray(rng.integers(0, cfg.input_size, size=(S, T + 1)))
    key = jax.random.PRNGKey(42)
    mom = jnp.float32(0.95)
    noise = jnp.float32(0.0)

    p1, b1, s1 = params, bptt, nn.new_state(cfg, S)
    keys = jax.random.split(key, T)
    for t in range(T):
        p1, b1, s1, _ = engine.char_train_step(
            cfg, hyper, p1, b1, s1, toks[:, t], toks[:, t + 1], keys[t],
            mom, noise)

    params0 = jax.tree.map(jnp.copy, params)
    # chunk last: char_train_chunk donates its params/bptt/state buffers
    p2, b2, s2, totals = engine.char_train_chunk(
        cfg, hyper, params, bptt, nn.new_state(cfg, S), toks, key, mom, noise)
    np.testing.assert_allclose(np.asarray(p2.ih), np.asarray(p1.ih),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.hidden), np.asarray(s1.hidden),
                               rtol=1e-5, atol=1e-7)
    assert int(b2.generation) == T

    # unrolled scan is pure inlining: bit-identical to unroll=1
    p3, b3, s3, _ = engine.char_train_chunk(
        cfg, TrainHyper(condition=False, unroll=4),
        params0, nn.new_bptt_state(cfg, S),
        nn.new_state(cfg, S), toks, key, mom, noise)
    np.testing.assert_array_equal(np.asarray(p3.ih), np.asarray(p2.ih))
    np.testing.assert_array_equal(np.asarray(s3.hidden),
                                  np.asarray(s2.hidden))


@pytest.mark.parametrize("method", list(LearningMethod))
def test_optimizers_run_and_update(method):
    o, cfg, params, state, bptt = make_pair(seed=41)
    if method in (LearningMethod.ADADELTA, LearningMethod.RPROP):
        cfg = nn.RnnConfig(**{**cfg.__dict__, "flags": cfg.flags | Flag.AUX_ARRAYS})
        bptt = nn.new_bptt_state(cfg, 1)
        import dataclasses
        bptt = dataclasses.replace(
            bptt,
            ih_aux=jnp.full_like(bptt.ih_momentum, 1e-3),
            ho_aux=jnp.full_like(bptt.ho_momentum, 1e-3))
    ih_d = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.1, params.ih.shape).astype(np.float32))
    ho_d = jnp.asarray(np.random.default_rng(2).normal(
        0, 0.1, params.ho.shape).astype(np.float32))
    p2, b2 = apply_learning(cfg, params, bptt, ih_d, ho_d, None, method,
                            jnp.float32(0.9))
    assert not np.allclose(np.asarray(p2.ih), np.asarray(params.ih))
    assert np.isfinite(np.asarray(p2.ih)).all()
    assert np.isfinite(np.asarray(p2.ho)).all()


def test_calc_deltas_twopass_equivalence():
    """The two-pass BPTT gradient (no [S,D,h] trajectory buffer) must agree
    with the buffered formulation to f32 tolerance, including streams that
    trip the early-exit/emergency thresholds."""
    import jax
    import jax.numpy as jnp
    from recur_tpu import nn as rnn
    from recur_tpu.ops import init as winit
    from recur_tpu.ops.core import (advance_history, calc_deltas,
                                    calc_deltas_twopass, forward_step)

    rng = np.random.default_rng(7)
    for act in (rnn.Activation.RELU, rnn.Activation.RESQRT,
                rnn.Activation.RECLIP20):
        net = rnn.new_net(9, 17, 9, rng_seed=4, depth=6, learn_rate=1e-3,
                          activation=act)
        winit.randomise_weights(net)
        cfg = net.cfg
        S = 8
        state = rnn.new_state(cfg, S)
        # walk some steps so the ring is populated and heterogeneous
        for t in range(10):
            x = jnp.asarray(jax.nn.one_hot(rng.integers(0, 9, S), 9),
                            jnp.float32)
            fwd = forward_step(cfg, net.params, state.hidden, x)
            state = advance_history(state, fwd.input_row)
            state = rnn.RnnState(hidden=fwd.hidden, history=state.history,
                                 head=state.head)
        o_error = jnp.asarray(rng.standard_normal((S, cfg.o_size)),
                              jnp.float32)
        # a mix of tame and violent error scales exercises the thresholds
        o_error = o_error * jnp.asarray(
            [1e-4, 1e-2, 1.0, 10.0, 100.0, 1e3, 1e4, 1e-6])[:, None]
        mef = jnp.full((S,), 0.01 * cfg.h_size, jnp.float32)
        lr = jnp.float32(1e-3)
        a = calc_deltas(cfg, net.params, state, None, o_error, mef, lr)
        b = calc_deltas_twopass(cfg, net.params, state, None, o_error,
                                mef, lr)
        np.testing.assert_allclose(np.asarray(a.ih_delta),
                                   np.asarray(b.ih_delta),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.ho_delta),
                                   np.asarray(b.ho_delta), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a.min_error_factor),
                                   np.asarray(b.min_error_factor), rtol=1e-6)
        for k in a.stats:
            np.testing.assert_allclose(np.asarray(a.stats[k]),
                                       np.asarray(b.stats[k]), rtol=1e-5,
                                       err_msg=k)


@pytest.mark.slow
def test_factored_ring_equivalence():
    """The one-hot-factored ring (tokens + [bias,hidden] section) must train
    identically to the dense ring across activations, including steps where
    the emergency input soft-clip scales the row (the scale is recovered
    from the stored bias)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from recur_tpu import nn as rnn, engine
    from recur_tpu.engine import TrainHyper
    from recur_tpu.ops import init as winit

    rng = np.random.default_rng(3)
    for act in (rnn.Activation.RELU, rnn.Activation.RESQRT,
                rnn.Activation.RECLIP20):
        net = rnn.new_net(11, 19, 11, rng_seed=6, depth=5, learn_rate=1e-3,
                          activation=act)
        winit.randomise_weights(net)
        cfg = net.cfg
        S, T = 6, 24
        tokens = jnp.asarray(rng.integers(0, 11, (S, T + 1)))
        # huge initial hidden state triggers the input soft-clip on step 1
        hid0 = jnp.zeros((S, cfg.h_size), jnp.float32
                         ).at[:2, 1:cfg.hidden_size + 1].set(300.0)
        args = (jax.random.PRNGKey(2), jnp.float32(0.9), jnp.float32(0.0))

        def run(impl, factored):
            hyper = TrainHyper(condition=False, bptt_impl=impl)
            state = dataclasses.replace(
                rnn.new_state(cfg, S, factored=factored),
                hidden=jnp.array(hid0))   # fresh copy: the chunk donates it
            return engine.char_train_chunk(
                cfg, hyper, jax.tree.map(jnp.copy, net.params),
                rnn.new_bptt_state(cfg, S, 1e-3, 0.9), state, tokens, *args)

        pa, ba, sa, ta = run("buffered", False)
        pb, bb, sb, tb = run("factored", True)
        np.testing.assert_allclose(np.asarray(pa.ih), np.asarray(pb.ih),
                                   rtol=2e-4, atol=1e-6, err_msg=str(act))
        np.testing.assert_allclose(np.asarray(pa.ho), np.asarray(pb.ho),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sa.hidden),
                                   np.asarray(sb.hidden),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(float(ta.entropy), float(tb.entropy),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ba.min_error_factor),
                                   np.asarray(bb.min_error_factor),
                                   rtol=1e-5)


def test_dispatch_calc_deltas_guards():
    """The bptt_impl dispatcher rejects the factored formulation on paths
    whose ring is dense, and unknown names everywhere."""
    import pytest
    from recur_tpu.ops.core import (calc_deltas, calc_deltas_twopass,
                                    dispatch_calc_deltas)
    assert dispatch_calc_deltas("buffered").func is calc_deltas
    assert dispatch_calc_deltas("twopass").func is calc_deltas_twopass
    assert callable(dispatch_calc_deltas("factored", factored_ok=True))
    with pytest.raises(ValueError, match="factored"):
        dispatch_calc_deltas("factored")
    with pytest.raises(ValueError, match="unknown"):
        dispatch_calc_deltas("einsum")


def test_walk_unroll_is_bit_identical():
    """The backward-walk unroll knob is pure scheduling: gradients must be
    bit-identical at any unroll factor."""
    import dataclasses as dc
    from recur_tpu import nn
    from recur_tpu.ops import init as winit
    from recur_tpu.ops.core import calc_deltas, calc_deltas_twopass
    net = nn.new_net(9, 15, 9, rng_seed=7, depth=10)
    winit.randomise_weights(net)
    cfg = net.cfg
    S = 4
    rng = np.random.default_rng(0)
    state = nn.new_state(cfg, S)
    hist = rng.normal(0, 0.5, (S, cfg.depth, cfg.i_size)).astype(np.float32)
    hist[:, :, 0] = 1.0
    state = dc.replace(state, history=jnp.asarray(np.abs(hist)),
                       hidden=jnp.asarray(
                           np.abs(rng.normal(0, 1, (S, cfg.h_size))
                                  .astype(np.float32))))
    o_err = jnp.asarray(rng.normal(0, 1, (S, cfg.o_size)).astype(np.float32))
    mef = jnp.full((S,), 0.01, jnp.float32)
    for fn in (calc_deltas, calc_deltas_twopass):
        base = fn(cfg, net.params, state, None, o_err, mef,
                  jnp.float32(1e-3))
        for u in (3, 10):
            d = fn(cfg, net.params, state, None, o_err, mef,
                   jnp.float32(1e-3), walk_unroll=u)
            np.testing.assert_array_equal(np.asarray(base.ih_delta),
                                          np.asarray(d.ih_delta))
            np.testing.assert_array_equal(np.asarray(base.ho_delta),
                                          np.asarray(d.ho_delta))
