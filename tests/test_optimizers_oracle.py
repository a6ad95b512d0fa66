"""Each learning method must match its literal oracle implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.nn import Flag, LearningMethod, RnnConfig
from recur_tpu.ops.optimizers import apply_learning

import oracle as orc


def setup(aux=False):
    flags = Flag.STANDARD | (Flag.AUX_ARRAYS if aux else 0)
    cfg = RnnConfig(input_size=4, hidden_size=6, output_size=4, flags=flags,
                    depth=3)
    rng = np.random.default_rng(7)
    params = nn.RnnParams(
        ih=jnp.asarray(rng.normal(0, 0.1, (cfg.i_size, cfg.h_size))
                       .astype(np.float32)),
        ho=jnp.asarray(rng.normal(0, 0.1, (cfg.h_size, cfg.o_size))
                       .astype(np.float32)))
    bptt = nn.new_bptt_state(cfg, 1, learn_rate=0.01, momentum=0.9)
    ih_d = rng.normal(0, 0.05, (cfg.i_size, cfg.h_size)).astype(np.float32)
    ho_d = rng.normal(0, 0.05, (cfg.h_size, cfg.o_size)).astype(np.float32)
    return cfg, params, bptt, ih_d, ho_d


def run_steps(cfg, params, bptt, ih_d, ho_d, method, momentum, steps=3):
    import dataclasses
    for k in range(steps):
        params, bptt = apply_learning(cfg, params, bptt,
                                      jnp.asarray(ih_d) * (k + 1),
                                      jnp.asarray(ho_d) * (k + 1), None,
                                      method, jnp.float32(momentum))
    return params, bptt


def test_nesterov_matches():
    cfg, params, bptt, ih_d, ho_d = setup()
    w_ih = np.asarray(params.ih).copy()
    m_ih = np.zeros_like(w_ih)
    w_ho = np.asarray(params.ho).copy()
    m_ho = np.zeros_like(w_ho)
    for k in range(3):
        orc.apply_nesterov(w_ho, ho_d * (k + 1), m_ho, 0.01, 0.9)
        orc.apply_nesterov(w_ih, ih_d * (k + 1), m_ih, 0.01, 0.9)
    p2, b2 = run_steps(cfg, params, bptt, ih_d, ho_d,
                       LearningMethod.MOMENTUM_NESTEROV, 0.9)
    np.testing.assert_allclose(np.asarray(p2.ih), w_ih, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2.ho), w_ho, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("method,mw", [
    (LearningMethod.MOMENTUM_CLASSICAL, 1.0),
    (LearningMethod.MOMENTUM_SIMPLIFIED_NESTEROV, 0.9 / 1.9),
])
def test_classical_and_simplified_nesterov_match(method, mw):
    """The two remaining momentum variants are the weighted update with a
    derived momentum_weight (recur-nn.c:650-663): 1.0 for CLASSICAL,
    momentum/(1+momentum) for SIMPLIFIED_NESTEROV."""
    cfg, params, bptt, ih_d, ho_d = setup()
    w_ih = np.asarray(params.ih).copy()
    m_ih = np.zeros_like(w_ih)
    w_ho = np.asarray(params.ho).copy()
    m_ho = np.zeros_like(w_ho)
    for k in range(3):
        orc.apply_weighted_mw(w_ho, ho_d * (k + 1), m_ho, 0.01, 0.9, mw)
        orc.apply_weighted_mw(w_ih, ih_d * (k + 1), m_ih, 0.01, 0.9, mw)
    p2, b2 = run_steps(cfg, params, bptt, ih_d, ho_d, method, 0.9)
    np.testing.assert_allclose(np.asarray(p2.ih), w_ih, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2.ho), w_ho, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(b2.ih_momentum), m_ih, rtol=1e-5,
                               atol=1e-7)


def test_adagrad_matches():
    import dataclasses
    cfg, params, bptt, ih_d, ho_d = setup()
    ballast = 100.0
    bptt = dataclasses.replace(
        bptt, ih_momentum=jnp.full_like(bptt.ih_momentum, ballast),
        ho_momentum=jnp.full_like(bptt.ho_momentum, ballast))
    w_ih = np.asarray(params.ih).copy().astype(np.float64)
    a_ih = np.full_like(w_ih, ballast)
    w_ho = np.asarray(params.ho).copy().astype(np.float64)
    a_ho = np.full_like(w_ho, ballast)
    for k in range(3):
        orc.apply_adagrad(w_ho, (ho_d * (k + 1)).astype(np.float64), a_ho, 0.01)
        orc.apply_adagrad(w_ih, (ih_d * (k + 1)).astype(np.float64), a_ih, 0.01)
    p2, b2 = run_steps(cfg, params, bptt, ih_d, ho_d, LearningMethod.ADAGRAD,
                       0.9)
    np.testing.assert_allclose(np.asarray(p2.ih), w_ih, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2.ih_momentum), a_ih, rtol=1e-4)


def test_adadelta_matches():
    import dataclasses
    cfg, params, bptt, ih_d, ho_d = setup(aux=True)
    bptt = dataclasses.replace(
        bptt, ih_aux=jnp.full_like(bptt.ih_aux, 1e-2),
        ho_aux=jnp.full_like(bptt.ho_aux, 1e-2))
    w_ih = np.asarray(params.ih).astype(np.float64)
    g_ih = np.zeros_like(w_ih); s_ih = np.full_like(w_ih, 1e-2)
    w_ho = np.asarray(params.ho).astype(np.float64)
    g_ho = np.zeros_like(w_ho); s_ho = np.full_like(w_ho, 1e-2)
    for k in range(3):
        orc.apply_adadelta(w_ho, (ho_d * (k+1)).astype(np.float64), g_ho, s_ho, 0.01, 0.9)
        orc.apply_adadelta(w_ih, (ih_d * (k+1)).astype(np.float64), g_ih, s_ih, 0.01, 0.9)
    p2, b2 = run_steps(cfg, params, bptt, ih_d, ho_d, LearningMethod.ADADELTA,
                       0.9)
    np.testing.assert_allclose(np.asarray(p2.ih), w_ih, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2.ih_aux), s_ih, rtol=1e-4)


def test_rprop_matches():
    import dataclasses
    cfg, params, bptt, ih_d, ho_d = setup(aux=True)
    bptt = dataclasses.replace(
        bptt, ih_aux=jnp.full_like(bptt.ih_aux, 1e-4),
        ho_aux=jnp.full_like(bptt.ho_aux, 1e-4))
    w_ih = np.asarray(params.ih).astype(np.float64)
    pg_ih = np.zeros_like(w_ih); ps_ih = np.full_like(w_ih, 1e-4)
    w_ho = np.asarray(params.ho).astype(np.float64)
    pg_ho = np.zeros_like(w_ho); ps_ho = np.full_like(w_ho, 1e-4)
    rng = np.random.default_rng(3)
    sign = rng.choice([-1.0, 1.0], size=3)
    for k in range(3):
        orc.apply_rprop(w_ho, (ho_d * sign[k]).astype(np.float64), pg_ho, ps_ho, 0.01)
        orc.apply_rprop(w_ih, (ih_d * sign[k]).astype(np.float64), pg_ih, ps_ih, 0.01)
    import dataclasses as dc
    p2, b2 = params, bptt
    for k in range(3):
        p2, b2 = apply_learning(cfg, p2, b2, jnp.asarray(ih_d * sign[k]),
                                jnp.asarray(ho_d * sign[k]), None,
                                LearningMethod.RPROP, jnp.float32(0.9))
    np.testing.assert_allclose(np.asarray(p2.ih), w_ih, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(b2.ih_aux), ps_ih, rtol=1e-4)
