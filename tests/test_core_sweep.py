"""Property sweep: calc_deltas must match the numpy oracle across random
topologies, depths, activations and alignment edge cases (exact-pad sizes,
depth 1, single-output nets)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.nn import Activation, Flag, RnnConfig
from recur_tpu.ops.core import calc_deltas

import oracle as orc

CASES = [
    # (input, hidden, output, depth, activation)
    (3, 3, 3, 1, Activation.RELU),        # depth 1, exact align for o
    (4, 7, 1, 3, Activation.RELU),        # single output
    (5, 8, 4, 6, Activation.RESQRT),      # h_size pad-free (8+1→12? 9→12)
    (16, 15, 16, 4, Activation.RELU),     # h+1 exactly aligned
    (2, 2, 2, 8, Activation.RECLIP20),    # tiny everything
    (11, 31, 5, 10, Activation.RESQRT),
    (7, 12, 9, 30, Activation.RELU),      # deep bptt on short history
    (1, 5, 2, 5, Activation.RELU),        # one input
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"i{c[0]}h{c[1]}o{c[2]}d{c[3]}a{int(c[4])}"
                              for c in CASES])
def test_calc_deltas_sweep(case):
    input_size, hidden, output, depth, act = case
    o = orc.OracleNet(input_size, hidden, output, depth,
                      activation=int(act), seed=hash(case) & 0xFFFF)
    cfg = RnnConfig(input_size=input_size, hidden_size=hidden,
                    output_size=output,
                    flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                    depth=depth, activation=act)
    params = nn.RnnParams(ih=jnp.asarray(o.ih), ho=jnp.asarray(o.ho))
    rng = np.random.default_rng(1)
    out = None
    for _ in range(depth + 3):
        tok = int(rng.integers(0, input_size))
        out = o.step_forward(np.eye(input_size, dtype=np.float32)[tok])
    o_error, _, _ = orc.one_hot_error(out, output,
                                      int(rng.integers(0, output)))
    state = nn.RnnState(hidden=jnp.asarray(o.hidden)[None],
                        history=jnp.asarray(o.history)[None],
                        head=jnp.int32(o.head))
    mef = o.min_error_factor
    ih_o, ho_o, scale_o = o.calc_deltas(o_error.copy())
    d = calc_deltas(cfg, params, state, None, jnp.asarray(o_error)[None],
                    jnp.asarray([mef], jnp.float32), jnp.float32(o.learn_rate))
    np.testing.assert_allclose(np.asarray(d.ho_delta), ho_o,
                               rtol=2e-4, atol=1e-6, err_msg=str(case))
    np.testing.assert_allclose(np.asarray(d.ih_delta), ih_o,
                               rtol=2e-4, atol=1e-6, err_msg=str(case))
    np.testing.assert_allclose(float(d.stats["ih_scale"][0]), scale_o,
                               rtol=1e-4)
    np.testing.assert_allclose(float(d.min_error_factor[0]),
                               o.min_error_factor, rtol=1e-4)
