"""Weight initialisation families (recur-nn-init.c:382-735) and the
empirical gain scaler (rnn_scale_initial_weights, recur-nn.c:1027-1076).

Runs on the host with the bit-exact JSF64 PRNG so that a seeded net gets the
same initial weights the reference would produce: the RNG call sequence per
element is preserved (rand_double draws, gaussian draws, coin flips).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from recur_tpu.nn import (
    InitDistribution,
    InitMethod,
    Net,
    RnnConfig,
    RNN_INITIAL_WEIGHT_VARIANCE_FACTOR,
)
from recur_tpu.utils.rng import RecurRng


@dataclasses.dataclass
class InitParams:
    """struct RecurInitialisationParameters (recur-nn.h:230-258)."""
    method: InitMethod = InitMethod.FLAT
    submethod: InitMethod = InitMethod.FLAT
    bias_uses_submethod: bool = False
    inputs_use_submethod: bool = False
    # fan-in
    fan_in_sum: float = 3.0
    fan_in_step: float = 0.3
    fan_in_min: float = 0.1
    fan_in_ratio: float = 1.0
    # flat
    flat_variance: float = 0.1
    flat_shape: InitDistribution = InitDistribution.UNIFORM
    flat_perforation: float = 0.7
    # runs
    run_input_probability: float = 0.17
    run_input_magnitude: float = 0.2
    run_gain: float = 0.17
    run_len_mean: float = 0.0
    run_len_stddev: float = 0.0
    run_n: int = 0
    run_loop: bool = True
    run_crossing_paths: int = 0
    run_inputs_miss: int = 0
    run_input_at_start: bool = False


def default_init_params(cfg: RnnConfig) -> InitParams:
    """rnn_init_default_weight_parameters (recur-nn-init.c:685-719)."""
    return InitParams(
        fan_in_ratio=cfg.input_size * 1.0 / cfg.hidden_size,
        flat_variance=RNN_INITIAL_WEIGHT_VARIANCE_FACTOR / cfg.h_size,
        run_len_mean=cfg.hidden_size / 1.0,
        run_len_stddev=cfg.hidden_size / 3.0,
        run_n=int(cfg.h_size * 0.085),
    )


def _flat_sample(rng: RecurRng, shape: InitDistribution, variance: float,
                 stddev: float) -> float:
    if shape == InitDistribution.UNIFORM:
        rge = math.sqrt(12.0 * variance)
        return rge * rng.rand_double() - rge * 0.5
    if shape == InitDistribution.LOG_NORMAL:
        a = rng.cheap_gaussian_noise() * 0.33
        b = 0.9 * stddev * math.exp(a)
        return b if (rng.rand64() & 1) else -b
    if shape == InitDistribution.SEMICIRCLE:
        while True:
            a = rng.rand_double() * 2.0 - 1.0
            b = rng.rand_double()
            if a * a + b * b <= 1.0:
                return stddev * 2 * a
    # GAUSSIAN (default)
    return stddev * rng.cheap_gaussian_noise()


def _randomise_flat(rng: RecurRng, array: np.ndarray, width: int, height: int,
                    offset: int, variance: float, shape: InitDistribution,
                    perforation: float):
    """randomise_array_flat (recur-nn-init.c:495-545); array is 2-D
    [height+, stride] viewed in place.  Uses the native C++ kernel when
    available (same RNG call order), Python otherwise."""
    from recur_tpu import native
    if native.init_flat(rng, array, width, height, offset, variance,
                        int(shape), perforation):
        return
    stddev = math.sqrt(variance)
    for y in range(height):
        for x in range(offset, width + offset):
            if perforation == 0 or rng.rand_double() > perforation:
                array[y, x] = _flat_sample(rng, shape, variance, stddev)


def _randomise_fan_in(rng: RecurRng, weights: np.ndarray, width: int,
                      height: int, col_offset: int, row_offset: int,
                      total: float, kurtosis: float, margin: float):
    """randomise_array_fan_in (recur-nn-init.c:575-591): each destination
    column gets random rows until the absolute sum reaches ~total."""
    for x in range(width):
        remainder = total + margin
        i = 0
        while i < height * 2 and remainder > margin:
            y = rng.rand_small_int(height)
            if weights[row_offset + y, col_offset + x] == 0:
                w = (rng.rand_double() * 2 - 1) * remainder * kurtosis
                weights[row_offset + y, col_offset + x] += w
                remainder -= abs(w)
            i += 1


def randomise_weights(net: Net, p: InitParams | None = None):
    """rnn_randomise_weights_clever (recur-nn-init.c:649-683), in place on the
    host.  net.params arrays are replaced with numpy-initialised ones."""
    cfg = net.cfg
    rng = net.rng
    if p is None:
        p = default_init_params(cfg)
    ih = np.zeros((cfg.i_size, cfg.h_size), np.float32)
    ho = np.zeros((cfg.h_size, cfg.o_size), np.float32)
    bottom = (np.zeros((cfg.bottom_i_size, cfg.bottom_o_size), np.float32)
              if cfg.has_bottom else None)

    method = p.method
    if method == InitMethod.ZERO:
        pass
    elif method == InitMethod.FLAT:
        perf = min(max(p.flat_perforation, 0.0), 1.0)
        if perf < 1.0:
            _randomise_flat(rng, ih, cfg.hidden_size,
                            cfg.input_size + cfg.hidden_size + 1, 1,
                            p.flat_variance, p.flat_shape, perf)
            _randomise_flat(rng, ho, cfg.output_size, cfg.hidden_size + 1, 0,
                            p.flat_variance, p.flat_shape, perf)
            if bottom is not None:
                _randomise_flat(rng, bottom, cfg.input_size,
                                cfg.bottom_input_size, 1,
                                p.flat_variance, p.flat_shape, perf)
    elif method == InitMethod.FAN_IN:
        hsize = 1 + cfg.hidden_size
        if p.fan_in_ratio > 0:
            _randomise_fan_in(rng, ih, cfg.hidden_size, hsize, 1, 0,
                              p.fan_in_sum, p.fan_in_step, p.fan_in_min)
            _randomise_fan_in(rng, ih, cfg.hidden_size, cfg.input_size, 1,
                              hsize, p.fan_in_sum * p.fan_in_ratio,
                              p.fan_in_step, p.fan_in_min)
        else:
            _randomise_fan_in(rng, ih, cfg.hidden_size,
                              hsize + cfg.input_size, 1, 0,
                              p.fan_in_sum, p.fan_in_step, p.fan_in_min)
        _randomise_fan_in(rng, ho, cfg.output_size, cfg.hidden_size, 0, 0,
                          p.fan_in_sum, p.fan_in_step, p.fan_in_min)
        if bottom is not None:
            _randomise_fan_in(rng, bottom, cfg.input_size,
                              cfg.bottom_input_size + 1, 0, 0,
                              p.fan_in_sum, p.fan_in_step, p.fan_in_min)
    elif method == InitMethod.RUNS:
        if p.submethod != InitMethod.RUNS:
            sub = dataclasses.replace(p, method=p.submethod)
            net.params = _as_params(net, ih, ho, bottom)
            randomise_weights(net, sub)
            ih = np.asarray(net.params.ih).copy()
            ho = np.asarray(net.params.ho).copy()
            # zero the region runs will own (maybe_randomise_using_submethod,
            # recur-nn-init.c:625-646)
            rows = cfg.h_size if p.inputs_use_submethod else cfg.i_size
            start = 1 if p.bias_uses_submethod else 0
            ih[start:rows, :] = 0.0
        _init_runs(rng, cfg, ih, p)
    net.params = _as_params(net, ih, ho, bottom)


def _as_params(net: Net, ih, ho, bottom):
    from recur_tpu.nn import RnnParams
    import jax.numpy as jnp
    return RnnParams(ih=jnp.asarray(ih), ho=jnp.asarray(ho),
                     bottom=jnp.asarray(bottom) if bottom is not None else None)


def _bounded_log_normal_random_sign(rng: RecurRng, mean, stddev, bound):
    """recur-nn-init.c:384-394."""
    while True:
        x = rng.cheap_gaussian_noise()
        if abs(x) <= bound:
            break
    w = mean * math.exp(x * stddev)
    return w if (rng.rand64() & 1) else -w


def _init_runs(rng: RecurRng, cfg: RnnConfig, ih: np.ndarray, p: InitParams):
    """initialise_loops_or_runs (recur-nn-init.c:419-491): random directed
    paths of hidden-hidden links with optional input taps."""

    def add_random_input(dest):
        inp = rng.rand_small_int_range(0, cfg.input_size)
        ih[cfg.hidden_size + 1 + inp, dest] = (
            rng.cheap_gaussian_noise() * p.run_input_magnitude)

    def loop_link(s, e, linked_input_p):
        ih[s, e] = _bounded_log_normal_random_sign(rng, p.run_gain, 0.25, 3.0)
        if rng.rand_double() < linked_input_p:
            add_random_input(e)

    bound = cfg.hidden_size + 1
    unused = list(range(bound))
    i = bound
    linked_p = 0 if p.run_inputs_miss else p.run_input_probability
    missing_p = p.run_input_probability if p.run_inputs_miss else 0

    for _ in range(p.run_n):
        length = int(rng.cheap_gaussian_noise() * p.run_len_stddev
                     + p.run_len_mean + 0.5)
        length = min(max(2, length), cfg.hidden_size)
        if i + length + p.run_inputs_miss >= bound or p.run_crossing_paths:
            unused = list(range(bound))
            i = 1
        j = rng.rand_small_int_range(i, bound)
        beginning = e = unused[j]
        if p.run_input_at_start and p.run_input_magnitude:
            add_random_input(e)
        for _ in range(length):
            unused[j] = unused[i]
            s = e
            if p.run_crossing_paths == 2:
                e = rng.rand_small_int_range(1, bound)
            else:
                j = rng.rand_small_int_range(i, bound)
                e = unused[j]
            loop_link(s, e, linked_p)
            i += 1
        if p.run_loop:
            loop_link(e, beginning, linked_p)
        if rng.rand_double() < missing_p and i < bound:
            j = rng.rand_small_int_range(i, bound)
            e = unused[j]
            unused[j] = unused[i]
            i += 1
            add_random_input(e)


def scale_initial_weights(net: Net, target_gain: float,
                          generations: int = 10000):
    """rnn_scale_initial_weights (recur-nn.c:1027-1076): iteratively scale ih
    toward a target forward gain by simulating random ReLU activations.
    Uses the native fast path when available (~2M sequential gaussian draws
    take minutes in Python at h=199, <1s in C++)."""
    import jax.numpy as jnp
    from recur_tpu import native

    cfg = net.cfg
    rng = net.rng
    ih = np.array(net.params.ih, np.float32, order="C")  # writable copy
    if native.scale_weights_to_gain(rng, ih, cfg.h_size, cfg.hidden_size,
                                    target_gain, generations):
        net.params = dataclasses.replace(net.params, ih=jnp.asarray(ih))
        return
    for j in range(1, generations):
        layer_in = np.zeros(cfg.h_size, np.float32)
        layer_in[0] = 1.0
        sum_in = 1.0
        for i in range(1, cfg.hidden_size):
            n = max(rng.cheap_gaussian_noise(), 0.0)
            layer_in[i] = n
            sum_in += n * n
        out = layer_in[:cfg.hidden_size + 1] @ ih[:cfg.hidden_size + 1, :]
        out[0] = 1.0
        h = np.maximum(out[:cfg.hidden_size], 0.0)
        sum_out = float((h * h).sum())
        ratio = sum_out / sum_in
        adj = (target_gain * 10 + j) / (ratio * 10 + j)
        ih *= adj
    import jax.numpy as jnp
    net.params = dataclasses.replace(net.params, ih=jnp.asarray(ih))


def perforate_weights(net: Net, prob: float):
    """rnn_perforate_weights (recur-nn-init.c:739-742): random zeroing."""
    rng = net.rng
    for name in ("ih", "ho"):
        a = np.asarray(getattr(net.params, name)).copy()
        flat = a.ravel()
        for i in range(flat.size):
            if rng.rand_double() < prob:
                flat[i] = 0.0
        import jax.numpy as jnp
        net.params = dataclasses.replace(net.params, **{name: jnp.asarray(a)})


def zap_non_diagonals(net: Net, start: int, stop: int, n_friends: int):
    """rnn_zap_non_diagonals (recur-nn.c:1082-1134): zero non-diagonal
    hidden-hidden weights in a section (clockwork-RNN-ish structure)."""
    cfg = net.cfg
    ih = np.asarray(net.params.ih).copy()
    h_end = cfg.hidden_size + 1
    friend_start = start - n_friends
    if start >= h_end or start < 0 or start > stop:
        return
    stop = min(stop, h_end)
    if n_friends > stop - start or friend_start <= 0:
        n_friends = 0
        friend_start = start
    for y in range(h_end):
        if y < friend_start or y >= stop:
            ih[y, start:stop] = 0.0
        else:
            x = start + (y - friend_start if y < start else y - start)
            keep = ih[y, x]
            ih[y, start:stop] = 0.0
            ih[y, x] = keep
    import jax.numpy as jnp
    net.params = dataclasses.replace(net.params, ih=jnp.asarray(ih))


def clear_diagonal_only_section(net: Net, length: int, friends: int,
                                boost: float = 0.0):
    """rnn_clear_diagonal_only_section (recur-nn.c:1136-1145); boost adds to
    the section's diagonal weights (prepare_diagonal_only_section,
    text-predict.c:453-470)."""
    if not length:
        return
    h_end = net.cfg.hidden_size + 1
    friends = min(friends, length)
    zap_non_diagonals(net, h_end - length, h_end, friends)
    if boost:
        import jax.numpy as jnp
        idx = np.arange(h_end - length, h_end)
        ih = np.asarray(net.params.ih).copy()
        ih[idx, idx] += boost
        net.params = dataclasses.replace(net.params, ih=jnp.asarray(ih))

