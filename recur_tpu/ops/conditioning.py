"""Conditioning regularizer cycle + weight noise (recur-nn.c:775-883).

rnn_condition_net runs one of several numeric-hygiene ops depending on
generation % 8, each gated by a flag bit.  Under jit the generation is a
traced scalar, so each op is computed as a masked update (the flag gates are
static, so disabled ops compile away entirely).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recur_tpu.nn import (
    Flag,
    RnnConfig,
    RnnParams,
    BpttState,
    RANDOM_DAMAGE_FACTOR,
    RNN_CONDITIONING_INTERVAL,
    RNN_LAWN_MOWER_THRESHOLD,
    RNN_TALL_POPPY_SCALE,
    RNN_TALL_POPPY_THRESHOLD,
    WEIGHT_SCALE,
)

# cycle positions (recur-nn.h:70-76)
_BIT_SCALE = 0
_BIT_ZERO = 2
_BIT_LAWN_MOWER = 3
_BIT_TALL_POPPY = 4
_BIT_RAND = 6


def _zero_small(a):
    """zero_small_numbers (recur-nn-helpers.h:126-133): flush denormals."""
    return jnp.where(jnp.abs(a) > 1e-34, a, 0.0)


def condition_net(cfg: RnnConfig, params: RnnParams, bptt: BpttState,
                  key: jax.Array) -> tuple[RnnParams, BpttState]:
    """rnn_condition_net (recur-nn.c:782-855).  Uses bptt.generation % 8."""
    flags = cfg.flags
    m = bptt.generation % RNN_CONDITIONING_INTERVAL
    ih, ho = params.ih, params.ho
    ih_momentum, ho_momentum = bptt.ih_momentum, bptt.ho_momentum

    if flags & Flag.COND_USE_SCALE:
        hit = (m == _BIT_SCALE)
        s = jnp.where(hit, WEIGHT_SCALE, 1.0)
        ih, ho = ih * s, ho * s

    if flags & Flag.COND_USE_ZERO:
        hit = (m == _BIT_ZERO)
        ih = jnp.where(hit, _zero_small(ih), ih)
        ho = jnp.where(hit, _zero_small(ho), ho)
        ih_momentum = jnp.where(hit, _zero_small(ih_momentum), ih_momentum)
        ho_momentum = jnp.where(hit, _zero_small(ho_momentum), ho_momentum)

    if flags & Flag.COND_USE_LAWN_MOWER:
        hit = (m == _BIT_LAWN_MOWER)
        ih = jnp.where(hit,
                       jnp.clip(ih, -RNN_LAWN_MOWER_THRESHOLD,
                                RNN_LAWN_MOWER_THRESHOLD), ih)

    if flags & Flag.COND_USE_TALL_POPPY:
        hit = (m == _BIT_TALL_POPPY)
        flat = jnp.abs(ih.ravel())
        big_i = jnp.argmax(flat)
        big_v = flat[big_i]
        scale = jnp.where(hit & (big_v > RNN_TALL_POPPY_THRESHOLD),
                          RNN_TALL_POPPY_SCALE, 1.0)
        ih = ih.ravel().at[big_i].mul(scale).reshape(ih.shape)

    if flags & Flag.COND_USE_RAND:
        # random single-weight damage (recur-nn.c:808-827)
        hit = (m == _BIT_RAND)
        k1, k2 = jax.random.split(key)
        total = cfg.ih_size + cfg.ho_size
        t = jax.random.randint(k1, (), 0, total)
        damage = (jnp.clip(jax.random.normal(k2, ()), -6, 6)
                  * RANDOM_DAMAGE_FACTOR * cfg.h_size * bptt.learn_rate)
        in_ho = t >= cfg.ih_size
        t_ho = t - cfg.ih_size
        col_ho = t_ho % cfg.o_size
        ok_ho = hit & in_ho & (col_ho < cfg.output_size)
        ho = ho.ravel().at[t_ho].add(jnp.where(ok_ho, damage, 0.0),
                                     mode="drop").reshape(ho.shape)
        col_ih = t % cfg.h_size
        ok_ih = hit & ~in_ho & (col_ih >= 1) & (col_ih < cfg.input_offset)
        ih = ih.ravel().at[t].add(jnp.where(ok_ih, damage, 0.0),
                                  mode="drop").reshape(ih.shape)

    new_params = RnnParams(ih=ih, ho=ho, bottom=params.bottom)
    import dataclasses
    new_bptt = dataclasses.replace(bptt, ih_momentum=ih_momentum,
                                   ho_momentum=ho_momentum)
    return new_params, new_bptt


def weight_noise(cfg: RnnConfig, params: RnnParams, key: jax.Array,
                 deviation) -> RnnParams:
    """rnn_weight_noise (recur-nn.c:866-883): gaussian noise on the live
    (non-pad, non-bias-column) regions of each weight matrix."""
    k1, k2, k3 = jax.random.split(key, 3)

    def noise(k, shape):
        return jnp.clip(jax.random.normal(k, shape), -6, 6) * deviation

    ih = params.ih
    rows_ih = cfg.hidden_size + 1 + cfg.input_size
    n_ih = jnp.zeros_like(ih)
    n_ih = n_ih.at[:rows_ih, 1:cfg.hidden_size + 1].set(
        noise(k1, (rows_ih, cfg.hidden_size)))
    ho = params.ho
    n_ho = jnp.zeros_like(ho)
    n_ho = n_ho.at[:cfg.hidden_size + 1, :cfg.output_size].set(
        noise(k2, (cfg.hidden_size + 1, cfg.output_size)))
    bottom = params.bottom
    if cfg.has_bottom and bottom is not None:
        # reference region (recur-nn.c:878-882, [out, in] layout rows
        # 0..output_size, cols 1..input_size+1) transposed to our
        # [bottom_i_size, bottom_o_size] layout: input rows 1.., output cols
        n_b = jnp.zeros_like(bottom)
        n_b = n_b.at[1:cfg.bottom_input_size + 1, :cfg.input_size].set(
            noise(k3, (cfg.bottom_input_size, cfg.input_size)))
        bottom = bottom + n_b
    return RnnParams(ih=ih + n_ih, ho=ho + n_ho, bottom=bottom)
