"""Parrot: audio prediction / resynthesis (gstparrot.c rebuilt).

Training: 50%-overlapped Vorbis-windowed PCM frames → MDCT; the net learns
to predict the next MDCT frame from the previous one with a tanh output and
error (1 - a²)(target - a) (train_net, gstparrot.c:464-477).

Dreaming: the net feeds its own tanh output back as input
(fill_audio_chunk, gstparrot.c:556-585), with multiplicative gaussian noise
on the fed-back coefficients; frames go through the inverse MDCT, the
synthesis window and 50% overlap-add, scaled back to s16 (the analysis
window folds in a 1/32768 scale, so synthesis multiplies by 32768²).

Both loops run as jitted scans with channels as the stream axis.

Deviation from the reference: its per-channel delta calc overwrites rather
than accumulates (gstparrot.c:475 passes accumulate=0 for every channel), so
with >1 channel only the last channel trains; here channel gradients are
summed, which is what the synchronic-batch machinery intends.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.engine import TrainHyper
from recur_tpu.dsp.mdct import MDCT, frame_pcm
from recur_tpu.dsp.windows import WindowType, window_mask
from recur_tpu.nn import Flag, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.ops.core import (advance_history,
                                dispatch_calc_deltas, forward_step)
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.ops.optimizers import apply_learning

PARROT_RATE = 16000
PARROT_WINDOW_SIZE = 512
DEFAULT_LEARN_RATE = 0.0001


def tanh_train_step(cfg, hyper, params, bptt, state, x, target, key):
    """One MDCT frame across C channels: tanh output, derivative folded into
    the top error (gstparrot.c:464-477)."""
    C = x.shape[0]
    fwd = forward_step(cfg, params, state.hidden, x)
    state = advance_history(state, fwd.input_row)
    state = nn.RnnState(hidden=fwd.hidden, history=state.history,
                        head=state.head)
    a = jnp.tanh(fwd.output[:, :cfg.output_size])
    err = (1.0 - a * a) * (target - a)
    o_error = jnp.zeros((C, cfg.o_size), jnp.float32)
    o_error = o_error.at[:, :cfg.output_size].set(err)
    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, fwd.bottom_inputs, o_error,
                    bptt.min_error_factor, bptt.learn_rate)
    params, bptt = apply_learning(cfg, params, bptt, d.ih_delta, d.ho_delta,
                                  d.bottom_delta, hyper.learning_style,
                                  bptt.momentum, 1.0)
    bptt = dataclasses.replace(bptt, min_error_factor=d.min_error_factor,
                               ih_scale=d.stats["ih_scale"],
                               generation=bptt.generation + 1)
    if hyper.condition:
        params, bptt = condition_net(cfg, params, bptt, key)
    mse = jnp.mean((target - a) ** 2)
    return params, bptt, state, mse


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def parrot_train_chunk(cfg, hyper, params, bptt, state, coeffs, key):
    """coeffs: [T, C, n_coeffs] MDCT frames; trains frame t → frame t+1."""
    xs = coeffs[:-1]
    ys = coeffs[1:]
    keys = jax.random.split(key, xs.shape[0])

    def body(carry, inp):
        params, bptt, state = carry
        x, y, k = inp
        params, bptt, state, mse = tanh_train_step(cfg, hyper, params, bptt,
                                                   state, x, y, k)
        return (params, bptt, state), mse

    (params, bptt, state), mses = jax.lax.scan(
        body, (params, bptt, state), (xs, ys, keys))
    return params, bptt, state, mses.mean()


@partial(jax.jit, static_argnums=(0, 1))
def parrot_dream_chunk(cfg, n_frames: int, params, hidden, last_answer, key):
    """Generate n_frames of MDCT coefficients by feeding the tanh output
    back, with multiplicative gaussian noise on the first half of the
    fed-back coefficients (gstparrot.c:566-577)."""
    half = cfg.output_size // 2
    keys = jax.random.split(key, n_frames)

    def body(carry, k):
        hidden, ans = carry
        fwd = forward_step(cfg, params, hidden, ans)
        a = jnp.tanh(fwd.output[:, :cfg.output_size])
        noise = jnp.clip(jax.random.normal(k, (a.shape[0], half)), -6, 6)
        fed = a.at[:, :half].multiply(1.0 + noise)
        return (fwd.hidden, fed), a

    (hidden, last_answer), frames = jax.lax.scan(
        body, (hidden, last_answer), keys)
    return hidden, last_answer, frames   # frames: [T, C, n_coeffs]


class Parrot:
    """The parrot element: simultaneous training and dreaming on streaming
    audio."""

    def __init__(self, n_channels: int = 1, hidden_size: int = 199,
                 window_size: int = PARROT_WINDOW_SIZE,
                 learn_rate: float = DEFAULT_LEARN_RATE,
                 momentum: float = 0.95, bptt_depth: int = 30,
                 rng_seed: int = 9, net_filename: Optional[str] = None,
                 audio_rate: int = PARROT_RATE):
        self.n_channels = n_channels
        self.window_size = window_size
        self.half = window_size // 2
        self.rate = audio_rate
        n_coeffs = window_size // 2
        # analysis window folds in the 1/32768 s16 normalisation
        # (gstparrot.c:285-287)
        self.mdct = MDCT(window_size, WindowType.VORBIS)
        self.analysis_mask = jnp.asarray(
            window_mask(window_size, WindowType.VORBIS, 1.0 / 32768.0))
        flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
        self.net = nn.new_net(n_coeffs, hidden_size, n_coeffs, flags=flags,
                              rng_seed=rng_seed, depth=bptt_depth,
                              learn_rate=learn_rate, momentum=momentum)
        winit.randomise_weights(self.net)
        cfg = self.net.cfg
        self.hyper = TrainHyper(
            learning_style=LearningMethod.MOMENTUM_WEIGHTED, condition=True)
        self.params = self.net.params
        self.bptt = nn.new_bptt_state(cfg, n_channels, learn_rate=learn_rate,
                                      momentum=momentum)
        self.state = nn.new_state(cfg, n_channels)
        self.key = jax.random.PRNGKey(rng_seed)
        self.net_filename = net_filename or "parrot.net"
        # streaming state
        self._train_tail = np.zeros((n_channels, self.half), np.float32)
        self._last_coeffs: Optional[jax.Array] = None
        self._dream_hidden = jnp.zeros((n_channels, cfg.h_size), jnp.float32)
        self._dream_answer = jnp.zeros((n_channels, n_coeffs), jnp.float32)
        self._dream_prev_frame = np.zeros((n_channels, window_size),
                                          np.float32)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def generation(self) -> int:
        return int(self.bptt.generation)

    def mdct_frames(self, pcm: np.ndarray) -> jax.Array:
        """[C, N] PCM → [T, C, n_coeffs] MDCT frames (windowed, scaled)."""
        C, N = pcm.shape
        frames = np.stack([frame_pcm(pcm[c], self.window_size)
                           for c in range(C)], axis=1)  # [T, C, W]
        x = jnp.asarray(frames) * self.analysis_mask
        return x @ self.mdct.F

    def train(self, pcm: np.ndarray) -> float:
        """Train on [C, N] (or [N] mono) PCM in the s16 range.  Returns the
        mean squared prediction error over the chunk."""
        pcm = np.atleast_2d(np.asarray(pcm, np.float32))
        pcm = np.concatenate([self._train_tail, pcm], axis=1)
        usable = (pcm.shape[1] - self.window_size) // self.half * self.half \
            + self.window_size
        if usable < 2 * self.window_size:
            self._train_tail = pcm
            return float("nan")
        self._train_tail = pcm[:, usable - self.window_size + self.half:]
        coeffs = self.mdct_frames(pcm[:, :usable])
        if self._last_coeffs is not None:
            coeffs = jnp.concatenate([self._last_coeffs[None], coeffs],
                                     axis=0)
        self._last_coeffs = coeffs[-1]
        self.params, self.bptt, self.state, mse = parrot_train_chunk(
            self.net.cfg, self.hyper, self.params, self.bptt, self.state,
            coeffs, self._next_key())
        return float(mse)

    def dream(self, n_samples: int) -> np.ndarray:
        """Generate [C, n_samples] of audio from the dream net (shared
        weights, private state)."""
        n_frames = (n_samples + self.half - 1) // self.half
        self._dream_hidden, self._dream_answer, frames = parrot_dream_chunk(
            self.net.cfg, n_frames, self.params, self._dream_hidden,
            self._dream_answer, self._next_key())
        # inverse MDCT + synthesis window; overlap-add at half hop.  The
        # reference applies the SAME 1/32768-scaled window at analysis and
        # synthesis and restores "doubly" with x32768^2 (gstparrot.c:287,
        # 566-575) — the synthesis window must carry its 1/32768 factor or
        # the restore overdrives the output 32768x into clipping.
        t_frames = np.asarray((frames @ jnp.asarray(self.mdct.I))
                              * self.analysis_mask)   # [T, C, W]
        C = self.n_channels
        out = np.zeros((C, n_frames * self.half), np.float32)
        prev = self._dream_prev_frame
        for t in range(n_frames):
            s = prev[:, self.half:] + t_frames[t][:, :self.half]
            out[:, t * self.half:(t + 1) * self.half] = s * (32768.0 * 32768.0)
            prev = t_frames[t]
        self._dream_prev_frame = prev
        return np.clip(out[:, :n_samples], -32768, 32767)

    def save(self, filename: Optional[str] = None):
        self.net.params = self.params
        self.net.generation = self.generation
        nn.save_net(self.net, filename or self.net_filename, backup=True)
