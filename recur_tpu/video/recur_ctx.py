"""The `recur` generative AV artwork (recur-context.c + context-recurse.c).

One RNN (i=15 MFCCs + 90 video features, h=199, o=8x6x3) serves two roles:

* 12 trainers at random positions/scales learn to predict an 8x6 YCbCr patch
  of the next frame from a 6x5 downscaled patch of the current frame plus the
  current audio features (recur_train_nets, context-recurse.c:128-160).
* 341 weight-sharing constructor clones form a depth-5 quadtree: the root's
  output patch seeds its 4 children's inputs, recursively; the 256 leaves
  paint a 128x96 frame through a bit-interleave unswizzle
  (rnn_recursive_construct, context-recurse.c:230-301).

TPU shape: the reference recurses serially through 341 nets per frame; here
each tree LEVEL is one batched forward ([4^k, features] rows), and the
child-input windows (with wraparound) are a precomputed index gather, so a
frame is 5 matmuls.  Constructor hidden state lives in one [341, h] array.
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
from recur_tpu.dsp.mfcc import AudioBinner
from recur_tpu.dsp.windows import WindowType
from recur_tpu.nn import Flag, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.ops.core import (advance_history,
                                dispatch_calc_deltas, forward_step)
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.ops.optimizers import apply_learning

# constants (recur-context.h:21-76)
AUDIO_RATE = 16000
N_FFT_BINS = 40
N_MFCCS = 15
WORKING_W, WORKING_H = 96, 72
INPUT_W, INPUT_H = 4, 3
GAIN = 2
OUTPUT_W, OUTPUT_H = INPUT_W * GAIN, INPUT_H * GAIN
OUTPUT_SIZE = OUTPUT_W * OUTPUT_H * 3
N_VIDEO_FEATURES = (INPUT_H + 2) * (INPUT_W + 2) * 3
N_HIDDEN = 199
BPTT_DEPTH = 20
N_TRAINERS = 12
DEPTH = 5
N_LEAVES = 1 << (2 * DEPTH - 2)           # 256
N_CONSTRUCTORS = (4 ** DEPTH - 1) // 3    # 341
DIM_GAIN = 1 << (DEPTH - 1)               # 16
CONSTRUCT_W = OUTPUT_W * DIM_GAIN         # 128
CONSTRUCT_H = OUTPUT_H * DIM_GAIN         # 96


def unswizzle(i: int) -> tuple[int, int]:
    """Bit-interleave index → (x, y): x is the even bits, y the odd bits
    (context-recurse.c:176-192)."""
    x = y = 0
    bit = 0
    while i:
        x |= (i & 1) << bit
        i >>= 1
        y |= (i & 1) << bit
        i >>= 1
        bit += 1
    return x, y


def _quadrant_indices() -> np.ndarray:
    """[4, N_VIDEO_FEATURES] gather indices into a parent's raw output
    vector for each child quadrant: a (INPUT_H+2)x(INPUT_W+2) window with
    wraparound (fill_sub_net_inputs, context-recurse.c:194-228)."""
    idx = np.zeros((4, N_VIDEO_FEATURES), np.int32)
    for q in range(4):
        left = q % GAIN
        top = (q // GAIN) % GAIN
        x_off = INPUT_W * left
        y_off = INPUT_H * top
        k = 0
        for plane in range(3):
            base = plane * OUTPUT_W * OUTPUT_H
            for y in range(y_off - 1, y_off + INPUT_H + 1):
                yy = (OUTPUT_H - 1 if y < 0 else
                      0 if y >= OUTPUT_H else y)
                for x in range(x_off - 1, x_off + INPUT_W + 1):
                    xx = (OUTPUT_W - 1 if x < 0 else
                          0 if x >= OUTPUT_W else x)
                    idx[q, k] = base + yy * OUTPUT_W + xx
                    k += 1
    return idx


def _leaf_gather_indices() -> np.ndarray:
    """[3 * CONSTRUCT_H * CONSTRUCT_W] flat indices into the stacked leaf
    outputs ([N_LEAVES, OUTPUT_SIZE].ravel()): the inverse of the
    bit-interleave unswizzle, so the whole frame assembles on-device as one
    gather instead of 256 host-side patch copies."""
    tile_of = np.zeros((DIM_GAIN, DIM_GAIN), np.int64)
    for i in range(N_LEAVES):
        x, y = unswizzle(i)
        tile_of[y, x] = i
    p, y, x = np.meshgrid(np.arange(3), np.arange(CONSTRUCT_H),
                          np.arange(CONSTRUCT_W), indexing="ij")
    leaf = tile_of[y // OUTPUT_H, x // OUTPUT_W]
    elem = (p * OUTPUT_H * OUTPUT_W + (y % OUTPUT_H) * OUTPUT_W
            + (x % OUTPUT_W))
    return (leaf * OUTPUT_SIZE + elem).astype(np.int32).ravel()


def _downscale_patch(plane: np.ndarray, x: int, y: int, w: int, h: int,
                     scale: int) -> np.ndarray:
    """recur_integer_downscale_to_float for a patch: u8 plane region at
    (x, y) of size (w*scale, h*scale) → [h, w] floats in [0, 1)."""
    a = plane[y:y + h * scale, x:x + w * scale].astype(np.float32)
    a = a.reshape(h, scale, w, scale).mean(axis=(1, 3))
    return a / 256.0


class RecurContext:
    def __init__(self, rng_seed: int = 4, learn_rate: float = 1e-5,
                 momentum: float = 0.95,
                 net_filename: Optional[str] = None):
        n_inputs = N_MFCCS + N_VIDEO_FEATURES
        self.net = nn.new_net(n_inputs, N_HIDDEN, OUTPUT_SIZE,
                              flags=Flag.STANDARD, rng_seed=rng_seed,
                              depth=BPTT_DEPTH, learn_rate=learn_rate,
                              momentum=momentum)
        winit.randomise_weights(self.net)
        cfg = self.net.cfg
        self.hyper = TrainHyper(
            learning_style=LearningMethod.MOMENTUM_WEIGHTED, condition=True)
        self.params = self.net.params
        self.bptt = nn.new_bptt_state(cfg, N_TRAINERS,
                                      learn_rate=learn_rate,
                                      momentum=momentum)
        self.train_state = nn.new_state(cfg, N_TRAINERS)
        self.key = jax.random.PRNGKey(rng_seed)
        self.net_filename = net_filename or "recur.net"
        self.binner = AudioBinner(512, WindowType.HANN, N_FFT_BINS, 20.0,
                                  AUDIO_RATE * 0.499, 700.0, 0.0, AUDIO_RATE,
                                  value_size=2)
        self.current_audio = np.zeros(N_MFCCS, np.float32)
        # trainers: random non-overlapping patches at scales 1..5
        # (setup_trainers, context-recurse.c:40-80)
        rng = np.random.default_rng(rng_seed)
        mask = np.zeros((WORKING_H, WORKING_W), bool)
        self.trainers = []
        for scale_max in range(5, 0, -1):
            for _ in range(N_TRAINERS * 10):
                scale = int(rng.integers(1, scale_max + 1))
                h, w = scale * OUTPUT_H, scale * OUTPUT_W
                margin = 2 * scale
                # the INPUT window spans (x-scale .. x-scale+12*scale,
                # y-scale .. y-scale+10*scale); keep it inside the frame
                # (the C reference reads strided out-of-patch bytes there,
                # the numpy reshape cannot)
                x_hi = min(WORKING_W - w - margin,
                           WORKING_W - (INPUT_W + 2) * GAIN * scale + scale)
                y_hi = min(WORKING_H - h - margin,
                           WORKING_H - (INPUT_H + 2) * GAIN * scale + scale)
                if x_hi <= margin or y_hi <= margin:
                    continue
                x = int(rng.integers(margin, x_hi + 1))
                y = int(rng.integers(margin, y_hi + 1))
                if not mask[y:y + h, x:x + w].any():
                    mask[y:y + h, x:x + w] = True
                    self.trainers.append((x, y, scale))
                    if len(self.trainers) == N_TRAINERS:
                        break
            if len(self.trainers) == N_TRAINERS:
                break
            mask[:] = False
            self.trainers = []
        # constructor state
        self.quad_idx = jnp.asarray(_quadrant_indices())
        self.construct_hidden = jnp.zeros(
            (N_CONSTRUCTORS, cfg.h_size), jnp.float32)
        self.seed = np.zeros(N_VIDEO_FEATURES, np.float32)
        self._leaf_pos = [unswizzle(i) for i in range(N_LEAVES)]
        self._leaf_gather = jnp.asarray(_leaf_gather_indices())

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def generation(self) -> int:
        return int(self.bptt.generation)

    # ---- audio (consume_audio_samples, recur-context.c:25-140) ----
    def set_audio_window(self, pcm: np.ndarray):
        """Extract volume-normalised MFCCs from the audio window centred on
        the current frame."""
        w = 512
        if len(pcm) < w:
            pcm = np.pad(pcm, (0, w - len(pcm)))
        mf = np.asarray(self.binner.mfccs(jnp.asarray(
            pcm[:w].astype(np.float32))[None]))[0]
        volume = float(np.abs(pcm).mean()) or 1.0
        self.current_audio = (mf[:N_MFCCS] / max(np.log1p(volume), 1.0)
                              ).astype(np.float32)

    # ---- training (recur_train_nets, context-recurse.c:128-160) ----
    def train_frame_pair(self, src: np.ndarray, target: np.ndarray):
        """src/target: [3, WORKING_H, WORKING_W] u8 frames."""
        feats = np.zeros((N_TRAINERS, N_MFCCS + N_VIDEO_FEATURES), np.float32)
        targs = np.zeros((N_TRAINERS, OUTPUT_SIZE), np.float32)
        for j, (x, y, scale) in enumerate(self.trainers):
            feats[j, :N_MFCCS] = self.current_audio
            vin = []
            for p in range(3):
                vin.append(_downscale_patch(src[p], (x - scale) * 1,
                                            (y - scale) * 1, INPUT_W + 2,
                                            INPUT_H + 2, scale * GAIN))
            feats[j, N_MFCCS:] = np.concatenate([v.ravel() for v in vin])
            tout = []
            for p in range(3):
                tout.append(_downscale_patch(target[p], x, y, OUTPUT_W,
                                             OUTPUT_H, scale))
            targs[j] = np.concatenate([t.ravel() for t in tout])
        (self.params, self.bptt, self.train_state) = _recur_train_step(
            self.net.cfg, self.hyper, self.params, self.bptt,
            self.train_state, jnp.asarray(feats), jnp.asarray(targs),
            self._next_key())

    # ---- generation (rnn_recursive_construct, context-recurse.c:230-301) --
    def construct(self, seed: Optional[np.ndarray] = None) -> np.ndarray:
        """One fractal construction pass → [3, 96, 128] u8 frame."""
        if seed is None:
            seed = self.seed
        audio = jnp.asarray(self.current_audio)
        self.construct_hidden, leaf_out, root_out = _recur_construct(
            self.net.cfg, self.params, self.construct_hidden, self.quad_idx,
            jnp.asarray(seed.astype(np.float32)), audio)
        leaf = np.asarray(leaf_out)       # [N_LEAVES, OUTPUT_SIZE] sigmoided
        planes = np.zeros((3, CONSTRUCT_H, CONSTRUCT_W), np.uint8)
        for i, (x, y) in enumerate(self._leaf_pos):
            patch = leaf[i].reshape(3, OUTPUT_H, OUTPUT_W)
            planes[:, y * OUTPUT_H:(y + 1) * OUTPUT_H,
                   x * OUTPUT_W:(x + 1) * OUTPUT_W] = \
                np.clip(patch * 255.99, 0, 255).astype(np.uint8)
        # feed back: root output downscaled becomes the next seed (INPUT+2
        # window is built from the INPUT-sized downscale with edge repeat)
        root = np.asarray(root_out).reshape(3, OUTPUT_H, OUTPUT_W)
        small = root.reshape(3, INPUT_H, GAIN, INPUT_W, GAIN).mean((2, 4))
        pad = np.pad(small, ((0, 0), (1, 1), (1, 1)), mode="wrap")
        self.seed = pad.ravel().astype(np.float32)
        return planes

    def confabulate(self) -> np.ndarray:
        """Self-feeding generation (recur_confabulate, context-recurse.c:
        306-330): the root's previous output, downscaled, seeds the next
        construction."""
        return self.construct(self.seed)

    def confabulate_block(self, n: int = 8) -> np.ndarray:
        """n self-feeding constructions in ONE device call →
        [n, 3, 96, 128] u8 frames.  The audio features are held for the
        block (call set_audio_window between blocks; at 25 fps and n=8
        that is a 0.32 s audio granularity — the element's MFCC window is
        centred per block instead of per frame)."""
        audio = jnp.asarray(self.current_audio)
        self.construct_hidden, seed, frames = _recur_construct_block(
            self.net.cfg, self.params, self.construct_hidden,
            jnp.asarray(self.seed.astype(np.float32)), audio,
            self.quad_idx, n, self._leaf_gather)
        out = np.asarray(frames)                 # one readback per block
        self.seed = np.asarray(seed)             # queue drained: ~free
        return out

    def save(self, filename: Optional[str] = None):
        self.net.params = self.params
        self.net.generation = self.generation
        nn.save_net(self.net, filename or self.net_filename, backup=True)


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def _recur_train_step(cfg, hyper, params, bptt, state, feats, targets, key):
    fwd = forward_step(cfg, params, state.hidden, feats)
    state = advance_history(state, fwd.input_row)
    state = nn.RnnState(hidden=fwd.hidden, history=state.history,
                        head=state.head)
    a = jax.nn.sigmoid(fwd.output[:, :cfg.output_size])
    err = a * (1.0 - a) * (targets - a)
    o_error = jnp.zeros((feats.shape[0], cfg.o_size), jnp.float32)
    o_error = o_error.at[:, :cfg.output_size].set(err)
    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, None, o_error,
                    bptt.min_error_factor, bptt.learn_rate)
    params, bptt = apply_learning(cfg, params, bptt, d.ih_delta, d.ho_delta,
                                  None, hyper.learning_style, bptt.momentum,
                                  1.0)
    bptt = dataclasses.replace(bptt, min_error_factor=d.min_error_factor,
                               ih_scale=d.stats["ih_scale"],
                               generation=bptt.generation + 1)
    params, bptt = condition_net(cfg, params, bptt, key)
    return params, bptt, state


@partial(jax.jit, static_argnums=(0,))
def _recur_construct(cfg, params, hidden, quad_idx, seed, audio):
    return _construct_levels(cfg, params, hidden, quad_idx, seed, audio)


def _construct_levels(cfg, params, hidden, quad_idx, seed, audio):
    """Levelwise quadtree construction: level k is one [4^k, features]
    batched forward.  Returns (new hidden [341, h], sigmoided leaf outputs
    [256, OUTPUT_SIZE], raw root output)."""
    new_hidden = []
    # root input: sigmoid(seed) + audio
    x = jnp.concatenate([audio, jax.nn.sigmoid(seed)])[None, :]
    out = None
    root_out = None
    offset = 0
    for depth in range(DEPTH):
        n = 4 ** depth
        h_level = hidden[offset:offset + n]
        fwd = forward_step(cfg, params, h_level, x)
        new_hidden.append(fwd.hidden)
        out = fwd.output[:, :OUTPUT_SIZE]            # [n, OUTPUT_SIZE] raw
        if depth == 0:
            # RAW root output: recur_confabulate downscales net->output_layer
            # unsigmoided into the seed, and the next construction applies
            # the single sigmoid (context-recurse.c:306-330, 262) — a
            # sigmoid here would compress the feedback to [0.5, 0.73]
            root_out = out[0]
        if depth < DEPTH - 1:
            # children inputs: gather quadrant windows from parent outputs
            sub = jax.nn.sigmoid(out[:, quad_idx])   # [n, 4, N_VIDEO_FEATS]
            sub = sub.reshape(n * 4, N_VIDEO_FEATURES)
            aud = jnp.broadcast_to(audio, (n * 4, N_MFCCS))
            x = jnp.concatenate([aud, sub], axis=1)
        offset += n
    leaves = jax.nn.sigmoid(out)
    return jnp.concatenate(new_hidden, axis=0), leaves, root_out


@partial(jax.jit, static_argnums=(0, 6), donate_argnums=(2, 3))
def _recur_construct_block(cfg, params, hidden, seed, audio, quad_idx,
                           n_frames, leaf_gather):
    """n_frames self-feeding constructions in one device call: the seed
    feedback (root raw output → 2x2 mean downscale → wrap-pad, the
    recur_confabulate loop of context-recurse.c:306-330) and the
    bit-interleave frame assembly both run in-graph, so a block pays one
    ~26 ms tunnel readback instead of n."""
    def step(carry, _):
        hidden, seed = carry
        hidden, leaves, root = _construct_levels(cfg, params, hidden,
                                                 quad_idx, seed, audio)
        frame = jnp.clip(
            jnp.take(leaves.ravel(), leaf_gather).reshape(
                3, CONSTRUCT_H, CONSTRUCT_W) * 255.99,
            0, 255).astype(jnp.uint8)
        root3 = root.reshape(3, OUTPUT_H, OUTPUT_W)
        small = root3.reshape(3, INPUT_H, GAIN, INPUT_W, GAIN).mean((2, 4))
        seed = jnp.pad(small, ((0, 0), (1, 1), (1, 1)),
                       mode="wrap").ravel()
        return (hidden, seed), frame
    (hidden, seed), frames = jax.lax.scan(step, (hidden, seed), None,
                                          length=n_frames)
    return hidden, seed, frames
