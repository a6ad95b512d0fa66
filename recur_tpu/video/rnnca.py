"""RNN cellular-automata video (gstrnnca.c rebuilt).

One small RNN is (a) trained on real video by a set of trainer pixels
predicting their own next YCbCr from a neighbourhood, and (b) iterated as a
cellular automaton over every pixel to generate video.

The reference runs 144x96 = 13,824 weight-sharing per-pixel clone nets in a
serial loop (gstrnnca.c:805-831).  Here the whole CA is two matmuls: pixel
neighbourhood gathers are a precomputed index take, every pixel is a row of
the [P, features] input batch, and each pixel's recurrent hidden state is a
row of [P, h_size].  Same for the trainer pixels ([200, features]).

Stasis detection (gstrnnca.c:764-802) samples pixels and randomises the
frame when they stop changing.
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
from recur_tpu.nn import Flag, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.ops.core import (advance_history,
                                dispatch_calc_deltas, forward_step)
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.ops.optimizers import apply_learning, momentum_soft_start

RNNCA_WIDTH = 144
RNNCA_HEIGHT = 96
DEFAULT_PATTERN = "Y00120111C0111"
N_TRAINERS = 200
HISTORY_SAMPLES = 16
HISTORY_SEEMS_STUCK = 5
HISTORY_RATE = 0.333


def parse_offset_pattern(pattern: str) -> tuple[list, list]:
    """setup_inputs (gstrnnca.c:376-439): digit pairs after 'Y' or 'C' are
    (x, y) neighbourhood offsets, expanded over their mirror/diagonal
    symmetries (zeros and equal coordinates collapse duplicates)."""
    offsets_y: list[tuple[int, int]] = []
    offsets_c: list[tuple[int, int]] = []
    target = offsets_y
    pair = [0, 0]
    parity = 0
    for ch in pattern:
        if ch == "Y":
            target = offsets_y
            continue
        if ch == "C":
            target = offsets_c
            continue
        if ch.isdigit():
            pair[parity] = int(ch)
            parity = 1 - parity
            if parity == 0:
                x = min(pair)
                y = max(pair)
                while True:
                    while True:
                        while True:
                            target.append((x, y))
                            y = -y
                            if y >= 0:
                                break
                        x = -x
                        if x >= 0:
                            break
                    x, y = y, x
                    if y >= x:
                        break
    return offsets_y, offsets_c


def _offset_indices(offsets, xs, ys, w, h, edges: bool) -> np.ndarray:
    """get_offset_point for arrays: [P, n_offsets] flat indices into a plane
    (edges: clamp vs wrap, gstrnnca.c:644-667)."""
    ox = np.array([o[0] for o in offsets])[None, :]
    oy = np.array([o[1] for o in offsets])[None, :]
    x = xs[:, None] + ox
    y = ys[:, None] + oy
    if edges:
        x = np.clip(x, 0, w - 1)
        y = np.clip(y, 0, h - 1)
    else:
        x = x % w
        y = y % h
    return (y * w + x).astype(np.int32)


class Rnnca:
    def __init__(self, hidden_size: int = 99, pattern: str = DEFAULT_PATTERN,
                 n_trainers: int = N_TRAINERS, learn_rate: float = 1e-5,
                 momentum: float = 0.95, momentum_soft_start: float = 2000.0,
                 bptt_depth: int = 30, edges: bool = False, rng_seed: int = 2,
                 width: int = RNNCA_WIDTH, height: int = RNNCA_HEIGHT,
                 len_pos: int = 3, net_filename: Optional[str] = None):
        self.w, self.h = width, height
        self.edges = edges
        self.offsets_y, self.offsets_c = parse_offset_pattern(pattern)
        self.len_pos = len_pos
        n_inputs = (len(self.offsets_y) + 2 * len(self.offsets_c) + len_pos)
        flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
        self.net = nn.new_net(n_inputs, hidden_size, 3, flags=flags,
                              rng_seed=rng_seed, depth=bptt_depth,
                              learn_rate=learn_rate, momentum=momentum)
        winit.randomise_weights(self.net)
        cfg = self.net.cfg
        self.hyper = TrainHyper(
            learning_style=LearningMethod.MOMENTUM_WEIGHTED,
            momentum_soft_start=momentum_soft_start, condition=True)
        self.momentum = momentum
        self.params = self.net.params
        self.bptt = nn.new_bptt_state(cfg, n_trainers, learn_rate=learn_rate,
                                      momentum=momentum)
        self.train_state = nn.new_state(cfg, n_trainers)
        self.key = jax.random.PRNGKey(rng_seed)
        self.net_filename = net_filename or "rnnca.net"

        # trainer pixels: random non-edge, non-overlapping (gstrnnca.c:267-317)
        rng = np.random.default_rng(rng_seed)
        taken = set()
        txs, tys = [], []
        while len(txs) < n_trainers:
            x = int(rng.integers(1, self.w - 1))
            y = int(rng.integers(1, self.h - 1))
            if (x, y) not in taken:
                taken.add((x, y))
                txs.append(x)
                tys.append(y)
        self.trainer_x = np.array(txs)
        self.trainer_y = np.array(tys)
        self._trainer_gather = self._build_gather(self.trainer_x,
                                                  self.trainer_y, True)
        # constructor (play) state: one hidden row per pixel
        P = self.w * self.h
        xs = np.tile(np.arange(self.w), self.h)
        ys = np.repeat(np.arange(self.h), self.w)
        self._play_gather = self._build_gather(xs, ys, edges)
        self.play_hidden = jnp.zeros((P, cfg.h_size), jnp.float32)
        self.play_frame = rng.integers(0, 256, (3, P)).astype(np.uint8)
        # stasis detection history
        self._stasis = [{"offset": int(rng.integers(0, P)), "hits": 1,
                         "colour": -1} for _ in range(HISTORY_SAMPLES)]
        # NOTE a fused single-block Pallas forward kernel was built and
        # raced for this serving fleet in rounds 3-4: 0.92x XLA at 13,824
        # streams / 1.05x at 341 (artifacts/realtime/pallas_race_r04.json)
        # — XLA's own fusion already saturates the shape, so the kernel
        # was removed rather than shipped as dead weight.

    def _build_gather(self, xs, ys, edges):
        """Precompute (plane_idx, flat_idx) feature gathers + positional
        features for a pixel set (fill_net_inputs, gstrnnca.c:670-691)."""
        iy = _offset_indices(self.offsets_y, xs, ys, self.w, self.h, edges)
        ic = _offset_indices(self.offsets_c, xs, ys, self.w, self.h, edges)
        xx = (xs / self.w).astype(np.float32)
        yy = (ys / self.h).astype(np.float32)
        pos = [xx, yy]
        if self.len_pos == 3:
            pos.append(0.5 - ((yy - 0.5) ** 2 + (xx - 0.5) ** 2))
        return (jnp.asarray(iy), jnp.asarray(ic),
                jnp.asarray(np.stack(pos, axis=1).astype(np.float32)))

    _features = staticmethod(lambda frame, gather: _ca_features(frame,
                                                                gather))

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def generation(self) -> int:
        return int(self.bptt.generation)

    # ---- training on real video (maybe_learn, gstrnnca.c:719-742) ----
    def train_frame_pair(self, prev: np.ndarray, now: np.ndarray):
        """prev/now: [3, H, W] u8 (or [3, P]) video thumbnails."""
        prev = jnp.asarray(prev.reshape(3, -1).astype(np.float32) / 255.0)
        now_t = now.reshape(3, -1)
        tidx = self.trainer_y * self.w + self.trainer_x
        targets = jnp.asarray(
            (now_t[:, tidx].T).astype(np.float32) / 255.0)   # [T, 3]
        feats = self._features(prev, self._trainer_gather)
        (self.params, self.bptt, self.train_state) = _rnnca_train_step(
            self.net.cfg, self.hyper, self.params, self.bptt,
            self.train_state, feats, targets, self._next_key(),
            jnp.float32(self.momentum))

    def train_frame_block(self, prevs: np.ndarray, nows: np.ndarray):
        """Train on a block of n frame pairs in ONE device call — the same
        sequential per-frame updates as n train_frame_pair calls (scan
        carries params/bptt/state between frames), but the ~26 ms axon
        readback latency and per-op dispatch are paid once per block, not
        per frame.  prevs/nows: [n, 3, H, W] (or [n, 3, P]) u8."""
        n = len(prevs)
        prevs = jnp.asarray(prevs.reshape(n, 3, -1))   # u8: half the PCIe
        nows = jnp.asarray(nows.reshape(n, 3, -1))     # bytes of f32
        tidx = jnp.asarray((self.trainer_y * self.w
                            + self.trainer_x).astype(np.int32))
        keys = jax.random.split(self._next_key(), n)
        (self.params, self.bptt, self.train_state) = _rnnca_train_block(
            self.net.cfg, self.hyper, self.params, self.bptt,
            self.train_state, prevs, nows, tidx, self._trainer_gather,
            keys, jnp.float32(self.momentum))

    # ---- CA play (fill_frame, gstrnnca.c:805-831) ----
    def step_ca_block(self, n: int = 8) -> np.ndarray:
        """n CA iterations in ONE device call → [n, 3, H, W] u8 frames.

        The per-pixel CA feedback loop (frame → features → forward →
        quantised frame) runs device-resident inside a lax.scan, so a
        block pays one ~26 ms tunnel readback instead of n.  Stasis
        detection (gstrnnca.c:764-802) still samples every frame, in
        order, on the host; a triggered randomisation applies at the
        block boundary (≤ n-1 frames later than the reference's
        per-frame check — the detector needs HISTORY_SEEMS_STUCK=5
        consecutive hits anyway, so block-edge latency is in-family)."""
        frame = jnp.asarray(self.play_frame)
        self.play_hidden, last, frames = _rnnca_play_block(
            self.net.cfg, self.params, self.play_hidden, frame,
            self._play_gather, n)
        out = np.asarray(frames)                 # one readback per block
        self.play_frame = np.asarray(last)
        for f in out:                            # sequential, per frame
            self._check_stasis(f)
        return out.reshape(n, 3, self.h, self.w)

    def step_ca(self) -> np.ndarray:
        """One CA iteration over every pixel; returns the [3, H, W] u8
        frame."""
        frame = jnp.asarray(
            self.play_frame.astype(np.float32) / 255.0)
        feats = self._features(frame, self._play_gather)
        self.play_hidden, out = _rnnca_play_step(
            self.net.cfg, self.params, self.play_hidden, feats)
        f = np.asarray(out)                          # [P, 3] in [0,1)
        self.play_frame = np.clip(f.T * 255.9, 0, 255).astype(np.uint8)
        self._check_stasis()
        return self.play_frame.reshape(3, self.h, self.w)

    def _check_stasis(self, frame: Optional[np.ndarray] = None):
        """Sample pixels of `frame` ([3, P]; default the current
        play_frame) and randomise play_frame when they stop changing."""
        if frame is None:
            frame = self.play_frame
        rng = self.net.rng
        if rng.rand_double() >= HISTORY_RATE:
            return
        P = self.w * self.h
        min_hits = 99999
        for hst in self._stasis:
            colour = (int(frame[0, hst["offset"]]) << 16 |
                      int(frame[1, hst["offset"]]) << 8 |
                      int(frame[2, hst["offset"]]))
            if hst["hits"] == 0:
                hst["offset"] = rng.rand_small_int(P)
                hst["hits"] = 1
                hst["colour"] = colour
                min_hits = 0
            elif hst["colour"] == colour:
                hst["hits"] += 1
                min_hits = min(min_hits, hst["hits"])
            else:
                hst["hits"] = 0
                min_hits = 0
        if min_hits > HISTORY_SEEMS_STUCK:
            self.play_frame = np.random.default_rng(
                rng.rand64() & 0xFFFFFFFF).integers(
                0, 256, self.play_frame.shape).astype(np.uint8)
            for hst in self._stasis:
                hst["hits"] = 0

    def shuffle_trainer(self):
        """Periodic trainer relocation (gstrnnca.c:743-748)."""
        rng = self.net.rng
        i = rng.rand_small_int(len(self.trainer_x))
        self.trainer_x[i] = rng.rand_small_int(self.w - 2) + 1
        self.trainer_y[i] = rng.rand_small_int(self.h - 2) + 1
        self._trainer_gather = self._build_gather(self.trainer_x,
                                                  self.trainer_y, True)

    def save(self, filename: Optional[str] = None):
        self.net.params = self.params
        self.net.generation = self.generation
        nn.save_net(self.net, filename or self.net_filename, backup=True)


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def _rnnca_train_step(cfg, hyper, params, bptt, state, feats, targets, key,
                      momentum_target):
    """One video frame: all trainer pixels forward + sigmoid error
    slope*(target-a) (train_net, gstrnnca.c:693-716), one weight update."""
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    fwd = forward_step(cfg, params, state.hidden, feats)
    state = advance_history(state, fwd.input_row)
    state = nn.RnnState(hidden=fwd.hidden, history=state.history,
                        head=state.head)
    a = jax.nn.sigmoid(fwd.output[:, :3])
    err = a * (1.0 - a) * (targets - a)
    o_error = jnp.zeros((feats.shape[0], cfg.o_size), jnp.float32)
    o_error = o_error.at[:, :3].set(err)
    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, None, o_error,
                    bptt.min_error_factor, bptt.learn_rate)
    params, bptt = apply_learning(cfg, params, bptt, d.ih_delta, d.ho_delta,
                                  None, hyper.learning_style, momentum, 1.0)
    bptt = dataclasses.replace(bptt, min_error_factor=d.min_error_factor,
                               ih_scale=d.stats["ih_scale"],
                               generation=bptt.generation + 1)
    params, bptt = condition_net(cfg, params, bptt, key)
    return params, bptt, state


@partial(jax.jit, static_argnums=(0,))
def _rnnca_play_step(cfg, params, hidden, feats):
    fwd = forward_step(cfg, params, hidden, feats)
    return fwd.hidden, jax.nn.sigmoid(fwd.output[:, :3])


def _ca_features(frame, gather):
    """frame: [3, P] float in [0,1); returns [N, n_inputs]
    (fill_net_inputs, gstrnnca.c:670-691)."""
    iy, ic, pos = gather
    fy = jnp.take(frame[0], iy)                  # [N, len_Y]
    fcb = jnp.take(frame[1], ic)                 # [N, len_C]
    fcr = jnp.take(frame[2], ic)
    fc = jnp.stack([fcb, fcr], axis=-1).reshape(fy.shape[0], -1)
    return jnp.concatenate([fy, fc, pos], axis=1)


@partial(jax.jit, static_argnums=(0, 5), donate_argnums=(2, 3))
def _rnnca_play_block(cfg, params, hidden, frame_u8, gather, n_steps):
    """n_steps CA iterations with the frame feedback loop device-resident;
    the frame is re-quantised to u8 every step exactly as the per-frame
    path does (the CA's dynamics — and the stasis detector — see the same
    255-level state the reference's u8 frame buffer holds)."""
    def step(carry, _):
        hidden, frame = carry
        f = frame.astype(jnp.float32) / 255.0
        feats = _ca_features(f, gather)
        fwd = forward_step(cfg, params, hidden, feats)
        out = jax.nn.sigmoid(fwd.output[:, :3])      # [P, 3] in (0,1)
        new = jnp.clip(out.T * 255.9, 0, 255).astype(jnp.uint8)
        return (fwd.hidden, new), new
    (hidden, frame), frames = jax.lax.scan(step, (hidden, frame_u8), None,
                                           length=n_steps)
    return hidden, frame, frames


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def _rnnca_train_block(cfg, hyper, params, bptt, state, prevs_u8, nows_u8,
                       tidx, gather, keys, momentum_target):
    """Sequential per-frame-pair training over a block (maybe_learn,
    gstrnnca.c:719-742, n frames per device call): identical updates to n
    _rnnca_train_step calls — params/bptt/state carry through the scan."""
    def step(carry, xs):
        params, bptt, state = carry
        prev, now, key = xs
        momentum = momentum_soft_start(bptt.generation, momentum_target,
                                       hyper.momentum_soft_start)
        f = prev.astype(jnp.float32) / 255.0
        feats = _ca_features(f, gather)
        targets = jnp.take(now, tidx, axis=1).T.astype(jnp.float32) / 255.0
        fwd = forward_step(cfg, params, state.hidden, feats)
        state = advance_history(state, fwd.input_row)
        state = nn.RnnState(hidden=fwd.hidden, history=state.history,
                            head=state.head)
        a = jax.nn.sigmoid(fwd.output[:, :3])
        err = a * (1.0 - a) * (targets - a)
        o_error = jnp.zeros((feats.shape[0], cfg.o_size), jnp.float32)
        o_error = o_error.at[:, :3].set(err)
        deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                         walk_unroll=hyper.walk_unroll)
        d = deltas_fn(cfg, params, state, None, o_error,
                      bptt.min_error_factor, bptt.learn_rate)
        params, bptt = apply_learning(cfg, params, bptt, d.ih_delta,
                                      d.ho_delta, None, hyper.learning_style,
                                      momentum, 1.0)
        bptt = dataclasses.replace(bptt, min_error_factor=d.min_error_factor,
                                   ih_scale=d.stats["ih_scale"],
                                   generation=bptt.generation + 1)
        params, bptt = condition_net(cfg, params, bptt, key)
        return (params, bptt, state), None
    (params, bptt, state), _ = jax.lax.scan(
        step, (params, bptt, state), (prevs_u8, nows_u8, keys))
    return params, bptt, state
