"""Streaming audio classification: the gstclassify element rebuilt as a
host-side ring buffer + jitted window-batch training.

The reference (gstclassify.c) trains one subnet per interleaved channel on
half-overlapped MFCC windows at real-time rate.  Here channels are the stream
axis and whole *chunks of windows* are one device call: PCM [T, C, window] →
(mel/MFCC + Δ features) → scan of RNN train steps, so feature extraction and
training fuse into a single XLA program.

Capabilities kept from the element's ~50 properties: class groups
("Mm,Kk,Wx" = independent softmaxes, gstclassify.c:709-748), target event
strings ("c0t2.3:mkW", :1382-1541), error weighting, balanced training
(:2205-2215 — keep-probabilities refresh per window from seen counts
carried through the scan; decisions run on-device), ignored windows,
training lag, feature
offset/scale normalisation, Δ features and the intensity feature.
"""

from __future__ import annotations

import dataclasses
import re
from collections import deque
from functools import partial
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.audio import properties
from recur_tpu.engine import TrainHyper
from recur_tpu.dsp.mfcc import AudioBinner
from recur_tpu.dsp.windows import WindowType
from recur_tpu.nn import Activation, Flag, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.ops.core import (advance_history,
                                dispatch_calc_deltas, forward_step)
from recur_tpu.ops.conditioning import condition_net
from recur_tpu.ops.optimizers import apply_learning, momentum_soft_start
from recur_tpu.utils.hashing import rnn_hash32
from recur_tpu.utils.kvlog import KvLog

CLASSIFY_RATE = 8000
CLASSIFY_N_FFT_BINS = 40


@dataclasses.dataclass(frozen=True)
class ClassGroup:
    classes: str
    offset: int

    @property
    def n_classes(self) -> int:
        return len(self.classes)


def parse_classes_string(s: str) -> list[ClassGroup]:
    """"Mm,Kk,Wx" → groups of independent softmax classes
    (parse_classes_string, gstclassify.c:727-748).  Offsets count commas the
    way the reference does (group offset = position in the string)."""
    groups = []
    offset = 0
    for part in s.split(","):
        groups.append(ClassGroup(classes=part, offset=offset))
        offset += len(part) + 1
    # re-pack offsets contiguously (the reference's offset includes the
    # commas' slots, wasting output cells; we keep them dense)
    dense = []
    offset = 0
    for g in groups:
        dense.append(ClassGroup(classes=g.classes, offset=offset))
        offset += g.n_classes
    return dense


class ClassEvent(NamedTuple):
    window_no: int
    channel: int
    group: int
    target: int    # -1 = no training


def parse_target_string(s: str, groups: list[ClassGroup], n_channels: int,
                        window_size: int, lag: float = 0.0,
                        rate: int = CLASSIFY_RATE) -> list[ClassEvent]:
    """The c<chan>t<time>:<targets> grammar (gstclassify.c:1431-1541).
    Targets per event: one char per group — a class letter, '=' (no change)
    or '-' (stop training)."""
    time_to_window_no = rate * 2.0 / window_size
    events: list[ClassEvent] = []
    for phrase in s.split():
        m = re.match(r"^c(\d+)t([0-9.eE+-]+):(.*)$", phrase)
        if not m:
            raise ValueError(f"can't parse target phrase {phrase!r}")
        channel = int(m.group(1))
        if not (0 <= channel < n_channels):
            raise ValueError(f"channel {channel} out of range in {phrase!r}")
        t = float(m.group(2))
        window_no = int((t + lag) * time_to_window_no + 0.5)
        if window_no < 0:
            raise ValueError(f"negative window in {phrase!r}")
        targets = m.group(3)
        if len(targets) != len(groups):
            raise ValueError(f"{phrase!r} has {len(targets)} targets for "
                             f"{len(groups)} groups")
        for j, (ch, g) in enumerate(zip(targets, groups)):
            if ch == "=":
                continue
            if ch == "-":
                events.append(ClassEvent(window_no, channel, j, -1))
            else:
                k = g.classes.find(ch)
                if k < 0:
                    raise ValueError(f"class {ch!r} not in group "
                                     f"{g.classes!r}")
                events.append(ClassEvent(window_no, channel, j, k))
    events.sort()
    return events


def targets_for_windows(events: list[ClassEvent], start_window: int, T: int,
                        n_channels: int, n_groups: int,
                        current: np.ndarray) -> np.ndarray:
    """Materialise per-window targets [T, C, G] from the event list, starting
    from the `current` [C, G] state (which is updated in place to the state
    after window start_window+T-1)."""
    out = np.empty((T, n_channels, n_groups), np.int32)
    ei = 0
    while ei < len(events) and events[ei].window_no <= start_window:
        ev = events[ei]
        current[ev.channel, ev.group] = ev.target
        ei += 1
    evs = [e for e in events if start_window < e.window_no]
    it = iter(evs)
    nxt = next(it, None)
    for t in range(T):
        w = start_window + t
        while nxt is not None and nxt.window_no <= w:
            current[nxt.channel, nxt.group] = nxt.target
            nxt = next(it, None)
        out[t] = current
    return out


# ---------------------------------------------------------------------------
# device step
# ---------------------------------------------------------------------------

class WindowStats(NamedTuple):
    error: jax.Array      # scalar: Σ (1 - p_target) over trained groups
    correct: jax.Array    # scalar: Σ winner==target
    trained: jax.Array    # scalar: groups trained
    seen: jax.Array       # [o_size]: seen counts this window
    used: jax.Array       # [o_size]: used counts this window


def _group_masks(cfg, groups: list[ClassGroup]):
    """Static [G, o_size] one-hot span masks."""
    G = len(groups)
    m = np.zeros((G, cfg.o_size), np.float32)
    for i, g in enumerate(groups):
        m[i, g.offset:g.offset + g.n_classes] = 1.0
    return jnp.asarray(m), jnp.asarray(
        np.array([g.offset for g in groups], np.int32)), jnp.asarray(
        np.array([g.n_classes for g in groups], np.int32))


def classify_window_step(cfg, hyper, groups, params, bptt, state,
                         features, targets, train_p, error_weight,
                         window_live, key, momentum_target,
                         presynaptic_noise):
    """One analysis window across C channels (train_channel + the
    apply/condition tail of maybe_learn, gstclassify.c:2070-2254).

    features: [C, n_features]; targets: [C, G] int (-1 = no train);
    train_p: [o_size] balanced-training keep-probabilities (1.0 = always);
    error_weight: [o_size]; window_live: scalar bool (ignored_windows gate).
    """
    C = features.shape[0]
    G = len(groups)
    gmask, goff, gn = _group_masks(cfg, groups)
    momentum = momentum_soft_start(bptt.generation, momentum_target,
                                   hyper.momentum_soft_start)
    nk, bk, ck = jax.random.split(key, 3)
    fwd = forward_step(cfg, params, state.hidden, features,
                       noise_key=nk if hyper.use_noise else None,
                       presynaptic_noise=presynaptic_noise)
    state = advance_history(state, fwd.input_row)
    state = nn.RnnState(hidden=fwd.hidden, history=state.history,
                        head=state.head)

    logits = fwd.output[:, :cfg.o_size]
    # per-group masked softmax: set out-of-group logits to -inf per group
    lg = jnp.where(gmask[None, :, :] > 0, logits[:, None, :], -jnp.inf)
    p = jax.nn.softmax(lg, axis=-1)                    # [C, G, o_size]
    p = jnp.where(gmask[None, :, :] > 0, p, 0.0)
    winner_abs = jnp.argmax(lg, axis=-1)               # [C, G] absolute idx
    winner = winner_abs - goff[None, :]

    valid = (targets >= 0) & (targets < gn[None, :]) & window_live
    tgt_abs = jnp.clip(targets, 0) + goff[None, :]     # [C, G]
    # balanced-training keep decision per (channel, group)
    keep_p = jnp.take(train_p, tgt_abs)                # [C, G]
    u = jax.random.uniform(bk, (C, G))
    keep = valid & (keep_p > u)

    onehot = jax.nn.one_hot(tgt_abs, cfg.o_size, dtype=jnp.float32)
    err = (onehot - p) * keep[:, :, None].astype(jnp.float32)
    o_error = err.sum(axis=1)                          # [C, o_size]
    o_error = o_error * error_weight[None, :]

    # one-hot contraction, not take_along_axis (TPU gathers are slow)
    p_t = jnp.sum(p * onehot, axis=-1)
    err_sum = jnp.sum((1.0 - p_t) * keep)
    correct = jnp.sum((winner == targets) & keep)
    trained = jnp.sum(keep)

    deltas_fn = dispatch_calc_deltas(hyper.bptt_impl,
                                 walk_unroll=hyper.walk_unroll)
    d = deltas_fn(cfg, params, state, fwd.bottom_inputs, o_error,
                    bptt.min_error_factor, bptt.learn_rate)

    def do_apply(args):
        params, bptt = args
        return apply_learning(cfg, params, bptt, d.ih_delta, d.ho_delta,
                              d.bottom_delta, hyper.learning_style, momentum,
                              hyper.bottom_learn_rate_scale)

    params, bptt = jax.lax.cond(err_sum > 0, do_apply,
                                lambda a: a, (params, bptt))
    # channels with nothing to train skip rnn_bptt_calc_deltas in the
    # reference (train_channel early-outs, gstclassify.c:2079-2094), so
    # their per-clone adaptive min_error_factor must hold rather than be
    # eroded by a zero-error walk
    trained_ch = keep.any(axis=1)                      # [C]
    bptt = dataclasses.replace(
        bptt,
        min_error_factor=jnp.where(trained_ch, d.min_error_factor,
                                   bptt.min_error_factor),
        ih_scale=d.stats["ih_scale"],
        generation=bptt.generation + 1)
    if hyper.condition:
        params, bptt = condition_net(cfg, params, bptt, ck)

    seen_oh = jax.nn.one_hot(tgt_abs, cfg.o_size, dtype=jnp.float32) \
        * valid[:, :, None]
    used_oh = jax.nn.one_hot(tgt_abs, cfg.o_size, dtype=jnp.float32) \
        * keep[:, :, None]
    stats = WindowStats(error=err_sum, correct=correct.astype(jnp.float32),
                        trained=trained.astype(jnp.float32),
                        seen=seen_oh.sum(axis=(0, 1)),
                        used=used_oh.sum(axis=(0, 1)))
    return params, bptt, state, stats


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4, 5))
def classify_train_windows(cfg, hyper, groups, params, bptt, state,
                           features, targets, seen_counts, balance_bias,
                           error_weight, window_live, window_real, key,
                           momentum_target, presynaptic_noise):
    """Scan over T windows.  features: [T, C, F]; targets: [T, C, G];
    window_live: [T] bool.

    seen_counts [o_size] are carried through the scan so the
    balanced-training keep-probabilities `(1 - seen/total)^bias` refresh
    every window from the running counts, exactly as the reference
    recomputes train_p at the top of each window (gstclassify.c:2205-2215).
    bias = 0 yields p^0 = 1 everywhere (balancing off).

    window_real: [T] bool.  False marks PADDING windows (a flushed tail
    block padded up to BLOCK_WINDOWS so every device call compiles once):
    the step runs but its entire effect — params, optimizer state,
    hidden/history, generation, conditioning — is discarded, as if the
    window never existed."""
    T = features.shape[0]
    keys = jax.random.split(key, T)

    def body(carry, inp):
        params, bptt, state, seen = carry
        f, t, live, real, k = inp
        scale = 1.0 / (seen.sum() + 1.0)
        # clamp: f32 rounding can push seen*scale past 1 for a dominant
        # class, and a negative base under a fractional bias would be NaN
        train_p = jnp.maximum(1.0 - seen * scale, 0.0) ** balance_bias
        new_p, new_b, new_s, stats = classify_window_step(
            cfg, hyper, groups, params, bptt, state, f, t, train_p,
            error_weight, live & real, k, momentum_target,
            presynaptic_noise)
        sel = lambda n, o: jnp.where(real, n, o)
        params = jax.tree.map(sel, new_p, params)
        bptt = jax.tree.map(sel, new_b, bptt)
        state = jax.tree.map(sel, new_s, state)
        return (params, bptt, state, seen + stats.seen), stats

    (params, bptt, state, _), stats = jax.lax.scan(
        body, (params, bptt, state, seen_counts),
        (features, targets, window_live, window_real, keys),
        unroll=getattr(hyper, "unroll", 1))
    return params, bptt, state, jax.tree.map(lambda x: x.sum(0), stats)


@partial(jax.jit, static_argnums=(0, 1))
def classify_opine_windows(cfg, groups, params, hidden, features,
                           window_real):
    """Inference over T windows (emit_opinions, gstclassify.c:2259-2291):
    returns per-window per-channel per-group probabilities and winners.
    window_real: [T] bool — False marks padding windows (flushed tail
    blocks padded to a fixed shape) whose hidden-state advance is
    discarded; their probs/winners rows are garbage the caller drops."""
    gmask, goff, gn = _group_masks(cfg, groups)

    def body(h, inp):
        f, real = inp
        fwd = forward_step(cfg, params, h, f)
        logits = fwd.output[:, :cfg.o_size]
        lg = jnp.where(gmask[None, :, :] > 0, logits[:, None, :], -jnp.inf)
        p = jax.nn.softmax(lg, axis=-1)
        p = jnp.where(gmask[None, :, :] > 0, p, 0.0)
        winner = jnp.argmax(lg, axis=-1) - goff[None, :]
        return jnp.where(real, fwd.hidden, h), (p, winner)

    hidden, (probs, winners) = jax.lax.scan(body, hidden,
                                            (features, window_real))
    return hidden, probs, winners


# ---------------------------------------------------------------------------
# the harness
# ---------------------------------------------------------------------------

class AudioClassifier:
    """The classify element + its streaming loop.

    Feed interleaved (or [C, N]) s16/f32 PCM with feed(); each half-window
    boundary produces one analysis window per channel.  In training mode
    windows train the net; otherwise opinions are returned as dicts (the bus
    message equivalent, gstclassify.c:1937-1980).
    """

    def __init__(self, classes: str, n_channels: int = 1,
                 window_size: int = 256, hidden_size: int = 199,
                 mfccs: int = 0, delta_features: int = 0,
                 intensity_feature: int = 0,
                 min_frequency: float = 60.0, max_frequency: float = 0.0,
                 knee_frequency: float = 700.0, focus_frequency: float = 0.0,
                 lag: float = 0.0, ignored_windows: int = 0,
                 learn_rate: float = 0.0001, momentum: float = 0.95,
                 momentum_soft_start: float = 0.0,
                 learning_style: int = int(LearningMethod.MOMENTUM_NESTEROV),
                 activation: int = int(Activation.RELU),
                 presynaptic_noise: float = 0.0, bptt_depth: int = 30,
                 bottom_layer: int = 0, error_weight: Optional[str] = None,
                 balanced_training_bias: float = 0.0,
                 weight_init_method: int = 1, rng_seed: int = 11,
                 basename: str = "classify", net_filename: Optional[str] = None,
                 force_load: bool = False, log_file: Optional[str] = None,
                 audio_rate: int = CLASSIFY_RATE,
                 window_type: WindowType = WindowType.HANN,
                 pipeline_depth: int = 1, unroll: int = 1,
                 walk_unroll: int = 1, mesh=None,
                 confirmation_lag: float = 0.0,
                 features_offset: Optional[str] = None,
                 features_scale: Optional[str] = None,
                 weight_init_scale: float = 0.0,
                 weight_fan_in_sum: float = 0.0,
                 weight_fan_in_kurtosis: float = 0.3,
                 adagrad_ballast: float = 200.0,
                 top_learn_rate_scale: float = 1.0,
                 bottom_learn_rate_scale: float = 1.0,
                 random_alignment: bool = False,
                 weight_noise: float = 0.0,
                 features_file: Optional[str] = None):
        self.groups = parse_classes_string(classes)
        self.classes_string = classes
        self.n_channels = n_channels
        self.window_size = window_size
        self.rate = audio_rate
        self.lag = lag
        self.confirmation_lag = confirmation_lag
        self.ignored_windows = ignored_windows
        self.balanced_training_bias = balanced_training_bias
        self.momentum = momentum
        max_frequency = max_frequency or audio_rate * 0.499
        self.min_frequency = min_frequency
        self.max_frequency = max_frequency
        self.knee_frequency = knee_frequency
        self.focus_frequency = focus_frequency
        self.mfccs = mfccs
        self.delta_features = delta_features
        self.intensity_feature = intensity_feature
        self.window_type = WindowType(window_type)
        self.basename = basename
        self.net_basename = basename
        self.random_alignment = bool(random_alignment)
        self.weight_noise = weight_noise
        self._skip_samples = 0
        self._features_file = open(features_file, "w") if features_file \
            else None
        # the binner always computes CLASSIFY_N_FFT_BINS mel-ish bins
        # (recur_audio_binner_new, gstclassify.c:962-968); mfccs selects how
        # many DCT coefficients of those 40 bins are kept as features
        self.binner = AudioBinner(
            window_size, window_type, CLASSIFY_N_FFT_BINS,
            min_frequency, max_frequency, knee_frequency, focus_frequency,
            audio_rate, value_size=2)
        n_raw = (mfccs if mfccs else CLASSIFY_N_FFT_BINS) + intensity_feature
        self.n_raw_features = n_raw
        self.n_features = n_raw * (1 + delta_features)
        n_outputs = sum(g.n_classes for g in self.groups)

        # feature normalisation (gstclassify.c:2040-2051) — allocated before
        # the metadata render: the ctor's offset/scale strings are part of
        # the metadata (and so the filename hash), exactly as the element's
        # properties are at net-creation time (gstclassify.c:1240-1248)
        self.feature_offsets = np.zeros(self.n_features, np.float32)
        self.feature_scales = np.ones(self.n_features, np.float32)
        self.set_feature_normalisation(
            properties.parse_colon_floats(features_offset, self.n_features),
            properties.parse_colon_floats(features_scale, self.n_features))

        metadata = self._construct_metadata()
        self.net_filename = net_filename or self._default_filename(
            basename, hidden_size, bottom_layer, n_outputs, metadata)

        flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
        if learning_style in (LearningMethod.ADADELTA, LearningMethod.RPROP):
            flags |= Flag.AUX_ARRAYS
        import os
        if force_load and os.path.exists(self.net_filename):
            self.net = nn.load_net(self.net_filename)
            self._reconcile_metadata(self.net.metadata)
        else:
            self.net = nn.new_net(
                self.n_features, hidden_size, n_outputs, flags=flags,
                rng_seed=rng_seed, depth=bptt_depth, learn_rate=learn_rate,
                momentum=momentum, presynaptic_noise=presynaptic_noise,
                activation=Activation(activation),
                bottom_input_size=self.n_features if bottom_layer else 0,
                metadata=metadata)
            # initialise_net (gstclassify.c:1043-1060): an explicit
            # weight-fan-in-sum selects the fan-in method unless the init
            # method itself was chosen (DWIM back-compatibility)
            method = nn.InitMethod(weight_init_method)
            if weight_fan_in_sum and weight_init_method == 1:
                method = nn.InitMethod.FAN_IN
            p = winit.default_init_params(self.net.cfg)
            p = dataclasses.replace(
                p, method=method,
                fan_in_sum=weight_fan_in_sum or p.fan_in_sum,
                fan_in_step=weight_fan_in_kurtosis)
            winit.randomise_weights(self.net, p)
            if weight_init_scale:
                winit.scale_initial_weights(self.net, weight_init_scale)
            # create_net (gstclassify.c:1117-1122): per-matrix LR scales
            self.net.ho_scale = top_learn_rate_scale
        cfg = self.net.cfg
        self.hyper = TrainHyper(
            learning_style=LearningMethod(learning_style),
            momentum_soft_start=momentum_soft_start,
            use_noise=presynaptic_noise > 0.0,
            condition=True,   # gstclassify conditions every window
            bottom_learn_rate_scale=bottom_learn_rate_scale,
            unroll=max(1, int(unroll)),
            walk_unroll=max(1, int(walk_unroll)))
        self.params = self.net.params
        self.bptt = nn.new_bptt_state(cfg, n_channels, learn_rate=learn_rate,
                                      momentum=momentum)
        self.bptt = dataclasses.replace(
            self.bptt, generation=jnp.uint32(self.net.generation),
            ho_scale=jnp.float32(self.net.ho_scale))
        if (LearningMethod(learning_style) == LearningMethod.ADAGRAD
                and adagrad_ballast):
            # rnn_set_momentum_values(net, ada_ballast), gstclassify.c:1111
            self.bptt = dataclasses.replace(
                self.bptt,
                ih_momentum=jnp.full_like(self.bptt.ih_momentum,
                                          adagrad_ballast),
                ho_momentum=jnp.full_like(self.bptt.ho_momentum,
                                          adagrad_ballast))
        self.state = nn.new_state(cfg, n_channels)
        self.key = jax.random.PRNGKey(rng_seed)
        self.log = KvLog(log_file)

        # error weighting
        ew = np.ones(cfg.o_size, np.float32)
        if error_weight:
            vals = [float(x) for x in error_weight.split(":")]
            ew[:len(vals)] = vals
        self.error_weight = jnp.asarray(ew)
        # streaming state
        self.training = True
        self.window_no = 0
        # sizes may have been overridden by loaded-net metadata
        self._pcm_tail = np.zeros((n_channels, self.window_size // 2),
                                  np.float32)
        self._pending = np.zeros((n_channels, 0), np.float32)
        # Δ-feature carry lives on the DEVICE: reading it back per block
        # would cost a full device-link round trip each time
        self._prev_features = jnp.zeros(
            (max(self.delta_features, 1), n_channels, self.n_raw_features),
            jnp.float32)
        # training blocks whose stats have been launched but not read back;
        # drained down to pipeline_depth-1 entries after each block so up to
        # pipeline_depth device calls stay in flight (overlapping the
        # device-link readback latency; see bench.py's classify note)
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._pending_stats: deque = deque()
        self._pending_opinions: deque = deque()
        self.events: list[ClassEvent] = []
        self._current_targets = np.full(
            (n_channels, len(self.groups)), -1, np.int32)
        self.seen_counts = np.zeros(cfg.o_size, np.float64)
        self.used_counts = np.zeros(cfg.o_size, np.float64)
        # multi-chip: channels shard over the mesh's 'data' axis, the
        # hidden dim over 'model' (SURVEY §2.9 — the synchronic-minibatch
        # clone array becomes a sharded stream axis with psum'd stats)
        self.mesh = mesh
        if mesh is not None:
            from recur_tpu.parallel import mesh as pmesh
            self.params, self.bptt, self.state = pmesh.shard_classify_args(
                mesh, cfg, self.params, self.bptt, self.state)
            self._train_fn = pmesh.sharded_classify_train(
                mesh, cfg, self.hyper, tuple(self.groups))
            self._opine_fn = pmesh.sharded_classify_opine(
                mesh, cfg, tuple(self.groups))
        else:
            self._train_fn = partial(classify_train_windows, cfg,
                                     self.hyper, tuple(self.groups))
            self._opine_fn = partial(classify_opine_windows, cfg,
                                     tuple(self.groups))

    # -- metadata / filename (set_net_filename, gstclassify.c:688-705) --
    # Both directions generated from the single property registry
    # (audio/properties.py) so the metadata keys, the constructor surface
    # and the CLI cannot drift apart (SURVEY §5.6).
    def _construct_metadata(self) -> str:
        return properties.metadata_string(self)

    def _reconcile_metadata(self, metadata):
        """On load, the net file's stored feature/window parameters win over
        the constructor's (the element's metadata check, gstclassify.c:
        823-930): a net trained with one frontend must not silently be fed
        another's features.  Unlike the reference (whose sscanf never
        recovers them, gstclassify.c:898-916), the stored features-offset/
        features-scale normalisation is reapplied here — a normalised
        classifier stays normalised across a save/load round trip."""
        if not metadata:
            return
        kv = properties.parse_metadata(metadata)
        mismatches = []
        string_keys = ("classes", "basename", "features_offset",
                       "features_scale")
        for key, want in kv.items():
            if key in string_keys:
                continue
            got = getattr(self, key)
            if abs(float(want) - float(got)) > 1e-6:
                mismatches.append((key, got, want))
                setattr(self, key, want)
        if "classes" in kv and kv["classes"] != self.classes_string:
            mismatches.append(("classes", self.classes_string, kv["classes"]))
            self.classes_string = kv["classes"]
            self.groups = parse_classes_string(kv["classes"])
        if kv.get("basename"):
            # load_specified_net adopts the file's basename
            self.basename = self.net_basename = kv["basename"]
        if mismatches:
            import sys
            print("classify: net metadata overrides requested parameters: "
                  + ", ".join(f"{k} {a}->{b}" for k, a, b in mismatches),
                  file=sys.stderr)
            # rebuild the frontend to match the file (including the window
            # function — a net trained with a Vorbis window must not reload
            # onto a Hann frontend)
            self.window_type = WindowType(int(self.window_type))
            self.binner = AudioBinner(
                self.window_size, self.window_type, CLASSIFY_N_FFT_BINS,
                self.min_frequency, self.max_frequency, self.knee_frequency,
                self.focus_frequency, self.rate, value_size=2)
            n_raw = ((self.mfccs if self.mfccs else CLASSIFY_N_FFT_BINS)
                     + self.intensity_feature)
            self.n_raw_features = n_raw
            self.n_features = n_raw * (1 + self.delta_features)
        # rebuild the normalisation if the feature count was revised, then
        # restore any persisted normalisation (file wins; a "(null)" file
        # entry keeps the constructor's strings, matching the element where
        # the property value fills unparsed metadata fields)
        if len(self.feature_offsets) != self.n_features:
            self.feature_offsets = np.zeros(self.n_features, np.float32)
            self.feature_scales = np.ones(self.n_features, np.float32)
        self.set_feature_normalisation(
            properties.parse_colon_floats(kv.get("features_offset"),
                                          self.n_features),
            properties.parse_colon_floats(kv.get("features_scale"),
                                          self.n_features))

    def _default_filename(self, basename, hidden_size, bottom_layer,
                          n_outputs, metadata) -> str:
        sig = rnn_hash32(metadata)
        if bottom_layer:
            return (f"{basename}-{sig:x}-i{self.n_features}-b{bottom_layer}"
                    f"-h{hidden_size}-o{n_outputs}-{self.rate}Hz"
                    f"-w{self.window_size}.net")
        return (f"{basename}-{sig:x}-i{self.n_features}-h{hidden_size}"
                f"-o{n_outputs}-{self.rate}Hz-w{self.window_size}.net")

    # -- GObject-property-style live control (gstclassify's ~50 properties
    # and the pending-properties pattern, gstclassify.c:1679-1828).
    # Generated from the registry's immediate-timing rows, plus the
    # every-setup lag alias.
    PROPERTY_ALIASES = {**properties.immediate_aliases(), "lag": "lag"}

    def set_property(self, name: str, value):
        """Live property changes: learn-rate/momentum update traced scalars
        (no recompile), `target` re-parses the event string, `forget` resets
        recurrent state."""
        key = self.PROPERTY_ALIASES.get(name, name.replace("-", "_"))
        if key == "learn_rate":
            self.learn_rate = float(value)
        elif key == "momentum":
            self.momentum = float(value)
        elif key == "_target_string":
            self.set_target_string(value)
        elif key == "_forget":
            self.forget()
        elif key == "_pgm_dump":
            # PROP_PGM_DUMP (gstclassify.c:1689-1694): dump weight images
            # now, e.g. 'ihw how'
            if value:
                from recur_tpu.utils.pgm import multi_pgm_dump
                self.net.params = self.params
                multi_pgm_dump(self.net, value, self.basename)
        elif key == "windows_per_second":
            raise KeyError("windows-per-second is read-only")
        elif key in ("features_offset", "features_scale"):
            # the every-setup normalisation strings (gstclassify.c:1802)
            vals = properties.parse_colon_floats(value, self.n_features)
            if key == "features_offset":
                self.set_feature_normalisation(offsets=vals)
            else:
                self.set_feature_normalisation(scales=vals)
        elif key == "features_file":
            if self._features_file:
                self._features_file.close()
            self._features_file = open(value, "w") if value else None
        elif hasattr(self, key):
            setattr(self, key, value)
        else:
            raise KeyError(f"unknown property {name!r}")

    def get_property(self, name: str):
        """Read a property by its kebab-case name (get_property,
        gstclassify.c:1838-1920)."""
        if name == "windows-per-second":
            return self.rate * 2.0 / self.window_size
        key = self.PROPERTY_ALIASES.get(name, name.replace("-", "_"))
        if key == "_target_string":
            return getattr(self, "_target_string", "")
        if key == "_forget":
            return False          # action property; nothing to read
        if key == "_pgm_dump":
            return ""
        return getattr(self, key)

    def forget(self):
        """The `forget` property: zero hidden state and BPTT history
        (rnn_forget_history)."""
        from recur_tpu.ops.core import forget_state
        self.state = forget_state(self.state, bptt_too=True)

    # -- property-style setters --
    def set_target_string(self, s: str):
        self._target_string = s
        self.events = parse_target_string(s, self.groups, self.n_channels,
                                          self.window_size, self.lag,
                                          self.rate)

    def set_feature_normalisation(self, offsets=None, scales=None):
        if offsets is not None:
            self.feature_offsets[:len(offsets)] = offsets
        if scales is not None:
            self.feature_scales[:len(scales)] = scales

    # the metadata codec reads these as the colon-separated strings the
    # reference's features-offset/features-scale properties hold (None →
    # "(null)" when untouched, matching an unset property)
    @property
    def features_offset(self) -> Optional[str]:
        return properties.render_colon_floats(self.feature_offsets, 0.0)

    @property
    def features_scale(self) -> Optional[str]:
        return properties.render_colon_floats(self.feature_scales, 1.0)

    def begin_set(self):
        """Start-of-training-set hook (the element's per-pipeline setup(),
        gstclassify.c:1330-1369): random-alignment phase shift and the
        one-shot weight noise."""
        if not self.training:
            return
        if self.random_alignment:
            # gstclassify.c:1346-1357: shift the stream read point by a
            # random offset in [-window/2, window/2): positive skips
            # samples, negative prepends silence
            offset = (self.net.rng.rand_small_int(self.window_size)
                      - self.window_size // 2)
            if offset >= 0:
                self._skip_samples = offset
            else:
                self._pending = np.concatenate(
                    [np.zeros((self.n_channels, -offset),
                              self._pending.dtype if self._pending.size
                              else np.float32), self._pending], axis=1)
        if self.weight_noise:
            self.apply_weight_noise(self.weight_noise)

    def apply_weight_noise(self, wn: float):
        """One-shot gaussian weight noise (rnn_weight_noise via
        gstclassify.c:1363-1369); wn < 0 scales by -learn_rate."""
        from recur_tpu.ops.conditioning import weight_noise as wnoise
        if wn < 0:
            wn *= -self.learn_rate
        self.params = wnoise(self.net.cfg, self.params, self._next_key(),
                             jnp.float32(wn))

    @property
    def generation(self) -> int:
        return int(self.bptt.generation)

    @property
    def learn_rate(self) -> float:
        return float(self.bptt.learn_rate)

    @learn_rate.setter
    def learn_rate(self, v: float):
        self.bptt = dataclasses.replace(self.bptt, learn_rate=jnp.float32(v))

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # -- streaming --
    def feed(self, pcm: np.ndarray) -> list[dict]:
        """Feed PCM.  Accepts interleaved 1-D (length divisible by
        n_channels) or [C, N] arrays, s16 or float.  Returns opinion dicts
        when not training (empty list while training)."""
        pcm = np.asarray(pcm)
        if pcm.ndim == 1:
            pcm = pcm.reshape(-1, self.n_channels).T
        if self._skip_samples:
            # random-alignment: drop the first offset samples of the set
            n = min(self._skip_samples, pcm.shape[1])
            pcm = pcm[:, n:]
            self._skip_samples -= n
        if self._pending.dtype != pcm.dtype and self._pending.shape[1]:
            pcm = pcm.astype(self._pending.dtype)
        elif self._pending.shape[1] == 0:
            self._pending = np.zeros((self.n_channels, 0), pcm.dtype)
        self._pending = np.concatenate([self._pending, pcm], axis=1)
        half = self.window_size // 2
        # process in fixed-size blocks so every device call has the same
        # shape (one compile); the remainder stays pending until the next
        # feed or an explicit flush()
        out = []
        while self._pending.shape[1] // half >= self.BLOCK_WINDOWS:
            out.extend(self._run_block(self.BLOCK_WINDOWS))
        return out

    def flush(self) -> list[dict]:
        """Process any buffered remainder (end of stream)."""
        half = self.window_size // 2
        n = self._pending.shape[1] // half
        out = self._run_block(n) if n else []
        self.drain_stats()
        out.extend(self.drain_opinions())
        return out

    BLOCK_WINDOWS = 128

    def _run_block(self, n_windows: int) -> list[dict]:
        half = self.window_size // 2
        chunks, self._pending = (self._pending[:, :n_windows * half],
                                 self._pending[:, n_windows * half:])
        # A short tail (flush) is padded up to BLOCK_WINDOWS with silence
        # marked not-real, so EVERY device call has the block shape — one
        # compile total instead of one per distinct tail length (each TPU
        # compile costs tens of seconds)
        n_real = n_windows
        T = max(n_windows, self.BLOCK_WINDOWS)
        if n_windows < T:
            pad = np.zeros((self.n_channels, (T - n_windows) * half),
                           chunks.dtype)
            chunks_padded = np.concatenate([chunks, pad], axis=1)
        else:
            chunks_padded = chunks
        # Ship the raw PCM to the device ONCE and assemble the 50%-overlapped
        # [T, C, window] frames there — halves the host->device volume and
        # avoids the 2x window duplication (the transfer, not the FFT, is
        # the bottleneck on tunneled TPUs).
        halves = jnp.moveaxis(
            jnp.asarray(chunks_padded).reshape(self.n_channels, T, half),
            1, 0)                                    # [T, C, half]
        tail = jnp.asarray(self._pcm_tail)[None]     # [1, C, half]
        prev = jnp.concatenate([tail, halves[:-1]], axis=0)
        frames = jnp.concatenate([prev, halves], axis=-1)  # [T, C, window]
        # the carry tail is a slice of the HOST pcm we just shipped — taking
        # it from `chunks` avoids a device->host round trip per block
        # (np.array: a view here would pin the whole consumed block buffer)
        self._pcm_tail = np.array(chunks[:, -half:], np.float32, copy=True)
        real = np.arange(T) < n_real
        if self.training:
            self._train_frames(frames, real, n_real)
            return []
        return self._opine_frames(frames, real, n_real)

    def _features_for_frames(self, frames, n_real: Optional[int] = None) \
            -> jax.Array:
        """[T, C, window] → [T, C, n_features] with Δ features and
        normalisation (pcm_to_features, gstclassify.c:1983-2051).
        n_real: index of the last real (non-padding) window + 1; the
        Δ-feature carry is taken from there, not from a padded row."""
        T, C, _ = frames.shape
        if n_real is None:
            n_real = T
        x = jnp.asarray(frames, jnp.float32)
        if self.mfccs:
            raw = self.binner.mfccs(x)[..., 1 - self.intensity_feature:
                                       1 - self.intensity_feature
                                       + self.n_raw_features]
        else:
            bins = self.binner.log_freq_bins(x)
            if self.intensity_feature:
                inten = bins.mean(axis=-1, keepdims=True)
                raw = jnp.concatenate([bins, inten], axis=-1)
            else:
                raw = bins
        feats = raw
        if self.delta_features:
            # successive discrete time-differences, one block per order
            ds = [raw]
            cur = raw
            prev_f = jnp.asarray(self._prev_features)
            for order in range(self.delta_features):
                prev = jnp.concatenate([prev_f[order][None], cur[:-1]],
                                       axis=0)
                prev_f = prev_f.at[order].set(cur[n_real - 1])
                cur = cur - prev
                ds.append(cur)
            self._prev_features = prev_f   # stays device-resident, no sync
            feats = jnp.concatenate(ds, axis=-1)
        feats = (feats - jnp.asarray(self.feature_offsets)) \
            * jnp.asarray(self.feature_scales)
        return feats

    def _dump_features(self, feats, n_real: int):
        """features-file debug dump (gstclassify.c:2056-2062): one CSV-ish
        line per channel per window.  Reads the features back from the
        device, so it serialises the pipeline — debug only."""
        f = np.asarray(feats)
        for t in range(n_real):
            for c in range(self.n_channels):
                self._features_file.write(
                    "channel %d," % c
                    + ",".join("%5e" % v for v in f[t, c]) + "\n")

    def _train_frames(self, frames, real, n_real):
        T = frames.shape[0]
        feats = self._features_for_frames(frames, n_real)
        if self._features_file:
            self._dump_features(feats, n_real)
        targets = targets_for_windows(self.events, self.window_no, n_real,
                                      self.n_channels, len(self.groups),
                                      self._current_targets)
        live = np.zeros(T, bool)
        live[:n_real] = (np.arange(self.window_no, self.window_no + n_real)
                         >= self.ignored_windows)
        if n_real < T:
            targets = np.concatenate(
                [targets, np.full((T - n_real,) + targets.shape[1:], -1,
                                  targets.dtype)], axis=0)
        self.window_no += n_real
        # balanced-training counts: the scan carries them per window; the
        # host master counts (float64, accumulated in _log_oldest_stats)
        # seed each block — with pipeline_depth > 1 the seed lags the
        # blocks still in flight.  The f32 in-graph carry loses unit
        # increments (and collapses (1 - seen/total)^bias to exactly 0 for
        # a dominant class) once counts pass ~2^24, so large counts are
        # rescaled to <= 2^18 first: the keep-probabilities depend only on
        # the ratios, and at that magnitude the +1 smoothing term and the
        # per-window increments both still register in f32.
        seen = self.seen_counts
        total = seen.sum()
        if total > 2 ** 18:
            seen = seen * (2 ** 18 / total)
        self.params, self.bptt, self.state, stats = self._train_fn(
            self.params, self.bptt, self.state,
            feats, jnp.asarray(targets),
            jnp.asarray(seen.astype(np.float32)),
            jnp.float32(self.balanced_training_bias), self.error_weight,
            jnp.asarray(live), jnp.asarray(real), self._next_key(),
            jnp.float32(self.momentum),
            jnp.float32(self.net.cfg.presynaptic_noise))
        # defer the device->host stats reads: with pipeline_depth > 1 the
        # next block(s) are enqueued before this one's results are fetched,
        # hiding the device-link readback latency (balanced-training counts
        # then lag pipeline_depth blocks — same per-chunk approximation
        # class as the documented per-chunk probability update)
        # jnp.copy: the bptt buffers are donated to the NEXT block's call,
        # so a raw reference would be read after deletion
        self._pending_stats.append(
            (self.window_no, jnp.copy(self.bptt.generation), stats))
        while len(self._pending_stats) >= max(1, self.pipeline_depth):
            self._log_oldest_stats()

    def _log_oldest_stats(self):
        window_no, generation, stats = self._pending_stats.popleft()
        self.seen_counts += np.asarray(stats.seen, np.float64)
        self.used_counts += np.asarray(stats.used, np.float64)
        trained = max(float(stats.trained), 1.0)
        self.log.log_int("window", window_no)
        self.log.log_int("generation", int(generation))
        self.log.log_float("error", float(stats.error) / trained)
        self.log.log_float("correct", float(stats.correct) / trained)

    def drain_stats(self):
        """Sync: fetch and log every in-flight training block's stats."""
        while self._pending_stats:
            self._log_oldest_stats()

    def _opine_frames(self, frames, real, n_real) -> list[dict]:
        """Launch inference on a block; emit opinion dicts.  With
        pipeline_depth > 1 the device results are read back one or more
        blocks behind the launches (same latency-hiding as training), so
        feed() returns older blocks' messages — order preserved, the tail
        arriving from flush()."""
        feats = self._features_for_frames(frames, n_real)
        if self._features_file:
            self._dump_features(feats, n_real)
        targets = targets_for_windows(self.events, self.window_no, n_real,
                                      self.n_channels, len(self.groups),
                                      self._current_targets)
        hidden, probs, winners = self._opine_fn(
            self.params, self.state.hidden, feats, jnp.asarray(real))
        self.state = dataclasses.replace(self.state, hidden=hidden)
        self._pending_opinions.append(
            (self.window_no, targets, probs, winners, n_real))
        self.window_no += n_real
        out = []
        while len(self._pending_opinions) >= max(1, self.pipeline_depth):
            out.extend(self._render_oldest_opinions())
        return out

    def _render_oldest_opinions(self) -> list[dict]:
        (window_no, targets, probs, winners,
         n_real) = self._pending_opinions.popleft()
        probs = np.asarray(probs)      # [T, C, G, o_size]
        winners = np.asarray(winners)  # [T, C, G]
        window_to_secs = self.window_size * 0.5 / self.rate
        out = []
        for t in range(n_real):
            w = window_no + t
            if w < self.ignored_windows:
                continue
            msg = {"time": w * window_to_secs - self.lag}
            err_sum, n_err = 0.0, 0
            for c in range(self.n_channels):
                for gi, g in enumerate(self.groups):
                    for k, ch in enumerate(g.classes):
                        msg[f"channel {c}, group {gi} {ch}"] = float(
                            probs[t, c, gi, g.offset + k])
                    tgt = targets[t, c, gi]
                    win = int(winners[t, c, gi])
                    if 0 <= win < g.n_classes:
                        msg[f"channel {c}, group {gi} winner"] = g.classes[win]
                    if 0 <= tgt < g.n_classes:
                        msg[f"channel {c}, group {gi} target"] = \
                            g.classes[tgt]
                        msg[f"channel {c}, group {gi} correct"] = int(
                            win == tgt)
                        err_sum += 1.0 - probs[t, c, gi, g.offset + tgt]
                        n_err += 1
            msg["error"] = err_sum / n_err if n_err else 0.0
            out.append(msg)
        return out

    def drain_opinions(self) -> list[dict]:
        """Sync: render every in-flight inference block's messages."""
        out = []
        while self._pending_opinions:
            out.extend(self._render_oldest_opinions())
        return out

    def reset_state(self) -> list[dict]:
        """Forget hidden state/history between files (the element gets a
        stream restart).  In-flight inference blocks belong to the old
        stream but their messages are still valid — they are rendered and
        returned (rather than silently dropped) so a caller switching
        streams with pipeline_depth > 1 never loses up to pipeline_depth-1
        blocks of opinions."""
        self.drain_stats()
        tail = self.drain_opinions()
        self.state = nn.new_state(self.net.cfg, self.n_channels)
        if self.mesh is not None:
            from recur_tpu.parallel import mesh as pmesh
            _, _, self.state = pmesh.shard_classify_args(
                self.mesh, self.net.cfg, self.params, self.bptt, self.state)
        self._pcm_tail[:] = 0
        self._pending = np.zeros((self.n_channels, 0), np.float32)
        self._prev_features = jnp.zeros_like(self._prev_features)
        self.window_no = 0
        self._skip_samples = 0
        self._current_targets[:] = -1
        return tail

    def save(self, filename: Optional[str] = None):
        self.drain_stats()
        self.net.params = self.params
        self.net.generation = self.generation
        self.net.learn_rate = self.learn_rate
        self.net.min_error_factor = float(self.bptt.min_error_factor[0])
        # refresh the stored metadata so live-adjusted parameters — above
        # all the feature normalisation — persist through the checkpoint
        # (the reference renders its metadata from current property values
        # at net-creation; re-rendering at save keeps the same contract
        # while also capturing post-creation estimate_feature_normalisation)
        self.net.metadata = self._construct_metadata()
        nn.save_net(self.net, filename or self.net_filename, backup=True)
