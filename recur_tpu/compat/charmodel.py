"""Drop-in modern-Python equivalent of the reference's `charmodel` extension
(py-recur-text.c): `Alphabet` and multi-head `Net` with the same classes,
methods, kwargs and defaults (ctor defaults py-recur-text.c:437-452: depth 50,
ReSQRT, adagrad + ballast, presynaptic_noise 0.1).

Texts passed to train()/test() are ENCODED symbol sequences (bytes or uint8
arrays), exactly as the C module expects — use Alphabet.encode_text first.

Extension beyond the reference: Net.train_batch(texts, classes) trains many
documents as parallel TPU streams.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn as _nn
from recur_tpu.engine import TrainHyper
from recur_tpu.models import alphabet as _alpha
from recur_tpu.models.multihead import (
    multihead_spin,
    multihead_train_chunk,
    multihead_train_window_chunk,
)
from recur_tpu.nn import Activation, Flag, InitMethod, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.ops.core import biased_softmax, forward_step
from recur_tpu.utils.kvlog import KvLog

DEFAULT_ADAGRAD_BALLAST = 100.0
DEFAULT_ADADELTA_BALLAST = 100.0


class Alphabet:
    """charmodel.Alphabet (py-recur-text.c:36-300)."""

    def __init__(self, text=None, threshold: float = 1e-5,
                 digit_adjust: float = 1.0, alpha_adjust: float = 1.0,
                 ignore_case: bool = False, utf8: bool = False,
                 collapse_space: bool = False, alphabet_chars: str = None,
                 collapse_chars: str = None):
        if text is None:
            if alphabet_chars is None:
                raise ValueError("Neither text nor alphabet_chars is set")
            self._a = _alpha.Alphabet.from_chars(
                alphabet_chars, collapse_chars or "",
                case_insensitive=bool(ignore_case), utf8=bool(utf8),
                collapse_space=bool(collapse_space))
        else:
            self._a = _alpha.Alphabet.find(
                text, threshold=threshold, digit_adjust=digit_adjust,
                alpha_adjust=alpha_adjust, case_insensitive=bool(ignore_case),
                utf8=bool(utf8), collapse_space=bool(collapse_space))

    # -- members (py-recur-text.c Alphabet_getsetters/members) --
    @property
    def alphabet(self) -> str:
        return self._a.points_string()

    @property
    def collapsed_chars(self) -> str:
        return self._a.collapsed_string()

    @property
    def flags(self) -> int:
        return self._a.flags

    @property
    def len(self) -> int:
        return len(self._a)

    def __len__(self) -> int:
        return len(self._a)

    # -- methods --
    def get_codepoint(self, char: str) -> int:
        return self._a.get_codepoint(char)

    def encode_text(self, text) -> bytes:
        return self._a.encode(text).tobytes()

    def decode_text(self, encoded) -> str:
        if isinstance(encoded, (bytes, bytearray)):
            encoded = np.frombuffer(encoded, dtype=np.uint8)
        return self._a.decode(encoded)


class Net:
    """charmodel.Net: a multi-head char-LM (py-recur-text.c:428-996)."""

    def __init__(self, alphabet: Alphabet, classes: Sequence[str],
                 hidden_size: int, log_file: Optional[str] = "multi-text.log",
                 bptt_depth: int = 50, learn_rate: float = 0.001,
                 filename: Optional[str] = None, momentum: float = 0.95,
                 presynaptic_noise: float = 0.1, rng_seed: int = 2,
                 metadata: Optional[str] = None,
                 activation: int = int(Activation.RESQRT),
                 learning_method: int = int(LearningMethod.ADAGRAD),
                 basename: Optional[str] = None, verbose: int = 0,
                 temporal_pgm_dump: int = 0,
                 periodic_pgm_dump: Optional[str] = None,
                 periodic_pgm_period: int = 1000, batch_size: int = 1,
                 init_method: int = int(InitMethod.FLAT),
                 pipeline_depth: int = 1, unroll: int = 1,
                 walk_unroll: int = 1, history_dtype: str = "float32",
                 top_dtype: str = "float32", bptt_impl: str = "buffered",
                 _net: Optional[_nn.Net] = None):
        if batch_size < 1:
            raise ValueError(f"batch_size {batch_size} won't work")
        if top_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"top_dtype {top_dtype!r} not supported")
        if not (1 <= activation <= 5):
            raise ValueError(f"{activation} is not a valid activation")
        if not (0 <= learning_method <= 6):
            raise ValueError(f"{learning_method} is not a valid learning method")
        self.alphabet = alphabet
        self.class_names = list(classes)
        self.n_classes = len(self.class_names)
        if self.n_classes < 1:
            raise ValueError("no classes")
        self.class_name_lut = {n: i for i, n in enumerate(self.class_names)}
        self.learning_method = int(learning_method)
        self.batch_size = int(batch_size)
        self.momentum = float(momentum)
        self.verbose = verbose
        # TPU extension: >1 defers the per-train() log readback so up to N
        # documents' device work stays in flight (the device-link readback
        # costs ~26ms; see AudioClassifier.pipeline_depth)
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._pending_logs: deque = deque()
        alen = len(alphabet)
        flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
        if learning_method in (LearningMethod.ADADELTA, LearningMethod.RPROP):
            flags |= Flag.AUX_ARRAYS

        if _net is not None:
            self.net = _net
        else:
            self.net = _nn.new_net(alen, hidden_size, alen * self.n_classes,
                                   flags=flags, rng_seed=rng_seed,
                                   depth=bptt_depth, learn_rate=learn_rate,
                                   momentum=momentum,
                                   presynaptic_noise=presynaptic_noise,
                                   activation=Activation(activation),
                                   metadata=metadata)
            im = InitMethod(init_method if 0 <= init_method <= 3
                            else InitMethod.FLAT)
            p = winit.default_init_params(self.net.cfg)
            p.method = im
            winit.randomise_weights(self.net, p)

        basename = basename or "multi-text"
        if filename is None:
            m = _alpha.Metadata.from_alphabet(alphabet._a)
            filename = _alpha.construct_net_filename(
                m, basename, alen, 0, hidden_size, alen * self.n_classes)
        self.filename = filename
        self.log = KvLog(log_file)

        # device training state (S=1 stream for the reference API)
        cfg = self.net.cfg
        self._hyper = TrainHyper(
            learning_style=LearningMethod(learning_method),
            batch_size=self.batch_size,
            use_noise=cfg.presynaptic_noise > 0.0,
            condition=False, unroll=max(1, int(unroll)),
            walk_unroll=max(1, int(walk_unroll)),
            history_dtype=str(history_dtype),
            top_dtype=str(top_dtype), bptt_impl=str(bptt_impl))
        self._hdtype = jnp.dtype(history_dtype)
        self._params = self.net.params
        self._bptt = _nn.new_bptt_state(cfg, 1, learn_rate=self.net.learn_rate,
                                        momentum=momentum)
        self._bptt = dataclasses.replace(
            self._bptt, generation=jnp.uint32(self.net.generation))
        if learning_method == LearningMethod.ADAGRAD:
            self._set_momentum_values(DEFAULT_ADAGRAD_BALLAST)
        elif learning_method == LearningMethod.ADADELTA:
            self._set_momentum_values(DEFAULT_ADADELTA_BALLAST)
        elif learning_method == LearningMethod.RPROP:
            self._set_aux_values(1.0)
        self._state = _nn.new_state(cfg, 1, history_dtype=self._hdtype,
                                    factored=(bptt_impl == "factored"))
        self._key = jax.random.PRNGKey(rng_seed & 0xFFFFFFFF)
        # confab
        self._confab = None

    # ---- internals ----
    def _set_momentum_values(self, x: float):
        self._bptt = dataclasses.replace(
            self._bptt,
            ih_momentum=jnp.full_like(self._bptt.ih_momentum, x),
            ho_momentum=jnp.full_like(self._bptt.ho_momentum, x))

    def _set_aux_values(self, x: float):
        self._bptt = dataclasses.replace(
            self._bptt,
            ih_aux=jnp.full_like(self._bptt.ih_aux, x),
            ho_aux=jnp.full_like(self._bptt.ho_aux, x))

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @staticmethod
    def _as_symbols(text) -> np.ndarray:
        if isinstance(text, (bytes, bytearray)):
            return np.frombuffer(text, dtype=np.uint8).astype(np.int32)
        return np.asarray(text, dtype=np.int32)

    # ---- scalar properties (py-recur-text.c:601-634) ----
    @property
    def learn_rate(self) -> float:
        return float(self._bptt.learn_rate)

    @learn_rate.setter
    def learn_rate(self, v: float):
        self._bptt = dataclasses.replace(self._bptt,
                                         learn_rate=jnp.float32(v))

    @property
    def ih_scale(self) -> float:
        """bptt->ih_scale (py-recur-text.c:601-634): the last emergency BPTT
        scale, a live training-health signal; 1.0 means "no emergency clip".
        With multiple streams this reports the strongest intervention."""
        return float(jnp.min(self._bptt.ih_scale))

    @property
    def ho_scale(self) -> float:
        return float(self._bptt.ho_scale)

    @ho_scale.setter
    def ho_scale(self, v: float):
        self._bptt = dataclasses.replace(self._bptt, ho_scale=jnp.float32(v))

    @property
    def momentum_weight(self) -> float:
        return float(self._bptt.momentum_weight)

    @momentum_weight.setter
    def momentum_weight(self, v: float):
        self._bptt = dataclasses.replace(self._bptt,
                                         momentum_weight=jnp.float32(v))

    @property
    def presynaptic_noise(self) -> float:
        return self.net.cfg.presynaptic_noise

    @presynaptic_noise.setter
    def presynaptic_noise(self, v: float):
        self.net.cfg = dataclasses.replace(self.net.cfg,
                                           presynaptic_noise=float(v))
        self._hyper = dataclasses.replace(self._hyper, use_noise=v > 0.0)

    @property
    def generation(self) -> int:
        return int(self._bptt.generation)

    # ---- training (Net_train, py-recur-text.c:759-821) ----
    def train(self, text, target_class, leakage: float = -1.0,
              ignore_start: int = 0):
        syms = self._as_symbols(text)
        if len(syms) < 2 + ignore_start:
            raise ValueError("The text is not long enough")
        if target_class not in self.class_name_lut:
            raise KeyError(f"unknown class: {target_class!r}")
        target = self.class_name_lut[target_class]
        if leakage < 0:
            leakage = -leakage / self.n_classes
        if int(self._state.hidden.shape[0]) != 1:
            self._resize_streams(1)
        if ignore_start:
            cfg = self.net.cfg
            self._state = multihead_spin(
                cfg, self._params, len(self.alphabet), self._state,
                jnp.asarray(syms[:ignore_start])[None],
                cfg.presynaptic_noise > 0.0, self._next_key(),
                jnp.float32(cfg.presynaptic_noise))
            syms = syms[ignore_start:]
        self._train_streams(syms[None, :], np.array([target]), leakage)
        if self.verbose:
            print(f"{self.generation:8d} trained {target_class}")
        self._maybe_confab()

    def train_batch(self, texts: Sequence, target_classes: Sequence,
                    leakage: float = -1.0):
        """TPU extension: train several equal-length documents as parallel
        streams (documents are truncated to the shortest)."""
        enc = [self._as_symbols(t) for t in texts]
        n = min(len(e) for e in enc)
        block = np.stack([e[:n] for e in enc])
        targets = np.array([self.class_name_lut[c] for c in target_classes])
        if leakage < 0:
            leakage = -leakage / self.n_classes
        S = block.shape[0]
        if int(self._state.hidden.shape[0]) != S:
            self._resize_streams(S)
        self._train_streams(block, targets, leakage)

    def _resize_streams(self, S: int):
        cfg = self.net.cfg
        self._state = _nn.new_state(
            cfg, S, history_dtype=self._hdtype,
            factored=(self._hyper.bptt_impl == "factored"))
        mef = jnp.full((S,), float(self._bptt.min_error_factor[0]),
                       jnp.float32)
        self._bptt = dataclasses.replace(
            self._bptt, min_error_factor=mef,
            ih_scale=jnp.ones((S,), jnp.float32))

    # Document lengths vary per call; jitting one program per distinct
    # [S, len] shape would recompile for every new document.  Instead each
    # block is decomposed into a handful of fixed bucket sizes (state
    # carries across the pieces), so at most len(_CHUNK_BUCKETS) programs
    # per stream count ever compile.
    _CHUNK_BUCKETS = (4096, 1024, 256, 64, 16, 4, 1)

    def _chunk_spans(self, n_transitions: int):
        i = 0
        while i < n_transitions:
            rem = n_transitions - i
            n = next(b for b in self._CHUNK_BUCKETS if b <= rem)
            yield i, n
            i += n

    def _train_streams(self, block: np.ndarray, targets: np.ndarray,
                       leakage: float):
        S = block.shape[0]
        if int(self._state.hidden.shape[0]) != S:
            self._resize_streams(S)
        targets = jnp.asarray(targets)
        # accumulate the chunk stats ON DEVICE (a readback per bucket piece
        # would cost a full device-link round trip each); one deferred log
        # entry per call, drained pipeline_depth calls behind
        err = ent = None
        for i, n in self._chunk_spans(block.shape[1] - 1):
            piece = jnp.asarray(block[:, i:i + n + 1])
            # batch_size > 1 uses the windowed-walk formulation wherever the
            # bucket divides into apply windows; the per-char path covers
            # the small tail buckets (and batch_size == 1 exactly)
            chunk_fn = (multihead_train_window_chunk
                        if self._hyper.batch_size > 1
                        and not self.net.cfg.has_bottom
                        and self._hyper.bptt_impl == "buffered"
                        and n % self._hyper.batch_size == 0
                        else multihead_train_chunk)
            (self._params, self._bptt, self._state,
             stats) = chunk_fn(
                self.net.cfg, self._hyper, len(self.alphabet),
                self._params, self._bptt, self._state,
                piece, targets, jnp.float32(leakage), self._next_key(),
                jnp.float32(self.momentum),
                jnp.float32(self.net.cfg.presynaptic_noise))
            err = stats.error if err is None else err + stats.error
            ent = stats.entropy if ent is None else ent + stats.entropy
        if err is None:      # zero transitions (shortest doc has length 1)
            return
        n = max(block.shape[0] * (block.shape[1] - 1), 1)
        # jnp.copy: the bptt buffers are donated to the next chunk call
        self._pending_logs.append(
            (err, ent, n, jnp.copy(self._bptt.generation)))
        while len(self._pending_logs) >= max(1, self.pipeline_depth):
            self._log_oldest()

    def _log_oldest(self):
        err, ent, n, gen = self._pending_logs.popleft()
        self.log.log_float("t_error", float(err) / n)
        self.log.log_float("t_entropy", float(ent) / n)
        self.log.log_int("generation", int(gen))

    def drain_logs(self):
        """Sync: fetch and log every in-flight train() call's stats."""
        while self._pending_logs:
            self._log_oldest()

    # ---- scoring (Net_test) ----
    def test(self, text, ignore_start: int = 0, as_list: bool = False):
        syms = self._as_symbols(text)
        cfg = self.net.cfg
        # bucket-decomposed like _train_streams: a handful of compiled
        # shapes instead of one per document length
        from recur_tpu.models.multihead import multihead_xe_accumulate
        hidden = jnp.zeros((1, cfg.h_size), jnp.float32)
        sums = np.zeros(self.n_classes, np.float64)
        count = 0.0
        for i, n in self._chunk_spans(len(syms) - 1):
            piece = jnp.asarray(syms[i:i + n + 1])[None]
            hidden, s, c = multihead_xe_accumulate(
                cfg, self._params, len(self.alphabet), hidden, piece,
                jnp.int32(ignore_start - i))
            sums += np.asarray(s[0], np.float64)
            count += float(c)
        if count == 0:
            # a document with < 2 symbols has no transitions to score; 0.0
            # would read as a perfect score to downstream ranking, so
            # return NaN (the reference's 0/0 would likewise be NaN)
            vals = [float("nan")] * self.n_classes
        else:
            vals = [float(x) for x in sums / count]
        if as_list:
            return vals
        return dict(zip(self.class_names, vals))

    # ---- confabulation ----
    def start_confab(self, interval: int, n: int = 3, len: int = 79,
                     caps_marker: Optional[str] = None):
        self._confab = {
            "interval": interval, "n": n, "len": len,
            "caps_marker": caps_marker,
            "hidden": jnp.zeros((self.n_classes, self.net.cfg.h_size),
                                jnp.float32),
            "last": np.zeros(self.n_classes, np.int32),
            "next_gen": self.generation + interval,
        }

    def stop_confab(self):
        self._confab = None

    def _maybe_confab(self):
        c = self._confab
        if not c or self.generation < c["next_gen"]:
            return
        c["next_gen"] = self.generation + c["interval"]
        line = self.confabulate(c["len"] // self.n_classes, bias=0.0,
                                caps_marker=c["caps_marker"])
        print(f"{self.generation:8d}|" + "|".join(line))

    def confabulate(self, char_len: int, bias: float = 0.0,
                    caps_marker: Optional[str] = None) -> list[str]:
        """Generate char_len chars from each class head (multi_confab,
        charmodel-multi-predict.c:145-197)."""
        cfg = self.net.cfg
        alen = len(self.alphabet)
        c = self._confab or {
            "hidden": jnp.zeros((self.n_classes, cfg.h_size), jnp.float32),
            "last": np.zeros(self.n_classes, np.int32)}
        hidden = c["hidden"]
        last = c["last"].copy()
        marker_idx = (self.alphabet.get_codepoint(caps_marker)
                      if caps_marker else -2)
        if marker_idx < 0:
            # no caps-marker post-processing: sample everything in one
            # device call per confab
            from recur_tpu.models.multihead import multihead_confab_chunk
            hidden, toks = multihead_confab_chunk(
                cfg, self._params, alen, int(char_len), hidden,
                jnp.asarray(last, jnp.int32), jnp.float32(bias),
                self._next_key())
            toks = np.asarray(toks)
            if self._confab:
                self._confab["hidden"] = hidden
                self._confab["last"] = toks[:, -1].astype(np.int32)
            return [self.alphabet._a.decode(toks[m])
                    for m in range(self.n_classes)]
        outs: list[list[int]] = [[] for _ in range(self.n_classes)]
        pending_caps = [False] * self.n_classes
        texts = [""] * self.n_classes
        produced = [0] * self.n_classes
        while min(produced) < char_len:
            x = jax.nn.one_hot(jnp.asarray(last), cfg.raw_input_size,
                               dtype=jnp.float32)
            fwd = forward_step(cfg, self._params, hidden, x)
            hidden = fwd.hidden
            logits = np.asarray(
                fwd.output[:, :self.n_classes * alen]).reshape(
                    self.n_classes, self.n_classes, alen)
            for m in range(self.n_classes):
                if produced[m] >= char_len:
                    continue
                probs = np.asarray(biased_softmax(
                    jnp.asarray(logits[m, m]), bias))
                r = self.net.rng.rand_double()
                idx = int(np.searchsorted(np.cumsum(probs), r, side="right"))
                idx = min(idx, alen - 1)
                last[m] = idx
                ch = self.alphabet._a.points[idx]
                if idx == marker_idx:
                    pending_caps[m] = True
                    continue
                if pending_caps[m]:
                    if ord("a") <= ch <= ord("z"):
                        ch -= 32
                    elif 945 <= ch <= 969:  # greek
                        ch -= 32
                        if ch == 930:
                            ch += 1
                    pending_caps[m] = False
                texts[m] += chr(ch)
                produced[m] += 1
        if self._confab:
            self._confab["hidden"] = hidden
            self._confab["last"] = last
        return texts

    # ---- persistence ----
    def save(self, filename: Optional[str] = None, backup: int = 1):
        self.drain_logs()
        self.net.params = self._params
        self.net.generation = self.generation
        self.net.learn_rate = self.learn_rate
        self.net.ho_scale = self.ho_scale
        self.net.momentum = self.momentum
        self.net.min_error_factor = float(self._bptt.min_error_factor[0])
        _nn.save_net(self.net, filename or self.filename, backup=bool(backup))

    @classmethod
    def load(cls, filename: str, parse_metadata: Callable[[str], dict]):
        """Net.load (py-recur-text.c:881-996): the metadata string is parsed
        by a user callback into a dict with prescribed keys."""
        net = _nn.load_net(filename)
        if net.metadata is None:
            raise IOError(f"net {filename} has no metadata")
        md = parse_metadata(net.metadata)
        if md.get("version") != 1:
            raise ValueError(
                f"I don't know metadata format version {md.get('version')}")
        alphabet = Alphabet(
            text=None, alphabet_chars=md["alphabet"],
            collapse_chars=md.get("collapse_chars") or "",
            ignore_case=bool(md.get("case_insensitive", 0)),
            utf8=bool(md.get("utf8", 0)),
            collapse_space=bool(md.get("collapse_space", 0)))
        self = cls(alphabet, md["classnames"], net.cfg.hidden_size,
                   log_file=None, momentum=md.get("momentum", 0.95),
                   learning_method=md.get("learning_method",
                                          int(LearningMethod.ADAGRAD)),
                   batch_size=md.get("batch_size", 1),
                   verbose=md.get("verbose", 0),
                   basename=md.get("basename") or "multi-text",
                   filename=filename, _net=net)
        self._params = net.params
        self._bptt = dataclasses.replace(
            self._bptt, generation=jnp.uint32(net.generation),
            learn_rate=jnp.float32(net.learn_rate),
            ho_scale=jnp.float32(net.ho_scale),
            min_error_factor=jnp.full_like(self._bptt.min_error_factor,
                                           net.min_error_factor))
        return self

    def dump_parameters(self):
        print(f"Net: i{self.net.cfg.input_size} h{self.net.cfg.hidden_size} "
              f"o{self.net.cfg.output_size} classes {self.class_names} "
              f"gen {self.generation} lr {self.learn_rate}")

    def enable_fp_exceptions(self, enable: bool = True):
        """The reference traps FP exceptions (py-recur-text.c:1092); the JAX
        equivalent is NaN debugging."""
        jax.config.update("jax_debug_nans", bool(enable))
