"""Modern equivalent of the reference's `rnnumpy` extension
(py-recur-numpy.c): a generic numpy-driven RNN — 2-D float32 feature/target
arrays, row sequence = time.  Defaults follow py-recur-numpy.c:100-120
(depth 30, lr 0.1, adagrad, batch_size 80, ReLU).

Balanced training (py-recur-numpy.c:408-428): rows of over-seen classes are
stochastically skipped with probability 1 - (1 - seen/total)^balance.  The
skip decisions depend on running class counts + the net PRNG, so they are
computed on the host (cheap, O(rows)) and shipped to the device as a mask.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu import nn as _nn
from recur_tpu import engine
from recur_tpu.engine import TrainHyper
from recur_tpu.nn import Activation, Flag, InitMethod, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.utils.kvlog import KvLog


class Net:
    def __init__(self, input_size: int, hidden_size: int, output_size: int,
                 log_file: Optional[str] = None, bptt_depth: int = 30,
                 learn_rate: float = 0.1, filename: Optional[str] = None,
                 momentum: float = 0.95, presynaptic_noise: float = 0.0,
                 rng_seed: int = 2, metadata: Optional[str] = None,
                 activation: int = int(Activation.RELU),
                 learning_method: int = int(LearningMethod.ADAGRAD),
                 basename: Optional[str] = None, verbose: int = 0,
                 temporal_pgm_dump: int = 0,
                 periodic_pgm_dump: Optional[str] = None,
                 periodic_pgm_period: int = 1000, batch_size: int = 80,
                 init_method: int = int(InitMethod.FLAT),
                 ballast: float = -1.0, _net: Optional[_nn.Net] = None):
        if batch_size < 1:
            raise ValueError(f"batch_size {batch_size} won't work")
        flags = Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR
        if learning_method in (LearningMethod.ADADELTA, LearningMethod.RPROP):
            flags |= Flag.AUX_ARRAYS
        self.learning_method = int(learning_method)
        self.batch_size = int(batch_size)
        self.momentum = float(momentum)
        self.verbose = verbose
        if _net is not None:
            self.net = _net
        else:
            self.net = _nn.new_net(input_size, hidden_size, output_size,
                                   flags=flags, rng_seed=rng_seed,
                                   depth=bptt_depth, learn_rate=learn_rate,
                                   momentum=momentum,
                                   presynaptic_noise=presynaptic_noise,
                                   activation=Activation(activation),
                                   metadata=metadata)
            p = winit.default_init_params(self.net.cfg)
            p.method = InitMethod(init_method if 0 <= init_method <= 3
                                  else InitMethod.FLAT)
            winit.randomise_weights(self.net, p)
        self.filename = filename or f"{basename or 'rnnumpy'}.net"
        self.log = KvLog(log_file)
        cfg = self.net.cfg
        self._hyper = TrainHyper(
            learning_style=LearningMethod(learning_method),
            batch_size=self.batch_size,
            use_noise=cfg.presynaptic_noise > 0.0,
            condition=False)
        self._params = self.net.params
        self._bptt = _nn.new_bptt_state(cfg, 1, learn_rate=self.net.learn_rate,
                                        momentum=momentum)
        self._bptt = dataclasses.replace(
            self._bptt, generation=jnp.uint32(self.net.generation))
        if ballast < 0:
            ballast = 100.0 if learning_method == LearningMethod.ADAGRAD else 0.0
        if ballast:
            self._bptt = dataclasses.replace(
                self._bptt,
                ih_momentum=jnp.full_like(self._bptt.ih_momentum, ballast),
                ho_momentum=jnp.full_like(self._bptt.ho_momentum, ballast))
        if learning_method == LearningMethod.RPROP:
            self._bptt = dataclasses.replace(
                self._bptt,
                ih_aux=jnp.full_like(self._bptt.ih_aux, 1.0),
                ho_aux=jnp.full_like(self._bptt.ho_aux, 1.0))
        self._state = _nn.new_state(cfg, 1)
        self._key = jax.random.PRNGKey(rng_seed & 0xFFFFFFFF)
        # balanced-training counts persist across train() calls
        self.seen_counts = np.zeros(output_size, np.int64)
        self.seen_sum = 0
        self.used_sum = 0

    @property
    def generation(self) -> int:
        return int(self._bptt.generation)

    @property
    def learn_rate(self) -> float:
        return float(self._bptt.learn_rate)

    @learn_rate.setter
    def learn_rate(self, v: float):
        self._bptt = dataclasses.replace(self._bptt,
                                         learn_rate=jnp.float32(v))

    @property
    def ho_scale(self) -> float:
        """bptt->ho_scale (py-recur-numpy.c:277-281): top-layer LR scale."""
        return float(self._bptt.ho_scale)

    @ho_scale.setter
    def ho_scale(self, v: float):
        self._bptt = dataclasses.replace(self._bptt,
                                         ho_scale=jnp.float32(v))

    @property
    def momentum_weight(self) -> float:
        """bptt->momentum_weight (py-recur-numpy.c:283-287)."""
        return float(self._bptt.momentum_weight)

    @momentum_weight.setter
    def momentum_weight(self, v: float):
        self._bptt = dataclasses.replace(self._bptt,
                                         momentum_weight=jnp.float32(v))

    @property
    def ih_scale(self) -> float:
        """bptt->ih_scale: the last emergency BPTT scale (recur-nn.c:
        393-402), a live training-health signal; 1.0 = no clip.  With
        multiple streams this reports the strongest intervention (min)."""
        return float(jnp.min(self._bptt.ih_scale))

    @property
    def presynaptic_noise(self) -> float:
        return float(self.net.cfg.presynaptic_noise)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _check_2d(self, a, width, name):
        a = np.ascontiguousarray(a, dtype=np.float32)
        if a.ndim != 2 or a.shape[1] != width:
            raise ValueError(f"{name} must be 2-D with width {width}, "
                             f"got {a.shape}")
        return a

    def _balance_mask(self, targets: np.ndarray, base_mask, balance: float
                      ) -> np.ndarray:
        T = targets.shape[0]
        m = np.ones(T, np.float32)
        for i in range(T):
            if base_mask is not None and not base_mask[i]:
                m[i] = 0.0
                continue
            if balance != 0.0:
                t = int(np.argmax(targets[i]))
                self.seen_counts[t] += 1
                self.seen_sum += 1
                p = 1.0 - self.seen_counts[t] / self.seen_sum
                if p ** balance < self.net.rng.rand_float():
                    m[i] = 0.0
                    continue
                self.used_sum += 1
        return m

    def train(self, features, targets, n_epochs: int = 1, mask=None,
              learn_rate: float = -1.0, balance: float = 0.0):
        cfg = self.net.cfg
        features = self._check_2d(features, cfg.input_size, "input")
        targets = self._check_2d(targets, cfg.output_size, "target")
        if targets.shape[0] != features.shape[0]:
            raise ValueError("targets must have the same number of rows "
                             "as features")
        if mask is not None:
            mask = np.asarray(mask, bool)
            if mask.shape != (features.shape[0],):
                raise ValueError(f"mask is {mask.shape}; should be "
                                 f"({features.shape[0]},)")
        if learn_rate > 0:
            self.learn_rate = learn_rate
        targets = np.asarray(targets, np.float32)
        for _ in range(int(n_epochs)):
            m = self._balance_mask(targets, mask, balance)
            self._params, self._bptt, self._state, stats = \
                engine.dense_train_chunk(
                    cfg, self._hyper, self._params, self._bptt, self._state,
                    jnp.asarray(features)[None], jnp.asarray(targets)[None],
                    jnp.asarray(m)[None], self._next_key(),
                    jnp.float32(self.momentum),
                    jnp.float32(cfg.presynaptic_noise))
            n = max(float(stats.trained), 1.0)
            if self.verbose:
                print(f"epoch trained on {int(n)}; accuracy "
                      f"{float(stats.accuracy)/n:.2f} error "
                      f"{float(stats.error)/n:.2f}")
            self.log.log_float("error_t", float(stats.error) / n)
            self.log.log_float("use_ratio",
                               self.used_sum / max(self.seen_sum, 1))

    def classify(self, features) -> np.ndarray:
        cfg = self.net.cfg
        features = self._check_2d(features, cfg.input_size, "input")
        hidden = self._state.hidden
        hidden, probs = engine.dense_forward_seq(
            cfg, self._params, hidden, self._hyper.use_noise,
            jnp.asarray(features)[None], self._next_key(),
            jnp.float32(cfg.presynaptic_noise))
        self._state = dataclasses.replace(self._state, hidden=hidden)
        out = np.zeros((features.shape[0], cfg.output_size), np.float32)
        out[:, :] = np.asarray(probs[0])
        return out

    def save(self, filename: Optional[str] = None, backup: int = 0):
        self.net.params = self._params
        self.net.generation = self.generation
        self.net.learn_rate = self.learn_rate
        self.net.min_error_factor = float(self._bptt.min_error_factor[0])
        _nn.save_net(self.net, filename or self.filename, backup=bool(backup))

    @classmethod
    def load(cls, filename: str, **kwargs):
        net = _nn.load_net(filename)
        self = cls(net.cfg.input_size, net.cfg.hidden_size,
                   net.cfg.output_size, filename=filename, _net=net, **kwargs)
        self._params = net.params
        self._bptt = dataclasses.replace(
            self._bptt, generation=jnp.uint32(net.generation),
            learn_rate=jnp.float32(net.learn_rate))
        return self
