"""Core net definition: configs, parameter/state pytrees, CDB v10 save/load.

This is the TPU-native equivalent of the reference's RecurNN struct family
(recur-nn.h:158-227) and its CDB serialisation (recur-nn-io.c).  Key design
shift: instead of N pointer-aliased "clone" nets sharing weight arrays
(rnn_new_training_set, recur-nn-init.c:221-243), parameters are a single
pytree and *streams* are a leading batch axis on the state — the synchronic
mini-batch becomes the shape of the data, and gradient "all-reduce" becomes a
sum over the stream axis (or a psum over a device mesh).

Sizes: the reference rounds vector lengths up to 4 floats for SSE
(ALIGNED_VECTOR_LEN, recur-nn-helpers.h:20).  We keep those exact padded sizes
in the stored arrays so .net files are bit-compatible; XLA re-pads to MXU
tiles internally as it sees fit.
"""

from __future__ import annotations

import dataclasses
import struct
from enum import IntEnum
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu.utils.cdb import Reader, Writer
from recur_tpu.utils.rng import RecurRng

# --- constants (recur-nn.h:17-57) ---
RANDOM_DAMAGE_FACTOR = 0.5
MAX_TOP_ERROR_FACTOR = 2.0
MAX_ERROR_GAIN = 2.0
ERROR_GAIN_CEILING = 1.0
BASE_MIN_ERROR_FACTOR = 1e-12
MAX_MIN_ERROR_FACTOR = 1e-2
ABS_MIN_ERROR_FACTOR = 1e-20
MIN_ERROR_GAIN = 1e-8
RNN_HIDDEN_PENALTY = 0.0
HIDDEN_MEAN_SOFT_TOP = 16.0
INPUT_MEAN_SOFT_TOP = 16.0
RNN_INITIAL_WEIGHT_VARIANCE_FACTOR = 2.0
WEIGHT_SCALE = 1.0 - 1e-6
RNN_CONDITIONING_INTERVAL = 8
RNN_TALL_POPPY_THRESHOLD = 1.0
RNN_TALL_POPPY_SCALE = 0.99
RNN_LAWN_MOWER_THRESHOLD = 10.0
RNN_MOMENTUM_WEIGHT = 0.5


class Flag:
    """Net flags (recur-nn.h:78-103).  Stored verbatim in .net files."""
    OWN_BPTT = 1
    OWN_WEIGHTS = 2
    LOG_APPEND = 8
    LOG_HIDDEN_SUM = 16
    LOG_WEIGHT_SUM = 32
    BPTT_ADAPTIVE_MIN_ERROR = 64
    NO_MOMENTUMS = 128
    NO_DELTAS = 256
    BOTTOM_LAYER = 1024
    AUX_ARRAYS = 2048
    COND_USE_SCALE = 1 << (0 + 16)
    COND_USE_ZERO = 1 << (2 + 16)
    COND_USE_LAWN_MOWER = 1 << (3 + 16)
    COND_USE_TALL_POPPY = 1 << (4 + 16)
    COND_USE_RAND = 1 << (6 + 16)
    STANDARD = OWN_BPTT | OWN_WEIGHTS | COND_USE_ZERO | LOG_HIDDEN_SUM


class LearningMethod(IntEnum):
    """rnn_learning_method (recur-nn.h:109-119)."""
    MOMENTUM_WEIGHTED = 0
    MOMENTUM_NESTEROV = 1
    MOMENTUM_SIMPLIFIED_NESTEROV = 2
    MOMENTUM_CLASSICAL = 3
    ADAGRAD = 4
    ADADELTA = 5
    RPROP = 6


class Activation(IntEnum):
    """rnn_activation (recur-nn.h:130-140)."""
    RELU = 1
    RESQRT = 2
    RECLIP20 = 5


class InitMethod(IntEnum):
    ZERO = 0
    FLAT = 1
    FAN_IN = 2
    RUNS = 3


class InitDistribution(IntEnum):
    UNIFORM = 1
    GAUSSIAN = 2
    LOG_NORMAL = 3
    SEMICIRCLE = 4


def _align4(n: int) -> int:
    """ALIGNED_VECTOR_LEN for float: round to a multiple of 4."""
    return (n + 3) & ~3


@dataclasses.dataclass(frozen=True)
class RnnConfig:
    """Static net topology & behaviour; hashable, passed as a static jit arg."""
    input_size: int
    hidden_size: int
    output_size: int
    flags: int = Flag.STANDARD
    depth: int = 30                      # truncated-BPTT depth
    activation: Activation = Activation.RELU
    presynaptic_noise: float = 0.0
    # bottom (extra feed-forward) layer, RNN_NET_FLAG_BOTTOM_LAYER
    bottom_input_size: int = 0           # raw inputs to bottom layer
    bottom_overlap: int = 0

    @property
    def i_size(self) -> int:
        return _align4(self.hidden_size + self.input_size + 1)

    @property
    def h_size(self) -> int:
        return _align4(self.hidden_size + 1)

    @property
    def o_size(self) -> int:
        return _align4(self.output_size)

    @property
    def ih_size(self) -> int:
        return self.i_size * self.h_size

    @property
    def ho_size(self) -> int:
        return self.h_size * self.o_size

    @property
    def input_offset(self) -> int:
        """Where real inputs start inside the input layer (recur-nn.c:6)."""
        return self.hidden_size + 1

    @property
    def has_bottom(self) -> bool:
        return bool(self.flags & Flag.BOTTOM_LAYER)

    @property
    def bottom_i_size(self) -> int:
        return _align4(self.bottom_input_size + 1)

    @property
    def bottom_o_size(self) -> int:
        """Bottom layer output feeds the RNN's input slots."""
        return _align4(self.input_size)

    @property
    def adaptive_min_error(self) -> bool:
        return bool(self.flags & Flag.BPTT_ADAPTIVE_MIN_ERROR)

    @property
    def raw_input_size(self) -> int:
        """What callers feed: the bottom layer's inputs when present
        (one_hot_opinion, charmodel-helpers.h:16-33), else the RNN's."""
        return self.bottom_input_size if self.has_bottom else self.input_size


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RnnParams:
    """Learnable parameters.  ih: [i_size, h_size]; ho: [h_size, o_size];
    bottom: [bottom_i_size, bottom_o_size] or None."""
    ih: jax.Array
    ho: jax.Array
    bottom: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BpttState:
    """Per-model training state (RecurNNBPTT scalars + optimizer slots).

    min_error_factor is [S]-shaped: each stream's adaptive BPTT floor evolves
    independently, exactly as each clone's bptt does in the reference.
    """
    ih_momentum: jax.Array
    ho_momentum: jax.Array
    ih_aux: Optional[jax.Array]
    ho_aux: Optional[jax.Array]
    bottom_momentum: Optional[jax.Array]
    bottom_aux: Optional[jax.Array]
    learn_rate: jax.Array            # f32 scalar
    ho_scale: jax.Array              # f32 scalar (top-layer LR scale)
    momentum: jax.Array              # f32 scalar
    momentum_weight: jax.Array       # f32 scalar
    min_error_factor: jax.Array      # f32 [S]
    # last emergency BPTT scale per stream (recur-nn.c:393-402); 1.0 = no
    # clip.  Live training-health signal only — the reference marks
    # bptt->ih_scale "temporary" and does not serialize it.
    ih_scale: jax.Array              # f32 [S]
    generation: jax.Array            # u32 scalar
    # accumulated deltas for diachronic batching
    ih_delta: jax.Array
    ho_delta: jax.Array
    bottom_delta: Optional[jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RnnState:
    """Per-stream recurrent state: S parallel streams sharing one weight set.

    history is the truncated-BPTT input ring: history[s, t] is the full input
    layer [bias, hidden(t-1), x(t)] at time t, the exact contents the
    reference keeps in bptt->history (writing inputs IS writing history,
    recur-nn.c:696-704).
    """
    hidden: jax.Array       # [S, h_size] post-activation, [.,0]==1
    history: jax.Array      # [S, depth, i_size]
    head: jax.Array         # i32 scalar: ring index of most recent entry
    # one-hot-factored ring (bptt_impl="factored", char models only): the
    # ring keeps just the [bias, hidden] section ([S, depth, input_offset])
    # in `history` and the token ids here — the one-hot value equals the
    # stored bias (the input soft-clip scale), so nothing else is needed.
    tokens: Optional[jax.Array] = None   # [S, depth] i32


def new_params(cfg: RnnConfig, dtype=jnp.float32) -> RnnParams:
    ih = jnp.zeros((cfg.i_size, cfg.h_size), dtype)
    ho = jnp.zeros((cfg.h_size, cfg.o_size), dtype)
    bottom = (jnp.zeros((cfg.bottom_i_size, cfg.bottom_o_size), dtype)
              if cfg.has_bottom else None)
    return RnnParams(ih=ih, ho=ho, bottom=bottom)


def new_bptt_state(cfg: RnnConfig, n_streams: int, learn_rate: float = 1e-3,
                   momentum: float = 0.95) -> BpttState:
    def bzeros():
        # fresh buffer each time: aliased leaves break argument donation
        return (jnp.zeros((cfg.bottom_i_size, cfg.bottom_o_size), jnp.float32)
                if cfg.has_bottom else None)
    aux = bool(cfg.flags & Flag.AUX_ARRAYS)
    return BpttState(
        ih_momentum=jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32),
        ho_momentum=jnp.zeros((cfg.h_size, cfg.o_size), jnp.float32),
        ih_aux=jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32) if aux else None,
        ho_aux=jnp.zeros((cfg.h_size, cfg.o_size), jnp.float32) if aux else None,
        bottom_momentum=bzeros(),
        bottom_aux=bzeros() if aux else None,
        learn_rate=jnp.float32(learn_rate),
        ho_scale=jnp.float32(1.0),
        momentum=jnp.float32(momentum),
        momentum_weight=jnp.float32(RNN_MOMENTUM_WEIGHT),
        min_error_factor=jnp.full((n_streams,), BASE_MIN_ERROR_FACTOR * cfg.h_size,
                                  jnp.float32),
        ih_scale=jnp.ones((n_streams,), jnp.float32),
        generation=jnp.uint32(0),
        ih_delta=jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32),
        ho_delta=jnp.zeros((cfg.h_size, cfg.o_size), jnp.float32),
        bottom_delta=bzeros(),
    )


def new_state(cfg: RnnConfig, n_streams: int,
              history_dtype=jnp.float32, factored: bool = False) -> RnnState:
    """history_dtype=bfloat16 halves the HBM traffic of the BPTT backward
    walk (which re-reads the ring every step) at a small numeric cost;
    float32 is exact reference parity.  factored=True stores only the
    [bias, hidden] ring section plus token ids (one-hot char inputs; pair
    with TrainHyper(bptt_impl="factored"))."""
    width = cfg.input_offset if factored else cfg.i_size
    return RnnState(
        hidden=jnp.zeros((n_streams, cfg.h_size), jnp.float32),
        history=jnp.zeros((n_streams, cfg.depth, width),
                          jnp.dtype(history_dtype)),
        head=jnp.int32(0),
        tokens=(jnp.zeros((n_streams, cfg.depth), jnp.int32)
                if factored else None),
    )


@dataclasses.dataclass
class Net:
    """Host-side bundle: config + params + rng + metadata + training scalars.

    This is the object the task layers and CLIs handle; the jitted step
    functions take (cfg, params, state, bptt) pytrees directly.
    """
    cfg: RnnConfig
    params: RnnParams
    rng: RecurRng
    generation: int = 0
    metadata: Optional[str] = None
    learn_rate: float = 1e-3
    ho_scale: float = 1.0
    momentum: float = 0.95
    momentum_weight: float = RNN_MOMENTUM_WEIGHT
    min_error_factor: float = 0.0
    bptt_index: int = 0
    bottom_learn_rate_scale: float = 1.0

    def clone_cfg(self, **overrides) -> RnnConfig:
        return dataclasses.replace(self.cfg, **overrides)


def new_net(input_size: int, hidden_size: int, output_size: int,
            flags: int = Flag.STANDARD, rng_seed: int = 1, depth: int = 30,
            learn_rate: float = 1e-3, momentum: float = 0.95,
            presynaptic_noise: float = 0.0,
            activation: Activation = Activation.RELU,
            bottom_input_size: int = 0, bottom_overlap: int = 0,
            metadata: Optional[str] = None) -> Net:
    """rnn_new / rnn_new_with_bottom_layer equivalent (recur-nn-init.c:80-143)."""
    if bottom_input_size:
        flags |= Flag.BOTTOM_LAYER
    cfg = RnnConfig(input_size=input_size, hidden_size=hidden_size,
                    output_size=output_size, flags=flags, depth=depth,
                    activation=Activation(activation),
                    presynaptic_noise=presynaptic_noise,
                    bottom_input_size=bottom_input_size,
                    bottom_overlap=bottom_overlap)
    rng = RecurRng(rng_seed)
    net = Net(cfg=cfg, params=new_params(cfg), rng=rng,
              learn_rate=learn_rate, momentum=momentum, metadata=metadata,
              min_error_factor=BASE_MIN_ERROR_FACTOR * cfg.h_size)
    return net


# --------------------------------------------------------------------------
# CDB v10 serialisation (recur-nn-io.c).  Same keys, same binary layout.
# --------------------------------------------------------------------------

_FORMAT_VERSION = 10


def _i32(v) -> bytes:
    return struct.pack("<i", int(v))


def _u32(v) -> bytes:
    return struct.pack("<I", int(v) & 0xFFFFFFFF)


def _f32(v) -> bytes:
    return struct.pack("<f", float(v))


def save_net(net: Net, filename: str, backup: bool = False):
    """Write a version-10 net file identical in schema to rnn_save_net
    (recur-nn-io.c:12-147)."""
    cfg = net.cfg
    w = Writer()
    w.add("save_format_version", _i32(_FORMAT_VERSION))
    w.add("net.i_size", _i32(cfg.i_size))
    w.add("net.h_size", _i32(cfg.h_size))
    w.add("net.o_size", _i32(cfg.o_size))
    w.add("net.input_size", _i32(cfg.input_size))
    w.add("net.hidden_size", _i32(cfg.hidden_size))
    w.add("net.output_size", _i32(cfg.output_size))
    w.add("net.ih_size", _i32(cfg.ih_size))
    w.add("net.ho_size", _i32(cfg.ho_size))
    w.add("net.generation", _u32(net.generation))
    w.add("net.flags", _u32(cfg.flags))
    w.add("net.presynaptic_noise", _f32(cfg.presynaptic_noise))
    w.add("net.activation", _i32(int(cfg.activation)))
    w.add("net.rng", net.rng.to_bytes())
    ih = np.asarray(net.params.ih, dtype="<f4")
    ho = np.asarray(net.params.ho, dtype="<f4")
    assert ih.size == cfg.ih_size and ho.size == cfg.ho_size
    w.add("net.ih_weights", ih.tobytes())
    w.add("net.ho_weights", ho.tobytes())
    if net.metadata:
        w.add("net.metadata", net.metadata.encode("utf-8") + b"\0")
    if cfg.flags & Flag.OWN_BPTT:
        w.add("bptt.depth", _i32(cfg.depth))
        w.add("bptt.index", _i32(net.bptt_index))
        w.add("bptt.learn_rate", _f32(net.learn_rate))
        w.add("bptt.ho_scale", _f32(net.ho_scale))
        w.add("bptt.momentum", _f32(net.momentum))
        w.add("bptt.momentum_weight", _f32(net.momentum_weight))
        w.add("bptt.min_error_factor", _f32(net.min_error_factor))
    if cfg.has_bottom and net.params.bottom is not None:
        w.add("bottom_layer.input_size", _i32(cfg.bottom_input_size))
        w.add("bottom_layer.output_size", _i32(cfg.input_size))
        w.add("bottom_layer.i_size", _i32(cfg.bottom_i_size))
        w.add("bottom_layer.o_size", _i32(cfg.bottom_o_size))
        w.add("bottom_layer.learn_rate_scale", _f32(net.bottom_learn_rate_scale))
        w.add("bottom_layer.overlap", _i32(cfg.bottom_overlap))
        bw = np.asarray(net.params.bottom, dtype="<f4")
        w.add("bottom_layer.weights", bw.tobytes())
    w.write(filename, backup=backup)


def _unpack_i32(b: bytes) -> int:
    return struct.unpack("<i", b)[0]


def _unpack_u32(b: bytes) -> int:
    return struct.unpack("<I", b)[0]


def _unpack_f32(b: bytes) -> float:
    return struct.unpack("<f", b)[0]


def load_net(filename: str) -> Net:
    """Read a net file in any version >= 2 (rnn_load_net, recur-nn-io.c:149-357).

    Versions < 4 used unqualified keys; everything in the wild (and our own
    writer) is >= 4, but the qualified/unqualified switch is honoured.
    """
    r = Reader.open(filename)
    vraw = r.get("save_format_version")
    version = _unpack_i32(vraw) if vraw and len(vraw) == 4 else 0

    def key(obj: str, attr: str) -> str:
        return f"{obj}.{attr}" if version >= 4 else attr

    def geti(obj, attr):
        return _unpack_i32(r[key(obj, attr)])

    def getf(obj, attr):
        return _unpack_f32(r[key(obj, attr)])

    i_size = geti("net", "i_size")
    h_size = geti("net", "h_size")
    o_size = geti("net", "o_size")
    input_size = geti("net", "input_size")
    hidden_size = geti("net", "hidden_size")
    output_size = geti("net", "output_size")
    ih_size = geti("net", "ih_size")
    ho_size = geti("net", "ho_size")
    rng = RecurRng.from_bytes(r[key("net", "rng")])
    generation = _unpack_u32(r[key("net", "generation")])
    flags = _unpack_u32(r[key("net", "flags")])
    presynaptic_noise = getf("net", "presynaptic_noise") if version >= 9 else 0.0
    activation = Activation(geti("net", "activation")) if version >= 10 else Activation.RELU

    depth, index = 0, 0
    learn_rate, momentum = 0.0, 0.0
    momentum_weight = RNN_MOMENTUM_WEIGHT
    ho_scale = output_size / max(hidden_size, 1)
    min_error_factor = BASE_MIN_ERROR_FACTOR * h_size
    if flags & Flag.OWN_BPTT:
        depth = geti("bptt", "depth")
        learn_rate = getf("bptt", "learn_rate")
        index = geti("bptt", "index")
        momentum = getf("bptt", "momentum")
        momentum_weight = getf("bptt", "momentum_weight")
        if version >= 2:
            ho_scale = getf("bptt", "ho_scale")
        if version >= 3:
            min_error_factor = getf("bptt", "min_error_factor")

    bottom_input_size = 0
    bottom_overlap = 0
    bottom_lrs = 1.0
    if (flags & Flag.BOTTOM_LAYER) and version >= 4:
        bottom_lrs = getf("bottom_layer", "learn_rate_scale")
        bottom_input_size = geti("bottom_layer", "input_size")
        bottom_overlap = geti("bottom_layer", "overlap")

    cfg = RnnConfig(input_size=input_size, hidden_size=hidden_size,
                    output_size=output_size, flags=flags,
                    depth=max(depth, 1), activation=activation,
                    presynaptic_noise=presynaptic_noise,
                    bottom_input_size=bottom_input_size,
                    bottom_overlap=bottom_overlap)
    # cross-check computed sizes against saved ones (recur-nn-io.c:264-283)
    for name, got, want in (("i_size", cfg.i_size, i_size),
                            ("h_size", cfg.h_size, h_size),
                            ("o_size", cfg.o_size, o_size),
                            ("ih_size", cfg.ih_size, ih_size),
                            ("ho_size", cfg.ho_size, ho_size)):
        if got != want:
            raise ValueError(f"net file {filename}: {name} mismatch "
                             f"(computed {got}, saved {want})")

    ih = np.frombuffer(r[key("net", "ih_weights")], dtype="<f4").reshape(i_size, h_size)
    ho = np.frombuffer(r[key("net", "ho_weights")], dtype="<f4").reshape(h_size, o_size)
    bottom = None
    if cfg.has_bottom:
        braw = r.get(key("bottom_layer", "weights"))
        if braw is not None:
            bottom = np.frombuffer(braw, dtype="<f4").reshape(
                cfg.bottom_i_size, cfg.bottom_o_size)
    metadata = None
    if version >= 5:
        mraw = r.get(key("net", "metadata"))
        if mraw is not None:
            metadata = mraw.rstrip(b"\0").decode("utf-8", errors="replace")

    params = RnnParams(ih=jnp.asarray(ih), ho=jnp.asarray(ho),
                       bottom=jnp.asarray(bottom) if bottom is not None else None)
    return Net(cfg=cfg, params=params, rng=rng, generation=generation,
               metadata=metadata, learn_rate=learn_rate, ho_scale=ho_scale,
               momentum=momentum, momentum_weight=momentum_weight,
               min_error_factor=min_error_factor, bptt_index=index,
               bottom_learn_rate_scale=bottom_lrs)


def print_net_stats(net: Net):
    """rnn_print_net_stats (recur-nn-init.c:846-861): mean/variance of the
    live regions of each weight matrix."""
    def report(name, a):
        a = np.asarray(a)
        print(f"{name}: mean {a.mean():.3g} variance {a.var():.3g} "
              f"(std dev {a.std():.3g}) n {a.size}")
    cfg = net.cfg
    ih = np.asarray(net.params.ih)
    report("ih_weights",
           ih[:cfg.hidden_size + cfg.input_size + 1, 1:cfg.hidden_size + 1])
    ho = np.asarray(net.params.ho)
    report("ho_weights", ho[:cfg.hidden_size + 1, :cfg.output_size])
    if net.params.bottom is not None:
        b = np.asarray(net.params.bottom)
        report("bottom weights", b[:cfg.bottom_input_size + 1,
                                   1:cfg.input_size + 1])
