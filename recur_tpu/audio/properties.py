"""Single-source property registry for the classify surface.

The reference quadruplicates its ~50-property surface: GObject param specs
(gstclassify.c:306-643), the pending-properties timing machinery
(:1679-1828), net-metadata keys (:823-930) and classify.py's introspected
argparse args (:744-773).  Here ONE table describes each property — name,
type, default, range, blurb, timing class, metadata membership — and
everything else is generated from it:

  * CLI arguments (``add_classify_args`` / ``classifier_kwargs_from_args``)
  * live set_property aliases (``immediate_aliases``)
  * the net-metadata codec (``metadata_string`` / ``parse_metadata``)

Timing classes mirror pending_properties.h: "immediate" properties act on a
live classifier; "pre-creation" ones only make sense before the net exists;
"every-setup" ones re-apply when a net is (re)loaded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

IMMEDIATE = "immediate"
PRE_CREATION = "pre-creation"
EVERY_SETUP = "every-setup"


@dataclasses.dataclass(frozen=True)
class Prop:
    name: str                 # kebab-case property / CLI name
    type: Callable            # value parser (int/float/str)
    default: Any
    blurb: str
    timing: str = PRE_CREATION
    attr: Optional[str] = None        # python attribute / ctor kwarg
    metadata_fmt: Optional[str] = None  # printf fmt if stored in metadata
    rng: Optional[tuple] = None       # (min, max) hint
    short: Optional[str] = None       # short CLI flag
    cli: bool = True                  # expose as a CLI argument

    @property
    def attr_name(self) -> str:
        return self.attr or self.name.replace("-", "_")


# The classify element's surface (gstclassify.c:306-643), one row per
# property.  Metadata rows appear in the exact order the net-file metadata
# string is written (order feeds the filename hash — do not reorder).
CLASSIFY_PROPERTIES: tuple[Prop, ...] = (
    Prop("classes", str, "Mm", "class group string, e.g. 'Mm' or 'Mm,Kk,Wx'",
         metadata_fmt="%s", short="-c"),
    Prop("window-size", int, 256, "analysis window in samples (power of 2)",
         metadata_fmt="%d", rng=(32, 8192), short="-w"),
    Prop("mfccs", int, 0, "number of MFCCs (0 = use raw log bins)",
         metadata_fmt="%d", rng=(0, 40)),
    Prop("delta-features", int, 0, "orders of Δ features",
         metadata_fmt="%d", rng=(0, 4)),
    Prop("intensity-feature", int, 0, "append an intensity feature (0/1)",
         metadata_fmt="%d", rng=(0, 1)),
    Prop("lag", float, 0.0, "seconds to shift training targets vs audio",
         timing=EVERY_SETUP, metadata_fmt="%f"),
    Prop("min-frequency", float, 100.0, "lowest analysis frequency (Hz)",
         metadata_fmt="%f"),
    Prop("max-frequency", float, 0.0,
         "highest analysis frequency (0 = rate*0.499)", metadata_fmt="%f"),
    Prop("knee-frequency", float, 700.0,
         "mel-warp knee frequency (Hz)", metadata_fmt="%f"),
    Prop("focus-frequency", float, 0.0,
         "focus-warp centre frequency (0 = off)", metadata_fmt="%f"),
    Prop("window-type", int, 1,
         "analysis window: 0 none, 1 Hann, 2 Vorbis, 3 MP3",
         metadata_fmt="%d", rng=(0, 3)),
    # --- non-metadata, pre-creation ---
    Prop("channels", int, 12, "parallel audio channels (stream axis)",
         attr="n_channels", rng=(1, 1000), short="-n"),
    Prop("hidden-size", int, 199, "hidden layer size",
         rng=(1, 1_000_000), short="-H"),
    Prop("bptt-depth", int, 30, "truncated BPTT depth", rng=(1, 1000)),
    Prop("bottom-layer", int, 0, "optional feed-forward bottom layer size"),
    Prop("learning-style", int, 1,
         "0 weighted momentum, 1 Nesterov, 2 simplified-Nesterov, "
         "3 classical, 4 adagrad, 5 adadelta, 6 rprop "
         "(rnn_learning_method, recur-nn.h:109-119)"),
    Prop("activation", int, 2, "1 ReLU, 2 ReSQRT, 5 clipped ReLU",
         cli=False),
    Prop("presynaptic-noise", float, 0.0, "gaussian noise on hidden sums"),
    Prop("momentum-soft-start", float, 0.0, "softness of momentum onset"),
    Prop("weight-init-method", int, 1, "0 zero, 1 flat, 2 fan-in, 3 runs"),
    Prop("rng-seed", int, 11, "deterministic seed"),
    Prop("basename", str, "classify", "root for net/log filenames"),
    Prop("net-filename", str, None, "explicit net file path", short="-f"),
    Prop("force-load", bool, False, "reload an existing net file",
         cli=False),
    Prop("log-file", str, None, "key-value training log path"),
    Prop("error-weight", str, None, "per-output error weights 'a:b:...'"),
    # --- immediate (live) properties ---
    Prop("learn-rate", float, 0.0001, "learning rate", timing=IMMEDIATE,
         short="-l"),
    Prop("momentum", float, 0.95, "momentum (decay rate for adadelta)",
         timing=IMMEDIATE, short="-m"),
    Prop("training", bool, True, "train vs emit opinions",
         timing=IMMEDIATE, cli=False),
    Prop("target", str, "", "target event string 'c0t2.3:mkW ...'",
         timing=IMMEDIATE, attr="_target_string", cli=False),
    Prop("forget", bool, False, "zero hidden state and history",
         timing=IMMEDIATE, attr="_forget", cli=False),
    Prop("ignored-windows", int, 0, "skip the first N windows",
         timing=IMMEDIATE),
    Prop("balanced-training", float, 0.0,
         "bias toward training rare classes",
         timing=IMMEDIATE, attr="balanced_training_bias"),
    Prop("pipeline-depth", int, 1,
         "training blocks in flight before stats are read back (amortises "
         "device-link latency; 1 = synchronous)",
         timing=IMMEDIATE, rng=(1, 64)),
    Prop("unroll", int, 1,
         "window-scan unroll factor (identical math; trades compile time "
         "for per-iteration overhead)", rng=(1, 16)),
)


def metadata_props() -> tuple[Prop, ...]:
    return tuple(p for p in CLASSIFY_PROPERTIES if p.metadata_fmt)


def immediate_aliases() -> dict[str, str]:
    """kebab-case name → python attribute, for live set_property."""
    return {p.name: p.attr_name for p in CLASSIFY_PROPERTIES
            if p.timing == IMMEDIATE}


def metadata_string(obj) -> str:
    """Render the net-metadata block from an object carrying the attributes
    (key order is load-bearing: it feeds the filename hash)."""
    parts = []
    for p in metadata_props():
        attr = "classes_string" if p.name == "classes" else p.attr_name
        v = getattr(obj, attr)
        if p.metadata_fmt == "%d":
            v = int(v)
        parts.append(("%s " + p.metadata_fmt) % (p.name.replace("-", "_"), v))
    return "\n".join(parts) + "\n"


def parse_metadata(s: str) -> dict[str, Any]:
    """Parse a metadata block back to {attr_name: typed value}."""
    by_key = {p.name.replace("-", "_"): p for p in metadata_props()}
    out: dict[str, Any] = {}
    for line in s.splitlines():
        if " " not in line:
            continue
        k, v = line.split(" ", 1)
        p = by_key.get(k)
        if p is None:
            continue
        out[k] = p.type(float(v)) if p.type in (int,) else p.type(v)
    return out


def add_classify_args(parser, skip: Sequence[str] = ()):
    """Generate argparse arguments from the registry."""
    for p in CLASSIFY_PROPERTIES:
        if not p.cli or p.name in skip:
            continue
        flags = [f"--{p.name}"]
        if p.short:
            flags.append(p.short)
        kwargs: dict[str, Any] = {"help": p.blurb, "default": p.default,
                                  "dest": p.attr_name}
        if p.type is bool:
            kwargs["action"] = "store_true"
        else:
            kwargs["type"] = p.type
        parser.add_argument(*flags, **kwargs)
    return parser


def classifier_kwargs_from_args(opt) -> dict[str, Any]:
    """Collect AudioClassifier ctor kwargs from parsed args."""
    out = {}
    for p in CLASSIFY_PROPERTIES:
        if not p.cli:
            continue
        v = getattr(opt, p.attr_name, None)
        if v is None and p.default is None:
            continue
        out[p.attr_name] = v
    return out
