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
    metadata_optional: bool = False   # write only when != default (extension
                                      # keys kept out of reference-parity
                                      # metadata so hashes/filenames match)
    rng: Optional[tuple] = None       # (min, max) hint
    short: Optional[str] = None       # short CLI flag
    cli: bool = True                  # expose as a CLI argument
    readonly: bool = False            # get_property only (no ctor kwarg)
    cli_default: Any = None           # CLI-only default override (e.g. the
                                      # classify-train harness's channels=12
                                      # vs the library's 1)

    @property
    def attr_name(self) -> str:
        return self.attr or self.name.replace("-", "_")


# The classify element's surface (gstclassify.c:306-643), one row per
# property.  Metadata rows appear in the EXACT order and spelling of the
# reference's construct_metadata (gstclassify.c:847-876) — the rendered
# bytes feed rnn_hash32 and hence the net filename, so a reference-trained
# net and one of ours get identical names for identical parameters.
CLASSIFY_PROPERTIES: tuple[Prop, ...] = (
    Prop("classes", str, "01", "class group string, e.g. 'Mm' or 'Mm,Kk,Wx'",
         metadata_fmt="%s", short="-c"),
    Prop("min-frequency", float, 60.0, "lowest analysis frequency (Hz)",
         metadata_fmt="%f"),
    Prop("max-frequency", float, 0.0,
         "highest analysis frequency (0 = rate*0.499)", metadata_fmt="%f"),
    Prop("knee-frequency", float, 700.0,
         "mel-warp knee frequency (Hz)", metadata_fmt="%f"),
    Prop("mfccs", int, 0, "number of MFCCs (0 = use raw log bins)",
         metadata_fmt="%d", rng=(0, 40)),
    Prop("window-size", int, 256, "analysis window in samples (power of 2)",
         metadata_fmt="%d", rng=(32, 8192), short="-w"),
    Prop("basename", str, "classify", "root for net/log filenames",
         metadata_fmt="%s"),
    Prop("delta-features", int, 0, "orders of Δ features",
         metadata_fmt="%d", rng=(0, 4)),
    Prop("focus-frequency", float, 0.0,
         "focus-warp centre frequency (0 = off)", metadata_fmt="%f"),
    Prop("lag", float, 0.0, "seconds to shift training targets vs audio",
         timing=EVERY_SETUP, metadata_fmt="%f"),
    Prop("intensity-feature", int, 0, "append an intensity feature (0/1)",
         metadata_fmt="%d", rng=(0, 1)),
    Prop("confirmation-lag", float, 0.0,
         "seconds of confirmation lag for scoring (stored for the harness; "
         "gstclassify.c:415)", timing=EVERY_SETUP, metadata_fmt="%f"),
    Prop("features-offset", str, None,
         "per-feature offsets 'a:b:...' subtracted before scaling "
         "(find-feature-means workflow)", timing=EVERY_SETUP,
         metadata_fmt="%s"),
    Prop("features-scale", str, None,
         "per-feature scales 'a:b:...' applied after the offset",
         timing=EVERY_SETUP, metadata_fmt="%s"),
    # extension key: not in the reference's metadata — written only when it
    # differs from the default so reference-compatible nets hash identically
    # while non-Hann frontends still reload correctly
    Prop("window-type", int, 1,
         "analysis window: 0 none, 1 Hann, 2 Vorbis, 3 MP3",
         metadata_fmt="%d", metadata_optional=True, rng=(0, 3)),
    # --- non-metadata, pre-creation ---
    Prop("channels", int, 1, "parallel audio channels (stream axis)",
         attr="n_channels", rng=(1, 1000), short="-n", cli_default=12),
    Prop("hidden-size", int, 199, "hidden layer size",
         rng=(1, 1_000_000), short="-H"),
    Prop("bptt-depth", int, 30, "truncated BPTT depth", rng=(1, 1000)),
    Prop("bottom-layer", int, 0, "optional feed-forward bottom layer size"),
    Prop("learning-style", int, 1,
         "0 weighted momentum, 1 Nesterov, 2 simplified-Nesterov, "
         "3 classical, 4 adagrad, 5 adadelta, 6 rprop "
         "(rnn_learning_method, recur-nn.h:109-119)"),
    Prop("activation", int, 1, "1 ReLU, 2 ReSQRT, 5 clipped ReLU",
         cli=False),
    Prop("presynaptic-noise", float, 0.0, "gaussian noise on hidden sums"),
    Prop("momentum-soft-start", float, 0.0, "softness of momentum onset"),
    Prop("weight-init-method", int, 1, "0 zero, 1 flat, 2 fan-in, 3 runs"),
    Prop("weight-init-scale", float, 0.0,
         "empirically scale initial weights toward this forward gain "
         "(rnn_scale_initial_weights; 0 = off)"),
    Prop("weight-fan-in-sum", float, 0.0,
         "fan-in init: target sum of incoming weights per node (setting "
         "this selects the fan-in method unless weight-init-method is "
         "given, gstclassify.c:1046-1056)"),
    Prop("weight-fan-in-kurtosis", float, 0.3,
         "fan-in init: step size shaping the weight magnitude spread"),
    Prop("adagrad-ballast", float, 200.0,
         "initial adagrad gradient-accumulator value (softens early steps)"),
    Prop("top-learn-rate-scale", float, 1.0,
         "learn-rate multiplier for the hidden→output matrix (ho_scale)"),
    Prop("bottom-learn-rate-scale", float, 1.0,
         "learn-rate multiplier for the bottom layer"),
    Prop("random-alignment", bool, False,
         "start each training set at a random half-window phase "
         "(gstclassify.c:1346-1357)"),
    Prop("rng-seed", int, 11, "deterministic seed"),
    Prop("net-filename", str, None, "explicit net file path", short="-f"),
    Prop("force-load", bool, False, "reload an existing net file",
         cli=False),
    Prop("log-file", str, None, "key-value training log path"),
    Prop("features-file", str, None,
         "dump computed features per window to this file (debug)"),
    Prop("error-weight", str, None, "per-output error weights 'a:b:...'"),
    # --- immediate (live) properties ---
    Prop("learn-rate", float, 0.0001, "learning rate", timing=IMMEDIATE,
         short="-l"),
    Prop("momentum", float, 0.95, "momentum (decay rate for adadelta)",
         timing=IMMEDIATE, short="-m"),
    Prop("weight-noise", float, 0.0,
         "one-shot gaussian weight noise applied at each training-set "
         "start; negative values scale by -learn_rate "
         "(gstclassify.c:1363-1369)", timing=IMMEDIATE),
    Prop("training", bool, True, "train vs emit opinions",
         timing=IMMEDIATE, cli=False),
    Prop("target", str, "", "target event string 'c0t2.3:mkW ...'",
         timing=IMMEDIATE, attr="_target_string", cli=False),
    Prop("forget", bool, False, "zero hidden state and history",
         timing=IMMEDIATE, attr="_forget", cli=False),
    Prop("pgm-dump", str, "", "dump weight images now, e.g. 'ihw how'",
         timing=IMMEDIATE, attr="_pgm_dump", cli=False),
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
    Prop("walk-unroll", int, 1,
         "BPTT backward-walk unroll factor (identical math)", rng=(1, 64)),
    # --- read-only ---
    Prop("windows-per-second", float, 0.0,
         "analysis windows per second = rate*2/window-size "
         "(gstclassify.c:1916-1918)", timing=IMMEDIATE, cli=False,
         readonly=True),
)


def metadata_props() -> tuple[Prop, ...]:
    return tuple(p for p in CLASSIFY_PROPERTIES if p.metadata_fmt)


def immediate_aliases() -> dict[str, str]:
    """kebab-case name → python attribute, for live set_property."""
    return {p.name: p.attr_name for p in CLASSIFY_PROPERTIES
            if p.timing == IMMEDIATE}


def metadata_string(obj) -> str:
    """Render the net-metadata block from an object carrying the attributes.

    Byte-compatible with the reference's construct_metadata
    (gstclassify.c:847-876): hyphenated keys in its exact order, %f floats
    (six decimals), and unset strings rendered as "(null)" (glibc asprintf's
    behaviour for a NULL %s argument).  Extension keys (metadata_optional)
    are appended only when non-default, so any net the reference could have
    produced gets identical metadata bytes — and hence an identical
    rnn_hash32 filename signature."""
    parts = []
    for p in metadata_props():
        attr = "classes_string" if p.name == "classes" else p.attr_name
        v = getattr(obj, attr)
        if p.metadata_optional and (v == p.default or v is None):
            continue
        if p.metadata_fmt == "%d":
            v = int(v)
        elif p.metadata_fmt == "%s" and v is None:
            v = "(null)"
        parts.append(("%s " + p.metadata_fmt) % (p.name, v))
    return "\n".join(parts) + "\n"


def parse_metadata(s: str) -> dict[str, Any]:
    """Parse a metadata block back to {attr_name: typed value}.

    Accepts the reference's hyphenated keys and (for nets saved by rounds
    1-2 of this framework) the legacy underscored spelling.  Unlike the
    reference's sscanf (which stops at intensity-feature due to a missing
    separator in its template, gstclassify.c:898-916, so never recovers
    confirmation-lag or the normalisation strings), every key is parsed —
    feature normalisation survives a save/load round trip here."""
    by_key = {p.name: p for p in metadata_props()}
    out: dict[str, Any] = {}
    for line in s.splitlines():
        if " " not in line:
            continue
        k, v = line.split(" ", 1)
        p = by_key.get(k) or by_key.get(k.replace("_", "-"))
        if p is None:
            continue
        if p.metadata_fmt == "%s":
            out[p.attr_name] = None if v == "(null)" else v
        elif p.type is int:
            out[p.attr_name] = int(float(v))
        else:
            out[p.attr_name] = p.type(v)
    return out


def parse_colon_floats(s: Optional[str], n_limit: int) -> Optional[list]:
    """alloc_floats_from_colon_sep_string (gstclassify.c:757-800): parse up
    to n_limit floats from a loosely separated string; None/empty → None."""
    if not s or s == "(null)":
        return None
    import re
    vals = [float(x) for x in re.split(r"[^0-9eE.+-]+", s) if x][:n_limit]
    return vals or None


def render_colon_floats(values, default) -> Optional[str]:
    """Render a normalisation array as the colon-separated metadata string;
    None when every element equals the default (an unset property → the
    reference writes "(null)")."""
    import numpy as np
    a = np.asarray(values, np.float32)
    if np.all(a == default):
        return None
    return ":".join("%r" % float(v) for v in a)


def add_classify_args(parser, skip: Sequence[str] = ()):
    """Generate argparse arguments from the registry."""
    for p in CLASSIFY_PROPERTIES:
        if not p.cli or p.name in skip:
            continue
        flags = [f"--{p.name}"]
        if p.short:
            flags.append(p.short)
        default = p.cli_default if p.cli_default is not None else p.default
        kwargs: dict[str, Any] = {"help": p.blurb, "default": default,
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
