"""text-predict: train a char-level LM on a text corpus.

TPU rebuild of the reference CLI (text-predict.c); option names and defaults
follow text-predict.c:44-108.  The big behavioural extension is --multi-tap:
on TPU many taps are nearly free (they batch into the MXU), so the effective
default for speed is a few hundred streams, but the reference default (single
tap) is preserved.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.models.alphabet import (
    Alphabet, Metadata, check_metadata, construct_net_filename)
from recur_tpu.models.charmodel import CharModel, Schedule, Ventropy
from recur_tpu.nn import Activation, Flag, InitDistribution, InitMethod, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.utils.kvlog import KvLog

DEFAULT_CHARSET = "8 etaonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_!*&"
DEFAULT_COLLAPSE_CHARS = "10872}{659/34][@"
DEFAULT_TEXT = "/root/reference/test-images/erewhon.txt"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="text-predict", description=__doc__)
    a = p.add_argument
    a("--text", default=DEFAULT_TEXT, help="text file to learn")
    a("--alphabet", default=DEFAULT_CHARSET)
    a("--collapse-chars", default=DEFAULT_COLLAPSE_CHARS)
    a("--find-alphabet-threshold", type=float, default=0.0,
      help="if set, discover the alphabet from the text")
    a("--find-alphabet-digit-adjust", type=float, default=1.0)
    a("--find-alphabet-alpha-adjust", type=float, default=1.0)
    a("--case-sensitive", action="store_true")
    a("--utf8", action="store_true")
    a("--no-collapse-space", action="store_true")
    a("--hidden-size", type=int, default=199)
    a("--depth", type=int, default=30, help="BPTT depth")
    a("--learn-rate", type=float, default=0.001)
    a("--learn-rate-min", type=float, default=0.0)
    a("--learn-rate-inertia", type=int, default=0)
    a("--learn-rate-scale", type=float, default=0.5)
    a("--learn-rate-schedule", default="sample",
      choices=["sample", "trend"],
      help="'sample': the reference's random-recent-sample comparison "
           "(charmodel-predict.c:100-135); 'trend': noise-aware halved-"
           "window mean comparison (drops only when the averaged trend "
           "stalls — immune to single noisy validations)")
    a("--momentum", type=float, default=0.95)
    a("--momentum-weight", type=float, default=nn.RNN_MOMENTUM_WEIGHT)
    a("--momentum-soft-start", type=float, default=0.0)
    a("--learning-style", type=int, default=0,
      help="0 weighted, 1 nesterov, 2 simplified nesterov, 3 classical, "
           "4 adagrad, 5 adadelta, 6 rprop")
    a("--activation", type=int, default=1, help="1 ReLU, 2 ReSQRT, 5 clip20")
    a("--adagrad-ballast", type=float, default=200.0)
    a("--adadelta-ballast", type=float, default=0.0)
    a("--no-adaptive-min", action="store_true")
    a("--batch-size", type=int, default=1)
    a("--multi-tap", type=int, default=0, help="number of parallel taps")
    a("--presynaptic-noise", type=float, default=0.0)
    a("--rng-seed", type=int, default=1)
    a("--stop-after", type=int, default=0)
    a("--validate-chars", type=int, default=0)
    a("--validation-overlap", type=int, default=1)
    a("--confab-size", type=int, default=80)
    a("--confab-bias", type=float, default=0.0)
    a("--basename", default="text")
    a("--log-file", default="text.log")
    a("--log-weight-sum", action="store_true",
      help="log the ih weight abs-sum each report (can be expensive)")
    a("--filename", default=None, help="explicit net filename")
    a("--reload", action="store_true")
    a("--force-metadata", action="store_true")
    a("--init-method", type=int, default=int(InitMethod.FLAT))
    a("--init-submethod", type=int, default=int(InitMethod.FLAT))
    a("--flat-init-distribution", type=int,
      default=int(InitDistribution.SEMICIRCLE))
    a("--init-variance", type=float, default=-1.0)
    a("--init-weight-scale", type=float, default=0.0)
    a("--perforate-weights", type=float, default=0.0)
    a("--periodic-weight-noise", type=float, default=0.0)
    a("--report-interval", type=int, default=1024)
    a("--no-save-net", action="store_true")
    a("--diagonal-only-section", type=int, default=0)
    a("--diagonal-only-friends", type=int, default=0)
    a("--bottom-layer", type=int, default=0)
    a("--top-learn-rate-scale", type=float, default=1.0)
    a("--bottom-learn-rate-scale", type=float, default=1.0)
    a("--unroll", type=int, default=1,
      help="scan unroll factor (amortises per-iteration device overhead)")
    a("--walk-unroll", type=int, default=1,
      help="BPTT backward-walk unroll factor (amortises the per-depth-step "
           "overhead of the walk's small matmuls; identical math)")
    a("--ema-weight", type=float, default=0.0,
      help="per-generation decay for Polyak weight averaging (e.g. "
           "0.9999); validation then scores the averaged net, saved "
           "alongside as <net>.ema (beyond-reference extension)")
    a("--distill-from", action="append", default=[], metavar="NET",
      help="frozen teacher net(s) for ensemble distillation (repeatable): "
           "the training target blends toward the teachers' predictive "
           "mixture, computed in-graph with per-stream carried teacher "
           "hiddens (beyond-reference extension)")
    a("--distill-alpha", type=float, default=1.0,
      help="soft-target weight: 0 = pure hard labels, 1 = pure teacher "
           "mixture (default 1.0)")
    a("--distill-temp", type=float, default=1.0,
      help="teacher softmax temperature (default 1.0)")
    a("--snapshot-every", type=int, default=0,
      help="save the validation-scored weights as <net>.g<GEN> every N "
           "generations (decorrelated ensemble members from one run; "
           "beyond-reference extension)")
    a("--bptt-impl", default="buffered",
      choices=["buffered", "twopass", "factored"],
      help="BPTT gradient formulation: buffered einsum, twopass (trades "
           "matvecs for HBM traffic), or factored (twopass + one-hot-"
           "factored history ring; see ops/core.py)")
    a("--history-dtype", default="float32",
      choices=["float32", "bfloat16"],
      help="BPTT history ring dtype; bfloat16 halves its HBM traffic")
    a("--start-char", type=int, default=-1,
      help="character to start the first epoch on (-1 for generation mod "
           "text length, text-predict.c:590-597)")
    a("--dump-collapsed-text", default=None, metavar="FILE",
      help="dump the symbol-encoded text back out as readable text")
    a("--adjust-noise", action="store_true",
      help="scale presynaptic noise down along with the learn rate")
    a("--diagonal-only-boost", type=float, default=0.0,
      help="add to weights in --diagonal-only-section")
    a("--temporal-pgm-dump", action="store_true",
      help="dump stream-0 hidden activations over time as PPM images")
    a("--periodic-pgm-dump", default="", metavar="SPEC",
      help="dump weight images at each report, e.g. 'ihw how'")
    a("--fp-exception-level", type=int, default=0,
      help="0: none, >0: enable NaN/Inf debugging on device arrays")
    a("--override-params", "-o", action="store_true",
      help="override meta-parameters in a reloaded net (text-predict.c:258)")
    a("--quiet", "-q", action="count", default=0)
    a("--epochs", type=int, default=0, help="0 = run forever / stop-after")
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    with open(opt.text, "rb") as f:
        raw = f.read()

    case_insensitive = not opt.case_sensitive
    collapse_space = not opt.no_collapse_space
    if opt.find_alphabet_threshold:
        alphabet = Alphabet.find(
            raw, threshold=opt.find_alphabet_threshold,
            digit_adjust=opt.find_alphabet_digit_adjust,
            alpha_adjust=opt.find_alphabet_alpha_adjust,
            case_insensitive=case_insensitive, utf8=opt.utf8,
            collapse_space=collapse_space)
    else:
        alphabet = Alphabet.from_chars(
            opt.alphabet, opt.collapse_chars,
            case_insensitive=case_insensitive, utf8=opt.utf8,
            collapse_space=collapse_space)
    n_chars = len(alphabet)
    meta = Metadata.from_alphabet(alphabet)
    filename = opt.filename or construct_net_filename(
        meta, opt.basename, n_chars, opt.bottom_layer, opt.hidden_size,
        n_chars)

    flags = Flag.STANDARD
    if not opt.no_adaptive_min:
        flags |= Flag.BPTT_ADAPTIVE_MIN_ERROR
    if opt.log_weight_sum:
        flags |= Flag.LOG_WEIGHT_SUM
    style = LearningMethod(opt.learning_style)
    if style in (LearningMethod.ADADELTA, LearningMethod.RPROP):
        flags |= Flag.AUX_ARRAYS

    net = None
    if opt.reload and os.path.exists(filename):
        net = nn.load_net(filename)
        if opt.quiet < 1:
            print(f"reloaded {filename} at generation {net.generation}",
                  file=sys.stderr)
        meta, net.metadata = check_metadata(
            net.metadata, meta, trust_file_metadata=bool(opt.filename),
            force_metadata=opt.force_metadata)
        alphabet = meta.to_alphabet()
        if opt.override_params:
            # text-predict.c:517-522: CLI hyperparams win over the file's
            net.learn_rate = opt.learn_rate
            net.momentum = opt.momentum
            net.momentum_weight = opt.momentum_weight
    if net is None:
        # --bottom-layer N inserts a feed-forward layer below the RNN:
        # alphabet one-hots -> N features -> RNN (rnn_new_with_bottom_layer)
        rnn_inputs = opt.bottom_layer if opt.bottom_layer else n_chars
        net = nn.new_net(rnn_inputs, opt.hidden_size, n_chars, flags=flags,
                         rng_seed=opt.rng_seed, depth=opt.depth,
                         learn_rate=opt.learn_rate, momentum=opt.momentum,
                         presynaptic_noise=opt.presynaptic_noise,
                         activation=Activation(opt.activation),
                         bottom_input_size=n_chars if opt.bottom_layer else 0,
                         metadata=meta.construct())
        p = winit.default_init_params(net.cfg)
        p.method = InitMethod(opt.init_method)
        p.submethod = InitMethod(opt.init_submethod)
        p.flat_shape = InitDistribution(opt.flat_init_distribution)
        if opt.init_variance > 0:
            p.flat_variance = opt.init_variance
        winit.randomise_weights(net, p)
        if opt.init_weight_scale:
            winit.scale_initial_weights(net, opt.init_weight_scale)
        if opt.perforate_weights:
            winit.perforate_weights(net, opt.perforate_weights)
    net.ho_scale = opt.top_learn_rate_scale

    text = alphabet.encode(raw)
    if opt.dump_collapsed_text:
        from recur_tpu.models.alphabet import dump_collapsed_text
        dump_collapsed_text(text, opt.dump_collapsed_text, alphabet)
    if opt.fp_exception_level > 0:
        from recur_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging(True)
    if opt.validate_chars > 2:
        v_text = text[-opt.validate_chars:]
        text = text[:-opt.validate_chars]
    else:
        v_text = np.array([], dtype=np.uint8)

    if opt.diagonal_only_section:
        winit.clear_diagonal_only_section(net, opt.diagonal_only_section,
                                          opt.diagonal_only_friends,
                                          boost=opt.diagonal_only_boost)

    n_streams = max(opt.multi_tap, 1)
    log = KvLog(opt.log_file)
    import jax.numpy as jnp
    teachers = []
    if opt.distill_from:
        from recur_tpu.models.charmodel import ensemble_alphabet
        teachers = [nn.load_net(f) for f in opt.distill_from]
        try:
            ensemble_alphabet([net] + teachers,
                              ["the student net"] + opt.distill_from)
        except ValueError as e:
            print(f"text-predict: error: {e}", file=sys.stderr)
            return 2
    model = CharModel(net, alphabet, n_streams=n_streams,
                      distill_teachers=teachers,
                      distill_alpha=opt.distill_alpha,
                      distill_temp=opt.distill_temp,
                      learning_style=style, batch_size=opt.batch_size,
                      momentum_soft_start=opt.momentum_soft_start,
                      report_interval=opt.report_interval,
                      save_net=not opt.no_save_net, filename=filename,
                      periodic_weight_noise=opt.periodic_weight_noise,
                      log=log, seed=opt.rng_seed,
                      history_dtype=jnp.dtype(opt.history_dtype),
                      bptt_impl=opt.bptt_impl, unroll=opt.unroll,
                      walk_unroll=opt.walk_unroll,
                      ema_weight=opt.ema_weight,
                      snapshot_every=opt.snapshot_every,
                      periodic_pgm_dump=opt.periodic_pgm_dump,
                      temporal_pgm_dump=opt.temporal_pgm_dump,
                      basename=opt.basename)
    if style == LearningMethod.ADAGRAD and opt.adagrad_ballast:
        import dataclasses
        import jax.numpy as jnp
        model.bptt = dataclasses.replace(
            model.bptt,
            ih_momentum=jnp.full_like(model.bptt.ih_momentum,
                                      opt.adagrad_ballast),
            ho_momentum=jnp.full_like(model.bptt.ho_momentum,
                                      opt.adagrad_ballast))
    if opt.learn_rate_inertia:
        model.schedule = Schedule(opt.learn_rate_inertia, opt.learn_rate_min,
                                  opt.learn_rate_scale,
                                  adjust_noise=opt.adjust_noise,
                                  trend=opt.learn_rate_schedule == "trend")
    vent = Ventropy(net.cfg, v_text.astype(np.int32),
                    lap=opt.validation_overlap) if len(v_text) else None

    if opt.quiet < 1:
        print(f"alphabet ({n_chars}): »{alphabet.points_string()}«",
              file=sys.stderr)
        print(f"net: i{n_chars} h{opt.hidden_size} o{n_chars} "
              f"taps {n_streams}; saving to {filename}", file=sys.stderr)

    # start position: explicit --start-char, else generation mod length
    # (text-predict.c:590-597); later epochs always start at 0
    L = max(len(text) - 1, 1)
    start = (opt.start_char if 0 <= opt.start_char < L
             else net.generation % L)
    epoch = 0
    while True:
        epoch += 1
        finished = model.epoch(text, ventropy=vent, stop=opt.stop_after,
                               start=start,
                               confab_size=opt.confab_size,
                               confab_bias=opt.confab_bias,
                               quietness=opt.quiet)
        start = 0
        if finished or (opt.epochs and epoch >= opt.epochs):
            break
    model.save(filename, backup=True)
    if opt.quiet < 2:
        print(f"saved {filename} at generation {model.generation}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
