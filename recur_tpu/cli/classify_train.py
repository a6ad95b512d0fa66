"""classify-train: train an audio classifier on labelled WAV files.

Replaces the reference's classify-train (GStreamer pipeline driver).  Files
are labelled by a `filename class` list file (one per line) or by the
first-character-of-basename convention.
"""

from __future__ import annotations

import argparse
import sys

from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.trainer import LabelledFile, Trainer, class_from_filename


def load_file_list(path: str) -> list[LabelledFile]:
    """Each line: `<wav-path> <target-chars>` or just `<wav-path>`."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 2:
                out.append(LabelledFile(parts[0], parts[1]))
            else:
                out.append(LabelledFile(parts[0],
                                        class_from_filename(parts[0])))
    return out


def build_parser():
    p = argparse.ArgumentParser(prog="classify-train", description=__doc__)
    a = p.add_argument
    a("--classes", "-c", required=True,
      help="class group string, e.g. 'Mm' or 'Mm,Kk,Wx'")
    a("--train-list", required=True, help="file list for training")
    a("--test-list", required=True, help="file list for testing")
    a("--channels", "-n", type=int, default=12)
    a("--window-size", "-w", type=int, default=256)
    a("--hidden-size", "-H", type=int, default=199)
    a("--mfccs", type=int, default=0)
    a("--delta-features", type=int, default=0)
    a("--intensity-feature", type=int, default=0)
    a("--min-frequency", type=float, default=100.0)
    a("--max-frequency", type=float, default=0.0)
    a("--knee-frequency", type=float, default=700.0)
    a("--focus-frequency", type=float, default=0.0)
    a("--lag", type=float, default=0.0)
    a("--learn-rate", "-l", type=float, default=0.0001)
    a("--learn-rate-decay", type=float, default=0.9)
    a("--learn-rate-min", type=float, default=1e-6)
    a("--learn-rate-schedule", default="sqrt-exponential",
      choices=["flat", "sqrt-exponential", "inverse-time"])
    a("--momentum", "-m", type=float, default=0.95)
    a("--momentum-soft-start", type=float, default=0.0)
    a("--learning-style", type=int, default=1)
    a("--bptt-depth", type=int, default=30)
    a("--bottom-layer", type=int, default=0)
    a("--presynaptic-noise", type=float, default=0.0)
    a("--balanced-training", type=float, default=0.0)
    a("--error-weight", default=None)
    a("--ignored-windows", type=int, default=0)
    a("--basename", default="classify")
    a("--net-filename", "-f", default=None)
    a("--reload", action="store_true")
    a("--log-file", default="classify.log")
    a("--cycles", type=int, default=10)
    a("--timings", default=None,
      help="timing file (toggle / JSON-call / group formats) giving timed "
           "class events per audio file")
    a("--timing-threshold", type=float, default=0.0)
    a("--timing-max-duration", type=float, default=0.0)
    a("--activity-bias", type=int, default=0,
      help="add N duplicate training streams of only the files with timed "
           "class changes (classify-train:127-134)")
    a("--files-per-epoch", type=int, default=0,
      help="files drawn per training cycle (default: one per channel)")
    a("--test-interval", type=int, default=1,
      help="run a test epoch every N training cycles")
    a("--normalise-features", action="store_true",
      help="estimate per-feature offsets/scales from the training files "
           "(the find-feature-means workflow)")
    a("--no-save-net", action="store_true")
    a("--weight-init-method", type=int, default=1,
      help="0=zero 1=flat 2=fan-in 3=runs")
    a("--rng-seed", type=int, default=11)
    a("--quiet", "-q", action="count", default=0)
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)
    clf = AudioClassifier(
        classes=opt.classes, n_channels=opt.channels,
        window_size=opt.window_size, hidden_size=opt.hidden_size,
        mfccs=opt.mfccs, delta_features=opt.delta_features,
        intensity_feature=opt.intensity_feature,
        min_frequency=opt.min_frequency, max_frequency=opt.max_frequency,
        knee_frequency=opt.knee_frequency, focus_frequency=opt.focus_frequency,
        lag=opt.lag, ignored_windows=opt.ignored_windows,
        learn_rate=opt.learn_rate, momentum=opt.momentum,
        momentum_soft_start=opt.momentum_soft_start,
        learning_style=opt.learning_style, bptt_depth=opt.bptt_depth,
        bottom_layer=opt.bottom_layer,
        presynaptic_noise=opt.presynaptic_noise,
        error_weight=opt.error_weight,
        balanced_training_bias=opt.balanced_training,
        rng_seed=opt.rng_seed, basename=opt.basename,
        net_filename=opt.net_filename, force_load=opt.reload,
        weight_init_method=opt.weight_init_method,
        log_file=opt.log_file)
    timings = None
    if opt.timings:
        from recur_tpu.audio.timings import load_binary_timings
        timings = load_binary_timings(
            opt.timings, opt.classes.split(","),
            threshold=opt.timing_threshold,
            max_duration=opt.timing_max_duration)
    train_files = load_file_list(opt.train_list)
    if opt.normalise_features:
        from recur_tpu.audio.trainer import estimate_feature_normalisation
        estimate_feature_normalisation(clf, train_files[:16])
    trainer = Trainer(clf, train_files,
                      load_file_list(opt.test_list),
                      lr_schedule=opt.learn_rate_schedule,
                      lr_decay=opt.learn_rate_decay,
                      lr_min=opt.learn_rate_min, seed=opt.rng_seed,
                      verbose=opt.quiet < 1, timings=timings,
                      activity_bias=opt.activity_bias,
                      files_per_epoch=opt.files_per_epoch or None,
                      no_save_net=opt.no_save_net)
    result = trainer.run(opt.cycles, test_interval=opt.test_interval)
    if opt.quiet < 2:
        print("final:", result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
