"""classify-train: train an audio classifier on labelled WAV files.

Replaces the reference's classify-train (GStreamer pipeline driver).  Files
are labelled by a `filename class` list file (one per line) or by the
first-character-of-basename convention.
"""

from __future__ import annotations

import argparse
import sys

from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.properties import (add_classify_args,
                                        classifier_kwargs_from_args)
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
    # the classifier surface is GENERATED from the single property registry
    # (audio/properties.py) — the SURVEY §5.6 single-source-of-truth pattern,
    # like the reference's GObject-introspected argparse (classify.py:744-773)
    add_classify_args(p, skip=("classes",))
    a = p.add_argument
    a("--classes", "-c", required=True, dest="classes",
      help="class group string, e.g. 'Mm' or 'Mm,Kk,Wx'")
    a("--train-list", required=True, help="file list for training")
    a("--test-list", required=True, help="file list for testing")
    a("--learn-rate-decay", type=float, default=0.9)
    a("--learn-rate-min", type=float, default=1e-6)
    a("--learn-rate-schedule", default="sqrt-exponential",
      choices=["flat", "sqrt-exponential", "inverse-time"])
    a("--reload", action="store_true")
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
    a("--quiet", "-q", action="count", default=0)
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)
    kwargs = classifier_kwargs_from_args(opt)
    kwargs["force_load"] = opt.reload
    # classify-train logs by default (the reference defaults --log-file to
    # 'auto'); pass --log-file '' to disable
    kwargs.setdefault("log_file", "classify.log")
    clf = AudioClassifier(**kwargs)
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
