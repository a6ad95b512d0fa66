"""classify-test / classify-simple-test: score labelled WAV files with a
trained classifier net and print ROC/AUC stats (optionally JSON)."""

from __future__ import annotations

import argparse
import json
import sys

from recur_tpu import nn
from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.trainer import LabelledFile, Trainer
from recur_tpu.cli.classify_train import load_file_list


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="classify-test", description=__doc__)
    p.add_argument("--net-filename", "-f", required=True)
    p.add_argument("--classes", "-c", required=True)
    p.add_argument("--test-list", required=True)
    p.add_argument("--channels", "-n", type=int, default=12)
    p.add_argument("--window-size", "-w", type=int, default=256)
    p.add_argument("--json", action="store_true")
    opt = p.parse_args(argv)

    loaded = nn.load_net(opt.net_filename)
    clf = AudioClassifier(classes=opt.classes, n_channels=opt.channels,
                          window_size=opt.window_size,
                          hidden_size=loaded.cfg.hidden_size,
                          net_filename=opt.net_filename, force_load=True,
                          pipeline_depth=4)
    trainer = Trainer(clf, [], load_file_list(opt.test_list),
                      verbose=not opt.json)
    result = trainer.test_epoch()
    if opt.json:
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
