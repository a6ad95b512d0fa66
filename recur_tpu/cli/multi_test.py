"""multi-test: score file lists with an ENSEMBLE of classifier nets and
report per-net and combined stats (the reference's multi-test driver runs
several classifiers in one pipeline)."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.trainer import Trainer
from recur_tpu.audio import stats as cstats
from recur_tpu.cli.classify_train import load_file_list


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="multi-test", description=__doc__)
    p.add_argument("nets", nargs="+", help=".net files (the ensemble)")
    p.add_argument("--classes", "-c", required=True)
    p.add_argument("--test-list", required=True)
    p.add_argument("--channels", "-n", type=int, default=12)
    p.add_argument("--window-size", "-w", type=int, default=256)
    p.add_argument("--json", action="store_true")
    opt = p.parse_args(argv)

    files = load_file_list(opt.test_list)
    group0 = opt.classes.split(",")[0]
    all_scores = []
    truth = None
    results = {}
    for net_path in opt.nets:
        loaded = nn.load_net(net_path)
        clf = AudioClassifier(classes=opt.classes, n_channels=opt.channels,
                              window_size=opt.window_size,
                              hidden_size=loaded.cfg.hidden_size,
                              net_filename=net_path, force_load=True,
                              pipeline_depth=4)
        tr = Trainer(clf, [], files, verbose=False)
        scores, t = [], []
        C = clf.n_channels
        clf.training = False
        for i in range(0, len(files), C):
            batch = list(files[i:i + C])
            clf.reset_state()
            clf.events = []
            msgs = tr._run_stream(tr._assign_files(batch))
            for m in msgs:
                for j in range(min(C, len(batch))):
                    tgt = m.get(f"channel {j}, group 0 target")
                    pk = f"channel {j}, group 0 {group0[0]}"
                    if tgt is not None and pk in m:
                        scores.append(m[pk])
                        t.append(tgt == group0[0])
        results[net_path] = cstats.calc_core_stats(np.array(scores),
                                                   np.array(t))
        all_scores.append(np.array(scores))
        truth = np.array(t)
    if len(all_scores) > 1:
        n = min(len(s) for s in all_scores)
        mean_scores = np.mean([s[:n] for s in all_scores], axis=0)
        results["ensemble"] = cstats.calc_core_stats(mean_scores, truth[:n])
    if opt.json:
        print(json.dumps(results))
    else:
        for name, r in results.items():
            line = " ".join(f"{k} {v:.4f}" for k, v in r.items())
            print(f"{name}: {line}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
