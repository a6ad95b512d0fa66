#!/usr/bin/env python
"""Self-contained classify-train demo: synthesize a labelled audio corpus
(tone / chirp / noise classes), train an audio classifier end-to-end with
the Trainer harness, and report XE / AUC / accuracy / windows-per-second as
one JSON line — the BASELINE.json north-star workload measured end to end.

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/classify_demo.py
On CPU (smaller):
    JAX_PLATFORMS=cpu python scripts/classify_demo.py --cycles 3 --channels 4
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 8000


def synthesize_corpus(d: str, n_per_class: int, seconds: float, rng):
    """Three acoustically distinct classes: t = steady tone, c = repeating
    chirp sweeps, n = band-limited noise bursts."""
    from recur_tpu.audio.wavio import write_wav
    from recur_tpu.audio.trainer import LabelledFile

    files = []
    t = np.arange(int(RATE * seconds)) / RATE
    for i in range(n_per_class):
        # steady low tone with vibrato (300-900 Hz)
        f0 = rng.uniform(300, 900)
        tone = 3000 * np.sin(2 * np.pi * f0 * t
                             + 2.0 * np.sin(2 * np.pi * 5.0 * t))
        # chirp: sawtooth frequency sweep 1200->3500 Hz repeating ~1.5/s
        sweep = (t * rng.uniform(1.0, 2.0)) % 1.0
        fc = 1200 + 2300 * sweep
        chirp = 3000 * np.sin(2 * np.pi * np.cumsum(fc) / RATE)
        # noise bursts: white noise gated on/off
        gate = (np.sin(2 * np.pi * rng.uniform(2, 4) * t) > 0).astype(float)
        noise = 2500 * gate * rng.standard_normal(len(t))
        for cls, pcm in (("t", tone), ("c", chirp), ("n", noise)):
            pcm = pcm + rng.normal(0, 200, len(t))
            path = os.path.join(d, f"{cls}-{i:03d}.wav")
            write_wav(path, pcm, RATE)
            files.append(LabelledFile(path, cls))
    return files


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=199)
    p.add_argument("--cycles", type=int, default=8)
    p.add_argument("--n-per-class", type=int, default=12)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--learn-rate", type=float, default=2e-4)
    p.add_argument("--activation", type=int, default=2,
                   help="1 ReLU, 2 ReSQRT (default: ReSQRT — plain ReLU "
                        "recurrence at h=199 with dense features sits on a "
                        "forward-gain knife edge)")
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--keep", default=None, help="directory to keep WAVs in")
    opt = p.parse_args(argv)

    from recur_tpu.audio.classify import AudioClassifier
    from recur_tpu.audio.trainer import (Trainer,
                                         estimate_feature_normalisation)

    rng = np.random.default_rng(opt.seed)
    d = opt.keep or tempfile.mkdtemp(prefix="classify_demo_")
    os.makedirs(d, exist_ok=True)
    files = synthesize_corpus(d, opt.n_per_class, opt.seconds, rng)
    # stratified split: every class appears in the test set
    per_class = max(1, opt.n_per_class // 4)
    train, test = [], []
    for cls in "tcn":
        fs = [f for f in files if f.targets == cls]
        rng.shuffle(fs)
        test.extend(fs[:per_class])
        train.extend(fs[per_class:])
    rng.shuffle(train)

    clf = AudioClassifier(classes="tcn", n_channels=opt.channels,
                          window_size=256, hidden_size=opt.hidden_size,
                          learn_rate=opt.learn_rate, rng_seed=opt.seed,
                          activation=opt.activation,
                          delta_features=1, intensity_feature=1,
                          net_filename=os.path.join(d, "demo.net"),
                          log_file=os.path.join(d, "demo.log"))
    mu, sc = estimate_feature_normalisation(clf, train[:8])
    print(f"feature norm: offsets [{mu.min():.2f},{mu.max():.2f}] "
          f"scales [{sc.min():.3f},{sc.max():.3f}]", flush=True)
    tr = Trainer(clf, train, test, seed=opt.seed, verbose=True,
                 files_per_epoch=max(len(train) // 2, opt.channels),
                 lr_decay=0.95)
    t0 = time.time()
    result = {}
    wps = []
    for i in range(opt.cycles):
        tr.train_epoch()
        wps.append(tr.windows_per_second)
        result = tr.test_epoch()
        h = np.asarray(clf.state.hidden)
        print(f"cycle {tr.cycle}: auc {result['auc']:.4f} "
              f"acc {result['accuracy']:.4f} "
              f"train {tr.windows_per_second:,.0f} windows/s "
              f"[h!=0 {float((h != 0).mean()):.2f} hmax {float(h.max()):.0f} "
              f"ihmax {float(np.abs(np.asarray(clf.params.ih)).max()):.2f}]",
              flush=True)
        if result["auc"] > 0.99 and i >= 2:
            break
    elapsed = time.time() - t0
    # true mean test XE over targeted windows (Welford of -log2 p_target in
    # the Trainer; logging the mean probability instead would be
    # Jensen-biased optimistic)
    xe = float(result["xe_bits"])
    print(json.dumps({
        "metric": "classify-train end-to-end (3-class synthetic corpus)",
        "auc": round(result["auc"], 4),
        "accuracy": round(result["accuracy"], 4),
        "xe_bits": round(xe, 3),
        "train_windows_per_sec": round(max(wps), 0),
        "generations": clf.generation,
        "cycles": tr.cycle,
        "elapsed_sec": round(elapsed, 1),
    }))
    return 0 if result["auc"] > 0.95 else 1


if __name__ == "__main__":
    sys.exit(main())
