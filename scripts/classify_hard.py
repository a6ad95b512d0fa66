#!/usr/bin/env python
"""A classify task that can FAIL (VERDICT r3 next-step #5): two classes in
the SAME spectral band distinguished only by temporal structure (AM
modulation rate 3 Hz vs 9 Hz over an identical carrier distribution), under
additive noise.  A per-window spectral classifier cannot separate them —
the recurrent state has to integrate the envelope across windows, which is
exactly the capability gstclassify.c exists to provide (its README bird
calls are temporal too).

Measures, on the same corpus generator:
  * AUC vs training budget (per-cycle curve)
  * AUC vs SNR (+6 / 0 / -6 dB)
  * balanced training + error weighting on an 8:1 imbalanced corpus
    (gstclassify.c "balanced training" / error-weight properties)
  * training lag on a mid-stream class-switch corpus (timing events,
    gstclassify.c target-time grammar): with lag the windows right after
    an unobservable switch are not force-credited to the new class

Writes artifacts/classify_hard/results.json and prints it.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/classify_hard.py
    JAX_PLATFORMS=cpu python scripts/classify_hard.py --smoke   # tiny
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RATE = 8000
MOD = {"a": 3.0, "b": 9.0}          # AM rates; carriers overlap completely


def synth(path, cls, seconds, snr_db, rng, switch_to=None):
    """One file: AM tone, carrier drawn from the SAME band for both
    classes, plus white noise at snr_db.  switch_to: change class halfway
    (returns the switch time for the timing event)."""
    from recur_tpu.audio.wavio import write_wav
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    f0 = rng.uniform(600, 2400)      # identical distribution for a and b
    phase = rng.uniform(0, 2 * np.pi)
    mod = np.full(n, MOD[cls])
    t_switch = None
    if switch_to:
        t_switch = seconds * rng.uniform(0.35, 0.65)
        mod[t >= t_switch] = MOD[switch_to]
    env = 0.5 + 0.5 * np.sin(2 * np.pi * np.cumsum(mod) / RATE + phase)
    sig = env * np.sin(2 * np.pi * f0 * t)
    sig *= 3000.0 / np.sqrt((sig ** 2).mean() + 1e-9) * 0.1
    noise = rng.standard_normal(n)
    noise *= np.sqrt((sig ** 2).mean()) / np.sqrt((noise ** 2).mean()) \
        * 10 ** (-snr_db / 20.0)
    write_wav(path, sig + noise, RATE)
    return t_switch


def make_corpus(d, tag, n_per_class, seconds, snr_db, rng,
                imbalance=None, switching=False):
    """Returns (train_files, test_files, timings)."""
    from recur_tpu.audio.trainer import LabelledFile
    files, timings = [], {}
    counts = {"a": n_per_class, "b": n_per_class}
    if imbalance:
        counts["b"] = max(1, n_per_class // imbalance)
    for cls, cnt in counts.items():
        for i in range(cnt):
            name = f"{tag}-{cls}{i:03d}.wav"
            path = os.path.join(d, name)
            if switching:
                other = "b" if cls == "a" else "a"
                ts = synth(path, cls, seconds, snr_db, rng, switch_to=other)
                timings[name] = [(0, cls, 0.0, f"t0.0:{cls}"),
                                 (0, other, ts, f"t{ts}:{other}")]
                files.append(LabelledFile(path, cls))
            else:
                synth(path, cls, seconds, snr_db, rng)
                files.append(LabelledFile(path, cls))
    per_class = max(1, n_per_class // 4)
    train, test = [], []
    for cls in "ab":
        fs = [f for f in files if os.path.basename(f.path).startswith(
            f"{tag}-{cls}")]
        rng.shuffle(fs)
        test.extend(fs[:per_class])
        train.extend(fs[per_class:])
    rng.shuffle(train)
    return train, test, timings


def run_arm(train, test, timings, cycles, channels, seed, lag=0.0,
            balance=0.0, error_weight=None, lr=2e-4, track_curve=False,
            workdir=None):
    from recur_tpu.audio.classify import AudioClassifier
    from recur_tpu.audio.trainer import (Trainer,
                                         estimate_feature_normalisation)
    d = workdir or tempfile.mkdtemp(prefix="classify_hard_")
    clf = AudioClassifier(classes="ab", n_channels=channels,
                          window_size=256, hidden_size=199,
                          learn_rate=lr, rng_seed=seed, activation=2,
                          delta_features=1, intensity_feature=1,
                          lag=lag, balanced_training_bias=balance,
                          error_weight=error_weight,
                          net_filename=os.path.join(d, "hard.net"),
                          log_file=None)
    estimate_feature_normalisation(clf, train[:8])
    tr = Trainer(clf, train, test, seed=seed, verbose=False,
                 files_per_epoch=max(len(train) // 2, channels),
                 lr_decay=0.95, timings=timings or None)
    curve = []
    result = {}
    for _ in range(cycles):
        tr.train_epoch()
        result = tr.test_epoch()
        curve.append(round(result["auc"], 4))
    out = {"auc": round(result["auc"], 4),
           "accuracy": round(result["accuracy"], 4),
           "xe_bits": round(float(result["xe_bits"]), 3)}
    if track_curve:
        out["auc_per_cycle"] = curve
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--cycles", type=int, default=8)
    p.add_argument("--n-per-class", type=int, default=16)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU-sized run (corpus + one arm each)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the JAX_PLATFORMS env var "
                        "is not enough — an axon startup hook initialises "
                        "the TPU plugin first, CLAUDE.md)")
    p.add_argument("--out", default="artifacts/classify_hard/results.json")
    opt = p.parse_args(argv)

    import jax
    if opt.cpu or opt.smoke:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() != "cpu"
    channels = opt.channels or (64 if on_tpu else 4)
    cycles = 2 if opt.smoke else opt.cycles
    npc = 4 if opt.smoke else opt.n_per_class
    seconds = 2.0 if opt.smoke else opt.seconds

    rng = np.random.default_rng(opt.seed)
    d = tempfile.mkdtemp(prefix="classify_hard_corpus_")
    t0 = time.time()
    results = {"task": "same-band AM-rate discrimination (3 vs 9 Hz)",
               "channels": channels, "cycles": cycles,
               "n_per_class": npc, "seconds": seconds}

    # 1. budget curve at 0 dB SNR
    train, test, _ = make_corpus(d, "base", npc, seconds, 0.0, rng)
    results["budget_curve_0db"] = run_arm(train, test, None, cycles,
                                          channels, opt.seed,
                                          track_curve=True)
    print("budget:", results["budget_curve_0db"], flush=True)

    # 2. SNR sweep
    snrs = (0.0,) if opt.smoke else (6.0, 0.0, -6.0)
    results["snr_sweep"] = {}
    for snr in snrs:
        tr_f, te_f, _ = make_corpus(d, f"snr{int(snr)}", npc, seconds,
                                    snr, rng)
        results["snr_sweep"][f"{snr:+.0f}dB"] = run_arm(
            tr_f, te_f, None, cycles, channels, opt.seed)
        print(f"snr {snr:+.0f}:", results["snr_sweep"][f"{snr:+.0f}dB"],
              flush=True)

    # 3. balance / error-weight ablation on an 8:1 imbalanced corpus
    tr_f, te_f, _ = make_corpus(d, "imb", npc * 2, seconds, 0.0, rng,
                                imbalance=8)
    results["imbalance_8to1"] = {
        "plain": run_arm(tr_f, te_f, None, cycles, channels, opt.seed),
        "balanced_bias_1": run_arm(tr_f, te_f, None, cycles, channels,
                                   opt.seed, balance=1.0),
        "error_weight_1to6": run_arm(tr_f, te_f, None, cycles, channels,
                                     opt.seed, error_weight="1:6"),
    }
    print("imbalance:", results["imbalance_8to1"], flush=True)

    # 4. lag ablation on the mid-stream switching corpus
    tr_f, te_f, tm = make_corpus(d, "sw", npc, seconds * 2, 0.0, rng,
                                 switching=True)
    results["switching_lag"] = {
        "lag_0": run_arm(tr_f, te_f, tm, cycles, channels, opt.seed,
                         lag=0.0),
        "lag_0.4": run_arm(tr_f, te_f, tm, cycles, channels, opt.seed,
                           lag=0.4),
    }
    print("lag:", results["switching_lag"], flush=True)

    results["elapsed_sec"] = round(time.time() - t0, 1)
    out_path = os.path.join(REPO, opt.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
