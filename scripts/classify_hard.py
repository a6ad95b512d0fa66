#!/usr/bin/env python
"""A classify task that can FAIL (VERDICT r3 next-step #5): two classes in
the SAME spectral band distinguished only by temporal structure — up-chirps
vs down-chirps sweeping the same 1000-2200 Hz range at the same rate and
level, in noise.  Their window-marginal spectra coincide, so a per-window
spectral classifier sits at AUC 0.5 by construction; the recurrent state
has to integrate the sweep ORDER across ~10 windows, which is exactly the
capability gstclassify.c exists to provide (its README bird calls are the
same problem).  (A first attempt used AM-rate discrimination — 3 vs 9 Hz
envelopes — and the classifier stayed at chance through every budget/LR
probe; chirp direction keeps per-window spectra overlapping while giving
the deltas a learnable signature.)

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
# chirp sweep direction per class: +1 = up-chirp, -1 = down-chirp.  Both
# classes sweep the SAME 1000-2200 Hz band with the same duration, level
# and rate, so their window-marginal spectra coincide — only the temporal
# ORDER of the energy across ~10 windows differs (the bird-call problem
# gstclassify's README describes, with the spectral crutch removed).
DIRECTION = {"a": +1.0, "b": -1.0}
CHIRP_SECS = 0.15
CHIRPS_PER_SEC = 2.5


def _add_chirp(sig, start, direction, rng):
    n = int(RATE * CHIRP_SECS)
    if start + n > len(sig):
        return
    t = np.arange(n) / RATE
    f_lo, f_hi = 1000.0, 2200.0
    f = (f_lo + (f_hi - f_lo) * t / CHIRP_SECS if direction > 0
         else f_hi - (f_hi - f_lo) * t / CHIRP_SECS)
    env = np.hanning(n)
    sig[start:start + n] += env * np.sin(
        2 * np.pi * np.cumsum(f) / RATE + rng.uniform(0, 2 * np.pi))


def synth(path, cls, seconds, snr_db, rng, switch_to=None):
    """One file: repeated chirps (direction per class) in white noise at
    snr_db.  switch_to: flip the chirp direction halfway (returns the
    switch time for the timing event)."""
    from recur_tpu.audio.wavio import write_wav
    n = int(RATE * seconds)
    sig = np.zeros(n, np.float64)
    t_switch = (seconds * rng.uniform(0.35, 0.65)) if switch_to else None
    pos = rng.uniform(0, 1.0 / CHIRPS_PER_SEC)
    while pos < seconds - CHIRP_SECS:
        d = DIRECTION[cls if (t_switch is None or pos < t_switch)
                      else switch_to]
        _add_chirp(sig, int(pos * RATE), d, rng)
        pos += rng.uniform(0.6, 1.4) / CHIRPS_PER_SEC
    sig *= 3000.0 / (np.sqrt((sig ** 2).mean()) + 1e-9) * 0.1
    noise = rng.standard_normal(n)
    noise *= np.sqrt((sig ** 2).mean() + 1e-12) / \
        np.sqrt((noise ** 2).mean()) * 10 ** (-snr_db / 20.0)
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
    train, test = [], []
    for cls in "ab":
        fs = [f for f in files if os.path.basename(f.path).startswith(
            f"{tag}-{cls}")]
        rng.shuffle(fs)
        # test split per CLASS COUNT (a fixed n_per_class//4 would send an
        # imbalanced class's every file to the test set, leaving none to
        # train on — observed round 4)
        n_test = max(1, len(fs) // 4)
        test.extend(fs[:n_test])
        train.extend(fs[n_test:])
    rng.shuffle(train)
    return train, test, timings


def run_arm(train, test, timings, cycles, channels, seed, lag=0.0,
            balance=0.0, error_weight=None, lr=2e-4, track_curve=False,
            workdir=None, noise=0.1, lr_decay=0.9, max_reinits=2):
    """One training run with the reference's own stabilisation levers
    (VERDICT r4 #5):

    * presynaptic noise 0.1 during training (the py-recur-text default,
      py-recur-text.c:437-445) — without it, low-SNR training found its
      0.98-AUC optimum and then destabilised to 0.64 in later cycles;
    * lr decay 0.9/cycle (was 0.95) for the same late-cycle stability;
    * dead-seed detection + re-init: an init still at chance after two
      cycles never recovers (observed 1-in-6 seeds pinned at AUC~0.498
      through all 8 cycles).  Retry on a shifted seed with
      rnn_scale_initial_weights to forward gain 1.0 (recur-nn.c:1027-1076,
      the option's own help text says "try ~1.0")."""
    from recur_tpu.audio.classify import AudioClassifier
    from recur_tpu.audio.trainer import (Trainer,
                                         estimate_feature_normalisation)
    d = workdir or tempfile.mkdtemp(prefix="classify_hard_")
    reinits = 0
    for attempt in range(1 + max_reinits):
        clf = AudioClassifier(classes="ab", n_channels=channels,
                              window_size=256, hidden_size=199,
                              learn_rate=lr,
                              rng_seed=seed + 1000 * attempt, activation=2,
                              presynaptic_noise=noise,
                              delta_features=1, intensity_feature=1,
                              lag=lag, balanced_training_bias=balance,
                              error_weight=error_weight,
                              weight_init_scale=(1.0 if attempt else 0.0),
                              net_filename=os.path.join(
                                  d, f"hard{attempt}.net"),
                              log_file=None)
        estimate_feature_normalisation(clf, train[:8])
        tr = Trainer(clf, train, test, seed=seed, verbose=False,
                     files_per_epoch=max(len(train) // 2, channels),
                     lr_decay=lr_decay, timings=timings or None)
        curve = []
        result, best, dead = {}, None, False
        for c in range(cycles):
            tr.train_epoch()
            result = tr.test_epoch()
            curve.append(round(result["auc"], 4))
            if best is None or result["auc"] > best["auc"]:
                best = result
            if c == 1 and best["auc"] < 0.6 and attempt < max_reinits:
                dead = True
                break
        if not dead:
            break
        reinits += 1
    # report the BEST cycle (the reference protocol: classify.py's
    # decaying-record auto-save deploys the best net seen, not the last)
    out = {"auc": round(best["auc"], 4),
           "accuracy": round(best["accuracy"], 4),
           "xe_bits": round(float(best["xe_bits"]), 3),
           "final_auc": round(result["auc"], 4),
           "reinits": reinits}
    if track_curve:
        out["auc_per_cycle"] = curve
    return out


def run_arm_seeds(mk_corpus, cycles, channels, seeds, **kw):
    """Ablation arms are variance-dominated at one seed (a lag conclusion
    inverted between two single-seed runs): average the best-cycle AUC
    over independent corpus draws + net seeds."""
    per_seed = []
    for s in seeds:
        train, test, tm = mk_corpus(s)
        per_seed.append(run_arm(train, test, tm, cycles, channels, s, **kw))
    return {"auc": round(float(np.mean([r["auc"] for r in per_seed])), 4),
            "final_auc": round(float(np.mean([r["final_auc"]
                                              for r in per_seed])), 4),
            "xe_bits": round(float(np.mean([r["xe_bits"]
                                            for r in per_seed])), 3),
            "auc_per_seed": [r["auc"] for r in per_seed],
            "final_per_seed": [r["final_auc"] for r in per_seed],
            "reinits": int(sum(r["reinits"] for r in per_seed))}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--cycles", type=int, default=8)
    p.add_argument("--n-per-class", type=int, default=16)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--n-seeds", type=int, default=3,
                   help="independent corpus+net draws per ablation arm "
                        "(the lag arms are variance-dominated at 3)")
    p.add_argument("--base-snr", type=float, default=0.0,
                   help="SNR dB for the non-sweep corpora")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--only", default=None,
                   help="comma list of sections to run "
                        "(budget,snr,imbalance,lag); default all")
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

    sections = set((opt.only or "budget,snr,imbalance,lag").split(","))

    rng = np.random.default_rng(opt.seed)
    d = tempfile.mkdtemp(prefix="classify_hard_corpus_")
    t0 = time.time()
    results = {"task": "same-band chirp-direction discrimination "
                       "(up vs down sweeps, 1000-2200 Hz)",
               "channels": channels, "cycles": cycles, "lr": opt.lr,
               "base_snr_db": opt.base_snr,
               "n_per_class": npc, "seconds": seconds}

    if "budget" in sections:
        train, test, _ = make_corpus(d, "base", npc, seconds,
                                     opt.base_snr, rng)
        results["budget_curve"] = run_arm(train, test, None, cycles,
                                          channels, opt.seed, lr=opt.lr,
                                          track_curve=True)
        print("budget:", results["budget_curve"], flush=True)

    seeds = (opt.seed,) if opt.smoke else tuple(
        opt.seed + i for i in range(opt.n_seeds))

    if "snr" in sections:
        # downward from base: the +6..+12 dB side measured flat-to-better
        # (noise regularises, like presynaptic noise on the char pillar);
        # the interesting wall is below.  Seed-averaged (VERDICT r4 #5:
        # the round-4 single-seed sweep was non-monotone — 0.98/0.79/0.98
        # — which was draw variance, not physics; every seed gets its own
        # corpus draw AND net init).
        snrs = (0.0,) if opt.smoke else (opt.base_snr, opt.base_snr - 6.0,
                                         opt.base_snr - 12.0)
        results["snr_sweep"] = {}
        for snr in snrs:
            def snr_corpus(s, snr=snr):
                r = np.random.default_rng(3000 + 17 * int(snr) + s)
                tr_f, te_f, _ = make_corpus(d, f"snr{int(snr)}s{s}", npc,
                                            seconds, snr, r)
                return tr_f, te_f, None
            results["snr_sweep"][f"{snr:+.0f}dB"] = run_arm_seeds(
                snr_corpus, cycles, channels, seeds, lr=opt.lr)
            print(f"snr {snr:+.0f}:",
                  results["snr_sweep"][f"{snr:+.0f}dB"], flush=True)

    if "imbalance" in sections:
        def imb_corpus(s):
            r = np.random.default_rng(1000 + s)
            tr_f, te_f, _ = make_corpus(d, f"imb{s}", npc * 2, seconds,
                                        opt.base_snr, r, imbalance=4)
            return tr_f, te_f, None
        results["imbalance_4to1"] = {
            "plain": run_arm_seeds(imb_corpus, cycles, channels, seeds,
                                   lr=opt.lr),
            "balanced_bias_1": run_arm_seeds(imb_corpus, cycles, channels,
                                             seeds, balance=1.0, lr=opt.lr),
            "error_weight_1to4": run_arm_seeds(imb_corpus, cycles,
                                               channels, seeds,
                                               error_weight="1:4",
                                               lr=opt.lr),
        }
        print("imbalance:", results["imbalance_4to1"], flush=True)

    if "lag" in sections:
        def sw_corpus(s):
            r = np.random.default_rng(2000 + s)
            return make_corpus(d, f"sw{s}", npc, seconds * 2,
                               opt.base_snr, r, switching=True)
        results["switching_lag"] = {
            "lag_0": run_arm_seeds(sw_corpus, cycles, channels, seeds,
                                   lag=0.0, lr=opt.lr),
            "lag_0.4": run_arm_seeds(sw_corpus, cycles, channels, seeds,
                                     lag=0.4, lr=opt.lr),
        }
        print("lag:", results["switching_lag"], flush=True)

    results["elapsed_sec"] = round(time.time() - t0, 1)
    out_path = os.path.join(REPO, opt.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if opt.only and os.path.exists(out_path):
        # a partial re-run (--only snr / lag / ...) updates just its
        # sections in the committed record instead of clobbering the rest
        merged = json.load(open(out_path))
        merged.update({k: v for k, v in results.items()
                       if k not in ("elapsed_sec",)})
        merged["elapsed_sec"] = results["elapsed_sec"]
        results = merged
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
