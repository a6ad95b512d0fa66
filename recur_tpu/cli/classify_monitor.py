"""classify-monitor: stream a WAV through a trained classifier and print a
live per-class unicode bar display (the classify-gtk/gtkdisplay.py pairing,
headless)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.wavio import read_wav
from recur_tpu.utils.colour import C_NORMAL, bar_chart, colourise_float01


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="classify-monitor", description=__doc__)
    p.add_argument("wav")
    p.add_argument("--net-filename", "-f", required=True)
    p.add_argument("--classes", "-c", required=True)
    p.add_argument("--window-size", "-w", type=int, default=256)
    p.add_argument("--interval", type=float, default=0.5,
                   help="seconds between display rows")
    opt = p.parse_args(argv)

    loaded = nn.load_net(opt.net_filename)
    clf = AudioClassifier(classes=opt.classes, n_channels=1,
                          window_size=opt.window_size,
                          hidden_size=loaded.cfg.hidden_size,
                          net_filename=opt.net_filename, force_load=True)
    clf.training = False
    pcm, _ = read_wav(opt.wav, target_rate=clf.rate)
    group_keys = [(gi, g, [f"channel 0, group {gi} {ch}"
                           for ch in g.classes])
                  for gi, g in enumerate(clf.groups)]
    print(" time  " + " | ".join(g.classes for _, g, _ in group_keys))
    chunk = int(clf.rate * opt.interval)
    for i in range(0, len(pcm) - chunk, chunk):
        msgs = clf.feed(pcm[None, i:i + chunk]) + clf.flush()
        if not msgs:
            continue
        cols = [f"{i / clf.rate:6.1f}"]
        for gi, g, keys in group_keys:
            probs = np.mean([[m[k] for k in keys] for m in msgs], axis=0)
            best = int(np.argmax(probs))
            colour = colourise_float01(float(probs[best]))
            cols.append(f"{bar_chart(probs, best)} "
                        f"{colour}{g.classes[best]} "
                        f"{probs[best]:.2f}{C_NORMAL}")
        print(" ".join(cols))
    return 0


if __name__ == "__main__":
    sys.exit(main())
