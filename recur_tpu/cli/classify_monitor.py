"""classify-monitor: stream audio through a trained classifier and print a
live per-class unicode bar display (the classify-gtk/gtkdisplay.py pairing,
headless).

The input is any avio source spec: a WAV file, `pipe:FIFO` / `pipe:-`
carrying raw s16le at the classifier's rate (live microphone via external
plumbing, e.g. `arecord -f S16_LE -r 8000 | classify-monitor pipe:-`), or
`ffmpeg:SRC` where ffmpeg is available."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.utils import avio
from recur_tpu.utils.colour import C_NORMAL, bar_chart, colourise_float01


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="classify-monitor", description=__doc__)
    p.add_argument("input", help="audio source: WAV path, pipe:FIFO, "
                                 "pipe:- (stdin s16le), or ffmpeg:SRC")
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
    group_keys = [(gi, g, [f"channel 0, group {gi} {ch}"
                           for ch in g.classes])
                  for gi, g in enumerate(clf.groups)]
    print(" time  " + " | ".join(g.classes for _, g, _ in group_keys))
    chunk = int(clf.rate * opt.interval)
    t = 0
    # stream block-by-block: a FIFO source displays live as audio arrives
    for pcm in avio.audio_blocks(opt.input, clf.rate, channels=1,
                                 block_samples=chunk):
        msgs = clf.feed(pcm) + clf.flush()
        t += pcm.shape[1]
        if not msgs:
            continue
        cols = [f"{t / clf.rate:6.1f}"]
        for gi, g, keys in group_keys:
            probs = np.mean([[m[k] for k in keys] for m in msgs], axis=0)
            best = int(np.argmax(probs))
            colour = colourise_float01(float(probs[best]))
            cols.append(f"{bar_chart(probs, best)} "
                        f"{colour}{g.classes[best]} "
                        f"{probs[best]:.2f}{C_NORMAL}")
        print(" ".join(cols), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
