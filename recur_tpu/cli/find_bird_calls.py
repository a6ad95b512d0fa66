"""find-bird-calls: scan long recordings with a trained classifier and
report call detections + minute-level presence (the reference's bird-survey
driver), as JSON."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.utils import avio
from recur_tpu.audio import stats as cstats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="find-bird-calls", description=__doc__)
    p.add_argument("wavs", nargs="+")
    p.add_argument("--net-filename", "-f", required=True)
    p.add_argument("--classes", "-c", required=True,
                   help="class group string; the FIRST class is the call")
    p.add_argument("--window-size", "-w", type=int, default=256)
    p.add_argument("--threshold", "-t", type=float, default=0.5)
    p.add_argument("--min-length", type=float, default=0.1,
                   help="minimum call length in seconds")
    p.add_argument("--presence-window", type=float, default=60.0,
                   help="presence aggregation window (seconds)")
    opt = p.parse_args(argv)

    loaded = nn.load_net(opt.net_filename)
    clf = AudioClassifier(classes=opt.classes, n_channels=1,
                          window_size=opt.window_size,
                          hidden_size=loaded.cfg.hidden_size,
                          net_filename=opt.net_filename, force_load=True,
                          pipeline_depth=4)
    clf.training = False
    call_char = clf.groups[0].classes[0]
    key = f"channel 0, group 0 {call_char}"
    win_secs = opt.window_size * 0.5 / clf.rate
    out = {}
    for path in opt.wavs:
        pcm = avio.read_audio(path, clf.rate)
        clf.reset_state()
        msgs = clf.feed(pcm[None, :]) + clf.flush()
        scores = np.array([m[key] for m in msgs])
        # call detection: contiguous runs above threshold
        above = scores > opt.threshold
        calls = []
        start = None
        for i, a in enumerate(np.append(above, False)):
            if a and start is None:
                start = i
            elif not a and start is not None:
                length = (i - start) * win_secs
                if length >= opt.min_length:
                    calls.append({
                        "start": round(start * win_secs, 3),
                        "length": round(length, 3),
                        "peak": float(scores[start:i].max()),
                    })
                start = None
        pw = max(int(opt.presence_window / win_secs), 1)
        n_blocks = len(scores) // pw
        presence = [float(scores[i * pw:(i + 1) * pw].max())
                    for i in range(n_blocks)]
        out[path] = {"calls": calls, "presence": presence,
                     "windows": len(scores)}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
